"""Z-order clustering: key correctness + measurable multi-dim pruning."""

from __future__ import annotations

import glob
import random

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.functions.zorder import quantize, zorder_key
from weather_data_pipeline_sv_spark.sources.writers import write_zordered


def _morton2(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_python_reference(spark):
    rows = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(rows, "x: long, y: long")
    out = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=6).alias("z")
    ).collect()
    for r in out:
        assert r["z"] == _morton2(r["x"], r["y"], 6), (r["x"], r["y"])


def test_quantize_clamps_and_scales(spark):
    df = spark.createDataFrame([(-100.0,), (0.0,), (90.0,), (200.0,)], "v: double")
    got = [r[0] for r in df.select(quantize(F.col("v"), -90.0, 90.0, 8)).collect()]
    assert got[0] == 0  # clamped low
    assert got[1] == 127  # midpoint -> ~center cell
    assert got[2] == 255  # top of range
    assert got[3] == 255  # clamped high


def _file_stats(path: str, col: str) -> list[tuple[float, float]]:
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.read_metadata(f)
        idx = md.schema.names.index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        out.append((lo, hi))
    return out


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    rng = random.Random(42)
    rows = [(rng.uniform(47.0, 55.0), rng.uniform(5.0, 15.0)) for _ in range(20000)]
    df = spark.createDataFrame(rows, "lat: double, lon: double")
    n_files = 16

    lat_sorted = str(tmp_path / "lat_sorted")
    df.repartitionByRange(n_files, F.col("lat")).sortWithinPartitions("lat").write.parquet(
        lat_sorted
    )
    zpath = str(tmp_path / "zordered")
    write_zordered(df, zpath, [("lat", 47.0, 55.0), ("lon", 5.0, 15.0)], n_files)

    # row multiset preserved
    assert spark.read.parquet(zpath).count() == 20000

    # The z-order win is BALANCED extents: a lat-sorted layout has minimal
    # per-file area (thin slabs) but 100% lon extent, so footer stats can
    # never prune a lon predicate. Z-ordered files are narrow in BOTH dims
    # (~n^-1/2 each); a few range-boundary files may straddle a high z bit
    # and go wide, so assert on the bulk, not the max.
    z_lats, z_lons = _file_stats(zpath, "lat"), _file_stats(zpath, "lon")
    narrow_both = sum(
        1
        for (a_lo, a_hi), (o_lo, o_hi) in zip(z_lats, z_lons)
        if (a_hi - a_lo) <= 0.5 * 8.0 and (o_hi - o_lo) <= 0.5 * 10.0
    )
    assert narrow_both >= 12, f"only {narrow_both}/16 files narrow in both dims"

    # lon-only predicate: z-ordered layout prunes, lat-sorted cannot at all
    lon_band = (7.0, 8.0)
    z_surviving_lon = sum(
        1 for o_lo, o_hi in z_lons if not (o_hi < lon_band[0] or o_lo > lon_band[1])
    )
    assert z_surviving_lon <= len(z_lons) // 2

    # pruning proof, the way the parquet reader's pushdown sees it: a bbox
    # predicate can skip every file whose footer stats miss the box
    box = (49.0, 50.0, 7.0, 8.0)  # 1/8 of lat range x 1/10 of lon range
    lats, lons = _file_stats(zpath, "lat"), _file_stats(zpath, "lon")
    surviving = sum(
        1
        for (a_lo, a_hi), (o_lo, o_hi) in zip(lats, lons)
        if not (a_hi < box[0] or a_lo > box[1] or o_hi < box[2] or o_lo > box[3])
    )
    assert surviving <= len(lats) // 2
    # while the lat-sorted layout cannot prune on lon at all
    lons_sorted = _file_stats(lat_sorted, "lon")
    assert all(o_hi - o_lo > 9.0 for o_lo, o_hi in lons_sorted)
