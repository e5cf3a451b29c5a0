"""Tests for operators/spatial.py — the grid-bucketed range join must be
result-identical to the brute-force cross join (bucketing only prunes
non-matching pairs), including at the antimeridian and at high latitude."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.operators.spatial import (
    brute_force_range_join,
    bucketed_range_join,
)


def _pairs(df):
    return {
        (r["pid"], r["cid"], round(r["distance_km"], 6)) for r in df.collect()
    }


@pytest.fixture(scope="module")
def geo(spark):
    # deterministic scatter including lon wrap (±180) and high-lat bands
    pts = spark.createDataFrame(
        [
            (i,
             float((i * 37) % 149 - 74),          # lat in [-74, 74]
             float(((i * 91) % 360) - 180))        # lon in [-180, 179]
            for i in range(400)
        ],
        "pid long, lat double, lon double",
    )
    cents = spark.createDataFrame(
        [
            (j,
             float((j * 53) % 141 - 70),
             float(((j * 17 + 170) % 360) - 180))  # several near ±180
            for j in range(40)
        ],
        "cid long, c_lat double, c_lon double",
    )
    return pts, cents


@pytest.mark.parametrize("radius_km", [150.0, 500.0, 1200.0])
def test_bucketed_equals_brute_force(spark, geo, radius_km):
    pts, cents = geo
    got = _pairs(bucketed_range_join(pts, cents, radius_km))
    want = _pairs(brute_force_range_join(pts, cents, radius_km))
    assert got == want
    assert want, f"fixture produced no pairs at {radius_km} km — weak test"


def test_antimeridian_pair_found(spark):
    pts = spark.createDataFrame(
        [(1, 10.0, 179.8)], "pid long, lat double, lon double"
    )
    cents = spark.createDataFrame(
        [(1, 10.0, -179.8)], "cid long, c_lat double, c_lon double"
    )
    # 0.4 deg of lon at lat 10 ~ 44 km: must match across the wrap
    out = bucketed_range_join(pts, cents, radius_km=100.0).collect()
    assert len(out) == 1 and out[0]["distance_km"] < 100.0


def test_high_latitude_lon_shrink_handled(spark):
    # at lat 72, 1 deg lon ~ 34 km: a 300 km radius spans ~9 lon degrees,
    # far beyond the +/-1-cell ring that suffices at the equator
    pts = spark.createDataFrame(
        [(1, 72.0, 8.0)], "pid long, lat double, lon double"
    )
    cents = spark.createDataFrame(
        [(1, 72.0, 0.0)], "cid long, c_lat double, c_lon double"
    )
    got = bucketed_range_join(pts, cents, radius_km=300.0).collect()
    want = brute_force_range_join(pts, cents, radius_km=300.0).collect()
    assert len(got) == len(want) == 1


def test_disjoint_column_names_enforced(spark, geo):
    pts, _ = geo
    with pytest.raises(ValueError, match="disjoint"):
        bucketed_range_join(pts, pts, radius_km=10.0)


def test_no_cartesian_in_physical_plan(spark, geo):
    """The structural point of bucketing: the physical plan is a hash equi
    join on the cell key, never a cartesian/broadcast-NL pass."""
    pts, cents = geo
    cells = bucketed_range_join(pts, cents, radius_km=150.0)
    plan = cells._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # matched pairs are a tiny fraction of the N*M cross-join space
    assert cells.count() < pts.count() * cents.count() * 0.05
