"""Property tests for the round-2 surfaces: engine-portable band sizing,
packed-vote SimHash equivalence against an independent reference
implementation, shoelace-centroid invariants, and retry/cron contracts."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from weather_data_pipeline_sv_spark.catalog.vector import _V8_BS_SQL, _v8_band_size
from weather_data_pipeline_sv_spark.plans.scheduler import CronSchedule
from weather_data_pipeline_sv_spark.sources import retry as rt


# ---------------------------------------------------------------------------
# v8 band sizing: the Python chain and the SQL CASE must agree everywhere
# ---------------------------------------------------------------------------

@given(st.integers(min_value=0, max_value=3_000_000))
@settings(max_examples=200, deadline=None)
def test_band_size_python_sql_equivalence(n):
    sql = duckdb.query(
        f"SELECT {_V8_BS_SQL} FROM (SELECT {n} AS n)"
    ).fetchone()[0]
    assert sql == _v8_band_size(n)


def test_band_size_monotone():
    sizes = [_v8_band_size(n) for n in range(0, 1_000_000, 997)]
    assert sizes == sorted(sizes)
    assert sizes[0] == 4 and sizes[-1] <= 16


# ---------------------------------------------------------------------------
# SimHash packed-vote aggregation == independent per-doc reference
# ---------------------------------------------------------------------------

def _ref_simhash(text: str) -> tuple[int, int]:
    """Straight-line reference: md5 per token, +1/-1 votes per bit."""
    toks = text.strip().lower().split()
    votes_hi, votes_lo = [0] * 32, [0] * 32
    for t in toks:
        h = hashlib.md5(t.encode()).hexdigest()
        hi, lo = int(h[:8], 16), int(h[8:16], 16)
        for b in range(32):
            votes_hi[b] += 1 if (hi >> b) & 1 else -1
            votes_lo[b] += 1 if (lo >> b) & 1 else -1
    sig_hi = sum(1 << b for b in range(32) if votes_hi[b] > 0)
    sig_lo = sum(1 << b for b in range(32) if votes_lo[b] > 0)
    return sig_hi, sig_lo


def test_simhash_matches_reference_impl(spark):
    from weather_data_pipeline_sv_spark.operators.dedup import simhash

    docs = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "completely different content entirely here now"),
        (3, "single"),
        (4, "repeat repeat repeat repeat repeat"),
        (5, "  leading and   irregular   whitespace  "),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["simhash_hi"], r["simhash_lo"])
        for r in simhash(df, "doc_id", "text").collect()
    }
    for doc_id, text in docs:
        assert got[doc_id] == _ref_simhash(text), f"doc {doc_id}"


# ---------------------------------------------------------------------------
# Shoelace centroid invariants
# ---------------------------------------------------------------------------

def _centroid_of(spark, coords):
    from weather_data_pipeline_sv_spark.sources.postal_codes import (
        postal_centroids_from_overpass,
    )

    el = {
        "type": "way",
        "tags": {"postal_code": "X"},
        "geometry": [{"lon": x, "lat": y} for x, y in coords],
    }
    [r] = postal_centroids_from_overpass(spark, [el]).collect()
    return r["centroid_lon"], r["centroid_lat"]


@pytest.mark.parametrize("n_vertices", [3, 5, 8, 12])
@pytest.mark.parametrize("cx,cy,scale", [(0.0, 0.0, 1.0), (13.4, 52.5, 0.01)])
def test_regular_polygon_centroid_is_center(spark, n_vertices, cx, cy, scale):
    coords = [
        (
            cx + scale * math.cos(2 * math.pi * i / n_vertices),
            cy + scale * math.sin(2 * math.pi * i / n_vertices),
        )
        for i in range(n_vertices)
    ]
    lon, lat = _centroid_of(spark, coords)  # open ring: repair kicks in
    # 1e-7 deg ~= 1 cm: far below any centroid-distance use; tighter bounds
    # hit shoelace cancellation noise at offset coordinates (~1e-9)
    assert abs(lon - cx) < 1e-7 and abs(lat - cy) < 1e-7


def test_centroid_open_equals_closed(spark):
    coords = [(0, 0), (4, 0), (4, 1), (1, 1), (1, 3), (0, 3)]  # L-shape
    open_c = _centroid_of(spark, coords)
    closed_c = _centroid_of(spark, coords + [coords[0]])
    assert open_c == closed_c


def test_centroid_orientation_invariant(spark):
    coords = [(0, 0), (4, 0), (4, 1), (1, 1), (1, 3), (0, 3)]
    cw = _centroid_of(spark, list(reversed(coords)))
    ccw = _centroid_of(spark, coords)
    assert abs(cw[0] - ccw[0]) < 1e-12 and abs(cw[1] - ccw[1]) < 1e-12


# ---------------------------------------------------------------------------
# Retry schedule + cron contracts
# ---------------------------------------------------------------------------

@given(
    st.integers(min_value=1, max_value=20),
    st.floats(min_value=0.1, max_value=8.0),
    st.floats(min_value=0.0, max_value=5.0),
)
@settings(max_examples=100, deadline=None)
def test_backoff_schedule_properties(attempts, multiplier, min_wait):
    max_wait = min_wait + 10.0
    sched = rt.backoff_schedule(attempts, multiplier, min_wait, max_wait)
    assert len(sched) == attempts - 1
    assert sched == sorted(sched)  # nondecreasing
    assert all(min_wait <= s <= max_wait for s in sched)


@given(st.datetimes(min_value=dt.datetime(2020, 1, 1), max_value=dt.datetime(2030, 1, 1)))
@settings(max_examples=100, deadline=None)
def test_six_hourly_cron_always_four_fires_per_day(t0):
    fires = CronSchedule("0 */6 * * *").fires_between(t0, t0 + dt.timedelta(days=1))
    assert len(fires) == 4
    assert all(f.hour % 6 == 0 and f.minute == 0 for f in fires)
