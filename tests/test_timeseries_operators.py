"""Tests for operators/timeseries.py — gap-fill edge semantics."""

from __future__ import annotations

import datetime as dt

from weather_data_pipeline_sv_spark.operators.timeseries import (
    gap_fill_hourly,
    last_per_hour,
)

T0 = dt.datetime(2024, 6, 1, 0, 0, 0)
H = lambda h, m=0: T0 + dt.timedelta(hours=h, minutes=m)  # noqa: E731

SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def test_spine_covers_range_and_marks_gaps(spark):
    df = spark.createDataFrame(
        [(1, H(0), 7, 1.0), (2, H(3, 30), 7, 4.0)], SCHEMA
    )
    out = {r["hour"]: r for r in gap_fill_hourly(
        df, ["user_id"], "ts", "value", "event_id").collect()}
    assert sorted(out) == [H(0), H(1), H(2), H(3)]
    assert not out[H(0)]["is_gap"] and out[H(1)]["is_gap"] and out[H(2)]["is_gap"]
    # forward fill carries hour-0 value through the gap
    assert out[H(1)]["value_ff"] == 1.0 and out[H(2)]["value_ff"] == 1.0
    assert out[H(3)]["value_ff"] == 4.0 and not out[H(3)]["is_gap"]


def test_last_per_hour_takes_latest_by_ts_then_id(spark):
    df = spark.createDataFrame(
        [
            (1, H(0, 10), 7, 1.0),
            (2, H(0, 50), 7, 2.0),   # later ts wins
            (3, H(0, 50), 7, 3.0),   # equal ts: higher event_id wins
        ],
        SCHEMA,
    )
    rows = last_per_hour(df, ["user_id"], "ts", "value", "event_id").collect()
    assert len(rows) == 1 and rows[0]["value"] == 3.0


def test_keys_do_not_leak_across_users(spark):
    df = spark.createDataFrame(
        [(1, H(0), 1, 10.0), (2, H(2), 1, 20.0), (3, H(1), 2, 99.0)], SCHEMA
    )
    out = gap_fill_hourly(df, ["user_id"], "ts", "value", "event_id").collect()
    u1 = [r for r in out if r["user_id"] == 1]
    u2 = [r for r in out if r["user_id"] == 2]
    assert len(u1) == 3 and len(u2) == 1
    # user 2's value never appears in user 1's fill
    assert all(r["value_ff"] in (10.0, 20.0) for r in u1)
