"""Tests for operators/asof.py — semantics pinned against crafted cases and
pandas.merge_asof on real events data."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.operators.asof import asof_join
from weather_data_pipeline_sv_spark.sources import load_tables

T0 = dt.datetime(2024, 5, 1, 0, 0, 0)
M = lambda m: T0 + dt.timedelta(minutes=m)  # noqa: E731


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_backward_match_equal_ts_and_nulls(spark):
    left = _mk(spark, [
        (1, M(0), 10.0),   # before any right row -> nulls
        (2, M(5), 20.0),   # matches right at M(5) (equal ts included)
        (3, M(30), 30.0),  # matches latest right at M(20)
    ], "id long, ts timestamp, v double")
    right = _mk(spark, [
        (M(5), 1.5), (M(20), 2.5), (M(40), 3.5),
    ], "ts timestamp, rv double")
    out = {r["id"]: r for r in asof_join(left, right, on="ts").collect()}
    assert out[1]["ts_asof"] is None and out[1]["rv_asof"] is None
    assert out[2]["ts_asof"] == M(5) and out[2]["rv_asof"] == 1.5
    assert out[3]["ts_asof"] == M(20) and out[3]["rv_asof"] == 2.5


def test_by_keys_partition_matches(spark):
    left = _mk(spark, [("a", M(10), 1), ("b", M(10), 2)],
               "k string, ts timestamp, id long")
    right = _mk(spark, [("a", M(1), 100.0), ("b", M(9), 200.0)],
                "k string, ts timestamp, rv double")
    out = {r["id"]: r["rv_asof"] for r in
           asof_join(left, right, on="ts", by=["k"]).collect()}
    assert out == {1: 100.0, 2: 200.0}


def test_tolerance_voids_stale_matches(spark):
    left = _mk(spark, [(1, M(60), 1.0)], "id long, ts timestamp, v double")
    right = _mk(spark, [(M(0), 9.0)], "ts timestamp, rv double")
    loose = asof_join(left, right, on="ts").collect()[0]
    assert loose["rv_asof"] == 9.0
    tight = asof_join(
        left, right, on="ts", tolerance=F.expr("INTERVAL 30 MINUTES")
    ).collect()[0]
    assert tight["rv_asof"] is None and tight["ts_asof"] is None


def test_matches_pandas_merge_asof_on_events(spark, sf_dir):
    ev = load_tables(spark, sf_dir, "events")["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("value").alias("err_value"))
    got = (
        asof_join(clicks, errors, on="ts", by=["user_id"],
                  right_cols=["err_value"])
        .select("event_id", "ts_asof", "err_value_asof")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    lp = clicks.toPandas().sort_values("ts")
    rp = errors.toPandas().sort_values("ts")
    want = (
        pd.merge_asof(lp, rp, on="ts", by="user_id", direction="backward")
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 100
    assert got["event_id"].tolist() == want["event_id"].tolist()
    a = got["err_value_asof"].fillna(-1).tolist()
    b = want["err_value"].fillna(-1).tolist()
    assert a == b
