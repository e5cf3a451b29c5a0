"""Property-based invariants (SURVEY.md §5.4) via hypothesis.

Each property batches all generated values into ONE DataFrame per example
(Spark job launches dominate runtime, so examples are kept few and wide).
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.functions.rounding import rnd
from weather_data_pipeline_sv_spark.operators import dedup as dd

SET = settings(max_examples=10, deadline=None)

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@SET
@given(st.lists(st.tuples(st.floats(0, 359.999), st.floats(0.01, 100)),
                min_size=1, max_size=30))
def test_circular_mean_stays_in_range(spark, pairs):
    df = spark.createDataFrame(pairs, "direction double, w double")
    out = df.agg(
        F.degrees(
            F.atan2(
                F.sum(F.sin(F.radians("direction")) * F.col("w")),
                F.sum(F.cos(F.radians("direction")) * F.col("w")),
            )
        ).alias("d")
    ).collect()[0]["d"]
    norm = out + 360 if out < 0 else (out - 360 if out >= 360 else out)
    assert 0 <= norm < 360 or math.isnan(norm) is False
    assert 0 <= norm < 360


@SET
@given(st.lists(st.tuples(finite, st.floats(0.001, 1000)),
                min_size=1, max_size=30))
def test_idw_weighted_mean_within_bounds(spark, pairs):
    df = spark.createDataFrame(pairs, "x double, w double")
    r = df.agg(
        (F.sum(F.col("x") * F.col("w")) / F.sum("w")).alias("wm"),
        F.min("x").alias("mn"), F.max("x").alias("mx"),
    ).collect()[0]
    assert r["mn"] - 1e-6 <= r["wm"] <= r["mx"] + 1e-6


@SET
@given(st.lists(st.text(alphabet="abcdef ", min_size=10, max_size=60),
                min_size=2, max_size=8))
def test_jaccard_values_bounded(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = dd.jaccard_pairs(df, "doc_id", "text", n=2, threshold=0.0).collect()
    for r in rows:
        assert 0.0 < r["jaccard"] <= 1.0 + 1e-12
        assert r["doc_a"] < r["doc_b"]


@SET
@given(st.lists(finite, min_size=1, max_size=50), st.integers(0, 6))
def test_rounding_close_and_idempotent(spark, xs, n):
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    out = df.select(
        "x", rnd(F.col("x"), n).alias("r"), rnd(rnd(F.col("x"), n), n).alias("rr")
    ).collect()
    tol = 10.0 ** (-n) * 0.5000011
    for r in out:
        assert abs(r["r"] - r["x"]) <= tol
        assert r["rr"] == r["r"]  # idempotent


@SET
@given(st.lists(st.text(alphabet="abcxyz ", min_size=1, max_size=40),
                min_size=1, max_size=6))
def test_simhash_halves_fit_32_bits(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    for r in dd.simhash(df, "doc_id", "text").collect():
        assert 0 <= r["simhash_hi"] < 2**32
        assert 0 <= r["simhash_lo"] < 2**32


def test_quality_score_bounds_on_real_pipeline(spark, sf_dir):
    """Non-hypothesis sweep: every derived quality score in the weather
    catalog entry lands in [0, 1]."""
    from weather_data_pipeline_sv_spark.catalog import all_queries

    rows = all_queries()["p5_quality_flags"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["data_quality_score"] <= 1.0
