"""Tests for operators/skew.py — salted plans must be value-identical to
their unsalted equivalents, on uniform AND pathologically skewed data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_replicate_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # one key owns 90% of rows
    rows = [(i, "hot" if i % 10 else "cold", float(i % 97), i % 7)
            for i in range(5000)]
    return spark.createDataFrame(rows, "id long, k string, v double, g long")


def _by_key(rows, *cols):
    return {r["k"]: tuple(round(r[c], 6) if isinstance(r[c], float) else r[c]
                          for c in cols) for r in rows}


def test_salted_agg_equals_plain(spark, skewed):
    salted = salted_aggregate(
        skewed, ["k"],
        {"total": ("v", "sum"), "n": ("id", "count"),
         "lo": ("v", "min"), "hi": ("v", "max"), "mean": ("v", "avg")},
        n_salts=8, salt_cols=["id"],
    ).collect()
    plain = skewed.groupBy("k").agg(
        F.sum("v").alias("total"), F.count("id").alias("n"),
        F.min("v").alias("lo"), F.max("v").alias("hi"), F.avg("v").alias("mean"),
    ).collect()
    cols = ("total", "n", "lo", "hi", "mean")
    assert _by_key(salted, *cols) == _by_key(plain, *cols)


def test_salted_agg_spreads_partials(spark, skewed):
    """The partial stage must actually split the hot key across salts."""
    partial = (
        skewed.withColumn(
            "__salt", F.pmod(F.xxhash64("id"), F.lit(8))
        )
        .groupBy("k", "__salt").count()
    )
    hot_salts = partial.filter(F.col("k") == "hot").count()
    assert hot_salts == 8  # hot key present in every salt bucket


def test_salted_agg_rejects_nonalgebraic(spark, skewed):
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_aggregate(skewed, ["k"], {"x": ("v", "median")})


def test_salted_join_equals_plain(spark, skewed):
    build = spark.createDataFrame(
        [("hot", 1.5), ("cold", 2.5)], "k string, w double"
    )
    salted = salted_broadcast_replicate_join(skewed, build, "k", n_salts=8)
    plain = skewed.join(build, "k")
    assert salted.count() == plain.count() == 5000
    a = {(r["id"], r["w"]) for r in salted.collect()}
    b = {(r["id"], r["w"]) for r in plain.collect()}
    assert a == b
