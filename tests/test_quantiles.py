"""operators/quantiles: the bounded-state histogram quantile must be
bit-identical to Spark's builtin exact `percentile` (same interpolation
formula), including on high-cardinality raw values, ties, and 1-row
groups — the whole point is swapping the O(distinct)-in-one-buffer
builtin without changing a single output bit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.operators.quantiles import (
    grouped_exact_quantiles,
)


def _builtin(df, group, specs):
    aggs = [
        F.expr(f"percentile({col}, {p})").alias(name)
        for name, (col, p) in specs.items()
    ]
    return df.groupBy(group).agg(*aggs)


def _assert_match(df, group, specs, grid=None):
    got = {
        r[group]: tuple(r[n] for n in specs)
        for r in grouped_exact_quantiles(
            df, [group], specs, grid_decimals=grid
        ).collect()
    }
    want = {
        r[group]: tuple(r[n] for n in specs)
        for r in _builtin(df, group, specs).collect()
    }
    assert got == want


def test_matches_builtin_on_high_cardinality_column(spark):
    # ~20k distinct doubles across 7 groups — the shape whose builtin
    # buffer is O(distinct); values deliberately NOT on a coarse grid
    df = spark.range(20000).select(
        (F.col("id") % 7).alias("g"),
        (F.sin(F.col("id").cast("double")) * 1000.0).alias("v"),
    )
    _assert_match(
        df,
        "g",
        {
            "p10": ("v", 0.1),
            "median": ("v", 0.5),
            "p90": ("v", 0.9),
            "p99": ("v", 0.99),
        },
    )


def test_matches_builtin_with_ties_and_single_row_group(spark):
    rows = [
        ("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 2.0),  # heavy ties
        ("b", 5.0),                                        # n = 1
        ("c", 3.0), ("c", 7.0),                            # interpolated
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    _assert_match(df, "g", {"median": ("v", 0.5), "p75": ("v", 0.75)})


def test_matches_builtin_at_extreme_ps(spark):
    df = spark.range(101).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v")
    )
    _assert_match(df, "g", {"mn": ("v", 0.0), "mx": ("v", 1.0)})


def test_grid_snap_is_identity_on_grid_data(spark):
    # cent-grid values: snapping at 2 dp must not move anything
    df = spark.range(5000).select(
        (F.col("id") % 3).alias("g"),
        (F.floor(F.rand(seed=7) * 10000) / 100.0).alias("v"),
    )
    _assert_match(
        df, "g", {"median": ("v", 0.5), "p90": ("v", 0.9)}, grid={"v": 2}
    )


def test_multiple_value_columns_joined(spark):
    df = spark.range(1000).select(
        (F.col("id") % 2).alias("g"),
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 2).cast("double").alias("y"),
    )
    out = grouped_exact_quantiles(
        df, ["g"], {"mx": ("x", 0.5), "my": ("y", 0.5)}
    )
    assert set(out.columns) == {"g", "mx", "my"}
    rows = {r["g"]: (r["mx"], r["my"]) for r in out.collect()}
    assert rows[0] == (499.0, 998.0)
    assert rows[1] == (500.0, 1000.0)


def test_histogram_plan_has_no_builtin_percentile(spark):
    # the scale guarantee: the plan must aggregate counts, not carry a
    # per-group value map through a `percentile` aggregate
    df = spark.range(100).select(
        (F.col("id") % 2).alias("g"), F.col("id").cast("double").alias("v")
    )
    plan = grouped_exact_quantiles(
        df, ["g"], {"m": ("v", 0.5)}
    )._jdf.queryExecution().executedPlan().toString()
    assert "percentile" not in plan.lower()


def test_nulls_ignored_like_builtin(spark):
    # the builtin percentile IGNORES nulls; the histogram must too, and
    # an all-null group must still appear (with null quantiles)
    rows = [
        ("a", None), ("a", 1.0), ("a", 3.0),
        ("b", None), ("b", None),             # all-null group
        ("c", 5.0),
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    _assert_match(df, "g", {"median": ("v", 0.5)})
    got = {
        r["g"]: r["median"]
        for r in grouped_exact_quantiles(
            df, ["g"], {"median": ("v", 0.5)}
        ).collect()
    }
    assert got == {"a": 2.0, "b": None, "c": 5.0}


def test_null_group_key_matches_builtin(spark):
    # a NULL group KEY is a real group to the builtin — the multi-column
    # combine must not drop it (eqNullSafe join keys)
    rows = [(None, 1.0, 10.0), (None, 3.0, 30.0), ("a", 5.0, 50.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    specs = {"mx": ("x", 0.5), "my": ("y", 0.5)}
    got = {
        r["g"]: (r["mx"], r["my"])
        for r in grouped_exact_quantiles(df, ["g"], specs).collect()
    }
    assert got == {None: (2.0, 20.0), "a": (5.0, 50.0)}
