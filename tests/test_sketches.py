"""operators/sketches.py — deterministic HLL: accuracy inside the
published bound, register mergeability (the distributed-rollup
property), partition invariance, and both correction regimes."""

from __future__ import annotations

import pyspark.sql.functions as F

from weather_data_pipeline_sv_spark.operators.sketches import (
    hll_distinct,
    hll_error_bound,
    hll_estimate,
    hll_registers,
)


def _items(spark, n, groups=1):
    return spark.range(n * groups).select(
        (F.col("id") % groups).alias("g"),
        F.concat(F.lit("item-"), F.col("id")).alias("x"),
    )


def test_estimate_within_error_bound_large_regime(spark):
    # 50k distinct >> 2.5*m=2560: the raw HLL estimator branch
    n = 50_000
    est = hll_distinct(_items(spark, n), ["g"], "x", p=10).collect()[0][
        "est_distinct"
    ]
    assert est > 2.5 * 1024  # really the raw branch
    assert abs(est - n) / n < 4 * hll_error_bound(10)  # 4 sigma


def test_estimate_small_regime_linear_counting(spark):
    # 300 distinct << 2.5*m: the linear-counting branch, tight accuracy
    n = 300
    est = hll_distinct(_items(spark, n), ["g"], "x", p=10).collect()[0][
        "est_distinct"
    ]
    assert abs(est - n) / n < 0.05


def test_duplicates_do_not_move_the_estimate(spark):
    base = _items(spark, 5_000)
    dup = base.unionAll(base).unionAll(base)
    a = hll_distinct(base, ["g"], "x").collect()[0]["est_distinct"]
    b = hll_distinct(dup, ["g"], "x").collect()[0]["est_distinct"]
    assert a == b


def test_partition_invariance(spark):
    df = _items(spark, 10_000, groups=3)
    a = sorted(map(tuple, hll_distinct(df, ["g"], "x").collect()))
    b = sorted(
        map(tuple, hll_distinct(df.repartition(17), ["g"], "x").collect())
    )
    assert a == b


def test_registers_merge_by_max(spark):
    """The 1000-executor rollup property: sketches of disjoint halves
    merged by element-wise max == the sketch of the union."""
    df = _items(spark, 20_000)
    h1 = hll_registers(df.filter("id % 2 = 0"), ["g"], "x")
    h2 = hll_registers(df.filter("id % 2 = 1"), ["g"], "x")
    merged = (
        h1.unionAll(h2)
        .groupBy("g", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    est_merged = hll_estimate(merged, ["g"]).collect()[0]["est_distinct"]
    est_whole = hll_distinct(df, ["g"], "x").collect()[0]["est_distinct"]
    assert est_merged == est_whole


def test_register_table_is_bounded(spark):
    # 100k items, p=10 -> at most 1024 register rows
    regs = hll_registers(_items(spark, 100_000), ["g"], "x", p=10)
    assert regs.count() <= 1024
