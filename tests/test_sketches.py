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


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------
from weather_data_pipeline_sv_spark.operators.sketches import (  # noqa: E402
    cms_estimate,
    cms_table,
)


def _zipf_terms(spark):
    # term-i appears ~1000/i times: clear heavy hitters + a long tail
    rows = []
    for i in range(1, 60):
        rows += [(f"term{i}",)] * (1000 // i)
    return spark.createDataFrame(rows, "term string")


def test_cms_overcount_only_and_tight_for_heavy_hitters(spark):
    df = _zipf_terms(spark)
    cms = cms_table(df, "term")
    exact = df.groupBy("term").count()
    est = cms_estimate(cms, exact.select("term"), "term")
    rows = exact.join(est, "term").collect()
    n = df.count()
    for r in rows:
        assert r["cms_est"] >= r["count"]          # one-sided error
        # eps = e/width -> overcount bounded by ~eps*N (loose 3x slack)
        assert r["cms_est"] - r["count"] <= 3 * 2.718 / 256 * n


def test_cms_unseen_item_estimates_from_collisions_only(spark):
    df = _zipf_terms(spark)
    cms = cms_table(df, "term")
    probe = spark.createDataFrame([("never-seen-term",)], "term string")
    est = cms_estimate(cms, probe, "term").collect()[0]["cms_est"]
    assert 0 <= est <= 3 * 2.718 / 256 * df.count()


def test_cms_merges_by_sum(spark):
    df = _zipf_terms(spark).withColumn(
        "half", F.monotonically_increasing_id() % 2
    )
    a = cms_table(df.filter("half = 0"), "term")
    b = cms_table(df.filter("half = 1"), "term")
    merged = (
        a.unionAll(b).groupBy("s", "b").agg(F.sum("c").alias("c"))
    )
    whole = cms_table(df, "term")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cms_table_bounded(spark):
    assert cms_table(_zipf_terms(spark), "term").count() <= 4 * 256


def test_hll_ignores_null_items_like_count_distinct(spark):
    base = _items(spark, 2_000)
    with_nulls = base.unionAll(
        spark.range(50).select(
            F.lit(0).alias("g"), F.lit(None).cast("string").alias("x")
        )
    )
    a = hll_distinct(base, ["g"], "x").collect()[0]["est_distinct"]
    b = hll_distinct(with_nulls, ["g"], "x").collect()[0]["est_distinct"]
    assert a == b  # NULLs are not items (count(distinct) semantics)


def test_cms_estimate_broadcasts_the_counter_table(spark):
    """The bounded side (depth x width counters) must be the build side;
    a broadcast hint on the preserved side of the left join would be
    silently ignored (round-6 review finding)."""
    df = _zipf_terms(spark)
    cms = cms_table(df, "term")
    est = cms_estimate(cms, df.select("term").distinct(), "term")
    plan = est._sc._jvm.PythonSQLUtils.explainString(
        est._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
