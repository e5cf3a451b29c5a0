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


def test_cms_estimate_rejects_parameter_mismatch(spark, tmp_path):
    """cms_table stamps (depth, width, salt) into the counter column's
    metadata; cms_estimate asserts agreement — a width/salt mismatch
    would miss every bucket and silently estimate 0, violating the
    documented est >= exact guarantee (round-6 advice). The stamp
    survives a parquet round-trip."""
    import pytest as _pytest

    df = _zipf_terms(spark)
    cms = cms_table(df, "term", depth=4, width=256, salt="cms")
    probe = df.select("term").distinct().limit(3)
    for bad in (
        dict(width=512),
        dict(salt="other"),
        dict(depth=8),
    ):
        kw = dict(depth=4, width=256, salt="cms") | bad
        with _pytest.raises(ValueError, match="built with"):
            cms_estimate(cms, probe, "term", **kw)
    # parquet round-trip preserves the stamp — the persisted-sketch path
    p = str(tmp_path / "cms.parquet")
    cms.write.parquet(p)
    back = spark.read.parquet(p)
    with _pytest.raises(ValueError, match="built with"):
        cms_estimate(back, probe, "term", width=512)
    # matching params still work after the round-trip
    assert cms_estimate(back, probe, "term").count() == 3
    # a hand-built sketch without metadata skips the check (documented)
    bare = cms.select("s", "b", F.col("c").cast("bigint").alias("c"))
    assert cms_estimate(bare, probe, "term", width=512).count() == 3


# ---------------- bottom-k quantile sketch (t21/t22, round-7) ----------------


def _vals(spark, n=1000, groups=("a", "b")):
    rows = [
        (g, gi * 100_000 + i, float((i * 7919) % 1000))
        for gi, g in enumerate(groups)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "g string, id long, v double")


def test_qsketch_rollup_theorem_binding_k(spark):
    """bottomk(A ∪ B ∪ C) == merge(bottomk per slice) EXACTLY — at a k
    that BINDS (k=64 << 1000/group), so the theorem is exercised on the
    lossy path. This is the property that lets every executor/day keep k
    rows and still answer global quantiles."""
    from weather_data_pipeline_sv_spark.operators.sketches import (
        qsketch,
        qsketch_merge,
    )

    df = _vals(spark)
    whole = qsketch(df, ["g"], "v", "id", k=64)
    slices = [df.filter(F.col("id") % 3 == i) for i in range(3)]
    merged = qsketch_merge(
        [qsketch(s, ["g"], "v", "id", k=64) for s in slices], ["g"], k=64
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )
    # idempotent under overlapping re-merge (a replayed slice)
    remerged = qsketch_merge([merged, whole], ["g"], k=64)
    assert sorted(map(tuple, remerged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_qsketch_state_bounded_and_null_values_excluded(spark):
    from weather_data_pipeline_sv_spark.operators.sketches import qsketch

    df = _vals(spark).withColumn(
        "v", F.when(F.col("id") % 5 == 0, None).otherwise(F.col("v"))
    )
    sk = qsketch(df, ["g"], "v", "id", k=32)
    assert sk.count() == 2 * 32
    assert sk.filter(F.col("qsk_v").isNull()).count() == 0


def test_sample_quantiles_exact_on_full_table(spark):
    """sample_quantiles over the FULL table == the exact lower quantile
    (index floor(q*(n-1)) in (value, id) order) — the 'exact' side of
    t21's error column is literally the same rank rule."""
    from weather_data_pipeline_sv_spark.operators.sketches import (
        sample_quantiles,
    )

    df = _vals(spark, n=101, groups=("a",)).select(
        "g", F.col("v").alias("qsk_v"),
        F.col("id").cast("string").alias("qsk_id"),
    )
    out = {
        r["q"]: r["est"]
        for r in sample_quantiles(df, ["g"], [0.0, 0.5, 1.0]).collect()
    }
    vals = sorted(float((i * 7919) % 1000) for i in range(101))
    assert out[0.0] == vals[0]
    assert out[0.5] == vals[50]
    assert out[1.0] == vals[100]


def test_qsketch_quantile_error_bound(spark):
    """The kept set is a uniform sample -> the rank of the estimate is
    within ~3*sqrt(q(1-q)/k) of q (three-sigma; deterministic given the
    md5 variate, so this never flakes)."""
    import bisect

    from weather_data_pipeline_sv_spark.operators.sketches import (
        qsketch,
        sample_quantiles,
    )

    df = _vals(spark, n=5000, groups=("a",))
    k = 128
    sk = qsketch(df, ["g"], "v", "id", k=k)
    vals = sorted(r["v"] for r in df.collect())
    for r in sample_quantiles(sk, ["g"], [0.1, 0.5, 0.9]).collect():
        q = r["q"]
        # empirical rank of the estimated value in the population
        rank = bisect.bisect_right(vals, r["est"]) / len(vals)
        assert abs(rank - q) <= 3 * (q * (1 - q) / k) ** 0.5 + 1e-3, (
            q, rank
        )
