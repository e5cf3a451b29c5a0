"""Tests for operators/sampling.py — determinism, stability, disjointness."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.operators.sampling import (
    bernoulli_sample,
    split_column,
    stratified_sample,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_sample_is_deterministic_and_partition_stable(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = {r["doc_id"] for r in bernoulli_sample(d, "doc_id", 0.3).collect()}
    b = {r["doc_id"] for r in
         bernoulli_sample(d.repartition(13), "doc_id", 0.3).collect()}
    assert a == b and 0.15 < len(a) / d.count() < 0.45


def test_sample_fraction_monotone_nesting(spark, sf_dir):
    """A 10% sample is a subset of the 30% sample (same salt) — the
    threshold property that makes downsampling refinable."""
    d = _docs(spark, sf_dir)
    small = {r["doc_id"] for r in bernoulli_sample(d, "doc_id", 0.1).collect()}
    big = {r["doc_id"] for r in bernoulli_sample(d, "doc_id", 0.3).collect()}
    assert small <= big


def test_stratified_rates_apply_per_stratum(spark, sf_dir):
    d = _docs(spark, sf_dir)
    kept = stratified_sample(
        d, "source", "doc_id", {"src0": 1.0, "src1": 0.0}, default=0.5
    )
    by_src = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_src.get("src0") == 25        # all kept
    assert "src1" not in by_src            # none kept
    assert 0 < sum(v for k, v in by_src.items() if k not in ("src0",)) < 450


def test_split_disjoint_exhaustive_stable(spark, sf_dir):
    d = _docs(spark, sf_dir).withColumn(
        "split", split_column(F.col("doc_id"), 0.1, 0.1)
    )
    counts = {r["split"]: r["n"] for r in
              d.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 500
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    again = {r["split"]: r["n"] for r in
             _docs(spark, sf_dir).repartition(7)
             .withColumn("split", split_column(F.col("doc_id"), 0.1, 0.1))
             .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert again == counts


def test_temperature_resample_flattens_mixture(spark):
    from weather_data_pipeline_sv_spark.operators.sampling import (
        temperature_resample,
    )

    # skewed mixture: 900 'big' docs, 24 'rare' docs
    rows = [(i, "big") for i in range(900)] + [
        (1000 + i, "rare") for i in range(24)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_resample(df, "source", "doc_id", alpha=0.3).cache()
    got = {
        r["source"]: r["cnt"]
        for r in out.groupBy("source").agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }
    n = 924
    import math
    z = 900 ** 0.3 + 24 ** 0.3
    exp_big = n * (900 ** 0.3) / z
    exp_rare = n * (24 ** 0.3) / z
    # realized counts sit within the +/- n_s bernoulli envelope of the
    # exact expectations, and the mixture is genuinely flattened
    assert abs(got["big"] - exp_big) <= 900
    assert abs(got["rare"] - exp_rare) <= 24
    assert got["rare"] > 24  # rare source UP-sampled (copies > 1)
    assert got["big"] < 900  # dominant source down-sampled
    # rare docs really repeat: every rare doc appears floor(rate) or
    # floor(rate)+1 times, with contiguous 1-based copy indexes
    rate_rare = exp_rare / 24
    per_doc = {
        r["doc_id"]: r["c"]
        for r in out.filter("source = 'rare'")
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert set(per_doc.values()) <= {
        math.floor(rate_rare), math.floor(rate_rare) + 1
    }
    idx = sorted(
        r["copy_idx"]
        for r in out.filter("source = 'rare' and doc_id = 1000").collect()
    )
    assert idx == list(range(1, len(idx) + 1))
    # deterministic: a second run is row-identical
    again = temperature_resample(df, "source", "doc_id", alpha=0.3)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )
    out.unpersist()


def test_temperature_resample_null_group_is_a_real_group(spark):
    """NULL-source docs count into the normalizer, so they must also be
    resampled (null-safe rate join) — a plain equi-join would vanish
    them while undershooting the realized total (round-5 advisory)."""
    from weather_data_pipeline_sv_spark.operators.sampling import (
        temperature_resample,
    )

    rows = [(i, "big") for i in range(400)] + [
        (1000 + i, None) for i in range(16)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_resample(df, "source", "doc_id", alpha=0.3).cache()
    got = {
        r["source"]: r["cnt"]
        for r in out.groupBy("source").agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }
    # the null group survives and is up-sampled like any rare source
    assert None in got and got[None] > 16
    n, z = 416, 400 ** 0.3 + 16 ** 0.3
    assert abs(got[None] - n * (16 ** 0.3) / z) <= 16
    assert abs(got["big"] - n * (400 ** 0.3) / z) <= 400
    # realized total tracks N (no silent mass loss to the null group)
    assert abs(sum(got.values()) - n) <= n * 0.1
    out.unpersist()


def test_weighted_sample_without_replacement_properties(spark):
    from weather_data_pipeline_sv_spark.operators.sampling import (
        weighted_sample_without_replacement as wswr,
    )

    # two sources; within each, doc weights heavily skewed to low ids
    rows = [(s * 1000 + i, f"src{s}", 1000 if i < 10 else 1)
            for s in range(2) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    out = wswr(df, "source", "doc_id", "w", k=5).cache()
    got = out.collect()
    # exactly k per group, ranks 1..k
    per = {}
    for r in got:
        per.setdefault(r["source"], []).append(r["sample_rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per.values())
    # heavy weights dominate: most sampled docs come from the 10
    # heavy-weight ids (1000x weight, 10/200 of rows)
    heavy = sum(1 for r in got if r["doc_id"] % 1000 < 10)
    assert heavy >= 7  # of 10 total draws
    # deterministic + partition stable
    again = wswr(df.repartition(13), "source", "doc_id", "w", k=5)
    assert sorted(map(tuple, got)) == sorted(map(tuple, again.collect()))
    out.unpersist()


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from weather_data_pipeline_sv_spark.operators.sampling import (
        weighted_sample_without_replacement as wswr,
    )

    df = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 0), (3, "a", -1), (4, "a", None)],
        "doc_id long, source string, w long",
    )
    got = wswr(df, "source", "doc_id", "w", k=10).collect()
    assert [r["doc_id"] for r in got] == [1]
