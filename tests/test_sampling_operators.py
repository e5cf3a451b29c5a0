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
