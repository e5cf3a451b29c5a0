"""Persisted IVF index: train-once/probe-many parity with the in-memory
operator, and proof the probe prunes partitions instead of scanning the
corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.operators import similarity as sim

N_LISTS, N_PROBE, K = 8, 3, 4


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
        )
        .cache()
    )


@pytest.fixture(scope="module")
def index_path(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    cents = sim.write_ivf_index(emb, path, n_lists=N_LISTS, n_iter=2)
    assert cents.count() == N_LISTS
    return path


def test_probe_matches_in_memory_operator(spark, emb, index_path):
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    from_index = sim.probe_ivf_index(
        spark, index_path, q, k=K, n_probe=N_PROBE
    )
    in_memory = sim.ivf_ann_topk(
        emb, q, k=K, n_lists=N_LISTS, n_probe=N_PROBE, n_iter=2
    )
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])  # noqa: E731
    assert sorted(map(key, from_index.collect())) == sorted(
        map(key, in_memory.collect())
    )


def test_index_layout_partitioned_by_list(spark, index_path):
    files = spark.read.parquet(index_path).inputFiles()
    assert files and all("list_id=" in f for f in files)


def test_probe_scan_prunes_partitions(spark, index_path):
    """A list_id IN (...) filter on the partitioned index must show up as a
    PartitionFilter (planning-time pruning), not a post-scan filter."""
    probed = spark.read.parquet(index_path).filter(F.col("list_id").isin([0, 1]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    after = plan.split("PartitionFilters", 1)[1][:200]
    assert "list_id" in after and "IN (0,1)" in after.replace(" ", "").replace(
        "IN(0,1)", "IN (0,1)"
    )
    # behavioral check: the probe reads a strict subset of the index rows
    assert 0 < probed.count() < spark.read.parquet(index_path).count()
