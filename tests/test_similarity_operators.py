"""Unit tests for operators/similarity.py — ANN quality properties that the
oracle parity test can't see (parity proves Spark == DuckDB on the same
algorithm; these prove the algorithm is a *good* approximation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
        )
        .cache()
    )


@pytest.fixture(scope="module")
def queries(corpus):
    return corpus.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_lsh_ann_recall_floor(spark, corpus, queries):
    truth = _topk_sets(sim.brute_force_topk(corpus, queries, k=5))
    approx = _topk_sets(
        sim.lsh_ann_topk(corpus, queries, spark, k=5, n_planes=32, band_size=4)
    )
    hits = sum(len(truth[q] & approx.get(q, set())) for q in truth)
    recall = hits / sum(len(v) for v in truth.values())
    # md5 planes are deterministic -> this is a fixed number (~0.7), not flaky
    assert recall >= 0.5, f"LSH recall@5 degraded to {recall:.2f}"


def test_ivf_ann_recall_floor(corpus, queries):
    truth = _topk_sets(sim.brute_force_topk(corpus, queries, k=5))
    approx = _topk_sets(
        sim.ivf_ann_topk(corpus, queries, k=5, n_lists=16, n_probe=4)
    )
    hits = sum(len(truth[q] & approx.get(q, set())) for q in truth)
    recall = hits / sum(len(v) for v in truth.values())
    assert recall >= 0.5, f"IVF recall@5 degraded to {recall:.2f}"


def test_ivf_assignment_partitions_corpus(corpus):
    cent = sim.ivf_centroids(corpus, n_lists=16, n_iter=2)
    assert cent.count() == 16
    assigned = sim.ivf_assign(corpus, cent)
    # every vector lands in exactly one list
    assert assigned.count() == corpus.count()
    assert assigned.select("vec_id").distinct().count() == corpus.count()
    n_lists_used = assigned.select("list_id").distinct().count()
    assert n_lists_used > 1  # quantizer actually partitions


def test_lsh_probes_fraction_of_corpus(spark, corpus, queries):
    """The point of LSH: candidates << full corpus scan."""
    planes = sim.md5_hyperplanes(spark, 32, 64)
    cb = sim.lsh_buckets(corpus, "vec_id", "emb", planes, 4)
    qb = sim.lsh_buckets(queries, "query_id", "qemb", planes, 4)
    cand = (
        qb.join(cb, ["band_id", "band_key"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    n_queries = queries.count()
    avg_cand = cand.count() / n_queries
    assert avg_cand < 0.6 * corpus.count(), (
        f"LSH candidates {avg_cand:.0f}/query ~ full scan, no pruning"
    )


def test_brute_force_self_excluded_and_ranked(corpus, queries):
    out = sim.brute_force_topk(corpus, queries, k=3).collect()
    by_q = {}
    for r in out:
        assert r["neighbor_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cosine"]))
    for q, rows in by_q.items():
        rows.sort()
        assert [r[0] for r in rows] == [1, 2, 3]
        cosines = [r[1] for r in rows]
        assert cosines == sorted(cosines, reverse=True)


def test_cosine_near_dup_pairs_symmetric_free(corpus):
    pairs = sim.cosine_near_dup_pairs(corpus, "vec_id", "emb", threshold=0.4)
    rows = pairs.collect()
    assert rows, "expected some near-dup pairs at 0.4 on test corpus"
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert r["cosine"] >= 0.4 - 1e-9


def test_suggested_params_scale_with_corpus():
    from weather_data_pipeline_sv_spark.operators.similarity import (
        suggest_ivf_params,
        suggest_lsh_params,
    )

    p_small, b_small = suggest_lsh_params(500)
    p_big, b_big = suggest_lsh_params(1_000_000)
    assert b_small == 4 and p_small == 24
    assert b_big > b_small  # wider bands as the corpus grows
    assert 2 ** b_big >= 1_000_000 / 50 / 2
    l_small, _ = suggest_ivf_params(500)
    l_big, pr_big = suggest_ivf_params(1_000_000)
    assert l_big == 1000 and pr_big == 125
    assert l_small < l_big
