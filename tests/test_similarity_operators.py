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


# ---------------------------------------------------------------------------
# semdedup_dropped_ids: the grouped numpy kernel must be BIT-IDENTICAL to
# the block self-join + interpreted-fold expression chain it replaced
# (round-11). The reference form below is that chain, verbatim.
# ---------------------------------------------------------------------------
def _dropped_ids_reference(rows, block_col, tau, newer=None):
    from weather_data_pipeline_sv_spark.functions.rounding import rnd

    withn = rows.withColumn("__nrm", sim.norm(F.col("emb")))
    a = withn.select(
        F.col("vec_id").alias("id_a"), F.col("emb").alias("emb_a"),
        block_col, F.col("__nrm").alias("__na"),
    )
    b = withn.select(
        F.col("vec_id").alias("id_b"), F.col("emb").alias("emb_b"),
        block_col, F.col("__nrm").alias("__nb"),
    )
    if newer is not None:
        b = b.join(newer.select(F.col("vec_id").alias("id_b")), "id_b")
    return (
        a.join(b, block_col)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            rnd(
                sim.dot(F.col("emb_a"), F.col("emb_b"))
                / (F.col("__na") * F.col("__nb")),
                6,
            )
            >= F.lit(tau)
        )
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )


def _kernel_corpus(spark):
    """Blocks with boundary pairs: duplicates (cos=1), near-tau pairs, a
    zero vector, negatives, and a singleton block."""
    import math

    rows = []
    # block 0: exact dup family + orthogonal + zero vector
    rows += [
        (0, [1.0, 2.0, 3.0, 4.0], 0),
        (1, [1.0, 2.0, 3.0, 4.0], 0),     # dup of 0 -> dropped
        (2, [2.0, 4.0, 6.0, 8.0], 0),     # colinear -> dropped
        (3, [-4.0, 3.0, -2.0, 1.0], 0),
        (4, [0.0, 0.0, 0.0, 0.0], 0),     # zero norm: never dropped
    ]
    # block 1: pair exactly AT the 6-dp tau boundary after rounding
    t = math.acos(0.45)
    rows += [
        (10, [1.0, 0.0, 0.0, 0.0], 1),
        (11, [math.cos(t), math.sin(t), 0.0, 0.0], 1),  # cos ~= 0.45
        (12, [-1.0, -0.001, 0.0, 0.0], 1),              # cos ~= -1 vs 10
    ]
    # block 2: singleton
    rows += [(20, [5.0, 5.0, 5.0, 5.0], 2)]
    return spark.createDataFrame(
        rows, "vec_id long, emb array<double>, list_id long"
    )


def test_semdedup_kernel_matches_expression_chain(spark):
    rows = _kernel_corpus(spark)
    got = sorted(
        r["vec_id"]
        for r in sim.semdedup_dropped_ids(rows, "list_id", tau=0.45).collect()
    )
    # the reference chain raises DIVIDE_BY_ZERO on the zero vector under
    # ANSI (so real corpora provably contain none); compare on the
    # nonzero rows — the zero vector eliminates nothing (cos is NaN/NULL
    # on both sides) so the reference dropped set is unchanged by it
    nz = rows.filter(F.col("vec_id") != 4)
    want = sorted(
        r["vec_id"]
        for r in _dropped_ids_reference(nz, "list_id", 0.45).collect()
    )
    assert got == want
    assert 1 in got and 2 in got and 4 not in got and 20 not in got


def test_semdedup_kernel_matches_on_real_corpus(spark, corpus):
    cent = sim.ivf_centroids(corpus.filter(F.col("vec_id") % 7 == 0), 8)
    assigned = sim.ivf_assign(corpus, cent).cache()
    got = sorted(
        r["vec_id"]
        for r in sim.semdedup_dropped_ids(
            assigned, "list_id", tau=0.45
        ).collect()
    )
    want = sorted(
        r["vec_id"]
        for r in _dropped_ids_reference(assigned, "list_id", 0.45).collect()
    )
    assert got == want and len(got) > 0
    assigned.unpersist()


def test_semdedup_kernel_new_col_restricts_candidates(spark):
    rows = _kernel_corpus(spark)
    # ids <= 2 are "stored": they eliminate but are never dropped
    flagged = rows.withColumn("__new", F.col("vec_id") > 2)
    got = sorted(
        r["vec_id"]
        for r in sim.semdedup_dropped_ids(
            flagged, "list_id", tau=0.45, new_col="__new"
        ).collect()
    )
    nz = rows.filter(F.col("vec_id") != 4)  # see boundary test: ANSI 0/0
    newer = nz.filter(F.col("vec_id") > 2)
    want = sorted(
        r["vec_id"]
        for r in _dropped_ids_reference(
            nz, "list_id", 0.45, newer=newer
        ).collect()
    )
    assert got == want
    assert all(i > 2 for i in got)
