"""Round-4 catalog entries: hard-negative mining (v15) and the exact
stratified split (smp5).

The oracle sweep checks value parity with DuckDB; these tests pin the
semantic invariants directly (Python recomputation, label constraints),
so the entries stay honest even if Spark code and oracle SQL are edited
in lockstep.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.catalog import all_queries
from weather_data_pipeline_sv_spark.sources import load_tables


@pytest.fixture(scope="module")
def queries():
    return all_queries()


# ---------------------------------------------------------------------------
# v15 — hard-negative mining
# ---------------------------------------------------------------------------
def test_v15_negatives_have_different_label(spark, sf_dir, queries):
    out = queries["v15_hard_negative_mining"](spark, sf_dir)
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"].select(
        "vec_id", "label"
    )
    qlab = {r["vec_id"]: r["label"] for r in emb.collect()}
    rows = out.collect()
    assert rows
    for r in rows:
        # the mined negative's label must differ from the QUERY's label
        assert r["neg_label"] != qlab[r["query_id"]], r
        # and neg_label must be the neighbor's true label
        assert r["neg_label"] == qlab[r["neighbor_id"]], r


def test_v15_ranks_contiguous_and_ordered(spark, sf_dir, queries):
    rows = queries["v15_hard_negative_mining"](spark, sf_dir).collect()
    per_q = defaultdict(list)
    for r in rows:
        per_q[r["query_id"]].append(r)
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1)), q
        cosines = [r["cosine"] for r in rs]
        # ranking orders by 6-dp-rounded cosine with id tie-break; the
        # displayed 4-dp value can wobble one 1e-4 step across a tie
        assert all(
            cosines[i] >= cosines[i + 1] - 1e-4 - 1e-9
            for i in range(len(cosines) - 1)
        ), q


def test_v15_subset_of_v3_candidate_universe(spark, sf_dir, queries):
    """Every v15 (query, neighbor) pair must share at least one LSH band —
    the 'same candidate universe as v3' property the entry's oracle
    interpolates (_DUCK_LSH_CAND). Recomputed here from the banding
    helpers directly, so a drift in v15's Spark-side candidate generation
    (different planes, band size, or join) fails this test."""
    from weather_data_pipeline_sv_spark.catalog.vector import (
        _BAND_SIZE,
        _DIM,
        _N_PLANES,
    )
    from weather_data_pipeline_sv_spark.operators import similarity as sim

    v15 = {
        (r["query_id"], r["neighbor_id"])
        for r in queries["v15_hard_negative_mining"](spark, sf_dir).collect()
    }
    assert v15
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"].select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    planes = sim.hyperplane_values(_N_PLANES, _DIM)
    bands = defaultdict(set)
    for r in sim.lsh_buckets(emb, "vec_id", "emb", planes, _BAND_SIZE).collect():
        bands[r["vec_id"]].add((r["band_id"], r["band_key"]))
    for q, n in v15:
        assert bands[q] & bands[n], (q, n)


# ---------------------------------------------------------------------------
# smp5 — exact stratified split
# ---------------------------------------------------------------------------
def _md5_u(doc_id: int, salt: str = "xsplit") -> float:
    h = hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()
    return int(h[:8], 16) / 4294967296.0


def test_smp5_matches_python_recomputation(spark, sf_dir, queries):
    out = queries["smp5_exact_stratified_split"](spark, sf_dir).collect()
    strata = defaultdict(list)
    for r in out:
        strata[(r["lang"], r["source"])].append(r)
    for key, rs in strata.items():
        n = len(rs)
        quota = (n + 9) // 10
        ordered = sorted(rs, key=lambda r: (_md5_u(r["doc_id"]), r["doc_id"]))
        for i, r in enumerate(ordered, start=1):
            expect = (
                "test" if i <= quota else "val" if i <= 2 * quota else "train"
            )
            assert r["split"] == expect, (key, r["doc_id"])


def test_smp5_exact_quotas(spark, sf_dir, queries):
    out = queries["smp5_exact_stratified_split"](spark, sf_dir)
    agg = (
        out.groupBy("lang", "source")
        .pivot("split", ["test", "val", "train"])
        .count()
        .fillna(0)
        .collect()
    )
    for r in agg:
        n = r["test"] + r["val"] + r["train"]
        quota = (n + 9) // 10
        assert r["test"] == min(quota, n)
        assert r["val"] == max(0, min(quota, n - quota))


# ---------------------------------------------------------------------------
# m5 — frame-anchored media near-dup (rewritten from all-pairs this round)
# ---------------------------------------------------------------------------
def test_m5_pairs_share_aligned_frame_and_pass_threshold(spark, sf_dir, queries):
    from weather_data_pipeline_sv_spark.catalog.multimodal import _NEAR_DUP_T

    rows = queries["m5_media_near_dup"](spark, sf_dir).collect()
    assert rows
    frames = queries["m3_frame_sample"](spark, sf_dir).collect()
    by_doc = defaultdict(set)
    for r in frames:
        by_doc[r["media_id"]].add((r["frame_id"], r["frame_md5"]))
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert r["cosine"] >= _NEAR_DUP_T - 1e-4  # cosine col rounds at 4
        # the defining candidate rule: at least one aligned frame shared
        assert by_doc[r["id_a"]] & by_doc[r["id_b"]], (r["id_a"], r["id_b"])


def test_smp5_partition_invariant(spark, sf_dir, queries):
    """Split assignment must be a pure function of the data, not of the
    INPUT partitioning — so repartition the input before the operator
    (repartitioning the output would test nothing: the labels would
    already be computed)."""
    from weather_data_pipeline_sv_spark.operators.sampling import (
        exact_stratified_split,
    )

    d = load_tables(spark, sf_dir, "documents")["documents"].select(
        "doc_id", "lang", "source"
    )
    base = sorted(
        map(tuple, exact_stratified_split(d, ["lang", "source"], "doc_id",
                                          salt="xsplit").collect())
    )
    again = sorted(
        map(
            tuple,
            exact_stratified_split(
                d.repartition(11), ["lang", "source"], "doc_id", salt="xsplit"
            ).collect(),
        )
    )
    assert base == again


# ---------------------------------------------------------------------------
# t15 — DSIR importance weights
# ---------------------------------------------------------------------------
def test_t15_counts_and_target_separation(spark, sf_dir, queries):
    from weather_data_pipeline_sv_spark.catalog.text import (
        _DSIR_TARGET_SRC,
        _docs_with_tokens,
    )

    out = {r["doc_id"]: r for r in queries["t15_dsir_weights"](spark, sf_dir).collect()}
    docs = _docs_with_tokens(spark, sf_dir).select(
        "doc_id", "source", "n_tokens"
    ).collect()
    tgt_w, rest_w = [], []
    for d in docs:
        if d["n_tokens"] < 2:
            assert d["doc_id"] not in out
            continue
        r = out[d["doc_id"]]
        # every bigram of the doc is counted exactly once
        assert r["n_bigrams"] == d["n_tokens"] - 1, d["doc_id"]
        (tgt_w if d["source"] == _DSIR_TARGET_SRC else rest_w).append(
            r["dsir_weight"]
        )
    # the LM was FIT on the target subset: its docs must look more
    # target-like than the background on average
    assert tgt_w and rest_w
    assert sum(tgt_w) / len(tgt_w) > sum(rest_w) / len(rest_w)


def test_t15_partition_invariant(spark, sf_dir, queries):
    out = queries["t15_dsir_weights"](spark, sf_dir)
    base = sorted(map(tuple, out.collect()))
    again = sorted(map(tuple, out.repartition(9).collect()))
    assert base == again
