"""Round-8 additions: RRF hybrid fusion properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.operators.retrieval import rrf_fuse


def _ranking(spark, rows):
    return spark.createDataFrame(rows, ["query_id", "doc_id", "rank"])


def test_rrf_single_ranking_preserves_order(spark):
    """1/(K+rank) is monotone decreasing in rank, so fusing one ranking
    returns it unchanged (same order, dense re-ranked 1..k)."""
    r = _ranking(spark, [(0, 10, 1), (0, 11, 2), (0, 12, 3)])
    out = rrf_fuse([r], k=3).orderBy("rank").collect()
    assert [x["doc_id"] for x in out] == [10, 11, 12]
    assert [x["rank"] for x in out] == [1, 2, 3]


def test_rrf_agreement_beats_single_side(spark):
    """A doc both sides rank (even modestly) outranks a doc only one
    side ranks first: 1/(60+2)+1/(60+2) > 1/(60+1)."""
    sparse = _ranking(spark, [(0, 1, 1), (0, 7, 2)])
    dense = _ranking(spark, [(0, 2, 1), (0, 7, 2)])
    out = rrf_fuse([sparse, dense], k=3).orderBy("rank").collect()
    assert out[0]["doc_id"] == 7  # the agreed doc wins
    # docs 1 and 2 tie exactly (both 1/61): doc_id ascending breaks it
    assert [x["doc_id"] for x in out[1:]] == [1, 2]


def test_rrf_hybrid_entry_consistency(spark, sf_dir):
    """t27's fused top-k: ranks dense 1..k per query, rrf within the
    attainable 2-side bounds, every fused doc justified by at least one
    side's top-k membership (spot: the query doc itself is rank 1 — the
    degenerate hit both chains agree on)."""
    from weather_data_pipeline_sv_spark.catalog import all_queries

    rows = all_queries()["t27_hybrid_rrf"](spark, sf_dir).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(x["rank"] for x in rs)
        assert ranks == list(range(1, len(rs) + 1))
        for x in rs:
            # published rrf is 6-dp biased-rounded, so allow half an ulp
            assert 0 < x["rrf"] <= 2.0 / 61 + 1e-6
        # self-retrieval lands IN the fused top-k (dense cosine of the
        # query with itself is 1.0, so self is always a dense hit) — but
        # not necessarily at rank 1: a near-duplicate with a smaller id
        # can tie the dense side and outscore on BM25 (observed: doc 146
        # over query 400 at sf0.001), which is correct fusion behavior
        assert q in {x["doc_id"] for x in rs}
