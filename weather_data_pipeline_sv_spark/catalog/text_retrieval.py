"""Lexical retrieval entries (split out of catalog/text.py along the
family seam — round-10 verdict #6; entry names and oracles verbatim):

- t8        — per-document TF-IDF top terms
- t23/t25/t26 — BM25 top-k: from-scratch, persisted term-bucketed
  index probe, incremental partial-aggregate store
- t27       — hybrid BM25 + exact-cosine + RRF fusion (the family's
  definitional fusion entry; t28-t31 in catalog/hybrid.py swap the
  dense leg to the production IVFADC probe)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.retrieval import BM25_B, BM25_K1
from ..sources import load_tables
from ..functions.caching import loop_cache
from ..functions.partitioning import ensure_min_parallelism
from ..functions.rounding import rnd, rnd_sql
from . import register
from .text import (
    _DUCK_TOKENS,
    _docs_with_tokens,
)

# ---------------------------------------------------------------------------
# T8 — per-document TF-IDF top terms (keyword extraction / index feature
# building). tf = term count / doc length; idf = ln(N / df) with N kept
# in-plan as a broadcast scalar. Shuffles: term explode → (doc, term)
# partial-agg counts, a broadcast df join (term vocabulary ≪ corpus), and
# the per-doc ranking window. ln() differs from the oracle's only at ULP
# level — absorbed by the biased rounding (functions/rounding.py).
# ---------------------------------------------------------------------------
_TFIDF_K = 3


@register(
    "t8_tfidf_terms",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {_DUCK_TOKENS} AS tokens FROM documents
    ), tok AS (
      SELECT doc_id, len(tokens) AS doc_len, unnest(tokens) AS term
      FROM tk WHERE len(tokens) > 0
    ), tf AS (
      SELECT doc_id, term, doc_len, count(*) AS n FROM tok
      WHERE term <> '' GROUP BY doc_id, term, doc_len
    ), n_docs AS (
      SELECT count(*) AS n_total FROM tk WHERE len(tokens) > 0
    ), df AS (
      SELECT term, count(DISTINCT doc_id) AS doc_freq FROM tok
      WHERE term <> '' GROUP BY term
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             (tf.n * 1.0 / tf.doc_len) * ln(n_docs.n_total * 1.0 / df.doc_freq)
               AS score
      FROM tf JOIN df USING (term) CROSS JOIN n_docs
    ), ranked AS (
      SELECT doc_id, term, score,
             CAST(row_number() OVER (
               PARTITION BY doc_id
               ORDER BY floor((score) * 1000000.0 + 0.5 + 1e-6) / 1000000.0 DESC,
                        term ASC) AS INTEGER) AS rank
      FROM scored
    )
    SELECT doc_id, term,
           floor((score) * 10000.0 + 0.5 + 1e-6) / 10000.0 AS tfidf, rank
    FROM ranked WHERE rank <= {_TFIDF_K}
    """,
)
def t8_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs_with_tokens(spark, sf_dir).filter(F.col("n_tokens") > 0)
    tok = d.select(
        "doc_id",
        F.col("n_tokens").alias("doc_len"),
        F.explode("tokens").alias("term"),
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term", "doc_len").agg(F.count(F.lit(1)).alias("n"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_total"))
    df_ = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("doc_freq"))
    scored = (
        # df_ is vocabulary-sized (one row per term) — NOT an explicit
        # broadcast: AQE sizes the post-shuffle aggregate at runtime, so
        # it broadcasts while small and shuffle-joins at scale. An
        # explicit F.broadcast here would pin an unbounded table to the
        # driver forever.
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (
                (F.col("n") * 1.0 / F.col("doc_len"))
                * F.log(F.col("n_total") * 1.0 / F.col("doc_freq"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(rnd(F.col("score"), 6)), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TFIDF_K)
        .select("doc_id", "term", rnd("score", 4).alias("tfidf"), "rank")
    )


# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# T23 — BM25 top-k keyword retrieval (Okapi BM25, Robertson & Walker
# 1994): the lexical counterpart of the embedding ANN family (v1-v18),
# used for decontamination-by-retrieval and sparse-baseline hard-negative
# mining. The inverted index IS the (term -> postings) aggregate; queries
# probe it with an equi-join on term, so only documents sharing a term
# with a query are ever scored. Query set: every doc_id % 100 == 0
# document contributes its first 8 tokens (deduped) as a query — a
# corpus-derived, deterministic probe set that scales with the corpus.
# Shuffles: ONE corpus-sized tf aggregate (map-side combined), a
# vocabulary-sized df aggregate (AQE sizes the join), a broadcast 1-row
# stats join, the (query, doc) partial-agg sum, and a per-QUERY top-k
# window — never a global window. See operators/retrieval.py.
# ---------------------------------------------------------------------------
_BM25_QMOD = 100
_BM25_QTERMS = 8
_BM25_K = 5


_T23_ORACLE = f"""
    WITH tk AS (
      SELECT doc_id, {_DUCK_TOKENS} AS tokens FROM documents
    ), tocc AS (
      SELECT doc_id, unnest(tokens) AS term FROM tk WHERE len(tokens) > 0
    ), toc AS (
      SELECT doc_id, term FROM tocc WHERE term <> ''
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toc GROUP BY doc_id, term
    ), dl AS (
      SELECT doc_id, count(*) AS doc_len FROM toc GROUP BY doc_id
    ), dfq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), stats AS (
      SELECT count(*) AS n_docs, avg(CAST(doc_len AS DOUBLE)) AS avgdl
      FROM dl
    ), qt AS (
      SELECT DISTINCT query_id, term FROM (
        SELECT doc_id AS query_id,
               unnest(list_slice(tokens, 1, {_BM25_QTERMS})) AS term
        FROM tk WHERE doc_id % {_BM25_QMOD} = 0 AND len(tokens) > 0
      ) WHERE term <> ''
    ), sc AS (
      SELECT q.query_id, tf.doc_id,
             sum(
               ln(1.0 + (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
               * tf.tf * ({BM25_K1} + 1.0)
               / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                  + {BM25_B} * dl.doc_len / stats.avgdl))
             ) AS score
      FROM qt q
      JOIN tf USING (term)
      JOIN dfq USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
      GROUP BY q.query_id, tf.doc_id
    ), rk AS (
      SELECT query_id, doc_id, score,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY {rnd_sql('score', 6)} DESC, doc_id ASC
             ) AS INTEGER) AS rank
      FROM sc
    )
    SELECT query_id, doc_id, rank, {rnd_sql('score', 4)} AS bm25
    FROM rk WHERE rank <= {_BM25_K}
    """


def _bm25_doc_terms(
    spark: SparkSession, sf_dir: str, exclude_mod: int | None = None
) -> DataFrame:
    """Exploded (doc_id, term) occurrences — the t23/t25/t26/pipe7
    corpus. ``exclude_mod`` drops the doc_id % exclude_mod == 0 docs
    (pipe7's eval split) so the rules stay in lockstep with the t23
    oracle across every consumer."""
    d = _docs_with_tokens(spark, sf_dir).filter(F.col("n_tokens") > 0)
    if exclude_mod is not None:
        d = d.filter(F.col("doc_id") % exclude_mod != 0)
    return d.select(
        "doc_id", F.explode("tokens").alias("term")
    ).filter(F.col("term") != "")


def _bm25_query_terms(
    spark: SparkSession, sf_dir: str, mod: int = _BM25_QMOD
) -> DataFrame:
    """Distinct (query_id, term): first 8 tokens of every %mod doc."""
    d = _docs_with_tokens(spark, sf_dir).filter(F.col("n_tokens") > 0)
    return (
        d.filter(F.col("doc_id") % mod == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice("tokens", 1, _BM25_QTERMS)).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )


@register("t23_bm25_topk", oracle=_T23_ORACLE)
def t23_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import bm25_topk

    return bm25_topk(
        _bm25_doc_terms(spark, sf_dir),
        _bm25_query_terms(spark, sf_dir),
        k=_BM25_K,
    )


# ---------------------------------------------------------------------------
# T25 — persisted BM25 index + partition-pruned probe (the serving
# shape, lexical twin of v11's persisted IVF index): postings and df are
# WRITTEN partitioned by a term-hash bucket; a probe collects its query
# terms' bucket set (query-sized, tiny by contract) and pushes it into
# both scans as a parquet PartitionFilter — the probe reads
# |query buckets| / 64 of the index no matter how large the corpus is.
# The oracle is t23's VERBATIM (the d10-shares-d7 proof shape): a hash
# match proves the persist/prune layer is result-invisible.
# ---------------------------------------------------------------------------
@register("t25_bm25_persisted", oracle=_T23_ORACLE)
def t25_bm25_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.retrieval import probe_bm25_index, write_bm25_index

    # driver-local scratch: correct only where driver and executors
    # share a filesystem (the local-mode harness this entry runs under);
    # a cluster deployment passes write_bm25_index/probe_bm25_index a
    # shared path (HDFS/object store) instead — the operators themselves
    # go through the Hadoop FS-backed parquet reader/writer either way
    root = tempfile.mkdtemp(prefix="wdp_bm25_index_")
    try:
        write_bm25_index(_bm25_doc_terms(spark, sf_dir), root)
        out = probe_bm25_index(
            spark, root, _bm25_query_terms(spark, sf_dir), k=_BM25_K
        )
        # pin before the index directory disappears (the pipe5 rule):
        # the probe plan reads the persisted files lazily and the
        # driver collects AFTER this function returns
        return loop_cache(out, eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# T26 — incremental BM25 index maintenance theorem (the retrieval member
# of the incremental ≡ batch franchise next to pipe3/t20/t22): the
# corpus arrives as three disjoint doc_id slices, each slice aggregates
# its OWN partials (tf is doc-local so per-slice tf is final; df and
# (n_docs, total_len) are additive), the partials merge by SUM with
# avgdl recomposed exactly as total_len/n_docs — and the merged index
# scores the same query set. The oracle computes the ONE-SHOT t23, so
# hash equality proves "updating a BM25 index for today's documents is a
# partial-aggregate merge, never a rebuild" — at 1000 executors the
# per-slice partials are exactly what each executor/day already holds.
# ---------------------------------------------------------------------------
@register("t26_incremental_bm25", oracle=_T23_ORACLE)
def t26_incremental_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import (
        bm25_score_topk,
        merge_bm25_partials,
        term_stats_partial,
    )

    doc_terms = _bm25_doc_terms(spark, sf_dir)
    slices = [
        doc_terms.filter(F.col("doc_id") % 3 == i) for i in range(3)
    ]
    parts = [term_stats_partial(sl) for sl in slices]
    tf, df, stats = merge_bm25_partials(
        [p[0] for p in parts], [p[1] for p in parts], [p[2] for p in parts]
    )
    return bm25_score_topk(
        tf, df, stats, _bm25_query_terms(spark, sf_dir), k=_BM25_K
    )



# ---------------------------------------------------------------------------
# T27 — HYBRID retrieval (sparse + dense + RRF fusion): the serving
# composition every modern retrieval stack runs — BM25 (t23's chain)
# and embedding cosine (v1's chain) each produce a per-query top-k over
# the SAME universe (documents that have both a token stream and an
# embedding: doc_id = vec_id), fused by Reciprocal Rank Fusion
# (operators/retrieval.py::rrf_fuse). RRF consumes only RANKS, so the
# two incomparable score scales need no calibration — which is exactly
# why it is the standard zero-training fusion rule.
# Scale shape: each side keeps its own proven plan (t23's posting-list
# probe, v1's broadcast-query BNL — at scale the dense side swaps to the
# IVF probe, same ranks in, fusion unchanged); the fusion layer itself
# only touches probe-sized data (queries x k per side). The dense side
# here INCLUDES the query doc (retrieving yourself is the degenerate
# hybrid hit both sides agree on; v1's neighbor semantics excludes
# self — documented divergence, not drift).
# ---------------------------------------------------------------------------
_T27_RRF_K = 60


@register(
    "t27_hybrid_rrf",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {_DUCK_TOKENS} AS tokens FROM documents
    ), u AS (
      SELECT t.doc_id, t.tokens FROM tk t
      JOIN embeddings e ON e.vec_id = t.doc_id
      WHERE len(t.tokens) > 0
    ), tocc AS (
      SELECT doc_id, unnest(tokens) AS term FROM u
    ), toc AS (
      SELECT doc_id, term FROM tocc WHERE term <> ''
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toc GROUP BY doc_id, term
    ), dl AS (
      SELECT doc_id, count(*) AS doc_len FROM toc GROUP BY doc_id
    ), dfq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), stats AS (
      SELECT count(*) AS n_docs, avg(CAST(doc_len AS DOUBLE)) AS avgdl
      FROM dl
    ), qt AS (
      SELECT DISTINCT query_id, term FROM (
        SELECT doc_id AS query_id,
               unnest(list_slice(tokens, 1, {_BM25_QTERMS})) AS term
        FROM u WHERE doc_id % {_BM25_QMOD} = 0
      ) WHERE term <> ''
    ), sc AS (
      SELECT q.query_id, tf.doc_id,
             sum(
               ln(1.0 + (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
               * tf.tf * ({BM25_K1} + 1.0)
               / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                  + {BM25_B} * dl.doc_len / stats.avgdl))
             ) AS score
      FROM qt q
      JOIN tf USING (term)
      JOIN dfq USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
      GROUP BY q.query_id, tf.doc_id
    ), srk AS (
      SELECT query_id, doc_id,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY {rnd_sql('score', 6)} DESC, doc_id ASC
             ) AS INTEGER) AS rank
      FROM sc
    ), ev AS (
      -- per-row norm hoisted OUT of the pair loop (3x less pairwise
      -- arithmetic; values bit-identical: same dot/(nq*nv) float ops)
      SELECT e.vec_id, e.embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(e.embedding::DOUBLE[],
                                   e.embedding::DOUBLE[])) AS nrm
      FROM embeddings e JOIN u ON u.doc_id = e.vec_id
    ), qe AS (
      SELECT vec_id AS query_id, emb AS qemb, nrm AS qnrm FROM ev
      WHERE vec_id % {_BM25_QMOD} = 0
    ), dp AS (
      SELECT q.query_id, v.vec_id AS doc_id,
             list_dot_product(q.qemb, v.emb) / (q.qnrm * v.nrm) AS cos
      FROM qe q CROSS JOIN ev v
    ), drk AS (
      SELECT query_id, doc_id,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY {rnd_sql('cos', 6)} DESC, doc_id ASC
             ) AS INTEGER) AS rank
      FROM dp
    ), contrib AS (
      SELECT query_id, doc_id, 1.0 / ({_T27_RRF_K} + rank) AS c
      FROM srk WHERE rank <= {_BM25_K}
      UNION ALL
      SELECT query_id, doc_id, 1.0 / ({_T27_RRF_K} + rank) AS c
      FROM drk WHERE rank <= {_BM25_K}
    ), fused AS (
      SELECT query_id, doc_id, sum(c) AS rrf
      FROM contrib GROUP BY query_id, doc_id
    ), frk AS (
      SELECT query_id, doc_id, rrf,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY {rnd_sql('rrf', 9)} DESC, doc_id ASC
             ) AS INTEGER) AS rank
      FROM fused
    )
    SELECT query_id, doc_id, rank, {rnd_sql('rrf', 6)} AS rrf
    FROM frk WHERE rank <= {_BM25_K}
    """,
)
def t27_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import bm25_topk, rrf_fuse
    from ..operators.similarity import dot

    docs = _docs_with_tokens(spark, sf_dir).filter(F.col("n_tokens") > 0)
    # ensure_min_parallelism matters HERE more than anywhere: the dense
    # side's per-pair HOF fold inherits the embedding table's partition
    # count, and a single-file parquet read otherwise serializes the
    # whole q x n cosine stage onto one task (measured: 300 s wall at
    # 420 s CPU — parallelism 1.4 — at the 30x dir before this line)
    emb = (
        ensure_min_parallelism(
            load_tables(spark, sf_dir, "embeddings")["embeddings"]
        )
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
        )
    )
    # the hybrid universe: ids carrying BOTH representations
    uni = docs.join(
        emb.select(F.col("vec_id").alias("doc_id")), "doc_id", "semi"
    )
    doc_terms = uni.select(
        "doc_id", F.explode("tokens").alias("term")
    ).filter(F.col("term") != "")
    q_terms = (
        uni.filter(F.col("doc_id") % _BM25_QMOD == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice("tokens", 1, _BM25_QTERMS)).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    sparse = bm25_topk(doc_terms, q_terms, k=_BM25_K)

    emb_u = emb.join(
        uni.select(F.col("doc_id").alias("vec_id")), "vec_id", "semi"
    ).withColumn("nrm", F.sqrt(dot(F.col("emb"), F.col("emb"))))
    qe = emb_u.filter(F.col("vec_id") % _BM25_QMOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"), F.col("nrm").alias("qnrm"),
    )
    # per-row norms hoisted out of the pair loop: the interpreted HOF
    # fold is the pairwise unit cost, and cos = dot/(nq*nv) needs ONE
    # fold per pair instead of three (dot + both norms) — measured 79 s
    # -> ~28 s at the 10x dir; values bit-identical (same float ops)
    pairs = F.broadcast(qe).crossJoin(emb_u).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        (dot(F.col("qemb"), F.col("emb"))
         / (F.col("qnrm") * F.col("nrm"))).alias("cos"),
    )
    wd = Window.partitionBy("query_id").orderBy(
        F.desc(rnd(F.col("cos"), 6)), F.asc("doc_id")
    )
    dense = (
        pairs.withColumn("rank", F.row_number().over(wd))
        .filter(F.col("rank") <= _BM25_K)
        .select("query_id", "doc_id", "rank")
    )
    return rrf_fuse(
        [sparse.select("query_id", "doc_id", "rank"), dense],
        k=_BM25_K, rrf_k=_T27_RRF_K,
    )
