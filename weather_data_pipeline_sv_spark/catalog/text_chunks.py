"""Chunking, boilerplate and leakage-split entries (split out of
catalog/text.py along the family seam — round-10 verdict #6; entry
names and oracles verbatim):

- t24        — overlapping token-window chunking
- d11/d12    — cross-document boilerplate, one-shot and incremental
- smp8/smp8b — doc-level leakage-free splits (exact and banded)
- smp9       — deterministic curriculum order
- pipe7      — decontamination by retrieval (BM25 probe)
- pipe8      — chunk-level exact dedup
- smp10      — chunk-level leakage split (stop-fingerprint capped)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators.retrieval import BM25_B, BM25_K1
from ..operators.chunking import CHUNK_MAX_DF as _SMP10_MAX_DF
from ..operators.sampling import hash_uniform_sql
from ..sources import load_tables
from ..functions.partitioning import ensure_min_parallelism
from ..functions.rounding import rnd, rnd_sql
from . import register
from .text import (
    _DUCK_DOC_SHINGLES,
    _DUCK_DOC_SHINGLES_CAPPED,
    _DUCK_TOKENS,
    _doc_shingles,
    _docs_with_tokens,
)
from .text_dedup import _DECON_MOD
from .text_retrieval import (
    _BM25_K,
    _BM25_QTERMS,
    _bm25_doc_terms,
    _bm25_query_terms,
)

# ---------------------------------------------------------------------------
# T24 — overlapping token-window chunking (context-window preparation):
# split every document into window=32-token chunks at stride 24 (8-token
# overlap) — the step that feeds embedding/indexing/packing in a RAG or
# pretraining pipeline. Pure map-side generator (sequence + explode +
# slice): ZERO shuffles at any corpus size; output volume is the only
# cost (each token re-emitted ~window/stride times).
# See operators/chunking.py.
# ---------------------------------------------------------------------------
_CHUNK_W = 32
_CHUNK_S = 24


@register(
    "t24_chunk_documents",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {_DUCK_TOKENS} AS tokens FROM documents
    ), st AS (
      SELECT doc_id, tokens,
             unnest(generate_series(1, len(tokens), {_CHUNK_S})) AS start_tok
      FROM tk WHERE len(tokens) >= 1
    )
    SELECT doc_id,
           CAST((start_tok - 1) // {_CHUNK_S} + 1 AS BIGINT) AS chunk_idx,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(len(list_slice(tokens, start_tok,
                start_tok + {_CHUNK_W} - 1)) AS BIGINT) AS n_chunk_tokens,
           array_to_string(list_slice(tokens, start_tok,
                start_tok + {_CHUNK_W} - 1), ' ') AS chunk_text
    FROM st
    """,
)
def t24_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.chunking import chunk_by_tokens

    d = _docs_with_tokens(spark, sf_dir)
    return chunk_by_tokens(
        d.select("doc_id", "tokens"), "doc_id", "tokens",
        window=_CHUNK_W, stride=_CHUNK_S,
    )


# ---------------------------------------------------------------------------
# D11 — cross-document boilerplate detection (the C4/RefinedWeb
# "repeated across too many pages" rule, shingle granularity because
# this corpus has no line structure): a 3-shingle occurring in >= max(5,
# 1% of docs) distinct documents is boilerplate; each document reports
# how much of it is boilerplate (the per-doc filter signal). The
# threshold is RELATIVE to corpus size — computed in-plan from the same
# shingle table, one extra 1-row aggregate kept broadcast.
# Shuffles: the d2-family distinct (doc, shingle) explode feeds BOTH the
# df aggregate and the per-doc counts — one corpus-sized pass; the
# boilerplate set is df-filtered vocabulary (tiny by Heaps' law + the
# threshold) and AQE broadcasts the semi-join side.
# ---------------------------------------------------------------------------
# canonical values live next to the incremental store so the batch
# entry and BoilerplateStore.report() can never drift apart (round-8
# verdict #7) — the store ≡ d11 pin in tests would only catch drift
# because it runs both; a single definition removes the possibility
from ..operators.boilerplate import BOILER_FRAC as _D11_FRAC
from ..operators.boilerplate import BOILER_MIN_DF as _D11_MIN_DF

_D11_ORACLE = f"""
    {_DUCK_DOC_SHINGLES},
    dfq AS (
      SELECT shingle, count(*) AS df FROM sh GROUP BY shingle
    ), tot AS (
      SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id
    ), nd AS (
      SELECT count(*) AS n_docs FROM tot
    ), boiler AS (
      SELECT shingle FROM dfq CROSS JOIN nd
      WHERE df >= greatest({_D11_MIN_DF}, ceil({_D11_FRAC} * n_docs))
    ), nb AS (
      SELECT s.doc_id, count(*) AS n_boiler
      FROM sh s JOIN boiler USING (shingle) GROUP BY s.doc_id
    )
    SELECT t.doc_id,
           CAST(t.n_shingles AS BIGINT) AS n_shingles,
           CAST(coalesce(nb.n_boiler, 0) AS BIGINT) AS n_boiler,
           {rnd_sql('coalesce(nb.n_boiler, 0) * 1.0 / t.n_shingles', 6)}
             AS boiler_ratio
    FROM tot t LEFT JOIN nb ON nb.doc_id = t.doc_id
    """


def _boilerplate_report(sh, dfq, tot, nd) -> DataFrame:
    """d11/d12's shared tail — delegated to
    operators/dedup.py::boilerplate_report (one expression tree for the
    batch entry, the incremental entry, AND the streaming store, so
    none can drift from the rule the others are hash-proven against)."""
    return dd.boilerplate_report(sh, dfq, tot, nd, _D11_MIN_DF, _D11_FRAC)


@register("d11_boilerplate_shingles", oracle=_D11_ORACLE)
def d11_boilerplate_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _doc_shingles(spark, sf_dir)
    dfq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    tot = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    nd = tot.agg(F.count(F.lit(1)).alias("n_docs"))
    return _boilerplate_report(sh, dfq, tot, nd)


# ---------------------------------------------------------------------------
# D12 — INCREMENTAL boilerplate (d11's rule maintained without a corpus
# rescan — round-7 verdict #6): the C4 threshold is corpus-relative, but
# its inputs are pure partial aggregates — shingle-df is additive per
# term, per-doc shingle counts are doc-local (final per slice, docs
# disjoint by the t26 contract), and n_docs is additive. So "update the
# boilerplate report for today's slice" = merge the per-slice partials
# (exactly t26's algebra) and recompute the threshold from merged
# stats; only the final tiny-vocabulary semi-join touches the retained
# doc-shingle rows — never the raw text. Shares d11's oracle VERBATIM:
# hash equality proves incremental ≡ batch.
# ---------------------------------------------------------------------------
@register("d12_incremental_boilerplate", oracle=_D11_ORACLE)
def d12_incremental_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import functools

    sh = _doc_shingles(spark, sf_dir)
    slices = [sh.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    # per-slice partials (what an incremental store would persist per day)
    dfs = [
        sl.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        for sl in slices
    ]
    tots = [
        sl.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
        for sl in slices
    ]
    nds = [t.agg(F.count(F.lit(1)).alias("n_docs")) for t in tots]
    union = lambda frames: functools.reduce(
        lambda a, b: a.unionByName(b), frames
    )
    dfq = union(dfs).groupBy("shingle").agg(
        F.sum("df").cast("long").alias("df")
    )
    tot = union(tots)
    nd = union(nds).agg(F.sum("n_docs").cast("long").alias("n_docs"))
    return _boilerplate_report(union(slices), dfq, tot, nd)


# ---------------------------------------------------------------------------
# SMP8 — leakage-free train/val/test split: assign the split by the
# NEAR-DUP CLUSTER (d6's connected components over the Jaccard >= 0.6
# graph), not the document — so two near-duplicates can never land one
# in train and one in test (the eval-contamination failure mode a plain
# hash-of-doc_id split has by construction). Split membership is the
# md5 variate of the cluster representative: deterministic, engine-
# replayable, stable under repartitioning. Plan = d6's clustering (its
# scale story is d6's: bucketed candidate generation, loop-pinned
# min-label propagation) + ONE map-side split projection.
#
# Two catalog entries share ONE oracle (the d10-shares-d7 proof shape):
# smp8 generates candidate pairs with the exact shared-shingle join
# (d2's shape, quadratic per shingle bucket); smp8b rides the MinHash
# band join in the high-recall 32-bands-of-2 configuration — candidate
# cost docs x n_hashes instead of df² per shingle, the 100 TB path. The
# oracle replays the EXACT clustering, so smp8b's hash match proves the
# banding had full recall on this corpus (miss prob (1-0.36)^32 ~ 6.5e-7
# per true pair at threshold 0.6) — banding is result-invisible, the
# j9/a13 salting rule.
# ---------------------------------------------------------------------------
_SMP8_VAL = 0.05
_SMP8_TEST = 0.05

_SMP8_ORACLE = f"""
    WITH RECURSIVE
    {_DUCK_DOC_SHINGLES_CAPPED.strip().removeprefix('WITH').strip()},
      counts AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
      rawpairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
      ),
      pairs AS (
        SELECT p.doc_a, p.doc_b FROM rawpairs p
        JOIN counts ca ON p.doc_a = ca.doc_id
        JOIN counts cb ON p.doc_b = cb.doc_id
        WHERE p.inter * 1.0 / (ca.n_sh + cb.n_sh - p.inter) >= 0.6
      ),
      und AS (
        SELECT doc_a AS s, doc_b AS t FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
      ),
      walk(v, l) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.t, w.l FROM walk w JOIN und e ON e.s = w.v
      ),
      comp AS (
        SELECT v AS doc_id, CAST(min(l) AS BIGINT) AS component
        FROM walk GROUP BY v
      )
    SELECT doc_id, component,
           CASE WHEN u < {_SMP8_TEST} THEN 'test'
                WHEN u < {_SMP8_TEST + _SMP8_VAL} THEN 'val'
                ELSE 'train' END AS split
    FROM (
      SELECT doc_id, component,
             {hash_uniform_sql('component', 'cluster_split')} AS u
      FROM comp
    )
    """


def _leakage_split(spark: SparkSession, sf_dir: str, candidates: str):
    from ..operators.sampling import leakage_free_split

    d = load_tables(spark, sf_dir, "documents")["documents"]
    return leakage_free_split(
        d, "doc_id", "text", n=3, threshold=0.6,
        val_frac=_SMP8_VAL, test_frac=_SMP8_TEST, salt="cluster_split",
        candidates=candidates,
        max_shingle_df=dd.JACCARD_MAX_SHINGLE_DF,
    )


@register("smp8_leakage_free_split", oracle=_SMP8_ORACLE)
def smp8_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _leakage_split(spark, sf_dir, "naive")


@register("smp8b_leakage_split_banded", oracle=_SMP8_ORACLE)
def smp8b_leakage_split_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _leakage_split(spark, sf_dir, "banded")


# ---------------------------------------------------------------------------
# SMP9 — deterministic global shuffle (epoch curriculum order): every
# training run needs a reproducible uniformly-shuffled example order;
# at 100 TB "row_number() OVER (ORDER BY hash)" is the canonical
# global-window scale-killer. operators/sampling.py::global_hash_order
# computes the IDENTICAL dense positions in two levels (hash-range
# buckets -> parallel per-bucket windows -> an n_buckets-row cumulative
# offset broadcast back); the oracle replays the naive global
# row_number, so hash equality here IS the proof the two-level plan
# produces the exact global order.
# ---------------------------------------------------------------------------
@register(
    "smp9_curriculum_order",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             CAST('0x' || substr(md5('curriculum' || ':' ||
               CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS hk
      FROM documents
    )
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY hk ASC, doc_id ASC) AS BIGINT)
             AS position
    FROM h
    """,
)
def smp9_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import global_hash_order

    d = ensure_min_parallelism(
        load_tables(spark, sf_dir, "documents")["documents"]
    ).select("doc_id")
    return global_hash_order(
        d, "doc_id", salt="curriculum", n_buckets=64
    ).select("doc_id", "position")


# ---------------------------------------------------------------------------
# PIPE7 — decontamination by retrieval: the fuzzy companion of d7/d10
# (exact n-gram overlap). Each benchmark/eval document (the d7 split,
# doc_id % 17 == 0) issues a BM25 query built from its leading tokens;
# any TRAINING document the query retrieves into its top-5 is flagged
# contaminated — the "search your eval set against the corpus" sweep
# production pipelines run when paraphrase-level leakage matters and
# exact n-gram matching misses it. Output: one row per contaminated
# training doc with how many eval queries hit it, its best rank, and its
# best score — the triage signal (high n_hits + rank 1 = near-verbatim
# leak; a single rank-5 hit = topical overlap to review).
# Scale shape: t23's plan with the corpus/eval split applied before the
# tf aggregate (eval set is corpus-fraction-sized; the retrieval is
# pruned to posting lists of eval-query terms) + one per-doc partial agg
# over the bounded (queries x k) hit set.
# ---------------------------------------------------------------------------
@register(
    "pipe7_retrieval_decontaminate",
    oracle=f"""
    WITH tk0 AS (
      SELECT doc_id, {_DUCK_TOKENS} AS tokens FROM documents
    ), tk AS (
      SELECT * FROM tk0 WHERE len(tokens) > 0
    ), tocc AS (
      SELECT doc_id, unnest(tokens) AS term FROM tk
      WHERE doc_id % {_DECON_MOD} <> 0
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
        FROM tk WHERE doc_id % {_DECON_MOD} = 0
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
    ), hits AS (
      SELECT query_id, doc_id, rank, {rnd_sql('score', 4)} AS bm25
      FROM rk WHERE rank <= {_BM25_K}
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_hits,
           CAST(min(rank) AS INTEGER) AS best_rank,
           max(bm25) AS best_bm25
    FROM hits GROUP BY doc_id
    """,
)
def pipe7_retrieval_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import bm25_topk

    corpus_terms = _bm25_doc_terms(spark, sf_dir, exclude_mod=_DECON_MOD)
    eval_queries = _bm25_query_terms(spark, sf_dir, mod=_DECON_MOD)
    hits = bm25_topk(corpus_terms, eval_queries, k=_BM25_K)
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.min("rank").cast("int").alias("best_rank"),
        F.max("bm25").alias("best_bm25"),
    )


# ---------------------------------------------------------------------------
# PIPE8 — chunk-level exact dedup (t24 ∘ d1): dedup at the CONTEXT-WINDOW
# granularity instead of the document — the shape used when near-identical
# documents share long runs (mirrors, templated pages, quoted passages)
# and document-level dedup either drops too much or misses the overlap.
# Every chunk is fingerprinted (md5 of its text); per fingerprint the
# KEEPER is the smallest (doc_id, chunk_idx); every other occurrence is a
# duplicate. Output is the per-document triage signal (n_chunks, n_dup,
# dup_ratio) a pipeline thresholds on.
# Scale shape: t24's zero-shuffle chunker, then ONE exchange keyed on the
# fingerprint (uniform by construction — md5) for the keeper window, then
# a per-doc partial agg. Fingerprint groups are tiny (dup families), so
# the window state is bounded; nothing is quadratic and no global
# structure exists.
# ---------------------------------------------------------------------------
@register(
    "pipe8_chunk_dedup",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {_DUCK_TOKENS} AS tokens FROM documents
    ), st AS (
      SELECT doc_id, tokens,
             unnest(generate_series(1, len(tokens), {_CHUNK_S})) AS start_tok
      FROM tk WHERE len(tokens) >= 1
    ), ch AS (
      SELECT doc_id,
             CAST((start_tok - 1) // {_CHUNK_S} + 1 AS BIGINT) AS chunk_idx,
             md5(array_to_string(list_slice(tokens, start_tok,
                  start_tok + {_CHUNK_W} - 1), ' ')) AS h
      FROM st
    ), rk AS (
      SELECT doc_id, chunk_idx,
             row_number() OVER (
               PARTITION BY h ORDER BY doc_id ASC, chunk_idx ASC
             ) AS rn
      FROM ch
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           {rnd_sql('sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) * 1.0'
                    ' / count(*)', 6)} AS dup_ratio
    FROM rk GROUP BY doc_id
    """,
)
def pipe8_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.chunking import chunk_by_tokens

    d = _docs_with_tokens(spark, sf_dir)
    chunks = chunk_by_tokens(
        d.select("doc_id", "tokens"), "doc_id", "tokens",
        window=_CHUNK_W, stride=_CHUNK_S,
    ).select("doc_id", "chunk_idx", F.md5("chunk_text").alias("h"))
    w = Window.partitionBy("h").orderBy(
        F.asc("doc_id"), F.asc("chunk_idx")
    )
    rk = chunks.withColumn("rn", F.row_number().over(w))
    dup = F.when(F.col("rn") > 1, 1).otherwise(0)
    return rk.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(dup).cast("long").alias("n_dup"),
        rnd(F.sum(dup) * 1.0 / F.count(F.lit(1)), 6).alias("dup_ratio"),
    )


# ---------------------------------------------------------------------------
# SMP10 — CHUNK-level leakage-free split (pipe8's fingerprints ∘ smp8's
# cluster rule — round-7 verdict #7): for pretraining evals the actual
# contamination unit is the CONTEXT WINDOW, not the document — a train
# doc and an eval doc sharing one verbatim 32-token window leaks that
# window into eval even when the documents as wholes are not near-dups
# (quoted passages, templated fragments). So the co-assignment graph
# has an edge wherever two documents share a chunk fingerprint;
# connected components + the md5-of-representative split assignment
# guarantee no shared window ever straddles train/test.
# Scale shape: t24's zero-shuffle chunker -> distinct (doc, h) -> the
# CAPPED shared-key self-join (operators/chunking.py::
# chunk_fingerprint_edges, max_chunk_df stop-fingerprint rule — the
# jaccard_pairs pattern, round-8 verdict #1) -> d6's loop-pinned label
# propagation. The cap is ENFORCED here, not assumed of some upstream
# step: a boilerplate-grade window shared by F documents would emit F²
# pairs in one shuffle partition and weld the corpus into one split
# component; with the cap the worst bucket is cap² pairs and the
# co-assignment graph carries only non-boilerplate windows — which is
# the leakage relation the split actually needs (mirrored in the
# oracle's hdf/chk CTEs, the d2 convention).
# ---------------------------------------------------------------------------
@register(
    "smp10_chunk_leakage_split",
    oracle=f"""
    WITH RECURSIVE
      tk AS (
        SELECT doc_id, {_DUCK_TOKENS} AS tokens FROM documents
      ), st AS (
        SELECT doc_id, tokens,
               unnest(generate_series(1, len(tokens), {_CHUNK_S})) AS start_tok
        FROM tk WHERE len(tokens) >= 1
      ), ch AS (
        SELECT DISTINCT doc_id,
               md5(array_to_string(list_slice(tokens, start_tok,
                    start_tok + {_CHUNK_W} - 1), ' ')) AS h
        FROM st
      ),
      hdf AS (
        SELECT h FROM ch GROUP BY h HAVING count(*) <= {_SMP10_MAX_DF}
      ),
      chk AS (
        SELECT c.doc_id, c.h FROM ch c JOIN hdf USING (h)
      ),
      pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM chk a JOIN chk b ON a.h = b.h AND a.doc_id < b.doc_id
      ),
      und AS (
        SELECT doc_a AS s, doc_b AS t FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
      ),
      walk(v, l) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.t, w.l FROM walk w JOIN und e ON e.s = w.v
      ),
      comp AS (
        SELECT v AS doc_id, CAST(min(l) AS BIGINT) AS component
        FROM walk GROUP BY v
      )
    SELECT doc_id, component,
           CASE WHEN u < {_SMP8_TEST} THEN 'test'
                WHEN u < {_SMP8_TEST + _SMP8_VAL} THEN 'val'
                ELSE 'train' END AS split
    FROM (
      SELECT doc_id, component,
             {hash_uniform_sql('component', 'chunk_split')} AS u
      FROM comp
    )
    """,
)
def smp10_chunk_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.chunking import chunk_by_tokens, chunk_fingerprint_edges
    from ..operators.graph import connected_components
    from ..operators.sampling import split_column

    d = _docs_with_tokens(spark, sf_dir)
    ch = (
        chunk_by_tokens(
            d.select("doc_id", "tokens"), "doc_id", "tokens",
            window=_CHUNK_W, stride=_CHUNK_S,
        )
        .select("doc_id", F.md5("chunk_text").alias("h"))
        .distinct()
    )
    pairs = chunk_fingerprint_edges(ch, max_chunk_df=_SMP10_MAX_DF)
    comp = connected_components(
        d.select("doc_id"), pairs,
        vertex_col="doc_id", src_col="doc_a", dst_col="doc_b",
    )
    return comp.select(
        "doc_id",
        "component",
        split_column(
            F.col("component"), val_frac=_SMP8_VAL, test_frac=_SMP8_TEST,
            salt="chunk_split",
        ).alias("split"),
    )


