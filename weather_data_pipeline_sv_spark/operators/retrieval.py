"""BM25 keyword retrieval over a document corpus (inverted-index probe).

Why: the engine's similarity-search family (catalog/vector.py v1-v18)
answers "nearest by embedding"; a training-data pipeline equally needs
the lexical side — "which documents match these query terms" — for
decontamination-by-retrieval, hard-negative mining against a sparse
baseline, and corpus QA ("what does the corpus say about X").
Okapi BM25 (Robertson & Walker 1994; the SPARSE retrieval baseline every
IR system publishes against) is the standard scoring rule.

Spark-first shape — the inverted index IS the (term -> postings)
aggregate, probed with an equi-join:

- ``tf``   : one tokenize/explode pass -> partial-agg counts keyed on
  (doc, term). At 100 TB this is the only corpus-sized shuffle, and the
  map-side combine collapses repeated terms before the exchange.
- ``df``   : per-term document frequency — vocabulary-sized (Heaps' law:
  sublinear in corpus size). Left as a post-shuffle aggregate so AQE
  broadcasts it while small and shuffle-joins at scale.
- ``stats``: N and avgdl, ONE row, kept in-plan via crossJoin(broadcast).
- probe    : query terms equi-join ``tf`` on term — exactly a posting-
  list lookup: only documents containing a query term ever materialize;
  documents sharing no term with any query are never scored (BM25 of a
  disjoint doc is 0 by definition, and the join prunes them for free).
- score    : sum of per-term contributions grouped by (query, doc) —
  partial-agg again — then a per-query top-k window (partitioned by
  query, never a global window).

Determinism / oracle parity: idf = ln(1 + (N - df + .5)/(df + .5))
(the non-negative Lucene variant of the Robertson idf) and the tf
saturation are plain arithmetic + ln in both engines; ULP-level ln
drift is absorbed by the repo's biased rounding (functions/rounding.py)
applied before the rank ordering and on the published score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import rnd

BM25_K1 = 1.2
BM25_B = 0.75


def term_stats(doc_terms: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """From exploded (doc_id, term) rows build the three index tables:

    - ``tf``    (doc_id, term, tf, doc_len) — the postings,
    - ``df``    (term, df) — vocabulary-sized,
    - ``stats`` (n_docs, avgdl) — one row.

    ``doc_len`` is the term-occurrence count of the document (tokenizer
    tokens, not characters), derived from the same exploded pass so a
    single corpus scan feeds the whole index.
    """
    tf = doc_terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    doc_len = doc_terms.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doc_len"))
    tf = tf.join(doc_len, "doc_id")
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = doc_len.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("doc_len").cast("double")).alias("avgdl"),
    )
    return tf, df, stats


def bm25_topk(
    doc_terms: DataFrame,
    query_terms: DataFrame,
    k: int = 5,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents per query by BM25.

    ``doc_terms``: exploded (doc_id, term) rows — one row per term
    OCCURRENCE (duplicates carry tf).
    ``query_terms``: (query_id, term) rows — one row per DISTINCT query
    term (callers dedupe; a repeated query term would double-count its
    contribution, which classic BM25 does not).

    Returns (query_id, doc_id, rank, bm25) with rank 1..k per query,
    ties broken by doc_id ascending on the 6-dp-rounded score.
    """
    tf, df, stats = term_stats(doc_terms)
    postings = (
        query_terms.join(tf, "term")
        .join(df, "term")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (
        F.col("tf") * (k1 + 1.0)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("doc_len") / F.col("avgdl"))
        )
    )
    scored = postings.select(
        "query_id", "doc_id", (idf * tf_part).alias("contrib")
    )
    per_doc = scored.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(rnd(F.col("score"), 6)), F.asc("doc_id")
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", rnd("score", 4).alias("bm25"))
    )
