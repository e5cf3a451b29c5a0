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

from ..functions.partitioning import one_partition_df
from ..functions.rounding import rnd
from .aggstore import PartialAggStore

BM25_K1 = 1.2
BM25_B = 0.75


def term_stats(
    doc_terms: DataFrame, cache: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """From exploded (doc_id, term) rows build the three index tables:

    - ``tf``    (doc_id, term, tf, doc_len) — the postings,
    - ``df``    (term, df) — vocabulary-sized,
    - ``stats`` (n_docs, avgdl) — one row.

    ``doc_len`` is the term-occurrence count of the document (tokenizer
    tokens, not characters), derived from the same exploded pass so a
    single corpus scan feeds the whole index.

    ``cache=True`` stage_cache-pins the two fan-out heads (``doc_len``:
    the tf join + stats; the joined ``tf``: the postings and the df
    aggregate) for callers that consume the tables in SEPARATE actions —
    ``write_bm25_index``'s three writes would otherwise each re-run the
    tokenize/explode upstream and its aggregates. Single-action callers
    (t23's one plan tree) keep the default: Spark's ReusedExchange
    already shares the tf exchange within one plan.
    """
    tf = doc_terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    doc_len = doc_terms.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doc_len"))
    if cache:
        from ..functions.caching import stage_cache

        doc_len = stage_cache(doc_len)
    tf = tf.join(doc_len, "doc_id")
    if cache:
        from ..functions.caching import stage_cache

        tf = stage_cache(tf)
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = doc_len.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("doc_len").cast("double")).alias("avgdl"),
    )
    return tf, df, stats


def bm25_score_topk(
    tf: DataFrame,
    df: DataFrame,
    stats: DataFrame,
    query_terms: DataFrame,
    k: int = 5,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Score + rank against prebuilt index tables (the shared core of
    the from-scratch, persisted-index, and merged-partials paths — the
    three produce hash-identical results by construction, which is what
    t25/t26's shared oracle proves)."""
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


def bm25_topk(
    doc_terms: DataFrame,
    query_terms: DataFrame,
    k: int = 5,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents per query by BM25, index built from scratch.

    ``doc_terms``: exploded (doc_id, term) rows — one row per term
    OCCURRENCE (duplicates carry tf).
    ``query_terms``: (query_id, term) rows — one row per DISTINCT query
    term (callers dedupe; a repeated query term would double-count its
    contribution, which classic BM25 does not).

    Returns (query_id, doc_id, rank, bm25) with rank 1..k per query,
    ties broken by doc_id ascending on the 6-dp-rounded score.
    """
    tf, df, stats = term_stats(doc_terms)
    return bm25_score_topk(tf, df, stats, query_terms, k=k, k1=k1, b=b)


# ---------------------------------------------------------------------------
# Persisted index: the serving shape. Building tf/df per query batch is
# fine for one-shot jobs; a retrieval SERVICE writes the index once and
# probes it many times. Postings and df are written partitioned by a
# term-hash bucket, so a probe reads ONLY the buckets its query terms
# hash to — a parquet partition filter (PartitionFilters in the scan,
# pinned in tests), the lexical twin of probe_ivf_index's list_id
# pruning. The bucket hash is xxhash64 (JVM-side, never compared
# cross-engine — it decides physical layout only; every VALUE the oracle
# checks flows through the same md5/ln arithmetic as the from-scratch
# path).
# ---------------------------------------------------------------------------
N_POSTING_BUCKETS = 64


def _term_bucket(term, n_buckets: int):
    return F.pmod(F.xxhash64(term), F.lit(n_buckets)).cast("int")


def write_bm25_index(
    doc_terms: DataFrame, path: str, n_buckets: int = N_POSTING_BUCKETS
) -> None:
    """Write postings/df partitioned by term-hash bucket + 1-row stats.

    Layout: ``{path}/postings/bucket=i/`` (doc_id, term, tf, doc_len),
    ``{path}/_df/bucket=i/`` (term, df), ``{path}/_stats`` (n_docs,
    avgdl, n_buckets). df and stats are plain additive aggregates, so
    incremental maintenance is a partial-aggregate merge — see
    merge_bm25_partials.

    ``n_buckets`` is stamped into ``_stats`` and read back by
    :func:`probe_bm25_index`: a probe hashing terms with a different
    bucket count than the one the index was laid out with would prune
    to the WRONG directories and silently miss postings (the
    cms_estimate build-parameter-mismatch class) — stamping makes the
    layout parameter travel with the index instead of relying on two
    call sites agreeing.
    """
    tf, df, stats = term_stats(doc_terms, cache=True)
    # co-locate each bucket before the partitioned write (the
    # write_ivfpq_index rule): otherwise every write task spans every
    # bucket directory and the file count is n_tasks × n_buckets — at
    # the 256-bucket production layout that's the listing cost probes
    # would pay forever for one build's saved exchange
    (
        tf.withColumn("bucket", _term_bucket(F.col("term"), n_buckets))
        .repartition(F.col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(f"{path}/postings")
    )
    (
        df.withColumn("bucket", _term_bucket(F.col("term"), n_buckets))
        .repartition(F.col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(f"{path}/_df")
    )
    (
        stats.withColumn("n_buckets", F.lit(n_buckets).cast("int"))
        .coalesce(1).write.mode("overwrite").parquet(f"{path}/_stats")
    )


def probe_bm25_index(
    spark,
    path: str,
    query_terms: DataFrame,
    k: int = 5,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k per query over a persisted index, reading only the buckets
    the query terms hash to.

    The bucket count comes from the INDEX's own ``_stats`` stamp (see
    write_bm25_index) — never from a caller parameter, so a probe can't
    hash terms against a different layout than the one on disk and
    silently read the wrong (or no) postings.

    The probed bucket set is collected from the QUERY side — small by
    contract (a probe batch, not a corpus) — and pushed into both scans
    as an ``isin`` partition filter, so the postings read is
    |query buckets| / n_buckets of the index regardless of corpus size.

    The query plan is pinned (loop_cache) before the bucket collect:
    without it the query DERIVATION — which in t25/pipe7-shaped use is a
    corpus-sized tokenize/explode/distinct — would execute twice, once
    for the bucket list and again inside the scoring join. The collected
    stats row is likewise re-injected as an in-plan literal rather than
    re-reading ``_stats`` at action time.
    """
    from ..functions.caching import loop_cache

    stats_rows = spark.read.parquet(f"{path}/_stats").collect()
    if not stats_rows:
        # write_bm25_index always writes exactly one stats row (a global
        # aggregate emits one row even for an empty corpus) — an empty
        # _stats means a corrupted or partially-written index; fail
        # loudly rather than serving an empty result
        raise ValueError(f"{path}/_stats is empty — corrupted index")
    srow = stats_rows[0].asDict()
    if srow.get("n_buckets") is None:
        raise ValueError(
            f"{path}/_stats carries no n_buckets stamp — not a "
            "write_bm25_index layout (or written by an older version); "
            "re-write the index"
        )
    n_buckets = int(srow["n_buckets"])
    stats = one_partition_df(
        spark,
        [(int(srow["n_docs"]), float(srow["avgdl"] or 0.0))],
        "n_docs long, avgdl double",
    )
    query_terms = loop_cache(query_terms, eager=True)
    buckets = [
        r["bucket"]
        for r in query_terms.select(
            _term_bucket(F.col("term"), n_buckets).alias("bucket")
        ).distinct().collect()
    ]
    tf = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("bucket").isin(buckets))
        .drop("bucket")
    )
    df = (
        spark.read.parquet(f"{path}/_df")
        .filter(F.col("bucket").isin(buckets))
        .drop("bucket")
    )
    return bm25_score_topk(tf, df, stats, query_terms, k=k, k1=k1, b=b)


# ---------------------------------------------------------------------------
# Incremental maintenance: tf rows are per-document (append-only — a new
# slice only ADDS rows), df is additive per term, and corpus stats are
# additive as (n_docs, total_len). So "update the index for today's
# documents" is a partial-aggregate MERGE, never a rebuild — the same
# mergeable-summaries property the sketch family (t20/t22) proves for
# HLL registers and bottom-k samples.
# ---------------------------------------------------------------------------
def term_stats_partial(doc_terms: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Per-slice partials: tf (final — doc-local), df_partial (term,
    df), stats_partial (n_docs, total_len). Merge with
    merge_bm25_partials."""
    tf, df, _ = term_stats(doc_terms)
    stats_partial = tf.groupBy().agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("tf").cast("long").alias("total_len"),
    )
    return tf, df, stats_partial


def merge_bm25_partials(
    tfs: list[DataFrame],
    dfs: list[DataFrame],
    stats_partials: list[DataFrame],
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Merge per-slice partials into the full index tables. df merges by
    SUM on term; stats merge as (sum n_docs, sum total_len) with avgdl
    recomposed EXACTLY as total_len / n_docs (an average is not
    mergeable, its (count, sum) decomposition is — the a14 rollup-
    cascade rule). tf rows concatenate (doc_ids are disjoint across
    slices by contract)."""
    import functools

    tf = functools.reduce(lambda a, b: a.unionByName(b), tfs)
    df = (
        functools.reduce(lambda a, b: a.unionByName(b), dfs)
        .groupBy("term").agg(F.sum("df").cast("long").alias("df"))
    )
    stats = (
        functools.reduce(lambda a, b: a.unionByName(b), stats_partials)
        .groupBy()
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            (
                F.sum("total_len").cast("double")
                / F.sum("n_docs").cast("double")
            ).alias("avgdl"),
        )
    )
    return tf, df, stats


# ---------------------------------------------------------------------------
# Streaming index maintenance: t26's merge algebra as a live store. Each
# arriving micro-batch of documents contributes its PARTIALS (tf rows —
# doc-local, so per-batch final — plus the additive df and (n_docs,
# total_len)); a probe merges the partials at read time. Because the
# merge is exact (t26, oracle-proven), the store answers queries
# IDENTICALLY to a from-scratch index over everything ingested so far —
# with per-day write cost O(slice), never a rebuild.
# ---------------------------------------------------------------------------
TF_SCHEMA = "doc_id long, term string, tf long, doc_len long"
DF_SCHEMA = "term string, df long"
STATS_SCHEMA = "n_docs long, total_len long"


class Bm25IndexStore(PartialAggStore):
    """Parquet-backed incremental BM25 index: t26's merge algebra as a
    live store on the generic exactly-once machinery
    (``operators/aggstore.py::PartialAggStore`` — per-batch atomic
    publish, watermarked compaction, interrupted-swap recovery, Hadoop
    FS reads; every crash point pinned in tests/test_bm25_store.py).

    Per-batch partials: ``tf`` rows are doc-local (batch-final), ``df``
    is additive per term, corpus stats are additive as (n_docs,
    total_len) — so a probe's read-time merge answers IDENTICALLY to a
    from-scratch index over everything ingested, with per-batch write
    cost O(slice), never a rebuild. Batches must carry disjoint doc_ids
    (the t26 contract — re-ingesting a document would double-count it
    in df/stats)."""

    TABLES = {
        "tf": TF_SCHEMA,
        "df_partial": DF_SCHEMA,
        "stats_partial": STATS_SCHEMA,
    }

    def partial_tables(self, batch: DataFrame) -> dict[str, DataFrame]:
        tf, df, stats = term_stats_partial(batch)
        return {"tf": tf, "df_partial": df, "stats_partial": stats}

    def fold(self, name: str, df: DataFrame) -> DataFrame:
        if name == "tf":
            return df  # doc-local rows: concatenation IS the merge
        if name == "df_partial":
            return df.groupBy("term").agg(
                F.sum("df").cast("long").alias("df")
            )
        return df.groupBy().agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("total_len").cast("long").alias("total_len"),
        )

    def index_tables(self) -> tuple[DataFrame, DataFrame, DataFrame]:
        """(tf, df, stats) merged across every applied batch — the t26
        partial-aggregate merge, evaluated lazily over the store's
        parquet. stats recomposes avgdl EXACTLY as total_len / n_docs
        (the a14 rule: an average is not mergeable, its (count, sum)
        decomposition is)."""
        tf = self.read_table("tf")
        df = self.fold("df_partial", self.read_table("df_partial"))
        stats = (
            self.read_table("stats_partial")
            .groupBy()
            .agg(
                F.sum("n_docs").cast("long").alias("n_docs"),
                (
                    F.sum("total_len").cast("double")
                    / F.sum("n_docs").cast("double")
                ).alias("avgdl"),
            )
        )
        return tf, df, stats

    def topk(
        self, query_terms: DataFrame, k: int = 5,
        k1: float = BM25_K1, b: float = BM25_B,
    ) -> DataFrame:
        tf, df, stats = self.index_tables()
        return bm25_score_topk(tf, df, stats, query_terms, k=k, k1=k1, b=b)


def bm25_index_stream(
    spark,
    input_dir: str,
    store_root: str,
    checkpoint: str,
    doc_schema: str = "doc_id long, lang string, text string",
    tokens_expr: str = "split(trim(lower(text)), '\\\\s+')",
):
    """Structured-Streaming front end for the incremental index: new
    document files land in ``input_dir``; each micro-batch is tokenized
    and its partials appended. availableNow + checkpoint resumes;
    the micro-batch id names the batch directory, so a retry after any
    partial failure is a no-op (the incremental_corpus_stream rule)."""
    stream = spark.readStream.schema(doc_schema).parquet(input_dir)

    def _process(batch: DataFrame, batch_id: int) -> None:
        doc_terms = (
            batch.withColumn("tokens", F.expr(tokens_expr))
            .filter(F.size("tokens") > 0)
            .select("doc_id", F.explode("tokens").alias("term"))
            .filter(F.col("term") != "")
        )
        Bm25IndexStore(batch.sparkSession, store_root).append(
            doc_terms, batch_id=batch_id
        )

    return (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_process)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: fuse independently-produced rankings (sparse BM25 +
# dense cosine being the canonical pair) with Reciprocal Rank Fusion
# (Cormack, Clarke & Buettner, SIGIR 2009 — the standard zero-training
# fusion rule every hybrid-search system ships). RRF needs only the
# RANKS, never the incomparable raw scores, which is exactly why it
# composes the engine's lexical (t23) and vector (v1) families without
# any score calibration.
# ---------------------------------------------------------------------------
RRF_K = 60  # the paper's constant: dampens rank-1 dominance


def rrf_fuse(
    rankings: list[DataFrame], k: int = 5, rrf_k: int = RRF_K
) -> DataFrame:
    """Fuse per-query rankings — each (query_id, doc_id, rank) — into
    top-k by summed reciprocal rank 1/(rrf_k + rank).

    Scale shape: each input is already a per-query top-k (bounded:
    queries x k rows per side), so the union + (query, doc) partial agg
    + per-QUERY rank window all run on probe-sized data — the fusion
    layer adds no corpus-sized work to either retrieval chain.

    Determinism / oracle parity: contributions are exact dyadic-free
    doubles 1/(rrf_k + rank) summed over <= len(rankings) terms; the
    fused ordering rounds to 9 dp first (ties are COMMON — a doc seen
    by one side only, at the same rank, produces exactly equal sums)
    with doc_id ascending as the final tie-break, the bm25_score_topk
    convention."""
    import functools

    contribs = [
        r.select(
            "query_id", "doc_id",
            (F.lit(1.0) / (F.lit(rrf_k) + F.col("rank"))).alias("contrib"),
        )
        for r in rankings
    ]
    fused = (
        functools.reduce(lambda a, b: a.unionByName(b), contribs)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("rrf"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(rnd(F.col("rrf"), 9)), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", rnd("rrf", 6).alias("rrf"))
    )
