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
    tf, df, stats = term_stats(doc_terms)
    (
        tf.withColumn("bucket", _term_bucket(F.col("term"), n_buckets))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(f"{path}/postings")
    )
    (
        df.withColumn("bucket", _term_bucket(F.col("term"), n_buckets))
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
    stats = spark.createDataFrame(
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


class Bm25IndexStore:
    """Parquet-backed incremental BM25 index under ``root/batches/``:
    one directory per applied batch holding ``tf/`` ``df_partial/``
    ``stats_partial/``. The per-batch directory is the EXACTLY-ONCE
    unit (the CorpusStore rule): all three tables land in one staging
    directory and publish with a single atomic rename, so a
    foreachBatch retry either sees the whole batch (no-op) or none of
    it. Batches must carry disjoint doc_ids (the t26 contract —
    re-ingesting a document would double-count it in df/stats).

    Exactly-once survives compaction: :meth:`compact` folds the applied
    batches into a single directory NAMED AFTER THE HIGHEST FOLDED ID
    and stamps a ``_compacted_through_<id>`` watermark next to it, and
    :meth:`append` refuses any ``batch_id <= watermark`` — so a
    streaming retry of a batch whose directory was folded away is still
    a no-op instead of a double-count (the round-7 replay-after-
    compaction hole). All directory reads and existence checks go
    through the Hadoop FileSystem API — the same one the writers
    publish with — so the store behaves identically on local paths,
    HDFS, and rename-supporting object stores; every read entry point
    first runs :meth:`_recover`, which finishes an interrupted
    ``replace_dir`` swap (``batches/`` absent, ``batches.replaced``
    backup present) by restoring the backup rather than silently
    serving an empty store."""

    _TABLES = ("tf", "df_partial", "stats_partial")
    _COMPACT_MARK = "_compacted_through_"

    def __init__(self, spark, root: str):
        self.spark = spark
        self.root = root
        self._batches_dir = root.rstrip("/") + "/batches"

    # -- filesystem plumbing (Hadoop FS, never os.*: the write side
    # publishes through this API, so the read side must look through
    # the same lens or a non-local deployment reads an empty store) --
    def _jpath(self, p: str):
        return self.spark._jvm.org.apache.hadoop.fs.Path(p)

    def _fs(self):
        return self._jpath(self.root).getFileSystem(
            self.spark._jsc.hadoopConfiguration()
        )

    def _entries(self) -> list[str]:
        """Names of everything inside ``batches/`` (after crash
        recovery), [] when the store is empty."""
        self._recover()
        fs = self._fs()
        jb = self._jpath(self._batches_dir)
        if not fs.exists(jb):
            return []
        return [st.getPath().getName() for st in fs.listStatus(jb)]

    def _recover(self) -> None:
        """Finish an interrupted compaction swap. ``replace_dir`` has a
        window between its two renames where ``batches/`` is absent and
        the sole copy lives at ``batches.replaced``; a store that opens
        inside that window must restore the backup BEFORE any read or
        write — otherwise probes serve empty results and a subsequent
        append recreates ``batches/``, after which the next swap deletes
        the backup as stale and the pre-crash data is gone."""
        fs = self._fs()
        jb = self._jpath(self._batches_dir)
        jbak = self._jpath(self._batches_dir + ".replaced")
        if not fs.exists(jb) and fs.exists(jbak):
            if not fs.rename(jbak, jb):
                raise IOError(
                    f"restore of interrupted swap {self._batches_dir}"
                    f".replaced failed"
                )

    def applied_batch_ids(self) -> list[int]:
        return sorted(
            int(e) for e in self._entries() if not e.startswith(("_", "."))
        )

    def compacted_through(self) -> int:
        """Highest batch id ever folded by :meth:`compact` (-1 if the
        store was never compacted). The watermark is the NAME of an
        empty marker file published atomically with the fold, so it
        needs no file-content read and survives the swap as one unit."""
        marks = [
            int(e[len(self._COMPACT_MARK):])
            for e in self._entries()
            if e.startswith(self._COMPACT_MARK)
        ]
        return max(marks, default=-1)

    def _read(self, name: str, schema: str) -> DataFrame:
        fs = self._fs()
        paths = [
            f"{self._batches_dir}/{b}/{name}"
            for b in self.applied_batch_ids()
        ]
        paths = [p for p in paths if fs.exists(self._jpath(p))]
        if not paths:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*paths)

    def index_tables(self) -> tuple[DataFrame, DataFrame, DataFrame]:
        """(tf, df, stats) merged across every applied batch — the t26
        partial-aggregate merge, evaluated lazily over the store's
        parquet."""
        tf = self._read("tf", TF_SCHEMA)
        df = (
            self._read("df_partial", DF_SCHEMA)
            .groupBy("term").agg(F.sum("df").cast("long").alias("df"))
        )
        stats = (
            self._read("stats_partial", STATS_SCHEMA)
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

    def append(
        self, doc_terms: DataFrame, batch_id: int | None = None
    ) -> bool:
        """Aggregate one batch's partials and publish them exactly once.
        Returns False (nothing written) when the batch id is already
        published — either its directory still exists, or it is at or
        below the compaction watermark (its directory was folded away,
        but the batch is no less published for it). That second branch
        is what keeps a foreachBatch retry a no-op even when
        :meth:`compact` ran between the batch's publish and the
        stream's checkpoint commit."""
        from ..functions.caching import loop_cache
        from ..sources.writers import atomic_rename_dir

        applied = self.applied_batch_ids()
        mark = self.compacted_through()
        bid = (
            batch_id
            if batch_id is not None
            else max(applied + [mark, -1]) + 1
        )
        if bid <= mark:
            return False  # folded into the compacted directory: replay no-op
        final = f"{self._batches_dir}/{bid}"
        if self._fs().exists(self._jpath(final)):
            return False
        tf, df, stats = term_stats_partial(doc_terms)
        pinned = {
            "tf": loop_cache(tf),
            "df_partial": loop_cache(df),
            "stats_partial": loop_cache(stats),
        }
        staging = f"{self.root.rstrip('/')}/_staging_batch_{bid}"
        for name in self._TABLES:
            pinned[name].write.mode("overwrite").parquet(
                f"{staging}/{name}"
            )
        return atomic_rename_dir(self.spark, staging, final)

    def compact(self) -> bool:
        """Fold every applied batch into a single ``batches/<hi>`` (hi =
        the highest folded id) — the 1000-batch answer: the same merge
        algebra a probe runs at read time (tf rows concatenate;
        df_partial sums by term; stats_partial sums), materialized once
        so read fan-in drops back to one directory per table. The fold
        publishes a ``_compacted_through_<hi>`` watermark marker IN THE
        SAME atomic swap, and :meth:`append` refuses ids at or below it
        — without that, a streaming batch that was published but whose
        checkpoint commit crashed before compaction would find its
        directory gone on replay and re-append, double-counting its
        documents in df/n_docs/total_len.

        The rebuilt tables lazily READ the current batches; the staging
        write below fully materializes them before the backup-rename
        swap (``sources.writers.replace_dir``) mutates anything, so a
        crash before the swap leaves the store untouched, the swap
        itself keeps the old state recoverable at ``batches.replaced``,
        and :meth:`_recover` finishes a swap that died between the two
        renames (run compaction out-of-band of probes, the
        VectorStore.retrain rule). No-op (False) when the store has one
        or zero batches. Subsequent appends continue the exactly-once
        sequence above the watermark."""
        from ..functions.caching import loop_cache
        from ..sources.writers import replace_dir

        applied = self.applied_batch_ids()
        if len(applied) <= 1:
            return False
        hi = applied[-1]
        tf = loop_cache(self._read("tf", TF_SCHEMA))
        dfp = loop_cache(
            self._read("df_partial", DF_SCHEMA)
            .groupBy("term").agg(F.sum("df").cast("long").alias("df"))
        )
        stp = loop_cache(
            self._read("stats_partial", STATS_SCHEMA)
            .groupBy()
            .agg(
                F.sum("n_docs").cast("long").alias("n_docs"),
                F.sum("total_len").cast("long").alias("total_len"),
            )
        )
        staging = f"{self.root.rstrip('/')}/_compacting"
        for name, d in (("tf", tf), ("df_partial", dfp), ("stats_partial", stp)):
            d.write.mode("overwrite").parquet(f"{staging}/{hi}/{name}")
        # the watermark travels inside the staged directory so fold +
        # mark publish as ONE rename — no window where the fold is live
        # but the watermark is not
        if not self._fs().createNewFile(
            self._jpath(f"{staging}/{self._COMPACT_MARK}{hi}")
        ):
            raise IOError(f"could not stamp compaction watermark in {staging}")
        replace_dir(self.spark, staging, self._batches_dir)
        return True




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
