"""Incremental corpus pipeline: dedup NEW documents against persisted state.

The batch corpus pipeline (catalog pipe2, ``catalog/text.py``) is a
whole-corpus rerun; a production 100 TB pipeline ingests a daily slice and
must dedup it against everything already accepted WITHOUT re-reading the
corpus text. This module provides that incremental path:

- ``process_corpus_batch`` — the pure-DataFrame batch step: quality-filter
  the new slice, exact-dedup it (within the slice and against the store's
  content hashes), near-dedup it (MinHash banding within the slice and
  against the store's band table, true-Jaccard verification against the
  store's shingle table), and emit the state delta to persist.
- ``CorpusStore`` — a parquet-backed store of that state (doc metadata +
  content hash, shingle sets, LSH band keys). Only DERIVED state is kept;
  the raw text never needs to be re-read.
- ``incremental_corpus_stream`` — the Structured Streaming wrapper:
  ``readStream`` over a document directory, ``foreachBatch`` into
  ``process_corpus_batch`` + ``CorpusStore.append``.

Equivalence guarantee (pytest-proven in ``tests/test_incremental_corpus.py``
and oracle-checked via catalog pipe3): if documents arrive in increasing
``doc_id`` order across batches, the union of per-batch survivors equals
the batch pipeline's survivors over the full corpus. The key invariant is
that the store keeps shingles/bands for EVERY exact-dedup survivor — also
the near-dup LOSERS — because the batch greedy rule
(``dedup.drop_near_duplicates``) lets a dropped document still eliminate a
later one.

Scale shape (state, not text): per stored doc the state is one hash row,
~n_tokens shingle rows, and 4 band rows. The per-batch work is
  - one broadcast-or-shuffle anti join on content_hash (exact),
  - one equi-join of the batch's bands against the store's bands
    (candidates; selective composite key, never a cross product),
  - shingle-intersection verification restricted to candidate pairs.
At 100 TB the store's bands/shingles tables would be bucketed by their
join key (band_key / doc_id) so the per-day join co-locates without a
store-side shuffle; parquet append keeps the daily write O(slice).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.caching import loop_cache, stage_cache

from ..functions.textstats import symbol_ratio
from .dedup import (
    _attach_jaccard,
    band_table,
    explode_shingles,
    minhash_signatures,
)

N_HASHES = 16
BAND_SIZE = 4
SHINGLE_N = 3
JACCARD_THRESHOLD = 0.5

# quality thresholds — identical to catalog pipe2 stage 1
_TOK_MIN, _TOK_MAX = 5, 5000
_MTL_MIN, _MTL_MAX = 2.0, 12.0
_SYMBOL_MAX = 0.3

DOCS_SCHEMA = (
    "doc_id long, lang string, n_tokens int, n_sh long, "
    "content_hash string, survivor boolean"
)
SHINGLES_SCHEMA = "doc_id long, shingle string"
BANDS_SCHEMA = "doc_id long, band_id int, band_key string"


def quality_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stage-1 quality rules, exactly pipe2's: token-count bounds, mean
    token length, symbol ratio, and an English-stopword hit. Adds
    ``tokens`` / ``n_tokens`` columns; all built-ins, no Python."""
    d = (
        df.filter(F.length(text_col) > 0)
        .withColumn("tokens", F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
        .withColumn("n_tokens", F.size("tokens"))
        .filter(F.col("n_tokens") > 0)
    )
    total_len = F.expr(
        "aggregate(transform(tokens, t -> length(t)), 0, (acc, x) -> acc + x)"
    )
    mean_tok_len = total_len.cast("double") / F.col("n_tokens")
    has_stopword = (
        F.regexp_count(F.lower(F.col(text_col)), F.lit(r"\b(the|a|of|and|is)\b")) > 0
    )
    return d.filter(
        F.col("n_tokens").between(_TOK_MIN, _TOK_MAX)
        & mean_tok_len.between(_MTL_MIN, _MTL_MAX)
        & (symbol_ratio(F.col(text_col)) < _SYMBOL_MAX)
        & has_stopword
    )


def _band_table(sig: DataFrame) -> DataFrame:
    """The SHARED banding from ``dedup.band_table`` (one definition for
    batch and incremental), with band_id narrowed to the store schema."""
    return band_table(sig, N_HASHES, BAND_SIZE).withColumn(
        "band_id", F.col("band_id").cast("int")
    )


def process_corpus_batch(
    batch: DataFrame,
    store_docs: DataFrame | None,
    store_shingles: DataFrame | None,
    store_bands: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, DataFrame]:
    """One incremental step. ``batch`` must carry (doc_id, lang, text) with
    doc_ids strictly greater than everything in the store (arrival order =
    id order; the id comparison resolves ordering within the batch).

    Returns ``{"docs", "shingles", "bands"}`` — the state delta: one
    ``docs`` row per exact-dedup survivor (``survivor`` marks near-dup
    winners), plus its shingle and band rows. Callers persist the delta
    (``CorpusStore.append``) before the next batch.
    """
    kept = quality_filter(batch, text_col)

    # exact dedup — md5(text), pipe2 stage-2 identity: min id within the
    # batch, anti join against every hash the store has seen
    w = Window.partitionBy("content_hash").orderBy(id_col)
    uniq = (
        kept.withColumn("content_hash", F.md5(F.col(text_col)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col(id_col).alias("doc_id"),
            "lang",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            "content_hash",
            text_col,
        )
    )
    if store_docs is not None:
        uniq = uniq.join(
            store_docs.select("content_hash"), "content_hash", "left_anti"
        )
    # fan-out head (guide §2.4): uniq feeds the shingle explode AND the
    # meta/docs-delta branch — without the pin each consumer re-runs the
    # quality regexes + the content-hash window over the slice (the same
    # reasoning as the sh pin below, which this function already had)
    uniq = stage_cache(uniq)

    # derived near-dup state for the batch's uniq docs. Uncapped shingles
    # (max_shingle_df needs corpus-global doc frequencies — not
    # incrementally computable without a store-wide rescan).
    sh = stage_cache(explode_shingles(uniq, "doc_id", text_col, SHINGLE_N))
    sig = minhash_signatures(sh, N_HASHES)
    # bands feeds both sides of the within-batch self-join, the
    # store-vs-batch join, and the persisted delta — pin it so the
    # signature aggregation (16 min-aggs + band md5s) runs once per slice
    bands = stage_cache(_band_table(sig))
    n_sh = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    meta = uniq.drop(text_col).join(n_sh, "doc_id", "left").fillna(0, ["n_sh"])

    # candidates: batch-vs-batch (lower id is doc_a) + store-vs-batch
    # (store doc is always doc_a: its id precedes every batch id)
    within = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    if store_bands is not None:
        cross = (
            store_bands.alias("s")
            .join(
                bands.alias("b"),
                (F.col("s.band_id") == F.col("b.band_id"))
                & (F.col("s.band_key") == F.col("b.band_key")),
            )
            .select(
                F.col("s.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
        )
        cand = within.unionByName(cross).distinct()
    else:
        cand = within.distinct()

    # verification: true Jaccard over the union of stored + batch shingles,
    # restricted to candidate pairs
    all_sh = (
        sh if store_shingles is None else store_shingles.unionByName(sh)
    )
    inter = (
        cand.join(all_sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            all_sh.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    counts = meta.select("doc_id", "n_sh")
    if store_docs is not None:
        counts = store_docs.select("doc_id", "n_sh").unionByName(counts)
    pairs = _attach_jaccard(inter, counts, JACCARD_THRESHOLD)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()

    docs_delta = meta.join(
        losers.withColumn("__lost", F.lit(True)), "doc_id", "left"
    ).select(
        "doc_id",
        "lang",
        "n_tokens",
        "n_sh",
        "content_hash",
        F.coalesce(~F.col("__lost"), F.lit(True)).alias("survivor"),
    )
    return {"docs": docs_delta, "shingles": sh, "bands": bands}


class CorpusStore:
    """Parquet-backed incremental-dedup state under ``root/batches/``:
    one directory per applied batch, each holding ``docs/`` ``shingles/``
    ``bands/`` (schemas above); a table read is one multi-path parquet
    scan over the per-batch subdirectories. Text is never stored — only
    the hashes, shingles, and band keys dedup needs.

    The per-batch directory is the EXACTLY-ONCE unit: a delta's three
    tables are written to one staging directory and published together
    with ONE atomic rename to ``batches/<id>``, so a foreachBatch retry
    either sees the complete batch (no-op) or none of it (clean
    re-append) — never a partial one (the failure mode three independent
    parquet appends had)."""

    _TABLES = ("docs", "shingles", "bands")

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._batches_dir = os.path.join(root, "batches")

    def applied_batch_ids(self) -> list[int]:
        # loud error, not silent reset: a store written by the pre-batch
        # layout (root/docs|shingles|bands) would otherwise read as empty
        # and forget every accepted document
        if os.path.isdir(os.path.join(self.root, "docs")):
            raise ValueError(
                f"{self.root} uses the legacy per-table layout; rebuild "
                "the store (re-run the batches) before appending with "
                "the batches/<id> layout."
            )
        if not os.path.isdir(self._batches_dir):
            return []
        return sorted(
            int(e) for e in os.listdir(self._batches_dir) if not e.startswith(("_", "."))
        )

    def _read(self, name: str, schema: str) -> DataFrame:
        paths = [
            os.path.join(self._batches_dir, str(b), name)
            for b in self.applied_batch_ids()
        ]
        paths = [p for p in paths if os.path.isdir(p)]
        if not paths:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*paths)

    def docs(self) -> DataFrame:
        return self._read("docs", DOCS_SCHEMA)

    def shingles(self) -> DataFrame:
        return self._read("shingles", SHINGLES_SCHEMA)

    def bands(self) -> DataFrame:
        return self._read("bands", BANDS_SCHEMA)

    def is_empty(self) -> bool:
        return not self.applied_batch_ids()

    def survivors(self) -> DataFrame:
        return self.docs().filter(F.col("survivor"))

    def append(
        self, delta: dict[str, DataFrame], batch_id: int | None = None
    ) -> bool:
        """Persist a batch delta exactly once: all three tables land in
        one staging directory (idempotent overwrite), and a single atomic
        rename publishes them as ``batches/<id>``. The delta plans
        lazily READ this store's parquet — the staging writes fully
        materialize them before the rename mutates anything, so callers
        must not re-execute the delta plans after a successful append.
        Returns False — having written nothing — when that batch id is
        already published (the retry no-op)."""
        # applied_batch_ids() also validates the layout (a legacy
        # per-table store raises) — run it even with an explicit id so a
        # direct append can't corrupt a store a read would refuse
        applied = self.applied_batch_ids()
        bid = batch_id if batch_id is not None else (applied or [-1])[-1] + 1
        final = os.path.join(self._batches_dir, str(bid))
        if os.path.isdir(final):
            return False
        # LAZY pin: the three tables share the quality/shingle upstream
        # (a fan-out head — without the pin each write recomputes it),
        # and nothing mutates until the rename below, so the eager
        # materialization the old in-place append needed is not required
        pinned = {
            name: loop_cache(df) for name, df in delta.items()
        }
        staging = os.path.join(self.root, f"_staging_batch_{bid}")
        for name in self._TABLES:
            pinned[name].write.mode("overwrite").parquet(
                os.path.join(staging, name)
            )
        from ..sources.writers import atomic_rename_dir

        return atomic_rename_dir(self.spark, staging, final)

    def process_and_append(
        self, batch: DataFrame, batch_id: int | None = None
    ) -> None:
        """Dedup one arriving batch against the store and publish the
        delta. A replay of an already-applied ``batch_id`` is a complete
        no-op (nothing recomputed, nothing written)."""
        if batch_id is not None and batch_id in set(self.applied_batch_ids()):
            return
        empty = self.is_empty()
        delta = process_corpus_batch(
            batch,
            None if empty else self.docs(),
            None if empty else self.shingles(),
            None if empty else self.bands(),
        )
        self.append(delta, batch_id=batch_id)


def incremental_corpus_stream(
    spark: SparkSession,
    input_dir: str,
    store_root: str,
    checkpoint: str,
    doc_schema: str = "doc_id long, lang string, text string",
    max_files_per_trigger: int | None = None,
):
    """Structured-Streaming front end: new document files land in
    ``input_dir``; each micro-batch is deduped against the store and the
    state delta appended. ``availableNow`` + checkpoint makes reruns
    resume where they left off. EXACTLY-ONCE: the micro-batch id (stable
    across retries by Structured Streaming's contract) names the batch
    directory and the atomic-rename publish in ``CorpusStore.append``
    makes a retry after any partial failure a no-op — replay-pinned in
    tests/test_incremental_corpus.py.
    """
    reader = spark.readStream.schema(doc_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def _process(batch: DataFrame, batch_id: int) -> None:
        CorpusStore(batch.sparkSession, store_root).process_and_append(
            batch, batch_id=batch_id
        )

    return (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_process)
        .trigger(availableNow=True)
        .start()
    )
