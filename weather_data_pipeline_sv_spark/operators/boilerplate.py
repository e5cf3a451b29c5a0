"""Streaming incremental boilerplate detection: d12's merge algebra as
a live store.

The C4/RefinedWeb "repeated across too many pages" rule (catalog d11,
`operators/dedup.py::boilerplate_report`) has a corpus-RELATIVE
threshold — max(min_df, ceil(frac * n_docs)) — so naively it needs the
whole corpus per update. But its inputs are pure partial aggregates
(d12's oracle-proven decomposition): shingle document-frequency is
additive per shingle, per-doc shingle counts are doc-local (per-batch
final), and n_docs is additive. So each arriving micro-batch of
documents appends its PARTIALS and the report recomputes from merged
stats — per-day write cost O(slice), never a corpus rescan; the only
full-width read at report time is the tiny-vocabulary semi-join back
to the RETAINED doc-shingle rows (the store's ``sh`` table, the tf
analogue in the BM25 store).

Built on ``PartialAggStore`` — the generic exactly-once machinery
(atomic per-batch publish, watermarked compaction, interrupted-swap
recovery, Hadoop FS reads); crash points pinned in
tests/test_boilerplate_store.py, mirrors of the BM25 store suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .aggstore import PartialAggStore
from .dedup import boilerplate_report

#: The CANONICAL d11/d12/store rule parameters — catalog/text.py's
#: _D11_* are imports of these (round-8 verdict #7: one definition, so
#: the oracle-checked batch entries and the live store cannot drift).
BOILER_MIN_DF = 5
BOILER_FRAC = 0.01


class BoilerplateStore(PartialAggStore):
    """Incremental store for the C4 boilerplate rule.

    ``append()`` takes DISTINCT (doc_id, shingle) rows of one batch of
    documents (the d2-family explode — ``operators/dedup.py::
    explode_shingles`` produces exactly this shape). Batches must carry
    disjoint doc_ids (the t26 contract).

    The ``sh`` table retains the per-doc shingle rows — corpus-sized,
    like the BM25 store's tf postings — because the rule's threshold is
    corpus-relative: when new batches move n_docs, which shingles count
    as boilerplate changes, and re-scoring needs each doc's shingles.
    ``df_partial`` and ``tot`` are the merged-at-read-time partials.
    """

    TABLES = {
        "sh": "doc_id long, shingle string",
        "df_partial": "shingle string, df long",
        "tot": "doc_id long, n_shingles long",
    }

    def partial_tables(self, batch: DataFrame) -> dict[str, DataFrame]:
        sh = batch.select("doc_id", "shingle")
        return {
            "sh": sh,
            "df_partial": sh.groupBy("shingle").agg(
                F.count(F.lit(1)).cast("long").alias("df")
            ),
            "tot": sh.groupBy("doc_id").agg(
                F.count(F.lit(1)).cast("long").alias("n_shingles")
            ),
        }

    def fold(self, name: str, df: DataFrame) -> DataFrame:
        if name == "df_partial":
            return df.groupBy("shingle").agg(
                F.sum("df").cast("long").alias("df")
            )
        return df  # sh and tot are doc-local: concatenation IS the merge

    def report(
        self, min_df: int = BOILER_MIN_DF, frac: float = BOILER_FRAC
    ) -> DataFrame:
        """Per-doc (n_shingles, n_boiler, boiler_ratio) over everything
        ingested so far — identical to the one-shot d11 computation over
        the union of all batches (the d12 theorem, pinned in tests)."""
        sh = self.read_table("sh")
        dfq = self.fold("df_partial", self.read_table("df_partial"))
        tot = self.read_table("tot")
        nd = tot.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        return boilerplate_report(sh, dfq, tot, nd, min_df, frac)


def boilerplate_stream(
    spark,
    input_dir: str,
    store_root: str,
    checkpoint: str,
    doc_schema: str = "doc_id long, lang string, text string",
    n: int = 3,
):
    """Structured-Streaming front end: new document files land in
    ``input_dir``; each micro-batch's distinct (doc, shingle) pairs are
    appended. availableNow + checkpoint resumes; the micro-batch id
    names the batch directory, so a retry after any partial failure is
    a no-op (the bm25_index_stream rule — including a retry of a batch
    whose directory was already folded away by ``compact()``)."""
    from .dedup import tokens, word_shingles

    stream = spark.readStream.schema(doc_schema).parquet(input_dir)

    def _process(batch: DataFrame, batch_id: int) -> None:
        tok = tokens(F.col("text"))
        sh = (
            batch.select(F.col("doc_id"), tok.alias("__tok"))
            .filter(F.size("__tok") >= n)
            .select(
                "doc_id",
                F.explode(word_shingles(F.col("__tok"), n)).alias("shingle"),
            )
        )
        BoilerplateStore(batch.sparkSession, store_root).append(
            sh, batch_id=batch_id
        )

    return (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_process)
        .trigger(availableNow=True)
        .start()
    )
