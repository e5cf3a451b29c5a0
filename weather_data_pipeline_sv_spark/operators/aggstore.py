"""Generic exactly-once partial-aggregate store.

The engine's incremental family keeps converging on one storage shape:
a batch of input contributes PARTIAL aggregate tables (doc-local rows
are per-batch final; counts/sums are additive), a probe merges the
partials at read time, and the merge being exact (the t26/d12/pipe3
theorems, each oracle-proven) makes the live store answer IDENTICALLY
to a one-shot rebuild over everything ingested. This module is that
shape once, hardened, so each new incremental operator only declares
its tables and its merge.

Durability contract (grown over rounds 5-8, all crash points pinned in
tests/test_bm25_store.py and test_boilerplate_store.py):

- EXACTLY-ONCE appends: a batch's tables land in one staging directory
  and publish with a single atomic rename of ``batches/<id>``; a
  foreachBatch retry finds the directory and no-ops.
- WATERMARKED compaction: ``compact()`` folds every batch into one
  directory named after the HIGHEST folded id and stamps an empty
  ``_compacted_through_<id>`` marker inside the same staged directory,
  so fold + watermark publish in ONE swap; ``append()`` refuses ids at
  or below the watermark — a replay of a batch whose directory was
  folded away stays a no-op instead of double-counting.
- CRASH RECOVERY: every entry point first finishes an interrupted
  ``replace_dir`` swap (``batches/`` absent + ``batches.replaced``
  present -> restore the backup) instead of serving an empty store.
- All reads go through the Hadoop FileSystem API — the same lens the
  writers publish through — so local paths, HDFS, and rename-supporting
  object stores behave identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class PartialAggStore:
    """Parquet-backed incremental store under ``root/batches/``: one
    directory per applied batch, one sub-directory per partial table.

    Subclasses declare:

    - ``TABLES``: ``{table_name: schema_string}`` — the partial tables
      each batch publishes;
    - ``partial_tables(batch)``: input batch -> ``{name: DataFrame}``
      partials (doc-local rows final, additive columns as partials);
    - ``fold(name, df)``: the per-table compaction merge — MUST be the
      same algebra a probe applies at read time, so compaction is
      result-invisible (subclass probes are built on :meth:`read_table`
      outputs and re-apply the merge lazily).

    Batches must carry disjoint unit ids (the t26 contract — the store
    cannot un-count a re-ingested unit).
    """

    TABLES: dict[str, str] = {}
    _COMPACT_MARK = "_compacted_through_"

    def __init__(self, spark, root: str):
        self.spark = spark
        self.root = root
        self._batches_dir = root.rstrip("/") + "/batches"

    # -- subclass surface -------------------------------------------------
    def partial_tables(self, batch: DataFrame) -> dict[str, DataFrame]:
        raise NotImplementedError

    def fold(self, name: str, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    # -- filesystem plumbing (Hadoop FS, never os.*) ----------------------
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

    # -- ledger ------------------------------------------------------------
    def applied_batch_ids(self) -> list[int]:
        return sorted(
            int(e) for e in self._entries() if not e.startswith(("_", "."))
        )

    def compacted_through(self) -> int:
        """Highest batch id ever folded by :meth:`compact` (-1 if never
        compacted). The watermark is the NAME of an empty marker file
        published atomically with the fold — readable by a listing, no
        file-content reads, travels with the swap as one unit."""
        marks = [
            int(e[len(self._COMPACT_MARK):])
            for e in self._entries()
            if e.startswith(self._COMPACT_MARK)
        ]
        return max(marks, default=-1)

    # -- reads ---------------------------------------------------------------
    def read_table(self, name: str) -> DataFrame:
        """Concatenated partial rows of ``name`` across every applied
        batch (lazy; subclass probes apply the merge on top)."""
        fs = self._fs()
        paths = [
            f"{self._batches_dir}/{b}/{name}"
            for b in self.applied_batch_ids()
        ]
        paths = [p for p in paths if fs.exists(self._jpath(p))]
        if not paths:
            return self.spark.createDataFrame([], self.TABLES[name])
        return self.spark.read.schema(self.TABLES[name]).parquet(*paths)

    # -- writes --------------------------------------------------------------
    def append(self, batch: DataFrame, batch_id: int | None = None) -> bool:
        """Aggregate one batch's partials and publish them exactly once.
        Returns False (nothing written) when the batch id is already
        published — either its directory still exists, or it is at or
        below the compaction watermark (folded away, but no less
        published for it). That second branch keeps a foreachBatch
        retry a no-op even when :meth:`compact` ran between the batch's
        publish and the stream's checkpoint commit."""
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
        pinned = {
            name: loop_cache(df)
            for name, df in self.partial_tables(batch).items()
        }
        staging = f"{self.root.rstrip('/')}/_staging_batch_{bid}"
        for name in self.TABLES:
            pinned[name].write.mode("overwrite").parquet(
                f"{staging}/{name}"
            )
        return atomic_rename_dir(self.spark, staging, final)

    def compact(self) -> bool:
        """Fold every applied batch into a single ``batches/<hi>`` (hi =
        the highest folded id) via the subclass's per-table :meth:`fold`
        — the same merge a probe runs at read time, materialized once so
        read fan-in drops back to one directory per table. The rebuilt
        tables lazily READ the current batches; the staging write fully
        materializes them before the backup-rename swap
        (``sources.writers.replace_dir``) mutates anything, the swap
        keeps the old state recoverable at ``batches.replaced``, and the
        ``_compacted_through_<hi>`` watermark publishes inside the SAME
        swap (see :meth:`append` for why). No-op (False) when the store
        has one or zero batches. Run compaction out-of-band of probes
        (the VectorStore.retrain rule)."""
        from ..functions.caching import loop_cache
        from ..sources.writers import replace_dir

        applied = self.applied_batch_ids()
        if len(applied) <= 1:
            return False
        hi = applied[-1]
        staging = f"{self.root.rstrip('/')}/_compacting"
        for name in self.TABLES:
            folded = loop_cache(self.fold(name, self.read_table(name)))
            folded.write.mode("overwrite").parquet(f"{staging}/{hi}/{name}")
        if not self._fs().createNewFile(
            self._jpath(f"{staging}/{self._COMPACT_MARK}{hi}")
        ):
            raise IOError(f"could not stamp compaction watermark in {staging}")
        replace_dir(self.spark, staging, self._batches_dir)
        return True
