"""Incremental semantic dedup: new embeddings deduped against a persisted
IVF index (the vector twin of ``operators/incremental.py``).

The batch SemDeDup entries (catalog v10/v12) are whole-corpus reruns; a
production embedding pipeline ingests a daily slice of vectors and must
drop the ones semantically duplicating anything already accepted WITHOUT
re-scoring the full corpus. This module provides that path:

- ``process_vector_batch`` — assign the arriving vectors to the FIXED
  persisted centroids (``similarity.ivf_assign`` — map-side, no shuffle),
  then apply the SemDeDup greedy rule inside each list: a batch vector is
  dropped iff a lower-id list-mate (already-stored OR earlier in the
  batch) sits at cosine >= tau. Emits the state delta to persist.
- ``VectorStore`` — parquet state in the ``write_ivf_index`` layout
  (vectors partitioned by ``list_id`` + a ``_centroids`` side table), so
  ``similarity.probe_ivf_index`` can serve ANN queries off the SAME
  directory the dedup maintains. DROPPED vectors are stored too (marked
  ``kept=false``): the greedy rule is one-shot pairwise, so a dropped
  vector can still eliminate a later near-twin of itself.

Equivalence guarantee (the pipe3 invariant, proven by catalog pipe4's
oracle and ``tests/test_incremental_vectors.py``): if vectors arrive in
increasing ``vec_id`` order across batches, the union of per-batch deltas
is ROW-IDENTICAL to the one-shot computation "assign everything to the
same centroids, greedy-drop within lists" — because per-vector assignment
is independent and dropped(v) only quantifies over ids < v, all of which
are in the store when v arrives.

Scale shape: the store is never shuffled — the batch side of the
store-vs-batch pair join is broadcast (a daily slice is bounded by
construction), so the join is one map-side pass over exactly the store
lists the batch touches; with the store partitioned by ``list_id`` on
disk, partition pruning skips every untouched list. Per-batch cost is
O(|touched lists|), not O(store). Centroids are FIXED between re-trains
(standard IVF practice); as lists grow past the SemDeDup block target the
operator reports list occupancy (``list_occupancy``) so the pipeline can
schedule a re-train + one-shot re-dedup (catalog v10) instead of letting
the per-list pair work creep quadratic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.caching import loop_cache, stage_cache
from ..functions.rounding import rnd
from .similarity import SEM_TAU, cosine, ivf_assign, ivf_centroids

#: SemDeDup cosine threshold — ``similarity.SEM_TAU``, the same constant
#: catalog v10/v12 interpolate into their oracles (re-exported under the
#: module's historic name).
TAU = SEM_TAU

VECTORS_SCHEMA = "vec_id long, emb array<double>, list_id long, kept boolean"


def process_vector_batch(
    batch: DataFrame,
    centroids,
    store_vectors: DataFrame | None,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    tau: float = TAU,
    broadcast_batch: bool = True,
) -> DataFrame:
    """One incremental step. ``batch`` must carry (vec_id, emb) with ids
    strictly greater than everything in the store (arrival order = id
    order; the id comparison resolves ordering within the batch).
    ``centroids`` is the persisted (list_id, centroid) table or collected
    rows — FIXED, never re-trained here.

    Returns the delta in ``VECTORS_SCHEMA``: every batch vector with its
    list and ``kept`` flag (false = semantically duplicates a lower-id
    vector). Callers persist the delta (``VectorStore.append``) before
    the next batch."""
    assigned = stage_cache(
        ivf_assign(batch, centroids, id_col=id_col, vec_col=vec_col)
    )
    newer = assigned.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("emb_b"), "list_id"
    )
    older = assigned.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("emb_a"), "list_id"
    )
    if store_vectors is not None:
        older = older.unionByName(
            store_vectors.select(
                F.col(id_col).alias("id_a"),
                F.col(vec_col).alias("emb_a"),
                "list_id",
            )
        )
    # batch side broadcast (default): a DAILY slice is bounded by
    # construction, the store is not — broadcasting the batch keeps the
    # store un-shuffled (map-side join over only the lists the batch
    # touches). Callers whose "batches" GROW with the corpus (e.g. the
    # pipe4 catalog replay, which slices the whole corpus in 3) must pass
    # broadcast_batch=False: a growing broadcast is the j9 bug class, and
    # the shuffle_hash fallback keeps the plan size-independent.
    newer_side = F.broadcast(newer) if broadcast_batch else newer.hint(
        "shuffle_hash"
    )
    dropped = (
        older.join(newer_side, "list_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            rnd(cosine(F.col("emb_a"), F.col("emb_b")), 6) >= F.lit(tau)
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )
    return assigned.join(dropped, id_col, "left").select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("emb"),
        "list_id",
        F.col("__dropped").isNull().alias("kept"),
    )


class VectorStore:
    """Parquet-backed incremental semantic-dedup state under ``root/``:
    ``vectors/`` (partitioned by ``list_id``, ``VECTORS_SCHEMA``) and
    ``_centroids/`` — the same layout ``similarity.write_ivf_index``
    produces, so ANN probes (``probe_ivf_index``) read the live store."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._vec_dir = os.path.join(root, "vectors")
        self._cent_dir = os.path.join(root, "vectors", "_centroids")

    # -- state ------------------------------------------------------------
    def is_initialized(self) -> bool:
        return os.path.isdir(self._cent_dir)

    def centroids(self) -> DataFrame:
        return self.spark.read.parquet(self._cent_dir)

    def vectors(self) -> DataFrame:
        # schema pinned: an empty store reads as an empty frame; list_id
        # comes back as the partition column and is cast to the schema
        if not self._has_vectors():
            return self.spark.createDataFrame([], VECTORS_SCHEMA)
        return (
            self.spark.read.parquet(self._vec_dir)
            .withColumn("list_id", F.col("list_id").cast("long"))
            .select("vec_id", "emb", "list_id", "kept")
        )

    def survivors(self) -> DataFrame:
        return self.vectors().filter(F.col("kept"))

    def list_occupancy(self) -> DataFrame:
        """(list_id, n_vectors) — the re-train signal: lists far above the
        SemDeDup block target mean the fixed quantizer has aged out."""
        return self.vectors().groupBy("list_id").agg(
            F.count(F.lit(1)).alias("n_vectors")
        )

    # -- lifecycle --------------------------------------------------------
    def initialize(
        self, train: DataFrame, n_lists: int, n_iter: int = 2
    ) -> None:
        """Train the coarse quantizer ONCE (deterministic Lloyd, same as
        catalog v10) and persist it; the store starts empty."""
        cents = ivf_centroids(train, n_lists=n_lists, n_iter=n_iter)
        cents.coalesce(1).write.mode("overwrite").parquet(self._cent_dir)

    def append(self, delta: DataFrame) -> None:
        """Persist a batch delta. Pinned lineage-truncating first (the
        delta plan lazily reads this store's parquet — a recompute after
        the append would see the mutated directory; same invariant as
        ``incremental.CorpusStore.append``)."""
        pinned = loop_cache(delta, eager=True)
        pinned.write.mode("append").partitionBy("list_id").parquet(
            self._vec_dir
        )

    def process_and_append(self, batch: DataFrame, **kwargs) -> DataFrame:
        """Dedup one arriving batch against the store; returns the delta
        that was appended (callers read ``kept`` off it). ``kwargs`` pass
        through to :func:`process_vector_batch` — in particular
        ``broadcast_batch=False`` when batches grow with the corpus (a
        growing driver-side broadcast is the j9 bug class; pipe4 sets it)
        and ``tau`` for a non-default dedup threshold."""
        store = None if not self._has_vectors() else self.vectors()
        delta = process_vector_batch(batch, self.centroids(), store, **kwargs)
        self.append(delta)
        return delta

    def _has_vectors(self) -> bool:
        return os.path.isdir(self._vec_dir) and any(
            e.startswith("list_id=") for e in os.listdir(self._vec_dir)
        )


def incremental_vector_stream(
    spark: SparkSession,
    input_dir: str,
    store_root: str,
    checkpoint: str,
    vec_schema: str = "vec_id long, emb array<double>",
    max_files_per_trigger: int | None = None,
    **process_kwargs,
):
    """Structured-Streaming front end: new embedding files land in
    ``input_dir``; each micro-batch is deduped against the store and the
    delta appended. The store must be ``initialize``-d first (the coarse
    quantizer is trained out-of-band, never inside a micro-batch). Same
    exactly-once caveat as ``incremental_corpus_stream``: a foreachBatch
    retry after a partial append could double-write a delta; production
    would MERGE on vec_id or write batch-id-named files."""
    reader = spark.readStream.schema(vec_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def _process(batch: DataFrame, _batch_id: int) -> None:
        VectorStore(batch.sparkSession, store_root).process_and_append(
            batch, **process_kwargs
        )

    return (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_process)
        .trigger(availableNow=True)
        .start()
    )
