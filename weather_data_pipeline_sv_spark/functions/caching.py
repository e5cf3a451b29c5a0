"""Mid-plan materialization with a selectable durability mode.

Several catalog entries have a FAN-OUT HEAD: one expensive intermediate
(an IVF assignment, an exploded shingle set, a cleaned corpus) consumed by
2-4 downstream plan branches. Without materialization every consumer
recomputes the head — measured 2-5x end-to-end on the heavy vector/dedup
entries — so those sites pin the head via :func:`stage_cache`.

Three modes, chosen by ``SPARK_GRAFT_CACHE_MODE``:

``local`` (default)
    ``DataFrame.localCheckpoint`` — executor-local blocks, lineage
    truncated. Fastest, and the right call for the single-JVM bench/driver
    protocol. CAVEAT (round-3 ADVICE): on a real multi-executor cluster an
    executor loss makes the truncated plan unrecoverable (job retry, not
    recompute), and blocks persist for the session lifetime unless the
    caller unpersists — the bench's per-query GC handles that locally.
``persist``
    ``persist(StorageLevel.MEMORY_AND_DISK)`` — lineage retained, so an
    executor loss recomputes the lost blocks; the 100 TB default. The plan
    tree is NOT truncated, so iterative drivers (operators/graph.py) that
    checkpoint per round to bound plan growth still force ``local`` or
    ``reliable`` for their loop state. Blocks stay pinned for the session:
    call :func:`release_stage_caches` between units of work in long-lived
    sessions (the pinned frames are tracked for exactly that).
``reliable``
    ``DataFrame.checkpoint`` — blocks written to the fault-tolerant
    checkpoint dir (``SPARK_GRAFT_CHECKPOINT_DIR`` must point at shared
    storage, e.g. HDFS/S3); survives executor AND driver restarts.

All three are semantically identical (same rows, same schema); the mode
only trades recompute cost against fault tolerance, which is why a plain
env switch is safe.
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_MODES = ("local", "persist", "reliable")

#: Frames pinned by :func:`stage_cache` in ``persist`` mode, so long-lived
#: sessions can release them (``release_stage_caches``) without the
#: blunt ``spark.catalog.clearCache()``. ``local``/``reliable`` blocks are
#: not tracked: localCheckpoint blocks die with their RDD handles (the
#: bench's per-query gc releases them) and reliable checkpoints live on
#: shared storage by design.
_PERSISTED: list[DataFrame] = []


def release_stage_caches() -> int:
    """Unpersist every frame :func:`stage_cache` pinned in ``persist``
    mode this session; returns how many were released. Call between
    logical units in a long-lived session — without it MEMORY_AND_DISK
    blocks accumulate until ``spark.catalog.clearCache()`` happens to
    run (the bench does per query; library users must do one or the
    other themselves)."""
    n = len(_PERSISTED)
    for df in _PERSISTED:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing left to release
    _PERSISTED.clear()
    return n


def cache_mode() -> str:
    mode = os.environ.get("SPARK_GRAFT_CACHE_MODE", "local")
    if mode not in _MODES:
        raise ValueError(
            f"SPARK_GRAFT_CACHE_MODE={mode!r} not one of {_MODES}"
        )
    return mode


def stage_cache(df: DataFrame, eager: bool = False) -> DataFrame:
    """Materialize a fan-out head under the session's durability mode.

    ``eager=True`` forces computation now (callers that need a stable
    snapshot before mutating inputs, e.g. incremental state pinning);
    the default defers to first use like any lazy plan node.

    RETENTION: in ``persist`` mode blocks stay pinned for the session —
    nothing here unpersists (the consumers are lazy plan branches, so
    there is no safe release point inside the entry). Long-lived sessions
    that call catalog entries repeatedly should call
    :func:`release_stage_caches` (or ``spark.catalog.clearCache()``)
    between units of work. ``local`` mode has the same session-lifetime
    retention via localCheckpoint blocks, released when the Python/JVM
    DataFrame handles are gc'd (the bench forces that per query).
    """
    mode = cache_mode()
    if mode == "persist":
        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        _PERSISTED.append(out)
        if eager:
            out.count()
        return out
    if mode == "reliable":
        ckdir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
        sc = df.sparkSession.sparkContext
        # idempotent: first caller wins; checkpoint() raises if unset
        if ckdir and sc._jsc.sc().getCheckpointDir().isEmpty():
            sc.setCheckpointDir(ckdir)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def loop_cache(df: DataFrame, eager: bool = False) -> DataFrame:
    """Materialization for ITERATIVE loop state (label propagation,
    incremental stores): the plan must be truncated each round or analysis
    time grows with iteration count, so ``persist`` mode falls back to
    ``local`` here (with the executor-loss caveat) rather than silently
    building an ever-deeper tree. ``reliable`` mode is honored."""
    if cache_mode() == "reliable":
        return stage_cache(df, eager=eager)
    return df.localCheckpoint(eager=eager)
