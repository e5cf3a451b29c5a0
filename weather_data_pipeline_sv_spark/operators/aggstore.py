"""Generic exactly-once partial-aggregate store.

The engine's incremental family keeps converging on one storage shape:
a batch of input contributes PARTIAL aggregate tables (doc-local rows
are per-batch final; counts/sums are additive), a probe merges the
partials at read time, and the merge being exact (the t26/d12/pipe3
theorems, each oracle-proven) makes the live store answer IDENTICALLY
to a one-shot rebuild over everything ingested. This module is that
shape once, hardened, so each new incremental operator only declares
its tables and its merge.

Durability contract (grown over rounds 5-9, all crash points pinned in
tests/test_bm25_store.py, test_boilerplate_store.py and
test_store_lifecycle_invariants.py):

- EXACTLY-ONCE appends: a batch's tables land in one staging directory
  and publish with a single atomic rename of ``batches/<id>``; a
  foreachBatch retry finds the directory and no-ops. After publishing,
  ``append()`` VERIFIES the batch survived any concurrent compaction
  swap (waiting out the swap lock first) and republishes if the swap
  swallowed it — so an append that returns True is durable even when
  it raced ``compact()`` (round-8 verdict #3: the contract is enforced
  in-band, not left to out-of-band discipline).
- WATERMARKED compaction: ``compact()`` folds every batch into one
  directory named after the HIGHEST folded id and stamps an empty
  ``_compacted_through_<id>`` marker inside the same staged directory,
  so fold + watermark publish in ONE swap; ``append()`` refuses ids at
  or below the watermark — a replay of a batch whose directory was
  folded away stays a no-op instead of double-counting.
- SWAP/APPEND COORDINATION: ``compact()`` stages the fold from a FIXED
  batch-id snapshot, then takes a lock file for the (milliseconds-long)
  swap window, carries forward any batch published since the snapshot
  by COPYING its directory into the staged swap (copy, not rename — a
  crash mid-carry must leave the live ``batches/`` intact), swaps, and
  finally RECONCILES: before dropping the pre-swap backup it copies
  back any batch directory that raced past the carry listing. Appends
  wait on the lock both before publishing and in the post-publish
  verify, so the only append that can even enter the locked window is
  one whose lock-wait timed out against a stalled compactor — and the
  reconcile + republish still cover it. The enforced bound: an append
  is durable provided the compactor's locked window completes within
  ``_LOCK_WAIT_S`` OR the appender survives to run its post-publish
  verify — the standard lease-style guarantee, pinned in
  tests/test_store_lifecycle_invariants.py.
- CRASH RECOVERY: every entry point first finishes an interrupted
  ``replace_dir`` swap (``batches/`` absent + ``batches.replaced``
  present -> restore the backup) instead of serving an empty store;
  the restore WAITS OUT a held swap lock first (round-10: the same
  on-disk state is what a live swap looks like mid-window, and an
  eager restore would resurrect the pre-fold layout under the
  compactor — double-counting every folded batch once the install
  retry re-copied it next to the fold).
  ``compact()`` clears its own stale staging directory and stale lock
  at entry, so a compact that crashed after staging (fold dir + marker
  written, swap never ran) can never leak a second watermark into a
  later compact's swap — re-staging starts from an empty directory.
- All reads go through the Hadoop FileSystem API — the same lens the
  writers publish through — so local paths, HDFS, and rename-supporting
  object stores behave identically.

COMPACTION COST MODEL (100 TB note, round-8 verdict #8): ``fold()`` on
additive tables (df/stats partials) shrinks data and is always worth
materializing; on doc-local tables (tf/sh postings) fold IS
concatenation, so compaction rewrites the corpus-sized table for no
data reduction — its only benefit is collapsing read fan-in, and
read-side fan-in for parquet is one ``read.parquet(*paths)`` with a
bounded file listing, which stays cheap up to thousands of batch
directories. At scale, run ``compact()`` on a cadence sized to the
additive tables' growth (they are tiny), accept the doc-local rewrite
as the price of that cadence, or keep fan-in bounded by cadence alone;
a per-table partial compaction was considered and rejected — staging a
swap that renames live doc-local directories has a crash window where
the stale-staging cleanup would delete the sole copy.

CONCURRENCY LIMITS: one compactor at a time (compact() reclaims a
stale lock at entry, so two live concurrent compacts remain
out-of-band discipline — they'd fold the same snapshot anyway);
concurrent appends of DISTINCT batch ids are safe against each other
and against one compactor.
"""

from __future__ import annotations

import time

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
    _SWAP_LOCK = "_compact_swap.lock"
    #: post-publish verify: how long an append waits for an in-flight
    #: swap before assuming the lock is stale (a crashed compactor —
    #: in which case no swap is running and verifying is safe anyway)
    _LOCK_WAIT_S = 30.0
    _PUBLISH_ATTEMPTS = 5

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
        the backup as stale and the pre-crash data is gone.

        The same on-disk state is also what a LIVE swap looks like from
        the outside, so restoring is gated on the swap lock: while the
        lock is held this waits (bounded by ``_LOCK_WAIT_S``, mirroring
        :meth:`_await_swap_lock`) instead of renaming the backup out
        from under the compactor — an eager restore here would resurrect
        the pre-fold layout mid-swap, hand the compactor's install-retry
        loop already-folded batch directories to re-copy next to the
        fold (double-counting every pre-snapshot row), and strand the
        reconcile against a backup that no longer exists. Only a stale
        lock from a crashed compactor falls through the wait, and then
        restoring IS the right recovery."""
        fs = self._fs()
        jb = self._jpath(self._batches_dir)
        jbak = self._jpath(self._batches_dir + ".replaced")
        if fs.exists(jb) or not fs.exists(jbak):
            return
        if fs.exists(self._lock_jpath()):
            deadline = time.monotonic() + self._LOCK_WAIT_S
            while fs.exists(self._lock_jpath()):
                if time.monotonic() >= deadline:
                    break
                time.sleep(0.05)
            if fs.exists(jb) or not fs.exists(jbak):
                return  # the swap completed while we waited
        if not fs.rename(jbak, jb) and not fs.exists(jb):
            # a concurrent recoverer may win the rename — losing that
            # race is fine as long as batches/ is live again
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
    def _read_table_for(self, name: str, batch_ids: list[int]) -> DataFrame:
        """``name``'s partial rows concatenated across exactly
        ``batch_ids`` — the fixed-snapshot read :meth:`compact` folds
        from (a live re-listing there would let a concurrent append
        leak INTO the fold while also being carried forward = counted
        twice)."""
        fs = self._fs()
        paths = [f"{self._batches_dir}/{b}/{name}" for b in batch_ids]
        paths = [p for p in paths if fs.exists(self._jpath(p))]
        if not paths:
            return self.spark.createDataFrame([], self.TABLES[name])
        return self.spark.read.schema(self.TABLES[name]).parquet(*paths)

    def read_table(self, name: str) -> DataFrame:
        """Concatenated partial rows of ``name`` across every applied
        batch (lazy; subclass probes apply the merge on top)."""
        return self._read_table_for(name, self.applied_batch_ids())

    # -- writes --------------------------------------------------------------
    def _lock_jpath(self):
        return self._jpath(f"{self.root.rstrip('/')}/{self._SWAP_LOCK}")

    def _await_swap_lock(self) -> None:
        """Wait out an in-flight compaction swap (milliseconds-long
        window; bounded wait so a stale lock from a crashed compactor
        cannot wedge appends — with no live compactor there is no swap
        to race, so proceeding is safe)."""
        fs = self._fs()
        deadline = time.monotonic() + self._LOCK_WAIT_S
        while fs.exists(self._lock_jpath()):
            if time.monotonic() >= deadline:
                return
            time.sleep(0.05)

    def append(self, batch: DataFrame, batch_id: int | None = None) -> bool:
        """Aggregate one batch's partials and publish them exactly once.
        Returns False (nothing written) when the batch id is already
        published — either its directory still exists, or it is at or
        below the compaction watermark (folded away, but no less
        published for it). That second branch keeps a foreachBatch
        retry a no-op even when :meth:`compact` ran between the batch's
        publish and the stream's checkpoint commit.

        A True return is DURABLE against a concurrent compaction: after
        the atomic publish the append waits out any in-flight swap and
        verifies its directory survived (or was folded under the
        watermark); if the swap's backup-cleanup swallowed it, the
        pinned partials are republished. The batch is therefore never
        silently lost — the enforced half of the swap/append contract
        (the other half is compact()'s carry-forward)."""
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
        fs = self._fs()
        if fs.exists(self._jpath(final)):
            return False
        pinned = {
            name: loop_cache(df)
            for name, df in self.partial_tables(batch).items()
        }
        staging = f"{self.root.rstrip('/')}/_staging_batch_{bid}"
        for attempt in range(self._PUBLISH_ATTEMPTS):
            # don't publish INTO a locked swap window — wait it out
            # first (new publishes land in the post-swap layout; only a
            # stalled compactor's stale lock lets one through early,
            # and the reconcile/republish pair still covers that)
            self._await_swap_lock()
            for name in self.TABLES:
                pinned[name].write.mode("overwrite").parquet(
                    f"{staging}/{name}"
                )
            if not atomic_rename_dir(self.spark, staging, final):
                # final appeared between the existence check and the
                # rename: first attempt = genuine concurrent publish of
                # the same id (replay: no-op); a retry attempt = our own
                # earlier publish was restored/carried by the swap.
                # Either way the staging dir is now an orphan — drop it.
                fs.delete(self._jpath(staging), True)
                return attempt > 0
            # verify the publish survived any concurrent swap: wait out
            # the (very short) locked swap window, then check the only
            # two states that mean "published": the directory is live,
            # or a fold consumed it under the watermark.
            self._await_swap_lock()
            self._recover()
            if fs.exists(self._jpath(final)):
                return True
            if bid <= self.compacted_through():
                return True
            # the swap deleted our batch with its backup (published
            # after the compactor's carry-forward listing): republish
            # from the pinned partials.
        raise IOError(
            f"append of batch {bid} kept losing the race against "
            f"compaction swaps after {self._PUBLISH_ATTEMPTS} attempts"
        )

    def compact(self, carry_passes: int = 8) -> bool:
        """Fold every applied batch into a single ``batches/<hi>`` (hi =
        the highest folded id) via the subclass's per-table :meth:`fold`
        — the same merge a probe runs at read time, materialized once so
        read fan-in drops back to one directory per table.

        Protocol: (1) clear any stale staging/lock left by a crashed
        compact — re-staging from a dirty directory would publish a
        SECOND ``_compacted_through`` marker and double-count every
        pre-crash row; (2) snapshot the applied batch ids and stage the
        fold of exactly that snapshot (``_read_table_for``), stamping
        the ``_compacted_through_<hi>`` watermark inside the staged
        directory so fold + watermark publish in ONE swap (see
        :meth:`append` for why); (3) take the swap lock and CARRY
        FORWARD any batch published since the snapshot by copying its
        directory into the staged swap (copy, not rename — a crash
        mid-carry leaves the live store intact; carried batches stay
        un-folded, above the watermark, and fold next time); (4) the
        backup-rename swap (:meth:`_swap_with_reconcile`) installs the
        staged state — the old state stays recoverable at
        ``batches.replaced`` until the swap completes — and RECONCILES
        any batch directory found in the backup that is not part of the
        staged state (an append that raced past the carry listing) by
        copying it back BEFORE the backup is dropped. Appends racing
        the swap itself additionally self-heal via their post-publish
        verify. No-op (False) when the store has one or zero batches.
        Probes should still run out-of-band of compaction (a probe plan
        holding paths into the pre-swap layout can hit deleted files —
        the VectorStore.retrain rule); appends need no such discipline.
        """
        from ..functions.caching import loop_cache

        fs = self._fs()
        staging = f"{self.root.rstrip('/')}/_compacting"
        jstaging = self._jpath(staging)
        jlock = self._lock_jpath()
        fs.delete(jstaging, True)  # stale staging from a crashed compact
        fs.delete(jlock, False)    # stale lock from a crashed compact

        applied = self.applied_batch_ids()
        if len(applied) <= 1:
            return False
        hi = applied[-1]
        for name in self.TABLES:
            folded = loop_cache(
                self.fold(name, self._read_table_for(name, applied))
            )
            folded.write.mode("overwrite").parquet(f"{staging}/{hi}/{name}")
        if not fs.createNewFile(
            self._jpath(f"{staging}/{self._COMPACT_MARK}{hi}")
        ):
            raise IOError(f"could not stamp compaction watermark in {staging}")

        if not fs.createNewFile(jlock):
            raise IOError(f"could not take compaction swap lock {jlock}")
        try:
            # carry forward batches published since the snapshot: their
            # partials must ride the swap or the backup-cleanup deletes
            # them. Copy keeps the live source intact until the swap.
            carried = set(applied)
            for _ in range(carry_passes):
                new = [b for b in self.applied_batch_ids()
                       if b not in carried]
                if not new:
                    break
                for b in new:
                    self._copy_dir(
                        f"{self._batches_dir}/{b}", f"{staging}/{b}"
                    )
                    carried.add(b)
            self._swap_with_reconcile(staging, carried)
        finally:
            fs.delete(jlock, False)
        return True

    def _copy_dir(self, src: str, dst: str) -> None:
        ok = self.spark._jvm.org.apache.hadoop.fs.FileUtil.copy(
            self._fs(), self._jpath(src),
            self._fs(), self._jpath(dst),
            False, self.spark._jsc.hadoopConfiguration(),
        )
        if not ok:
            raise IOError(f"copy {src} -> {dst} failed")

    def _swap_with_reconcile(self, staging: str, carried: set[int]) -> None:
        """Install ``staging`` as the new ``batches/`` via backup-rename
        (the ``sources.writers.replace_dir`` shape), with two additions
        the generic helper cannot provide:

        - an append that slips BETWEEN the two renames (a stale-timeout
          publisher recreates ``batches/`` while it is briefly absent)
          is folded into the staged state and the rename retried;
        - before the backup is dropped, any batch directory in it that
          is not part of the staged state — published after the carry
          listing — is copied back in (reconcile), so the backup
          cleanup can never be the sole deleter of a published batch.

        Crash windows match :meth:`_recover`'s contract: between the
        renames the sole copy lives at ``batches.replaced`` and every
        entry point restores it; a crash after the install but before
        reconcile leaves the raced batch in the backup only — that one
        is re-published by the appender's own post-publish verify (the
        double-crash of compactor AND appender falls back to the
        stream's checkpoint replay, which re-appends above the
        watermark)."""
        fs = self._fs()
        jb = self._jpath(self._batches_dir)
        jbak = self._jpath(self._batches_dir + ".replaced")
        jstaging = self._jpath(staging)
        # if the install rename races a recreated batches/, Hadoop's
        # local/HDFS rename does NOT fail — it NESTS staging INSIDE the
        # existing destination (dst/srcName); detect via the basename
        stage_name = staging.rstrip("/").rsplit("/", 1)[-1]
        jnested = self._jpath(f"{self._batches_dir}/{stage_name}")
        fs.delete(jbak, True)  # stale backup — batches/ is live
        if not fs.rename(jb, jbak):
            raise IOError(f"backup rename {self._batches_dir} failed")
        for _ in range(8):
            if (
                not fs.exists(jb)
                and fs.rename(jstaging, jb)
                and not fs.exists(jnested)
            ):
                break
            # batches/ was recreated inside the window — an append's
            # stale-timeout publish, or a lease-expired _recover
            # restoring the old layout. If our rename nested into it,
            # unwind the nesting back to the staging path first.
            if fs.exists(jnested) and not fs.rename(jnested, jstaging):
                raise IOError(
                    f"could not unwind nested install {jnested}"
                )
            if not fs.exists(jb):
                raise IOError(
                    f"rename {staging} -> {self._batches_dir} failed"
                )
            # fold the recreated directories into staging (copy-then-
            # delete; the copy lands in the state about to become live)
            # and retry
            for st in fs.listStatus(jb):
                name = st.getPath().getName()
                if name.startswith(("_", ".")):
                    continue
                # a batch already carried (or folded — carried starts as
                # the fold snapshot) must NOT be re-copied: a _recover
                # that restored the old layout inside the window would
                # otherwise hand every pre-snapshot directory back to
                # be double-counted next to the staged fold
                if int(name) in carried:
                    continue
                self._copy_dir(
                    f"{self._batches_dir}/{name}", f"{staging}/{name}"
                )
                carried.add(int(name))
            fs.delete(jb, True)
        else:
            raise IOError(
                f"install of {staging} kept racing appends recreating "
                f"{self._batches_dir}"
            )
        # reconcile: batches published into the OLD layout after the
        # carry listing ride back in before the backup is dropped. The
        # backup can legitimately be gone — a lock-wait-exhausted
        # _recover restored it mid-swap, in which case its contents
        # were folded back through the install-retry loop above.
        if not fs.exists(jbak):
            return
        for st in fs.listStatus(jbak):
            name = st.getPath().getName()
            if name.startswith(("_", ".")):
                continue
            if int(name) in carried:
                continue
            if not fs.exists(self._jpath(f"{self._batches_dir}/{name}")):
                self._copy_dir(
                    f"{self._batches_dir}.replaced/{name}",
                    f"{self._batches_dir}/{name}",
                )
        fs.delete(jbak, True)
