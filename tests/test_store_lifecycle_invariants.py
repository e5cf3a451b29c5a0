"""Round-6 lifecycle invariants (round-5 verdict items #6 and #8):

1. pipe5's returned DataFrame must survive deletion of its temp store —
   the entry pins via ``loop_cache(..., eager=True)`` BEFORE the
   ``finally: rmtree``; if the eager materialization were dropped, the
   first post-return action would re-read deleted files.
2. Exactly-once replay must survive a DRIVER RESTART: a *fresh* store
   object opened on the same directory must recover applied batch ids
   from the on-disk layout alone and no-op a replayed batch id —
   in-memory idempotence is not the production claim, recovery is.
"""

from __future__ import annotations

import math
import time

import pyspark.sql.functions as F
import pytest

from weather_data_pipeline_sv_spark.functions.caching import loop_cache
from weather_data_pipeline_sv_spark.operators.incremental import CorpusStore
from weather_data_pipeline_sv_spark.operators.incremental_vectors import (
    VectorStore,
)

VEC_SCHEMA = "vec_id long, emb array<double>"


def _unit(seq):
    n = math.sqrt(sum(x * x for x in seq))
    return [x / n for x in seq]


def _vec_slices():
    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.0, 1.0, 0.0, 0.0]
    c = [0.0, 0.0, 1.0, 0.0]
    return [
        [(0, a), (1, b), (2, _unit([1.0, 0.05, 0.0, 0.0]))],
        [(10, c), (11, _unit([0.04, 1.0, 0.0, 0.0]))],
        [(20, _unit([0.0, 0.03, 1.0, 0.0])),
         (21, _unit([0.5, 0.5, 0.5, 0.0]))],
    ]


# ---------------------------------------------------------------------------
# 1a. the loop_cache(eager=True) mechanism itself: an eager pin
#     materializes before the source disappears; a lazy one does not.
# ---------------------------------------------------------------------------
def test_loop_cache_eager_pins_before_source_deletion(spark, tmp_path):
    import shutil

    src = str(tmp_path / "src")
    spark.range(100).withColumn("v", F.col("id") * 2).write.parquet(src)

    df = spark.read.parquet(src)
    pinned = loop_cache(df.filter("id < 50"), eager=True)
    lazy = loop_cache(spark.read.parquet(src).filter("id >= 50"))
    shutil.rmtree(src)
    # eager: blocks already live in the block manager — survives
    assert pinned.count() == 50
    assert len(pinned.collect()) == 50
    # lazy: first materialization happens after the delete — fails.
    # This is the exact regression "drop eager=True from pipe5" causes.
    with pytest.raises(Exception):
        lazy.collect()


# ---------------------------------------------------------------------------
# 1b. the entry-level invariant: pipe5's result is collectable (twice,
#     with a fresh action each time) after its temp store is gone.
# ---------------------------------------------------------------------------
def test_pipe5_result_survives_store_deletion(spark):
    from weather_data_pipeline_sv_spark.catalog.vector import (
        pipe5_quantizer_retrain,
    )

    out = pipe5_quantizer_retrain(spark, "/root/testdata/sf0.001")
    # the entry's finally-block has already rmtree'd the store; every
    # action below re-evaluates against the pinned blocks
    n = out.count()
    assert n > 0
    rows = out.collect()
    assert len(rows) == n
    assert {r["kept"] for r in rows} <= {True, False}
    # a derived plan (new action, new stages) must also evaluate
    assert out.filter("kept").count() + out.filter("not kept").count() == n


# ---------------------------------------------------------------------------
# 2. driver-restart recovery: FRESH store objects on the same directory.
# ---------------------------------------------------------------------------
def test_vector_store_restart_recovers_exactly_once(spark, tmp_path):
    root = str(tmp_path / "vstore_restart")
    slices = _vec_slices()
    vs = VectorStore(spark, root)
    vs.initialize(spark.createDataFrame(slices[0], VEC_SCHEMA), n_lists=3)
    for bid, sl in enumerate(slices):
        vs.process_and_append(
            spark.createDataFrame(sl, VEC_SCHEMA), batch_id=bid
        )
    once = sorted(map(tuple, vs.vectors().collect()))
    applied = vs.applied_batch_ids()
    del vs  # driver "restart": no in-memory state survives

    vs2 = VectorStore(spark, root)
    assert vs2.applied_batch_ids() == applied  # recovered from layout
    # replaying the LAST batch id through the fresh object must no-op
    assert (
        vs2.process_and_append(
            spark.createDataFrame(slices[-1], VEC_SCHEMA),
            batch_id=len(slices) - 1,
        )
        is None
    )
    assert sorted(map(tuple, vs2.vectors().collect())) == once
    assert vs2.applied_batch_ids() == applied


def test_corpus_store_restart_recovers_exactly_once(spark, tmp_path):
    root = str(tmp_path / "cstore_restart")
    batches = [
        [(0, "the quick brown fox jumps over the lazy dog again and again",
          "en", "web"),
         (1, "an entirely different document about spark pipelines at scale",
          "en", "web")],
        [(10, "the quick brown fox jumps over the lazy dog again and again",
          "en", "web"),  # dup of 0, later id -> dropped
         (11, "fresh content with plenty of words to pass quality filters",
          "en", "book")],
    ]
    schema = "doc_id long, text string, lang string, source string"
    cs = CorpusStore(spark, root)
    for bid, rows in enumerate(batches):
        cs.process_and_append(
            spark.createDataFrame(rows, schema), batch_id=bid
        )
    once = sorted(map(tuple, cs.docs().collect()))
    applied = cs.applied_batch_ids()
    del cs

    cs2 = CorpusStore(spark, root)
    assert cs2.applied_batch_ids() == applied
    cs2.process_and_append(
        spark.createDataFrame(batches[-1], schema),
        batch_id=len(batches) - 1,
    )
    assert sorted(map(tuple, cs2.docs().collect())) == once
    assert cs2.applied_batch_ids() == applied


# ---------------------------------------------------------------------------
# 3. Round-9 swap/append coordination (round-8 verdict #3 + ADVICE #1):
#    compaction and appends may interleave without out-of-band
#    discipline — the contract is enforced by stale-staging cleanup,
#    the swap lock, carry-forward, reconcile, and the appender's
#    post-publish verify. All on BoilerplateStore (the thinner of the
#    two PartialAggStore subclasses).
# ---------------------------------------------------------------------------
from pyspark.sql import functions as F  # noqa: E402

from weather_data_pipeline_sv_spark.operators.boilerplate import (  # noqa: E402
    BoilerplateStore,
)
from weather_data_pipeline_sv_spark.operators.dedup import (  # noqa: E402
    boilerplate_report,
    explode_shingles,
)

_DOCS = [
    (1, "the cat sat on the red mat today"),
    (2, "the cat sat on a blue chair yesterday"),
    (3, "the cat sat under the old tree quietly"),
    (4, "weather data pipelines aggregate hourly observations"),
    (5, "completely unrelated text about sailing boats"),
    (6, "weather data pipelines aggregate daily forecasts"),
    (7, "one more weather data pipelines document arrives late"),
]


def _shingles(spark, docs):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return explode_shingles(df, "doc_id", "text", 3)


def _one_shot_report(spark, docs):
    sh = _shingles(spark, docs)
    dfq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    tot = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    nd = tot.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    return sorted(
        map(tuple, boilerplate_report(sh, dfq, tot, nd, 2, 0.01).collect())
    )


def _store_report(store):
    return sorted(map(tuple, store.report(2, 0.01).collect()))


def _markers(store):
    return [
        e for e in store._entries() if e.startswith(store._COMPACT_MARK)
    ]


def test_compact_crash_after_staging_is_cleaned_up(spark, tmp_path):
    """ADVICE #1 (round 8): a compact that crashes AFTER writing the
    staged fold + watermark but BEFORE the swap must not poison later
    compacts. Pre-fix failure modes: (a) retry at the SAME hi raised
    IOError forever (stale marker made createNewFile fail); (b) retry
    after new appends published BOTH folds via the swap and
    double-counted every pre-crash row."""
    root = str(tmp_path / "bp_crash_staging")
    store = BoilerplateStore(spark, root)
    assert store.append(_shingles(spark, _DOCS[:2]), batch_id=0)
    assert store.append(_shingles(spark, _DOCS[2:4]), batch_id=1)

    boom = RuntimeError("crash before swap")

    def crash(staging, carried):
        raise boom

    orig = store._swap_with_reconcile
    store._swap_with_reconcile = crash
    try:
        import pytest as _pytest

        with _pytest.raises(RuntimeError):
            store.compact()
    finally:
        store._swap_with_reconcile = orig
    # staging holds a fold dir + marker; live store is untouched
    assert store.applied_batch_ids() == [0, 1]
    assert store.compacted_through() == -1

    # (a) immediate retry at the SAME hi must succeed, not IOError
    assert store.compact() is True
    assert store.applied_batch_ids() == [1]
    assert store.compacted_through() == 1
    assert _markers(store) == [f"{store._COMPACT_MARK}1"]

    # crash AGAIN (fresh staged fold at hi=1 left behind), then append
    # and re-compact: exactly ONE watermark, no double-counted rows
    store._swap_with_reconcile = crash
    try:
        store.append(_shingles(spark, _DOCS[4:6]), batch_id=2)
        import pytest as _pytest

        with _pytest.raises(RuntimeError):
            store.compact()
    finally:
        store._swap_with_reconcile = orig
    assert store.compact() is True
    assert store.applied_batch_ids() == [2]
    assert store.compacted_through() == 2
    assert _markers(store) == [f"{store._COMPACT_MARK}2"]
    assert _store_report(store) == _one_shot_report(spark, _DOCS[:6])


def test_append_during_compaction_window_not_lost(spark, tmp_path):
    """Round-8 verdict #3: a foreachBatch append that publishes AFTER
    compact's carry-forward listing but BEFORE the swap used to be
    deleted with the swap's backup — append returned True, the stream
    checkpointed, the data was gone. Now the swap's reconcile copies
    the raced batch back in before dropping the backup."""
    root = str(tmp_path / "bp_race_append")
    store = BoilerplateStore(spark, root)
    assert store.append(_shingles(spark, _DOCS[:2]), batch_id=0)
    assert store.append(_shingles(spark, _DOCS[2:4]), batch_id=1)

    raced = {}
    orig = store._swap_with_reconcile

    def race_then_swap(staging, carried):
        # a second driver-side writer (fresh store object, as after a
        # restart) publishes batch 2 inside the locked window — its
        # pre-publish lock wait times out (stalled-compactor path)
        other = BoilerplateStore(spark, root)
        other._LOCK_WAIT_S = 0.1
        raced["returned"] = other.append(
            _shingles(spark, _DOCS[4:6]), batch_id=2
        )
        orig(staging, carried)

    store._swap_with_reconcile = race_then_swap
    try:
        assert store.compact() is True
    finally:
        store._swap_with_reconcile = orig

    assert raced["returned"] is True
    # the raced batch SURVIVED the swap: present, above the watermark,
    # counted exactly once
    assert store.applied_batch_ids() == [1, 2]
    assert store.compacted_through() == 1
    assert _store_report(store) == _one_shot_report(spark, _DOCS[:6])
    # and the next compact folds it normally
    assert store.compact() is True
    assert store.applied_batch_ids() == [2]
    assert _store_report(store) == _one_shot_report(spark, _DOCS[:6])


def test_append_republishes_when_swap_swallows_it(spark, tmp_path):
    """The appender-side half of the contract: if a swap's backup
    cleanup deletes a just-published batch (simulated by deleting the
    directory under the appender between publish and verify), the
    post-publish verify detects the loss and republishes from the
    pinned partials — append's True return stays truthful."""
    root = str(tmp_path / "bp_republish")
    store = BoilerplateStore(spark, root)
    assert store.append(_shingles(spark, _DOCS[:2]), batch_id=0)

    final = f"{store._batches_dir}/1"
    state = {"sabotaged": False}
    orig_wait = store._await_swap_lock

    def swallow_once():
        orig_wait()
        # fire only on the POST-publish verify (the batch dir exists),
        # not the pre-publish lock wait
        if not state["sabotaged"] and store._fs().exists(
            store._jpath(final)
        ):
            state["sabotaged"] = True
            assert store._fs().delete(store._jpath(final), True)

    store._await_swap_lock = swallow_once
    try:
        assert store.append(_shingles(spark, _DOCS[2:4]), batch_id=1) is True
    finally:
        store._await_swap_lock = orig_wait

    assert state["sabotaged"]
    assert store.applied_batch_ids() == [0, 1]
    assert _store_report(store) == _one_shot_report(spark, _DOCS[:4])


def test_append_failed_rename_cleans_staging_orphan(spark, tmp_path):
    """ADVICE #3 (round 8): when the final directory is created between
    append's existence check and its rename (a concurrent publisher of
    the same id wins the race), atomic_rename_dir returns False — the
    loser must delete its _staging_batch_<id> orphan and report the
    batch as already published."""
    root = str(tmp_path / "bp_orphan")
    store = BoilerplateStore(spark, root)
    assert store.append(_shingles(spark, _DOCS[:2]), batch_id=0)

    loser = BoilerplateStore(spark, root)
    fs = loser._fs()
    state = {"raced": False}
    orig_wait = loser._await_swap_lock

    def winner_publishes_first():
        orig_wait()
        if not state["raced"]:
            state["raced"] = True
            # the concurrent winner lands batch 1 AFTER the loser's
            # existence check passed (the lock wait runs inside the
            # publish loop, post-check) but before the loser's rename
            assert store.append(_shingles(spark, _DOCS[2:4]), batch_id=1)

    loser._await_swap_lock = winner_publishes_first
    try:
        assert (
            loser.append(_shingles(spark, _DOCS[2:4]), batch_id=1) is False
        )
    finally:
        loser._await_swap_lock = orig_wait

    assert state["raced"]
    assert not fs.exists(loser._jpath(f"{root}/_staging_batch_1"))
    assert loser.applied_batch_ids() == [0, 1]
    assert _store_report(loser) == _one_shot_report(spark, _DOCS[:4])


# ---------------------------------------------------------------------------
# 4. Round-10 (ADVICE, medium): _recover vs the swap lock. The on-disk
#    state mid-swap (batches/ absent + batches.replaced present) is
#    indistinguishable from a crashed swap, so _recover must WAIT OUT a
#    held lock instead of renaming the backup out from under a live
#    compactor — and even a lease-timeout restore (stalled-compactor
#    fallback) must leave the subsequent install retry + reconcile
#    correct: no double-counted folds, no throw on the stolen backup.
# ---------------------------------------------------------------------------
class _FsRenameHook:
    """Delegating proxy over the JVM FileSystem that fires a callback
    AFTER each successful rename — the only seam that lets a test stand
    inside _swap_with_reconcile's between-renames window."""

    def __init__(self, real, hook):
        self._real = real
        self._hook = hook

    def rename(self, a, b):
        ok = self._real.rename(a, b)
        self._hook(a, b, ok)
        return ok

    def __getattr__(self, name):
        return getattr(self._real, name)


def test_recover_waits_out_live_swap_lock(spark, tmp_path):
    """A reader opening mid-window while the lock is HELD must not
    restore; it waits, the swap completes, and the reader sees the
    post-swap layout. Pre-fix, the reader's eager restore made the
    simulated installer's rename fail."""
    import threading

    root = str(tmp_path / "bp_recover_wait")
    store = BoilerplateStore(spark, root)
    assert store.append(_shingles(spark, _DOCS[:2]), batch_id=0)
    assert store.append(_shingles(spark, _DOCS[2:4]), batch_id=1)

    fs = store._fs()
    jb = store._jpath(store._batches_dir)
    jbak = store._jpath(store._batches_dir + ".replaced")
    # construct the exact mid-swap state: lock held, backup renamed away
    assert fs.createNewFile(store._lock_jpath())
    assert fs.rename(jb, jbak)

    result = {}

    def finish_swap():
        time.sleep(0.4)
        result["install_ok"] = fs.rename(jbak, jb)  # the install
        fs.delete(store._lock_jpath(), False)

    t = threading.Thread(target=finish_swap)
    t.start()
    reader = BoilerplateStore(spark, root)  # default _LOCK_WAIT_S
    ids = reader.applied_batch_ids()  # blocks on the lock, not restores
    t.join()
    assert result["install_ok"] is True  # reader did NOT steal the backup
    assert ids == [0, 1]
    assert not fs.exists(jbak)


def test_recover_restores_after_stale_lock_timeout(spark, tmp_path):
    """The lease fallback: a crashed compactor's lock times out and the
    reader restores — data is served, not an empty store."""
    root = str(tmp_path / "bp_recover_stale")
    store = BoilerplateStore(spark, root)
    assert store.append(_shingles(spark, _DOCS[:2]), batch_id=0)
    fs = store._fs()
    assert fs.createNewFile(store._lock_jpath())
    assert fs.rename(
        store._jpath(store._batches_dir),
        store._jpath(store._batches_dir + ".replaced"),
    )
    reader = BoilerplateStore(spark, root)
    reader._LOCK_WAIT_S = 0.2
    assert reader.applied_batch_ids() == [0]  # restored after timeout
    assert fs.exists(store._jpath(store._batches_dir))


def test_timeout_restore_mid_swap_cannot_double_count(spark, tmp_path):
    """The full ADVICE scenario: a short-leased reader restores the old
    layout INSIDE a live swap window (its lock wait expires against a
    slow-but-alive compactor). The install retry must SKIP the restored,
    already-folded directories (pre-fix: copied next to the fold →
    every pre-snapshot row counted twice) and the reconcile must
    tolerate the stolen backup (pre-fix: listStatus threw)."""
    root = str(tmp_path / "bp_recover_midswap")
    store = BoilerplateStore(spark, root)
    assert store.append(_shingles(spark, _DOCS[:2]), batch_id=0)
    assert store.append(_shingles(spark, _DOCS[2:4]), batch_id=1)

    real_fs = store._fs()
    state = {"fired": False}

    def on_rename(a, b, ok):
        # fire once, right after the backup rename (batches -> .replaced)
        if (
            not state["fired"]
            and ok
            and b.getName().endswith(".replaced")
        ):
            state["fired"] = True
            reader = BoilerplateStore(spark, root)
            reader._LOCK_WAIT_S = 0.1  # lease expires against live lock
            # pre-fix: this resurrected the old layout mid-swap
            assert reader.applied_batch_ids() == [0, 1]

    store._fs = lambda: _FsRenameHook(real_fs, on_rename)
    try:
        assert store.compact() is True
    finally:
        del store._fs  # restore the class method

    assert state["fired"]
    assert store.applied_batch_ids() == [1]
    assert store.compacted_through() == 1
    assert _markers(store) == [f"{store._COMPACT_MARK}1"]
    # the decisive assertion: rows counted exactly once
    assert _store_report(store) == _one_shot_report(spark, _DOCS[:4])


# ---------------------------------------------------------------------------
# 5. Round-10 verdict #3: race the store FOR REAL. One thread loops
#    append() (disjoint unit ids, distinct batch ids) while the main
#    thread loops compact(). The four crash-point tests above pin
#    enumerated interleavings; this catches the ones nobody enumerated.
#    Final state must equal a one-shot rebuild: every batch applied or
#    folded (monotone watermark), every row counted exactly once.
# ---------------------------------------------------------------------------
def test_concurrent_appends_race_compactor_loop(spark, tmp_path):
    import threading

    root = str(tmp_path / "bp_thread_race")
    n_batches = 10
    all_docs = [
        (b * 100 + j,
         f"doc {b} {j} " + " ".join(f"w{b}x{j}y{t}" for t in range(6)))
        for b in range(n_batches)
        for j in range(2)
    ]
    by_batch = [
        [d for d in all_docs if d[0] // 100 == b] for b in range(n_batches)
    ]

    appender = BoilerplateStore(spark, root)
    errors = []
    appended = []

    def run_appends():
        try:
            for b in range(n_batches):
                appended.append(
                    (b, appender.append(_shingles(spark, by_batch[b]),
                                        batch_id=b))
                )
        except Exception as exc:  # noqa: BLE001 — fail the test with it
            errors.append(exc)

    t = threading.Thread(target=run_appends)
    compactor = BoilerplateStore(spark, root)
    t.start()
    n_compacts = 0
    while t.is_alive():
        try:
            if compactor.compact():
                n_compacts += 1
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)
            break
    t.join()
    assert not errors, errors
    # every append of a fresh id reported durable publication
    assert [ok for _, ok in appended] == [True] * n_batches
    # ledger sanity: nothing below the watermark is still a live dir,
    # and batches + watermark jointly cover all ids exactly once
    mark = compactor.compacted_through()
    live = compactor.applied_batch_ids()
    assert all(b > mark for b in live if b != mark) or live == [mark]
    covered = set(range(mark + 1)) | set(live)
    assert covered == set(range(n_batches))
    # the decisive check: the racing history ≡ one-shot rebuild
    assert _store_report(compactor) == _one_shot_report(spark, all_docs)
    # replays stay no-ops after the dust settles (exactly-once holds)
    for b in range(n_batches):
        assert (
            appender.append(_shingles(spark, by_batch[b]), batch_id=b)
            is False
        )
    assert _store_report(compactor) == _one_shot_report(spark, all_docs)
