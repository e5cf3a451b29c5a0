"""Incremental semantic dedup == one-shot batch over the same centroids.

The theorem under test (operators/incremental_vectors.py): processing
vector slices in increasing vec_id order through process_vector_batch —
each slice assigned to the FIXED coarse quantizer and greedy-dropped
against the persisted store — yields exactly the one-shot result "assign
everything, drop every vector with a lower-id list-mate at cosine >= tau".
Covers:

- near-dup pairs that SPAN batch boundaries (late dup of an early vector),
- a dropped vector that must still eliminate a later near-twin (greedy
  one-shot rule — the reason the store keeps kept=false rows too),
- the parquet VectorStore round-trip (partitioned layout + centroids),
- probe_ivf_index serving ANN queries off the live store directory,
- the Structured Streaming wrapper with restart/resume via checkpoint.
"""

from __future__ import annotations

import math
import os

import pyspark.sql.functions as F
import pytest

from weather_data_pipeline_sv_spark.functions.rounding import rnd
from weather_data_pipeline_sv_spark.operators import similarity as sim
from weather_data_pipeline_sv_spark.operators.incremental_vectors import (
    TAU,
    VectorStore,
    incremental_vector_stream,
    process_vector_batch,
)

VEC_SCHEMA = "vec_id long, emb array<double>"


def _vecs():
    """Hand-built corpus with cross-batch duplicate structure; slices
    split at vec_id < 10, < 20, rest. Base directions are far apart so
    list assignment is stable; near-dups are tiny perturbations."""
    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.0, 1.0, 0.0, 0.0]
    c = [0.0, 0.0, 1.0, 0.0]

    def mix(v, w, eps):
        n = math.sqrt(sum((x + eps * y) ** 2 for x, y in zip(v, w)))
        return [(x + eps * y) / n for x, y in zip(v, w)]

    return [
        # batch 1
        (0, a),
        (1, b),
        (2, mix(a, b, 0.05)),  # near-dup of 0 -> dropped, stays in state
        (3, c),
        # batch 2
        (11, mix(a, c, 0.04)),  # near-dup of 0 AND 2 (cross-batch) -> dropped
        (12, mix(b, c, 0.03)),  # near-dup of 1 -> dropped
        (13, mix(c, a, 0.06)),  # near-dup of 3 -> dropped
        # batch 3
        (21, mix(a, b, 0.045)),  # near-dup of 0/2 (2 is a LOSER) -> dropped
        (22, [0.0, 0.0, 0.0, 1.0]),  # new orthogonal direction -> kept
        (23, mix([0.0, 0.0, 0.0, 1.0], a, 0.02)),  # near-dup of 22 -> dropped
    ]


def _one_shot(spark, rows, cents):
    """Reference: assign everything to the fixed centroids, greedy-drop
    within lists over the full id order."""
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    assigned = sim.ivf_assign(df, cents)
    a = assigned.select(
        F.col("vec_id").alias("id_a"), F.col("emb").alias("emb_a"), "list_id"
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"), F.col("emb").alias("emb_b"), "list_id"
    )
    dropped = (
        a.join(b, "list_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(rnd(sim.cosine(F.col("emb_a"), F.col("emb_b")), 6) >= TAU)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("__d", F.lit(True))
    )
    return {
        (r["vec_id"], r["list_id"], r["kept"])
        for r in assigned.join(dropped, "vec_id", "left")
        .select("vec_id", "list_id", F.col("__d").isNull().alias("kept"))
        .collect()
    }


@pytest.fixture(scope="module")
def cents(spark):
    train = spark.createDataFrame(
        [r for r in _vecs() if r[0] < 10], VEC_SCHEMA
    )
    return sim.ivf_centroids(train, n_lists=3, n_iter=2)


def _slices(rows):
    return [
        [r for r in rows if r[0] < 10],
        [r for r in rows if 10 <= r[0] < 20],
        [r for r in rows if r[0] >= 20],
    ]


def test_incremental_equals_one_shot_in_memory(spark, cents):
    rows = _vecs()
    expected = _one_shot(spark, rows, cents)
    store = None
    got = set()
    for sl in _slices(rows):
        delta = process_vector_batch(
            spark.createDataFrame(sl, VEC_SCHEMA), cents, store
        )
        got |= {
            (r["vec_id"], r["list_id"], r["kept"]) for r in delta.collect()
        }
        store = delta if store is None else store.unionByName(delta)
    assert got == expected
    # the cross-batch structure actually exercised what it claims
    kept_ids = {v for v, _, k in got if k}
    assert kept_ids == {0, 1, 3, 22}


def test_loser_still_eliminates(spark, cents):
    # vec 2 is dropped in batch 1 (near-dup of 0) but must still drop 21
    # in batch 3 — verify 21 is dropped even when 0 lands in another list
    # than 21 (it doesn't here, but the invariant is the store keeping 2)
    rows = _vecs()
    store = None
    for sl in _slices(rows):
        delta = process_vector_batch(
            spark.createDataFrame(sl, VEC_SCHEMA), cents, store
        )
        store = delta if store is None else store.unionByName(delta)
    st = {r["vec_id"]: r["kept"] for r in store.collect()}
    assert st[2] is False and st[21] is False
    # the loser's row is still IN the store (kept=false), not absent
    assert 2 in st


def test_vector_store_parquet_roundtrip(spark, tmp_path):
    rows = _vecs()
    root = str(tmp_path / "vstore")
    vs = VectorStore(spark, root)
    train = spark.createDataFrame(_slices(rows)[0], VEC_SCHEMA)
    vs.initialize(train, n_lists=3, n_iter=2)
    assert vs.is_initialized()
    for sl in _slices(rows):
        vs.process_and_append(spark.createDataFrame(sl, VEC_SCHEMA))
    expected = _one_shot(spark, rows, vs.centroids())
    got = {
        (r["vec_id"], r["list_id"], r["kept"])
        for r in vs.vectors().collect()
    }
    assert got == expected
    assert {r["vec_id"] for r in vs.survivors().collect()} == {0, 1, 3, 22}
    occ = {
        r["list_id"]: r["n_vectors"] for r in vs.list_occupancy().collect()
    }
    assert sum(occ.values()) == len(rows)
    # layout: one atomic batch_id= dir per applied batch, list_id dirs
    # nested inside (probe-prunable), _centroids alongside — still
    # readable by probe_ivf_index (test_probe_serves_off_live_store)
    vdir = os.path.join(root, "vectors")
    bdirs = [e for e in os.listdir(vdir) if e.startswith("batch_id=")]
    assert len(bdirs) == len(_slices(rows))
    assert any(
        e.startswith("list_id=") for e in os.listdir(os.path.join(vdir, bdirs[0]))
    )
    assert os.path.isdir(os.path.join(vdir, "_centroids"))


def test_probe_serves_off_live_store(spark, tmp_path):
    rows = _vecs()
    root = str(tmp_path / "vstore2")
    vs = VectorStore(spark, root)
    vs.initialize(
        spark.createDataFrame(_slices(rows)[0], VEC_SCHEMA), n_lists=3
    )
    for sl in _slices(rows):
        vs.process_and_append(spark.createDataFrame(sl, VEC_SCHEMA))
    queries = spark.createDataFrame(
        [(100, [1.0, 0.02, 0.0, 0.0])], "query_id long, qemb array<double>"
    )
    out = sorted(
        sim.probe_ivf_index(
            spark, os.path.join(root, "vectors"), queries, k=3, n_probe=2
        ).collect(),
        key=lambda r: r["rank"],
    )
    assert len(out) == 3
    # nearest neighbor of a ~[1,0,0,0] query is vector 0 (or its twin 2)
    assert out[0]["neighbor_id"] in (0, 2)


def test_streaming_wrapper_and_resume(spark, tmp_path):
    rows = _vecs()
    in_dir, root, ck = (
        str(tmp_path / "in"),
        str(tmp_path / "vstore3"),
        str(tmp_path / "ck"),
    )
    os.makedirs(in_dir)
    vs = VectorStore(spark, root)
    vs.initialize(
        spark.createDataFrame(_slices(rows)[0], VEC_SCHEMA), n_lists=3
    )
    sl = _slices(rows)
    # two files, then stream; then a third file and a RESUMED stream
    for i, part in enumerate(sl[:2]):
        spark.createDataFrame(part, VEC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        if i == 0:
            q = incremental_vector_stream(spark, in_dir, root, ck)
            q.awaitTermination()
    q = incremental_vector_stream(spark, in_dir, root, ck)
    q.awaitTermination()
    spark.createDataFrame(sl[2], VEC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    q = incremental_vector_stream(spark, in_dir, root, ck)
    q.awaitTermination()
    got = {
        (r["vec_id"], r["kept"]) for r in vs.vectors().collect()
    }
    expected = {
        (v, k) for v, _, k in _one_shot(spark, rows, vs.centroids())
    }
    assert got == expected


def test_append_replay_is_exactly_once(spark, tmp_path):
    """The documented foreachBatch failure mode: re-running the same batch
    id (retry after a crash) must leave the store hash-identical to the
    single-write store — the atomic batch_id= rename is the commit."""
    rows = _vecs()
    root = str(tmp_path / "vstore_replay")
    vs = VectorStore(spark, root)
    vs.initialize(
        spark.createDataFrame(_slices(rows)[0], VEC_SCHEMA), n_lists=3
    )
    for bid, sl in enumerate(_slices(rows)):
        vs.process_and_append(
            spark.createDataFrame(sl, VEC_SCHEMA), batch_id=bid
        )
    once = sorted(map(tuple, vs.vectors().collect()))
    # replay every batch id — process_and_append AND raw append no-op
    for bid, sl in enumerate(_slices(rows)):
        assert (
            vs.process_and_append(
                spark.createDataFrame(sl, VEC_SCHEMA), batch_id=bid
            )
            is None
        )
    delta = process_vector_batch(
        spark.createDataFrame(_slices(rows)[2], VEC_SCHEMA), vs.centroids(), None
    )
    assert vs.append(delta, batch_id=2) is False
    assert sorted(map(tuple, vs.vectors().collect())) == once
    assert vs.applied_batch_ids() == [0, 1, 2]


def test_retrain_equals_one_shot_under_new_quantizer(spark, tmp_path):
    """VectorStore.retrain: after the quantizer-aging migration the store
    must be row-identical to the one-shot batch computation over the same
    vectors with the new quantizer (trained on the pre-retrain
    survivors), and probes must serve off the swapped layout."""
    rows = _vecs()
    root = str(tmp_path / "vstore_retrain")
    vs = VectorStore(spark, root)
    vs.initialize(
        spark.createDataFrame(_slices(rows)[0], VEC_SCHEMA), n_lists=3
    )
    for sl in _slices(rows):
        vs.process_and_append(spark.createDataFrame(sl, VEC_SCHEMA))
    # the one-shot twin: same training set (pre-retrain survivors), same
    # Lloyd, assign + greedy over ALL stored vectors
    survivors = vs.survivors().select("vec_id", "emb")
    new_cents = sim.ivf_centroids(survivors, n_lists=4, n_iter=2)
    expected = _one_shot(spark, rows, new_cents)
    got = vs.retrain(new_n_lists=4)
    assert {
        (r["vec_id"], r["list_id"], r["kept"]) for r in got.collect()
    } == expected
    # state readers agree post-swap
    assert {
        (r["vec_id"], r["list_id"], r["kept"])
        for r in vs.vectors().collect()
    } == expected
    assert vs.centroids().count() == 4
    # history compacted to a single batch; appends restart after it
    assert vs.applied_batch_ids() == [0]
    # probe serves off the retrained layout
    queries = spark.createDataFrame(
        [(100, [1.0, 0.02, 0.0, 0.0])], "query_id long, qemb array<double>"
    )
    out = sim.probe_ivf_index(
        spark, os.path.join(root, "vectors"), queries, k=3, n_probe=2
    ).collect()
    assert len(out) == 3
    # a post-retrain append keeps working and lands as batch 1
    extra = spark.createDataFrame(
        [(30, [0.0, 1.0, 0.0, 0.02])], VEC_SCHEMA
    )
    vs.process_and_append(extra)
    assert vs.applied_batch_ids() == [0, 1]
    assert 30 in {r["vec_id"] for r in vs.vectors().collect()}


def test_empty_batch_append_and_legacy_layout_guard(spark, tmp_path):
    rows = _vecs()
    root = str(tmp_path / "vstore_edge")
    vs = VectorStore(spark, root)
    vs.initialize(
        spark.createDataFrame(_slices(rows)[0], VEC_SCHEMA), n_lists=3
    )
    # an EMPTY micro-batch must publish cleanly (zero-row delta -> a
    # file-less batch dir) and must not poison later reads or appends
    empty = spark.createDataFrame([], VEC_SCHEMA)
    out = vs.process_and_append(empty, batch_id=0)
    assert out.count() == 0
    assert vs.applied_batch_ids() == [0]
    assert vs.vectors().count() == 0
    vs.process_and_append(
        spark.createDataFrame(_slices(rows)[0], VEC_SCHEMA), batch_id=1
    )
    assert vs.vectors().count() == len(_slices(rows)[0])
    # a legacy-layout store (top-level list_id= dirs) errors loudly
    # instead of silently reading as empty
    legacy = str(tmp_path / "vstore_legacy")
    os.makedirs(os.path.join(legacy, "vectors", "list_id=0"))
    with pytest.raises(ValueError, match="legacy"):
        VectorStore(spark, legacy).vectors()


def test_corpus_store_legacy_layout_guard(spark, tmp_path):
    from weather_data_pipeline_sv_spark.operators.incremental import (
        CorpusStore,
    )

    legacy = str(tmp_path / "cstore_legacy")
    os.makedirs(os.path.join(legacy, "docs"))
    with pytest.raises(ValueError, match="legacy"):
        CorpusStore(spark, legacy).docs()


def test_interrupted_swap_is_loud_and_replace_dir_restores(spark, tmp_path):
    from weather_data_pipeline_sv_spark.sources.writers import replace_dir

    rows = _vecs()
    root = str(tmp_path / "vstore_swapcrash")
    vs = VectorStore(spark, root)
    vs.initialize(
        spark.createDataFrame(_slices(rows)[0], VEC_SCHEMA), n_lists=3
    )
    vs.process_and_append(
        spark.createDataFrame(_slices(rows)[0], VEC_SCHEMA), batch_id=0
    )
    before = sorted(map(tuple, vs.vectors().collect()))
    # simulate a retrain swap crash between its two renames: vectors/ is
    # gone, the only copy sits at vectors.replaced
    vdir = os.path.join(root, "vectors")
    os.rename(vdir, vdir + ".replaced")
    with pytest.raises(ValueError, match="interrupted"):
        vs.vectors()
    # a subsequent replace_dir (e.g. a re-run retrain) must RESTORE the
    # sole copy, not delete it: publish fresh content over the crashed
    # state and verify the swap completes with the new content live
    staging = os.path.join(root, "_retry_staging")
    spark.createDataFrame(
        [(999, [0.0, 0.0, 0.0, 1.0], 0, True)],
        "vec_id long, emb array<double>, list_id long, kept boolean",
    ).withColumn("batch_id", F.lit(0)).write.mode("overwrite").partitionBy(
        "batch_id", "list_id"
    ).parquet(staging)
    replace_dir(spark, staging, vdir)
    assert not os.path.isdir(vdir + ".replaced")
    assert {r["vec_id"] for r in vs.vectors().collect()} == {999}
    # and the pure-restore path: crash again, then replace_dir with a
    # fresh staging restores-then-swaps without ever losing a copy
    assert before  # (sanity: the original store had content)
