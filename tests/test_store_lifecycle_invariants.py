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
