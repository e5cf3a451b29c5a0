"""Incremental corpus pipeline == batch rerun.

The theorem under test (operators/incremental.py): processing document
slices in increasing doc_id order through process_corpus_batch — each
slice deduped against the persisted store — yields exactly the survivors
the batch pipeline (quality -> exact dedup -> MinHash-LSH near-dup with
greedy keep-lowest-id) produces on the full corpus. Covers:

- near-dup pairs that SPAN batch boundaries (late dup of an early doc),
- a near-dup LOSER that must still eliminate a later doc (greedy rule —
  the reason the store keeps state for losers too),
- exact duplicates across batches,
- streaming restart/resume via checkpoint (new files after a rerun).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from weather_data_pipeline_sv_spark.operators import dedup as dd
from weather_data_pipeline_sv_spark.operators.incremental import (
    CorpusStore,
    incremental_corpus_stream,
    process_corpus_batch,
    quality_filter,
)

DOC_SCHEMA = "doc_id long, lang string, text string"

_BASE = "the quick brown fox jumps over a lazy dog near the river bank today"
_ALT = "a completely different document about the economics of grain markets is here"


def _docs():
    """Hand-built corpus with cross-batch duplicate structure.
    Batches split at doc_id < 10, < 20, rest."""
    return [
        # batch 1
        (1, "en", _BASE),
        (2, "en", _ALT),
        (3, "en", "tiny"),  # quality-dropped: < 5 tokens
        (4, "en", _BASE + " extra"),  # near-dup of 1 -> dropped, stays in state
        # batch 2
        (11, "en", _BASE),  # exact dup of 1 (cross-batch) -> dropped
        (12, "en", _BASE + " extra words"),  # near-dup of 4 (a LOSER) -> dropped
        (13, "en", "the weather of berlin is mild and the rain is light today ok"),
        # batch 3
        (21, "en", _ALT),  # exact dup of 2 -> dropped
        (22, "en", "the weather of berlin is mild and the rain is heavy today ok"),
        # near-dup of 13 -> dropped
        (23, "de", "der schnelle braune fuchs springt is the of a und so weiter ja"),
    ]


def _batch_survivors(spark, rows):
    """Reference: the batch pipeline over the full corpus."""
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    kept = quality_filter(df)
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    uniq = (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "text")
    )
    pairs = dd.minhash_lsh_pairs(
        uniq, "doc_id", "text", n=3, n_hashes=16, band_size=4, threshold=0.5,
        max_shingle_df=None, materialize=False,
    )
    surv = dd.drop_near_duplicates(uniq, "doc_id", pairs)
    return sorted(r["doc_id"] for r in surv.select("doc_id").collect())


def test_fixture_exercises_cross_batch_dedup(spark):
    """The hand corpus must actually produce cross-batch exact dups,
    cross-batch near-dups, and a loser-eliminates-later case — otherwise
    the equality test below proves nothing."""
    expected = _batch_survivors(spark, _docs())
    # 3 quality-dropped; 11, 21 exact-dropped; 4, 12, 22 near-dropped
    assert expected == [1, 2, 13, 23]


def test_incremental_equals_batch(spark):
    rows = _docs()
    batches = [
        [r for r in rows if r[0] < 10],
        [r for r in rows if 10 <= r[0] < 20],
        [r for r in rows if r[0] >= 20],
    ]
    store_docs = store_sh = store_bands = None
    acc = None
    for b in batches:
        delta = process_corpus_batch(
            spark.createDataFrame(b, DOC_SCHEMA), store_docs, store_sh, store_bands
        )
        acc = (
            delta
            if acc is None
            else {
                k: acc[k].unionByName(delta[k]).localCheckpoint(eager=False)
                for k in acc
            }
        )
        store_docs, store_sh, store_bands = acc["docs"], acc["shingles"], acc["bands"]
    got = sorted(
        r["doc_id"]
        for r in store_docs.filter(F.col("survivor")).select("doc_id").collect()
    )
    assert got == _batch_survivors(spark, rows)


def test_streaming_incremental_with_restart(spark, tmp_path):
    """foreachBatch + parquet store + checkpoint: one file per micro-batch,
    then a restart with a new file; final survivors == batch rerun on all
    docs seen so far at each checkpointed position."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    store_root = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    rows = _docs()

    def write(batch_rows, name):
        spark.createDataFrame(batch_rows, DOC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))

    write([r for r in rows if r[0] < 10], "b1")
    write([r for r in rows if 10 <= r[0] < 20], "b2")
    q = incremental_corpus_stream(
        spark, str(in_dir), store_root, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(180)
    store = CorpusStore(spark, store_root)
    got = sorted(r["doc_id"] for r in store.survivors().select("doc_id").collect())
    assert got == _batch_survivors(spark, [r for r in rows if r[0] < 20])

    # restart: a third file arrives; checkpoint resumes past b1/b2
    write([r for r in rows if r[0] >= 20], "b3")
    q2 = incremental_corpus_stream(
        spark, str(in_dir), store_root, ckpt, max_files_per_trigger=1
    )
    q2.awaitTermination(180)
    got2 = sorted(r["doc_id"] for r in store.survivors().select("doc_id").collect())
    assert got2 == _batch_survivors(spark, rows)
    # state exists for near-dup losers too (the greedy-rule invariant)
    all_ids = {r["doc_id"] for r in store.docs().select("doc_id").collect()}
    assert 4 in all_ids and not (
        store.docs().filter("doc_id = 4").first()["survivor"]
    )


def test_store_never_holds_text(spark, tmp_path):
    store_root = str(tmp_path / "store")
    store = CorpusStore(spark, store_root)
    store.process_and_append(
        spark.createDataFrame([r for r in _docs() if r[0] < 10], DOC_SCHEMA)
    )
    assert "text" not in store.docs().columns


@pytest.mark.parametrize("split_at", [2, 5, 8])
def test_incremental_equality_any_split_point(spark, split_at):
    """Property-ish: equality holds wherever the batch boundary falls
    (ids still increasing across batches)."""
    rows = _docs()
    ids = sorted(r[0] for r in rows)
    cut = ids[split_at]
    b1 = [r for r in rows if r[0] <= cut]
    b2 = [r for r in rows if r[0] > cut]
    d1 = process_corpus_batch(spark.createDataFrame(b1, DOC_SCHEMA), None, None, None)
    d2 = process_corpus_batch(
        spark.createDataFrame(b2, DOC_SCHEMA),
        d1["docs"],
        d1["shingles"],
        d1["bands"],
    )
    got = sorted(
        r["doc_id"]
        for r in d1["docs"]
        .unionByName(d2["docs"])
        .filter(F.col("survivor"))
        .select("doc_id")
        .collect()
    )
    assert got == _batch_survivors(spark, rows)


def test_append_replay_is_exactly_once(spark, tmp_path):
    """Re-running the same batch id (a foreachBatch retry) must leave the
    store hash-identical to the single-write store — the per-batch atomic
    directory rename is the commit, covering all three state tables at
    once (three independent appends could previously land partially)."""
    rows = _docs()
    store_root = str(tmp_path / "store_replay")
    store = CorpusStore(spark, store_root)
    batches = [
        [r for r in rows if r[0] < 10],
        [r for r in rows if 10 <= r[0] < 20],
        [r for r in rows if r[0] >= 20],
    ]
    for bid, b in enumerate(batches):
        store.process_and_append(
            spark.createDataFrame(b, DOC_SCHEMA), batch_id=bid
        )
    once = {
        name: sorted(map(tuple, getattr(store, name)().collect()))
        for name in ("docs", "shingles", "bands")
    }
    # replay every batch id: complete no-ops at both API levels
    for bid, b in enumerate(batches):
        store.process_and_append(
            spark.createDataFrame(b, DOC_SCHEMA), batch_id=bid
        )
    delta = process_corpus_batch(
        spark.createDataFrame(batches[0], DOC_SCHEMA), None, None, None
    )
    assert store.append(delta, batch_id=0) is False
    again = {
        name: sorted(map(tuple, getattr(store, name)().collect()))
        for name in ("docs", "shingles", "bands")
    }
    assert again == once
    assert store.applied_batch_ids() == [0, 1, 2]
