"""Incremental BM25 index store: streaming maintenance ≡ one-shot
rebuild (t26's algebra as a live store), exactly-once replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.operators.retrieval import (
    Bm25IndexStore,
    bm25_index_stream,
    bm25_topk,
)

DOCS = [
    (1, "en", "the cat sat on the mat"),
    (2, "en", "the dog sat"),
    (3, "en", "cats and dogs"),
    (4, "en", "weather data pipeline"),
    (5, "en", "the cat and the dog"),
    (6, "en", "data pipeline weather data"),
]


def _doc_terms(spark, docs):
    df = spark.createDataFrame(docs, ["doc_id", "lang", "text"])
    return (
        df.withColumn("tokens", F.expr("split(trim(lower(text)), '\\\\s+')"))
        .filter(F.size("tokens") > 0)
        .select("doc_id", F.explode("tokens").alias("term"))
        .filter(F.col("term") != "")
    )


def _queries(spark):
    return spark.createDataFrame(
        [(0, "cat"), (0, "sat"), (1, "data"), (1, "weather")],
        ["query_id", "term"],
    )


def test_store_matches_one_shot_rebuild(spark, tmp_path):
    store = Bm25IndexStore(spark, str(tmp_path / "idx"))
    # ingest in three disjoint slices
    for i, sl in enumerate((DOCS[:2], DOCS[2:4], DOCS[4:])):
        assert store.append(_doc_terms(spark, sl), batch_id=i)
    got = sorted(
        map(tuple, store.topk(_queries(spark), k=10).collect())
    )
    want = sorted(
        map(
            tuple,
            bm25_topk(_doc_terms(spark, DOCS), _queries(spark), k=10)
            .collect(),
        )
    )
    assert got == want
    assert store.applied_batch_ids() == [0, 1, 2]


def test_append_replay_is_noop(spark, tmp_path):
    store = Bm25IndexStore(spark, str(tmp_path / "idx2"))
    assert store.append(_doc_terms(spark, DOCS[:3]), batch_id=0)
    before = sorted(
        map(tuple, store.topk(_queries(spark), k=10).collect())
    )
    # a foreachBatch retry re-appends the same id — must write nothing
    assert store.append(_doc_terms(spark, DOCS[:3]), batch_id=0) is False
    after = sorted(
        map(tuple, store.topk(_queries(spark), k=10).collect())
    )
    assert before == after and store.applied_batch_ids() == [0]


def test_streaming_front_end_matches_batch(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    # one parquet file per "day"
    for i, sl in enumerate((DOCS[:2], DOCS[2:4], DOCS[4:])):
        spark.createDataFrame(sl, ["doc_id", "lang", "text"]).coalesce(
            1
        ).write.parquet(str(src / f"day{i}"))
    store_root = str(tmp_path / "idx3")
    q = bm25_index_stream(
        spark, str(src / "*"), store_root, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    store = Bm25IndexStore(spark, store_root)
    assert store.applied_batch_ids()  # at least one micro-batch landed
    got = sorted(
        map(tuple, store.topk(_queries(spark), k=10).collect())
    )
    want = sorted(
        map(
            tuple,
            bm25_topk(_doc_terms(spark, DOCS), _queries(spark), k=10)
            .collect(),
        )
    )
    assert got == want
    # resume: a second availableNow run over the same input adds nothing
    q2 = bm25_index_stream(
        spark, str(src / "*"), store_root, str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    assert sorted(
        map(tuple, Bm25IndexStore(spark, store_root).topk(
            _queries(spark), k=10
        ).collect())
    ) == want


def test_compaction_preserves_results_and_resets_sequence(spark, tmp_path):
    store = Bm25IndexStore(spark, str(tmp_path / "idx4"))
    assert store.compact() is False  # empty store: no-op
    for i, sl in enumerate((DOCS[:2], DOCS[2:4])):
        store.append(_doc_terms(spark, sl), batch_id=i)
    before = sorted(
        map(tuple, store.topk(_queries(spark), k=10).collect())
    )
    assert store.compact() is True
    # folded into ONE batch named after the highest folded id, with the
    # watermark stamped — the ledger survives compaction
    assert store.applied_batch_ids() == [1]
    assert store.compacted_through() == 1
    assert sorted(
        map(tuple, store.topk(_queries(spark), k=10).collect())
    ) == before
    # appends continue after compaction; the full store still equals the
    # one-shot index over everything ingested
    store.append(_doc_terms(spark, DOCS[4:]))
    got = sorted(
        map(tuple, store.topk(_queries(spark), k=10).collect())
    )
    want = sorted(
        map(
            tuple,
            bm25_topk(_doc_terms(spark, DOCS), _queries(spark), k=10)
            .collect(),
        )
    )
    assert got == want
    assert store.compact() is True  # idempotent second fold works too
    assert sorted(
        map(tuple, store.topk(_queries(spark), k=10).collect())
    ) == want


def test_replay_of_folded_batch_is_noop(spark, tmp_path):
    """The round-7 exactly-once hole: batch K publishes, the stream dies
    before Spark checkpoints K, compact() folds K's directory away, the
    stream resumes and replays K. Without the compacted-through
    watermark the replay re-appends K and double-counts its documents in
    df/n_docs/total_len; with it the replay is a no-op and the store
    still equals the one-shot index."""
    store = Bm25IndexStore(spark, str(tmp_path / "idx5"))
    for i, sl in enumerate((DOCS[:2], DOCS[2:4], DOCS[4:])):
        assert store.append(_doc_terms(spark, sl), batch_id=i)
    assert store.compact() is True
    assert store.compacted_through() == 2
    want = sorted(
        map(
            tuple,
            bm25_topk(_doc_terms(spark, DOCS), _queries(spark), k=10)
            .collect(),
        )
    )
    # replay the HIGHEST folded id (the crashed-checkpoint case) and an
    # interior one — both must refuse, store unchanged
    assert store.append(_doc_terms(spark, DOCS[4:]), batch_id=2) is False
    assert store.append(_doc_terms(spark, DOCS[2:4]), batch_id=1) is False
    assert sorted(
        map(tuple, store.topk(_queries(spark), k=10).collect())
    ) == want
    # fresh ids above the watermark still append, auto-id continues past it
    store2 = Bm25IndexStore(spark, str(tmp_path / "idx6"))
    for i, sl in enumerate((DOCS[:2], DOCS[2:4])):
        store2.append(_doc_terms(spark, sl), batch_id=i)
    store2.compact()
    assert store2.append(_doc_terms(spark, DOCS[4:])) is True  # auto id
    assert store2.applied_batch_ids() == [1, 2]
    assert sorted(
        map(tuple, store2.topk(_queries(spark), k=10).collect())
    ) == want


def test_interrupted_swap_is_recovered_on_open(spark, tmp_path):
    """replace_dir's crash window: batches/ renamed to batches.replaced
    but the staging rename never happened. A store opening inside that
    window must restore the backup before any read or write — not serve
    an empty index and then let the next compaction delete the backup."""
    import os

    root = str(tmp_path / "idx7")
    store = Bm25IndexStore(spark, root)
    for i, sl in enumerate((DOCS[:2], DOCS[2:4], DOCS[4:])):
        store.append(_doc_terms(spark, sl), batch_id=i)
    want = sorted(
        map(tuple, store.topk(_queries(spark), k=10).collect())
    )
    # simulate the crash: first rename done, second never happened
    os.rename(
        os.path.join(root, "batches"), os.path.join(root, "batches.replaced")
    )
    reopened = Bm25IndexStore(spark, root)
    assert reopened.applied_batch_ids() == [0, 1, 2]  # recovered, not []
    assert not os.path.exists(os.path.join(root, "batches.replaced"))
    assert sorted(
        map(tuple, reopened.topk(_queries(spark), k=10).collect())
    ) == want
    # and the store keeps working after recovery
    assert reopened.compact() is True
    assert sorted(
        map(tuple, reopened.topk(_queries(spark), k=10).collect())
    ) == want
