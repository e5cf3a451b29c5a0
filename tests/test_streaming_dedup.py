"""Streaming incremental corpus dedup: exact dedup of a document stream
across micro-batches AND query restarts.

Uses Structured Streaming's stateful ``dropDuplicates`` on the normalized
content hash (the same identity as operators/dedup.exact_duplicates), with
state in the checkpoint: a duplicate arriving in a later batch — or after
a restart — is dropped. State is one entry per distinct hash; production
streams bound it with ``dropDuplicatesWithinWatermark`` when late
duplicates have a horizon.
"""

from __future__ import annotations

from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string"


def _run(spark, in_dir, ckpt):
    out: list = []
    stream = (
        spark.readStream.schema(DOC_SCHEMA).parquet(in_dir)
        .withColumn("content_hash", F.md5(F.trim(F.lower(F.col("text")))))
        .dropDuplicates(["content_hash"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda b, _i: out.extend(b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return out


def test_streaming_dedup_across_batches_and_restarts(spark, tmp_path):
    in_dir = tmp_path / "docs"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write(rows):
        spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))

    write([(1, "alpha beta gamma"), (2, "delta epsilon"), (3, "Alpha Beta Gamma")])
    out1 = _run(spark, str(in_dir), ckpt)
    # 3 normalizes identically to 1 -> dropped within the first batch
    assert sorted(r["doc_id"] for r in out1) in ([1, 2], [2, 3])

    # restart with new files: one true new doc, one duplicate of batch 1
    write([(4, "  ALPHA beta gamma "), (5, "zeta eta")])
    out2 = _run(spark, str(in_dir), ckpt)
    assert [r["doc_id"] for r in out2] == [5]  # 4 deduped via checkpointed state


EVT_SCHEMA = "doc_id long, text string, event_ts timestamp"


def _run_bounded(spark, in_dir, ckpt, delay="1 hour"):
    out: list = []
    stream = (
        spark.readStream.schema(EVT_SCHEMA).parquet(in_dir)
        .withColumn("content_hash", F.md5(F.trim(F.lower(F.col("text")))))
        .withColumn("event_ts", F.col("event_ts").cast("timestamp"))
        .withWatermark("event_ts", delay)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda b, _i: out.extend(b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return out


def test_streaming_dedup_within_watermark_bounds_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates inside the watermark
    horizon are dropped, but state is EVICTABLE — a duplicate arriving
    long after the watermark passed its key is treated as new. That
    re-emission is exactly what proves state is bounded by the horizon
    (plain dropDuplicates state grows with every distinct key forever —
    unusable on a 100 TB/day stream)."""
    import datetime as dt

    in_dir = tmp_path / "docs"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2025, 10, 10, 12, 0, 0)

    def write(rows):
        spark.createDataFrame(rows, EVT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))

    # batch 1: doc + an in-horizon duplicate (10 min later) -> one survivor
    write([(1, "alpha beta", t0), (2, "ALPHA beta ", t0 + dt.timedelta(minutes=10))])
    out1 = _run_bounded(spark, str(in_dir), ckpt)
    assert len(out1) == 1

    # batch 2: watermark advances 10 h past t0 (delay is 1 h), evicting the
    # hash's state; the same content arriving now is emitted again
    write([(3, "fresh content", t0 + dt.timedelta(hours=10))])
    out2 = _run_bounded(spark, str(in_dir), ckpt)
    assert [r["doc_id"] for r in out2] == [3]

    write([(4, "alpha beta", t0 + dt.timedelta(hours=10, minutes=5))])
    out3 = _run_bounded(spark, str(in_dir), ckpt)
    assert [r["doc_id"] for r in out3] == [4]  # re-emitted: state was evicted
