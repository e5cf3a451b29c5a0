"""Tests for streaming/stateful.py — applyInPandasWithState sessionization.

Proves the two invariants the e1 oracle can't see:
1. batch/stream equivalence: the stateful stream emits exactly the batch
   sessions, minus each user's final (still-open) session
2. state survives micro-batch AND query-restart boundaries (checkpointed):
   a session split across input files is emitted once, unsplit
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.sources import load_tables
from weather_data_pipeline_sv_spark.streaming.stateful import (
    sessionize_batch,
    sessionize_stream,
)

EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, value double"

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)
MIN = dt.timedelta(minutes=1)


def _run_stream(spark, in_dir: str, ckpt: str, gap_minutes: int = 360):
    out: list = []
    stream = (
        spark.readStream.schema(EVENT_SCHEMA).parquet(in_dir)
    )
    q = (
        sessionize_stream(stream, gap_minutes=gap_minutes)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda b, _i: out.extend(b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return out


def test_stream_matches_batch_minus_open_sessions(spark, sf_dir, tmp_path):
    ev = (
        load_tables(spark, sf_dir, "events")["events"]
        .filter(F.col("user_id") < 30)  # keep the test quick
        .select("event_id", F.col("ts").cast("timestamp").alias("ts"),
                "user_id", "value")
    )
    in_dir = str(tmp_path / "in")
    ev.write.parquet(in_dir)

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in _run_stream(spark, in_dir, str(tmp_path / "ckpt"))
    }

    batch = sessionize_batch(ev, gap_minutes=360).collect()
    last_idx = {}
    for r in batch:
        last_idx[r["user_id"]] = max(last_idx.get(r["user_id"], 0), r["session_idx"])
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch
        if r["session_idx"] != last_idx[r["user_id"]]  # open session stays in state
    }
    assert got == want and len(want) > 10


def test_state_survives_restart_and_batch_boundary(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_file(name, rows):
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))

    # file 1: two events of an open session
    write_file("f1", [(1, T0, 7, 1.0), (2, T0 + 10 * MIN, 7, 2.0)])
    out1 = _run_stream(spark, str(in_dir), ckpt, gap_minutes=60)
    assert out1 == []  # session still open, nothing emitted

    # file 2 (new query run, same checkpoint): one more event inside the
    # gap, then one far beyond it -> closes a 3-event session
    write_file("f2", [(3, T0 + 20 * MIN, 7, 3.0), (4, T0 + 600 * MIN, 7, 4.0)])
    out2 = _run_stream(spark, str(in_dir), ckpt, gap_minutes=60)
    assert len(out2) == 1
    s = out2[0]
    assert s["user_id"] == 7
    assert s["n_events"] == 3  # NOT 1 — state carried across runs
    assert s["session_start"] == T0
    assert s["session_end"] == T0 + 20 * MIN
    assert abs(s["total_value"] - 6.0) < 1e-9


def test_builtin_session_window_agrees_with_gaps_and_islands(spark, tmp_path):
    """Spark's native session_window() is the third sessionization form
    (besides gaps-and-islands batch and applyInPandasWithState streaming).
    Same gap semantics -> same session boundaries and aggregates; in
    streaming it gets watermark-driven state eviction for free, making it
    the preferred form when per-session custom state isn't needed."""
    import datetime as dt

    from pyspark.sql import functions as F

    from weather_data_pipeline_sv_spark.streaming.stateful import sessionize_batch

    t0 = dt.datetime(2025, 10, 10, 12, 0, 0)
    rows = [
        # u1: two sessions (40-min gap with 30-min threshold)
        (1, t0, 1, 10.0),
        (2, t0 + dt.timedelta(minutes=10), 1, 20.0),
        (3, t0 + dt.timedelta(minutes=50), 1, 30.0),
        # u2: one session, boundary gap exactly 30 min extends the session
        (4, t0, 2, 1.0),
        (5, t0 + dt.timedelta(minutes=29), 2, 2.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )

    native = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select("user_id", "session_start", "n_events", "total_value")
    )
    ours = sessionize_batch(ev, gap_minutes=30).select(
        "user_id", "session_start", "n_events", "total_value"
    )
    assert sorted(map(tuple, native.collect())) == sorted(map(tuple, ours.collect()))

    # streaming form: same session_window agg with watermarked append
    # output. Append emits a session only once the watermark (max event
    # time - delay, updated between batches) passes its end — so closed
    # sessions surface in FOLLOW-UP runs whose new events advance the
    # watermark, which is exactly the eviction contract being tested.
    land = tmp_path / "sess_land"
    land.mkdir()
    ckpt = str(tmp_path / "sess_ckpt")
    out: list = []

    def run_once():
        stream = (
            spark.readStream.schema(ev.schema).parquet(str(land))
            .withWatermark("ts", "1 hour")
            .groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        q = (
            stream.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(lambda b, _i: out.extend(b.collect()))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    ev.coalesce(1).write.mode("append").parquet(str(land))
    run_once()
    # late events push the watermark past the original sessions' ends
    for extra_h in (3, 5):
        spark.createDataFrame(
            [(100 + extra_h, t0 + dt.timedelta(hours=extra_h), 99, 0.0)],
            ev.schema,
        ).coalesce(1).write.mode("append").parquet(str(land))
        run_once()
    emitted = sorted((r["user_id"], r["n_events"]) for r in out if r["user_id"] != 99)
    assert emitted == [(1, 1), (1, 2), (2, 2)]
