"""Stream-static enrichment join (streaming/jobs.py::stream_enrich).

Proves (1) stream output equals the equivalent batch join, including
stream rows with no dim match (LEFT semantics), and (2) the join is
stateless — it needs no watermark and runs in one availableNow pass.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.sources import load_tables
from weather_data_pipeline_sv_spark.streaming.jobs import stream_enrich

EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def test_stream_enrich_matches_batch_left_join(spark, sf_dir, tmp_path):
    ev = (
        load_tables(spark, sf_dir, "events")["events"]
        .filter(F.col("user_id") < 40)
        .select("event_id", F.col("ts").cast("timestamp").alias("ts"),
                "user_id", "value")
    )
    in_dir = str(tmp_path / "in")
    ev.write.parquet(in_dir)

    # dim misses some users on purpose (only even ids) → LEFT must keep rows
    dim = (
        ev.select("user_id").distinct()
        .filter(F.col("user_id") % 2 == 0)
        .withColumn("segment", F.concat(F.lit("seg-"), F.col("user_id") % 5))
    )

    out: list = []
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(in_dir)
    q = (
        stream_enrich(stream, dim, ["user_id"])
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda b, _i: out.extend(b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {(r["event_id"], r["segment"]) for r in out}
    want = {
        (r["event_id"], r["segment"])
        for r in ev.join(F.broadcast(dim), ["user_id"], "left").collect()
    }
    assert got == want and len(want) > 50
    # unmatched users surface with NULL segment (left semantics)
    assert any(s is None for _, s in got)
