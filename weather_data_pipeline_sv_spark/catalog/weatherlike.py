"""Weather-pipeline-shaped compositions over the generic testdata.

The full weather pipeline itself (clean → IDW aggregate → serve, with its
own fixture tables) is exercised in pytest against a DuckDB oracle that
mirrors the reference SQL (see tests/test_weather_pipeline.py). These
catalog entries prove the same composition shapes on the driver's tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_tables
from ..functions.rounding import rnd
from . import register


# ---------------------------------------------------------------------------
# WX1 — forecast-accuracy style join (schema.sql:388-437): two hourly
# rollups of the same stream joined on (key, hour) with abs-error math.
# ---------------------------------------------------------------------------
@register(
    "wx1_accuracy_join",
    oracle="""
    WITH f AS (
      SELECT user_id, date_trunc('hour', ts) AS hour_ts, floor((avg(value)) * 10000.0 + 0.5 + 1e-6) / 10000.0 AS forecast_value
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, date_trunc('hour', ts)
    ), o AS (
      SELECT user_id, date_trunc('hour', ts) AS hour_ts, floor((avg(value)) * 10000.0 + 0.5 + 1e-6) / 10000.0 AS observed_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, date_trunc('hour', ts)
    )
    SELECT f.user_id, f.hour_ts, f.forecast_value, o.observed_value,
           floor((abs(f.forecast_value - o.observed_value)) * 10000.0 + 0.5 + 1e-6) / 10000.0 AS abs_error
    FROM f JOIN o ON f.user_id = o.user_id AND f.hour_ts = o.hour_ts
    """,
)
def wx1_accuracy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]

    def rollup(etype: str, out: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .groupBy(
                "user_id",
                F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hour_ts"),
            )
            .agg(rnd(F.avg("value"), 4).alias(out))
        )

    f = rollup("view", "forecast_value")
    o = rollup("purchase", "observed_value")
    return f.join(o, ["user_id", "hour_ts"]).select(
        "user_id",
        "hour_ts",
        "forecast_value",
        "observed_value",
        rnd(F.abs(F.col("forecast_value") - F.col("observed_value")), 4).alias(
            "abs_error"
        ),
    )


# ---------------------------------------------------------------------------
# WX2 — validation metrics block (transform.py:152-244): groupBy-less
# aggregates feeding pass/fail gates.
# ---------------------------------------------------------------------------
@register(
    "wx2_validation_metrics",
    oracle="""
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           count(*) AS n_events,
           floor((avg(value)) * 10000.0 + 0.5 + 1e-6) / 10000.0 AS avg_value,
           CAST(count(*) FILTER (WHERE value IS NULL) AS BIGINT) AS n_null_value,
           max(ts) AS max_ts
    FROM events
    """,
)
def wx2_validation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    return ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        rnd(F.avg("value"), 4).alias("avg_value"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_value"),
        F.max("ts").alias("max_ts"),
    )
