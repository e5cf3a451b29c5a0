"""Time-series regularization: bucket → spine → forward fill.

The hypertable-style operator a weather/sensor pipeline needs that plain
SQL group-bys don't give: turn an irregular event stream into a regular
per-key hourly series with gaps explicitly materialized and filled.

Scale shape: one shuffle keyed on the series key for the bucket argmax,
a map-side ``sequence()`` explode for the spine (no shuffle — each key's
spine generates from its own min/max row), an equi join back on
(key, bucket), and one window pass for the forward fill. Everything stays
in JVM built-ins; the spine explode is bounded by (range/step) per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hour(c):
    # date_trunc returns an instant even for NTZ input; cast back so the
    # result collects host-timezone-independently (UTC session)
    return F.date_trunc("hour", c).cast("timestamp_ntz")


def last_per_hour(
    df: DataFrame, keys: list[str], ts_col: str, value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """(keys, hour, value) — the latest value inside each hour bucket,
    deterministic via (ts, tiebreak) argmax as a map-side-combining
    max_by aggregation (no window shuffle of raw rows)."""
    return df.groupBy(*keys, _hour(F.col(ts_col)).alias("hour")).agg(
        F.expr(
            f"max_by({value_col}, struct({ts_col}, {tiebreak_col}))"
        ).alias(value_col)
    )


def gap_fill_hourly(
    df: DataFrame, keys: list[str], ts_col: str, value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Regular hourly series per key from min to max observed hour:
    missing hours appear with ``is_gap = true`` and the value forward-
    filled from the most recent observed hour."""
    hourly = last_per_hour(df, keys, ts_col, value_col, tiebreak_col)
    spine = (
        hourly.groupBy(*keys)
        .agg(F.min("hour").alias("__mn"), F.max("hour").alias("__mx"))
        .select(
            *keys,
            F.explode(
                F.sequence(
                    F.col("__mn").cast("timestamp"),
                    F.col("__mx").cast("timestamp"),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("__h"),
        )
        # cast outside the select holding the generator (Spark disallows
        # expressions wrapping explode) — back to NTZ for host-tz-free collect
        .select(*keys, F.col("__h").cast("timestamp_ntz").alias("hour"))
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # shuffle_hash hint: BOTH sides grow with (keys × hours) — Catalyst's
    # post-aggregation size estimate otherwise broadcasts the hourly side
    # (measured 2.9M rows broadcast at a 30× dir, 31.4 s vs 12.8 s with
    # the hash join; at 100× the broadcast would OOM the driver). The
    # equi-join on (keys, hour) hash-partitions cleanly; no sort needed.
    return (
        spine.join(hourly.hint("shuffle_hash"), [*keys, "hour"], "left")
        .select(
            *keys,
            "hour",
            F.last(value_col, ignorenulls=True).over(w).alias(f"{value_col}_ff"),
            F.col(value_col).isNull().alias("is_gap"),
        )
    )


def hourly_partials(
    df: DataFrame, keys: list[str], ts_col: str, value_col: str
) -> DataFrame:
    """Finest-grain partial aggregates (the continuous-aggregate base):
    (keys, hour, n, total, mn, mx). Everything downstream reaggregates
    from these — raw data is touched exactly once however many coarser
    resolutions exist."""
    return df.groupBy(*keys, _hour(F.col(ts_col)).alias("hour")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("total"),
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
    )


def reaggregate(
    partials: DataFrame, keys: list[str], bucket_col: str, unit: str,
    out_col: str,
) -> DataFrame:
    """Roll partial aggregates up to a coarser time unit ('day', 'month',
    ...): sums and counts add, min/max nest, avg recomposes as total/n —
    the algebraic-decomposition rule that makes hypertable-style cascades
    exact (a mean of means would be wrong for uneven buckets)."""
    coarser = F.date_trunc(unit, F.col(bucket_col)).cast("timestamp_ntz")
    return partials.groupBy(*keys, coarser.alias(out_col)).agg(
        F.sum("n").alias("n"),
        F.sum("total").alias("total"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )
