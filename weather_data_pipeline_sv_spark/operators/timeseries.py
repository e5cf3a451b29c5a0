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
    filled from the most recent observed hour (most recent observed
    NON-NULL value — an observed-but-null hour counts as a gap and
    carries the prior value, matching ``last_value(... IGNORE NULLS)``).

    Plan shape — SEGMENT explode, not spine-and-join: each observed hour
    row (with its forward-fill value attached and the NEXT observed hour
    from one ``lead`` pass) explodes into itself plus its trailing gap
    hours, which already carry the filled value. One shuffle total (the
    window on the compact per-hour frame); the expanded rows flow
    straight to the consumer with NO join and NO window over the
    expanded data. Earlier shapes measured at the 30× dir: spine join +
    expanded-frame window 17.2 s, and its bounds-side explode ran
    single-threaded because AQE coalesced the tiny aggregate to one
    partition (a lone task emitting 31.5M rows) — the segment form is
    ~3× faster and removes both hazards structurally.
    """
    hourly = last_per_hour(df, keys, ts_col, value_col, tiebreak_col)
    wff = (
        Window.partitionBy(*keys)
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wlead = Window.partitionBy(*keys).orderBy("hour")
    seg = hourly.select(
        *keys,
        F.col("hour").alias("__obs"),
        F.col(value_col),
        F.last(value_col, ignorenulls=True).over(wff).alias("__ff"),
        F.lead("hour").over(wlead).alias("__next"),
    )
    # segment = [obs, next) on the hour grid; the last observed hour has
    # no successor and emits only itself. Generator arithmetic runs on
    # instants (sequence needs TIMESTAMP), result cast back to NTZ in a
    # separate select (Spark disallows expressions wrapping explode).
    gen = seg.select(
        *keys,
        "__obs",
        value_col,
        "__ff",
        F.explode(
            F.sequence(
                F.col("__obs").cast("timestamp"),
                F.coalesce(
                    F.col("__next").cast("timestamp")
                    - F.expr("INTERVAL 1 HOUR"),
                    F.col("__obs").cast("timestamp"),
                ),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("__h"),
    )
    return gen.select(
        *keys,
        F.col("__h").cast("timestamp_ntz").alias("hour"),
        F.col("__ff").alias(f"{value_col}_ff"),
        # a row is a gap unless it IS the observed hour and that
        # observation was non-null — the same predicate the spine-join
        # form read off the join's null side
        (
            ~(
                (F.col("__h").cast("timestamp_ntz") == F.col("__obs"))
                & F.col(value_col).isNotNull()
            )
        ).alias("is_gap"),
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
