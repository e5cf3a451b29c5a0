"""Silver-layer cleaning: quality flags, scores, filters.

Re-expresses the reference's INSERT…SELECT cleaning SQL
(`src/transformation/cleaning.py:63-166` observations, `:220-305`
forecasts) as pure DataFrame transformations. Branch order of every CASE
chain is preserved exactly — it is first-match semantics and the quirks
Q2/Q3 (SURVEY.md §2.10) depend on it:

- observation outlier flag checks humidity/cloud_cover; forecast's doesn't
- forecast score omits the precipitation range from the 1.0 branch and the
  precipitation outlier from the 0.3 branch
- completeness filter drops rows with >1 NULL among
  {temperature, wind_speed, precipitation}
- observations keep only validated=TRUE rows; forecasts have NO such filter
  (`cleaning.py:287-294`)

Every ``NOW()`` becomes the explicit ``asof`` parameter so runs are
deterministic and oracle-testable.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import ntz_lit
from .schemas import WEATHER_MEASURE_COLS

_CRITICAL = ("temperature", "wind_speed", "precipitation")


def _n_critical_nulls() -> Column:
    return sum(
        F.when(F.col(c).isNull(), 1).otherwise(0) for c in _CRITICAL
    )


def _not_between(c: str, lo: float, hi: float) -> Column:
    # SQL `x NOT BETWEEN a AND b` is NULL (not TRUE) for NULL x; Spark's
    # ~between matches that three-valued logic exactly.
    return ~F.col(c).between(lo, hi)


def _obs_has_outliers() -> Column:
    # reference cleaning.py:95-101 (obs variant incl. humidity/cloud_cover)
    cond = (
        _not_between("temperature", -40, 50)
        | _not_between("wind_speed", 0, 200)
        | _not_between("precipitation", 0, 200)
        | (F.col("humidity").isNotNull() & _not_between("humidity", 0, 100))
        | (F.col("cloud_cover").isNotNull() & _not_between("cloud_cover", 0, 100))
    )
    return F.when(cond, True).otherwise(False)


def _fcst_has_outliers() -> Column:
    # reference cleaning.py:256-260 (temp/wind/precip only — quirk Q3)
    cond = (
        _not_between("temperature", -40, 50)
        | _not_between("wind_speed", 0, 200)
        | _not_between("precipitation", 0, 200)
    )
    return F.when(cond, True).otherwise(False)


def _obs_quality_score() -> Column:
    # reference cleaning.py:104-124 — first-match branch order (quirk Q2)
    return (
        F.when(
            F.col("temperature").isNotNull()
            & F.col("wind_speed").isNotNull()
            & F.col("precipitation").isNotNull()
            & F.col("temperature").between(-40, 50)
            & F.col("wind_speed").between(0, 200)
            & F.col("precipitation").between(0, 200),
            1.0,
        )
        .when(
            F.col("temperature").isNull()
            | F.col("wind_speed").isNull()
            | F.col("precipitation").isNull(),
            0.6,
        )
        .when(
            _not_between("temperature", -40, 50) | _not_between("wind_speed", 0, 200),
            0.3,
        )
        .otherwise(0.5)
    )


def _fcst_quality_score() -> Column:
    # reference cleaning.py:262-274 — no precip term in 1.0/0.3 branches (Q2)
    return (
        F.when(
            F.col("temperature").isNotNull()
            & F.col("wind_speed").isNotNull()
            & F.col("precipitation").isNotNull()
            & F.col("temperature").between(-40, 50)
            & F.col("wind_speed").between(0, 200),
            1.0,
        )
        .when(F.col("temperature").isNull() | F.col("wind_speed").isNull(), 0.6)
        .when(_not_between("temperature", -40, 50), 0.3)
        .otherwise(0.5)
    )


def _num_text(c: str) -> Column:
    # Postgres `x::text` on DECIMAL renders plain decimal digits; Spark's
    # double→string does too for these magnitudes
    return F.coalesce(F.col(c).cast("string"), F.lit("NULL"))


def _obs_quality_notes() -> Column:
    # reference cleaning.py:127-137
    return (
        F.when(
            _not_between("temperature", -40, 50),
            F.concat(F.lit("Temperature outlier: "), _num_text("temperature")),
        )
        .when(
            _not_between("wind_speed", 0, 200),
            F.concat(F.lit("Wind speed outlier: "), _num_text("wind_speed")),
        )
        .when(
            _not_between("precipitation", 0, 200),
            F.concat(F.lit("Precipitation outlier: "), _num_text("precipitation")),
        )
        .when(
            F.col("temperature").isNull() | F.col("wind_speed").isNull(),
            F.lit("Missing critical fields"),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def _fcst_quality_notes() -> Column:
    # reference cleaning.py:276-282
    return (
        F.when(_not_between("temperature", -40, 50), F.lit("Temperature outlier"))
        .when(F.col("temperature").isNull(), F.lit("Missing temperature"))
        .otherwise(F.lit(None).cast("string"))
    )


def clean_observations(
    raw: DataFrame, asof: dt.datetime, lookback_hours: int = 168
) -> DataFrame:
    """raw_weather_observations → stg_observations.

    Reference `cleaning.py:27-197`: lookback window + completeness filter +
    validated-only filter, then flag/score/notes projection. All filters are
    plain predicates, so Catalyst pushes them into the parquet scan.
    """
    cutoff = ntz_lit(asof) - F.expr(f"INTERVAL {int(lookback_hours)} HOURS")
    return (
        raw.filter(F.col("timestamp") >= cutoff)
        .filter(~(_n_critical_nulls() > 1))
        .filter(F.col("validated"))
        .select(
            "station_id",
            "timestamp",
            *WEATHER_MEASURE_COLS,
            (_n_critical_nulls() > 1).alias("has_missing_values"),
            _obs_has_outliers().alias("has_outliers"),
            _obs_quality_score().alias("data_quality_score"),
            _obs_quality_notes().alias("quality_notes"),
            ntz_lit(asof).alias("processed_at"),
        )
    )


def clean_forecasts(
    raw: DataFrame, asof: dt.datetime, lookback_hours: int = 24
) -> DataFrame:
    """raw_weather_forecasts → stg_forecasts.

    Reference `cleaning.py:200-305`. The lookback filters on
    forecast_timestamp (issue time) — quirk Q4 — and there is no
    validated filter for forecasts.
    """
    cutoff = ntz_lit(asof) - F.expr(f"INTERVAL {int(lookback_hours)} HOURS")
    return (
        raw.filter(F.col("forecast_timestamp") >= cutoff)
        .filter(~(_n_critical_nulls() > 1))
        .select(
            "station_id",
            "forecast_timestamp",
            "target_timestamp",
            *WEATHER_MEASURE_COLS,
            (_n_critical_nulls() > 1).alias("has_missing_values"),
            _fcst_has_outliers().alias("has_outliers"),
            _fcst_quality_score().alias("data_quality_score"),
            _fcst_quality_notes().alias("quality_notes"),
            ntz_lit(asof).alias("processed_at"),
        )
    )


def check_temporal_consistency(
    stg: DataFrame, asof: dt.datetime, lookback_hours: int = 24
) -> DataFrame:
    """Rows with unrealistic temperature jumps (>20°C within ≤1h).

    Reference `cleaning.py:332-377` (returns only the count; we return the
    offending rows — ``.count()`` gives the reference's number).
    """
    from pyspark.sql import Window

    cutoff = ntz_lit(asof) - F.expr(f"INTERVAL {int(lookback_hours)} HOURS")
    w = Window.partitionBy("station_id").orderBy("timestamp")
    gap_s = F.unix_micros(F.col("timestamp").cast("timestamp")) - F.unix_micros(
        F.col("prev_ts").cast("timestamp")
    )
    return (
        stg.filter((F.col("timestamp") >= cutoff) & F.col("temperature").isNotNull())
        .select(
            "station_id",
            "timestamp",
            "temperature",
            F.lag("temperature").over(w).alias("prev_temp"),
            F.lag("timestamp").over(w).alias("prev_ts"),
        )
        .filter(
            (F.abs(F.col("temperature") - F.col("prev_temp")) > 20)
            & (gap_s <= 3600 * 1_000_000)
        )
    )
