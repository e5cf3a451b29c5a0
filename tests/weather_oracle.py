"""DuckDB oracle SQL for the weather pipeline (bronze → gold).

Independently re-derives the reference semantics
(`/root/reference/src/transformation/cleaning.py:63-166, 220-305` and
`aggregation.py:61-223`) in DuckDB SQL so the Spark implementation in
``weather_data_pipeline_sv_spark/plans`` is cross-checked engine-to-engine.
Haversine + floor-rounding match the Spark side by construction (SURVEY.md
§7 hard parts 2-3: the oracle uses the same great-circle formula and the
same engine-portable rounding).

Expects DuckDB views: raw_weather_observations, raw_weather_forecasts,
weather_stations, postal_codes.
"""

from __future__ import annotations

import datetime as dt

from weather_data_pipeline_sv_spark.functions.geo import haversine_km_sql
from weather_data_pipeline_sv_spark.functions.rounding import rnd_sql

_N_NULLS = (
    "((CASE WHEN temperature IS NULL THEN 1 ELSE 0 END)"
    " + (CASE WHEN wind_speed IS NULL THEN 1 ELSE 0 END)"
    " + (CASE WHEN precipitation IS NULL THEN 1 ELSE 0 END))"
)

_OBS_SCORE = """CAST(CASE
    WHEN temperature IS NOT NULL AND wind_speed IS NOT NULL
         AND precipitation IS NOT NULL
         AND temperature BETWEEN -40 AND 50
         AND wind_speed BETWEEN 0 AND 200
         AND precipitation BETWEEN 0 AND 200 THEN 1.0
    WHEN temperature IS NULL OR wind_speed IS NULL
         OR precipitation IS NULL THEN 0.6
    WHEN temperature NOT BETWEEN -40 AND 50
         OR wind_speed NOT BETWEEN 0 AND 200 THEN 0.3
    ELSE 0.5 END AS DOUBLE)"""

_FCST_SCORE = """CAST(CASE
    WHEN temperature IS NOT NULL AND wind_speed IS NOT NULL
         AND precipitation IS NOT NULL
         AND temperature BETWEEN -40 AND 50
         AND wind_speed BETWEEN 0 AND 200 THEN 1.0
    WHEN temperature IS NULL OR wind_speed IS NULL THEN 0.6
    WHEN temperature NOT BETWEEN -40 AND 50 THEN 0.3
    ELSE 0.5 END AS DOUBLE)"""

_MEASURES = (
    "temperature, humidity, pressure, wind_speed, wind_direction, "
    "precipitation, cloud_cover, visibility, sunshine, dew_point"
)

_HAV = haversine_km_sql("l.latitude", "l.longitude", "p.centroid_lat", "p.centroid_lon")


def _idw(col: str) -> str:
    return f"sum({col} * idw_weight) / nullif(sum(idw_weight), 0.0)"


def gold_oracle_sql(data_type: str, asof: dt.datetime, lookback_hours: int) -> str:
    """Full bronze→gold SQL for one data_type ('observation'|'forecast')."""
    ts = asof.strftime("%Y-%m-%d %H:%M:%S")
    is_fcst = data_type == "forecast"

    if is_fcst:
        dedup_keys = "station_id, forecast_timestamp, target_timestamp"
        dedup_order = "_ingest_ts ASC"  # first-wins (forecasts.py:233-243)
        source = "raw_weather_forecasts"
        time_field = "target_timestamp"
        window_filter = (
            f"forecast_timestamp >= TIMESTAMP '{ts}' - INTERVAL {lookback_hours} HOUR"
        )
        score = _FCST_SCORE
        extra_cols = "forecast_timestamp, target_timestamp"
        fts_select = "forecast_timestamp"
        group_extra = ", forecast_timestamp"
    else:
        dedup_keys = "station_id, timestamp"
        dedup_order = "_ingest_ts DESC"  # update-wins (observations.py:258-283)
        source = "raw_weather_observations"
        time_field = "timestamp"
        window_filter = (
            f"timestamp >= TIMESTAMP '{ts}' - INTERVAL {lookback_hours} HOUR"
        )
        score = _OBS_SCORE
        extra_cols = "timestamp"
        fts_select = "CAST(NULL AS TIMESTAMP) AS forecast_timestamp"
        group_extra = ""

    validated = "AND validated" if not is_fcst else ""

    wind_norm = (
        "CASE WHEN wind_direction_avg < 0 THEN wind_direction_avg + 360 "
        "WHEN wind_direction_avg >= 360 THEN wind_direction_avg - 360 "
        "ELSE wind_direction_avg END"
    )
    combined = (
        "avg_quality_score * 0.6"
        " + least(num_stations / 3.0, 1.0) * 0.2"
        " + (1.0 - least(avg_distance_km / 50.0, 1.0)) * 0.2"
    )

    return f"""
    WITH bronze AS (
      SELECT * FROM (
        SELECT r.*, row_number() OVER (
          PARTITION BY {dedup_keys} ORDER BY {dedup_order}) AS __rn
        FROM {source} r
      ) WHERE __rn = 1
    ),
    stg AS (
      SELECT station_id, {extra_cols}, {_MEASURES}, {score} AS data_quality_score
      FROM bronze
      WHERE {window_filter}
        AND NOT ({_N_NULLS} > 1)
        {validated}
    ),
    located AS (
      SELECT g.*, s.latitude, s.longitude
      FROM stg g JOIN weather_stations s USING (station_id)
      WHERE g.data_quality_score >= 0.5 AND s.latitude IS NOT NULL
    ),
    mapped0 AS (
      SELECT l.*, p.postal_code, {_HAV} AS distance_km
      FROM located l CROSS JOIN postal_codes p
      WHERE p.centroid_lat IS NOT NULL
    ),
    mapped AS (
      SELECT *, 1.0 / nullif(distance_km * distance_km, 0.0) AS idw_weight
      FROM mapped0 WHERE distance_km <= 50.0
    ),
    agg AS (
      SELECT postal_code,
             date_trunc('hour', {time_field}) AS ts_hour,
             {fts_select},
             {_idw('temperature')} AS temperature_avg,
             min(temperature) AS temperature_min,
             max(temperature) AS temperature_max,
             {_idw('precipitation')} AS precipitation_sum,
             {_idw('wind_speed')} AS wind_speed_avg,
             max(wind_speed) AS wind_speed_max,
             degrees(atan2(sum(sin(radians(wind_direction)) * idw_weight),
                           sum(cos(radians(wind_direction)) * idw_weight)))
               AS wind_direction_avg,
             {_idw('cloud_cover')} AS cloud_cover_avg,
             {_idw('pressure')} AS pressure_msl_avg,
             {_idw('sunshine')} AS sunshine_sum,
             {_idw('visibility')} AS visibility_avg,
             {_idw('dew_point')} AS dew_point_avg,
             {_idw('humidity')} AS relative_humidity_avg,
             CAST(count(DISTINCT station_id) AS BIGINT) AS num_stations,
             avg(data_quality_score) AS avg_quality_score,
             max(distance_km) AS max_distance_km,
             avg(distance_km) AS avg_distance_km
      FROM mapped
      GROUP BY postal_code, date_trunc('hour', {time_field}){group_extra}
      HAVING count(*) >= 1
    )
    SELECT postal_code,
           CAST(ts_hour AS TIMESTAMP) AS timestamp,
           '{data_type}' AS data_type,
           forecast_timestamp,
           {rnd_sql('temperature_avg', 2)} AS temperature_avg,
           {rnd_sql('temperature_min', 2)} AS temperature_min,
           {rnd_sql('temperature_max', 2)} AS temperature_max,
           {rnd_sql('precipitation_sum', 2)} AS precipitation_sum,
           {rnd_sql('wind_speed_avg', 2)} AS wind_speed_avg,
           {rnd_sql('wind_speed_max', 2)} AS wind_speed_max,
           CAST({rnd_sql(wind_norm, 0)} AS INTEGER) AS wind_direction_avg,
           CAST({rnd_sql('cloud_cover_avg', 0)} AS INTEGER) AS cloud_cover_avg,
           {rnd_sql('pressure_msl_avg', 2)} AS pressure_msl_avg,
           CAST({rnd_sql('sunshine_sum', 0)} AS INTEGER) AS sunshine_sum,
           CAST({rnd_sql('visibility_avg', 0)} AS INTEGER) AS visibility_avg,
           {rnd_sql('dew_point_avg', 2)} AS dew_point_avg,
           CAST({rnd_sql('relative_humidity_avg', 0)} AS INTEGER)
             AS relative_humidity_avg,
           num_stations,
           {rnd_sql(combined, 2)} AS avg_quality_score,
           {rnd_sql('max_distance_km', 2)} AS max_distance_km
    FROM agg
    """


def temporal_issue_count_sql(asof: dt.datetime, lookback_hours: int = 24) -> str:
    """Oracle for check_temporal_consistency (cleaning.py:332-377) over the
    deduped, cleaned observation staging rows."""
    ts = asof.strftime("%Y-%m-%d %H:%M:%S")
    return f"""
    WITH bronze AS (
      SELECT * FROM (
        SELECT r.*, row_number() OVER (
          PARTITION BY station_id, timestamp ORDER BY _ingest_ts DESC) AS __rn
        FROM raw_weather_observations r
      ) WHERE __rn = 1
    ),
    stg AS (
      SELECT station_id, timestamp, temperature
      FROM bronze
      WHERE timestamp >= TIMESTAMP '{ts}' - INTERVAL 168 HOUR
        AND NOT ({_N_NULLS} > 1)
        AND validated
    ),
    changes AS (
      SELECT station_id, timestamp, temperature,
             lag(temperature) OVER (PARTITION BY station_id ORDER BY timestamp)
               AS prev_temp,
             lag(timestamp) OVER (PARTITION BY station_id ORDER BY timestamp)
               AS prev_ts
      FROM stg
      WHERE timestamp >= TIMESTAMP '{ts}' - INTERVAL {lookback_hours} HOUR
        AND temperature IS NOT NULL
    )
    SELECT count(*) FROM changes
    WHERE abs(temperature - prev_temp) > 20
      AND epoch_us(timestamp) - epoch_us(prev_ts) <= 3600000000
    """
