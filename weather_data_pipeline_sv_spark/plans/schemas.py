"""Declared StructType schemas for every table of the weather engine.

Mirrors the reference's single-source-of-truth DDL (`sql/schema.sql`) with
the type mapping from SURVEY.md §1.2:

- DECIMAL measures → double (the reference rounds explicitly on write,
  `aggregation.py:169-189`; binary doubles are exact enough and vectorize)
- GEOMETRY(POINT) → latitude/longitude doubles; GEOMETRY(MULTIPOLYGON) →
  precomputed centroid lat/lon (the reference only ever uses ST_Centroid,
  `aggregation.py:94`)
- SERIAL surrogate ids → dropped; natural keys (the reference's own UNIQUE
  constraints, `schema.sql:68,100,235`) are the identity
- TIMESTAMP (naive) → TimestampNTZType: the reference stores naive UTC
  (`brightsky_client.py:80`); NTZ parquet is read identically by every
  engine and host timezone
- interpolated_fields TEXT[] → array<string>, kept but never populated
  (quirk Q7, `schema.sql:132`)

Schema inference is never used — every read/createDataFrame passes one of
these explicitly, like the reference's DDL-at-init discipline.
"""

from __future__ import annotations

from pyspark.sql import types as T

TS = T.TimestampNTZType()
D = T.DoubleType()
S = T.StringType()
I = T.IntegerType()
B = T.BooleanType()


def _s(*fields: tuple) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


# bronze — reference schema.sql:12-20 (geometry → centroid, see module doc)
POSTAL_CODES = _s(
    ("postal_code", S),
    ("city", S),
    ("state", S),
    ("centroid_lat", D),
    ("centroid_lon", D),
)

# bronze — reference schema.sql:27-43
WEATHER_STATIONS = _s(
    ("station_id", S),
    ("station_name", S),
    ("latitude", D),
    ("longitude", D),
    ("altitude", D),
    ("source", S),
    ("first_record_date", TS),
    ("last_record_date", TS),
)

_WEATHER_MEASURES = (
    ("temperature", D),
    ("humidity", I),
    ("pressure", D),
    ("wind_speed", D),
    ("wind_direction", I),
    ("precipitation", D),
    ("cloud_cover", I),
    ("visibility", D),
    ("sunshine", D),
    ("dew_point", D),
)

# bronze — reference schema.sql:47-74 (+_ingest_ts lineage for merge order)
RAW_WEATHER_OBSERVATIONS = _s(
    ("station_id", S),
    ("timestamp", TS),
    *_WEATHER_MEASURES,
    ("latitude", D),
    ("longitude", D),
    ("source", S),
    ("validated", B),
    ("source_type", S),
    ("_ingest_ts", TS),
)

# bronze — reference schema.sql:78-104 (bitemporal: issue + target time)
RAW_WEATHER_FORECASTS = _s(
    ("station_id", S),
    ("forecast_timestamp", TS),
    ("target_timestamp", TS),
    *_WEATHER_MEASURES,
    ("latitude", D),
    ("longitude", D),
    ("source", S),
    ("_ingest_ts", TS),
)

_QUALITY_FLAGS = (
    ("has_missing_values", B),
    ("has_outliers", B),
    ("data_quality_score", D),
    ("quality_notes", S),
    ("processed_at", TS),
)

# silver — reference schema.sql:112-152
STG_OBSERVATIONS = _s(
    ("station_id", S),
    ("timestamp", TS),
    *_WEATHER_MEASURES,
    *_QUALITY_FLAGS,
)

# silver — reference schema.sql:158-195
STG_FORECASTS = _s(
    ("station_id", S),
    ("forecast_timestamp", TS),
    ("target_timestamp", TS),
    *_WEATHER_MEASURES,
    *_QUALITY_FLAGS,
)

# gold — reference schema.sql:202-241
ANALYTICS_WEATHER_BY_POSTAL_CODE = _s(
    ("postal_code", S),
    ("timestamp", TS),
    ("data_type", S),  # 'observation' | 'forecast' (CHECK, schema.sql:236)
    ("forecast_timestamp", TS),  # NULL for observations (schema.sql:237-240)
    ("temperature_avg", D),
    ("temperature_min", D),
    ("temperature_max", D),
    ("precipitation_sum", D),  # IDW *mean* despite the name (quirk Q1)
    ("wind_speed_avg", D),
    ("wind_speed_max", D),
    ("wind_direction_avg", I),
    ("cloud_cover_avg", I),
    ("pressure_msl_avg", D),
    ("sunshine_sum", I),  # IDW mean, int-rounded (quirk Q1)
    ("visibility_avg", I),
    ("dew_point_avg", D),
    ("relative_humidity_avg", I),
    ("num_stations", T.LongType()),
    ("avg_quality_score", D),
    ("max_distance_km", D),
    ("interpolated_fields", T.ArrayType(S)),  # declared, never written (Q7)
    ("created_at", TS),
    ("updated_at", TS),
)

# gold — reference schema.sql:246-265
ANALYTICS_FORECAST_ACCURACY = _s(
    ("postal_code", S),
    ("forecast_issue_time", TS),
    ("forecast_target_time", TS),
    ("observed_time", TS),
    ("temperature_error", D),
    ("precipitation_error", D),
    ("wind_speed_error", D),
    ("mae", D),
    ("lead_time_hours", D),
)

WEATHER_MEASURE_COLS = [n for n, _ in _WEATHER_MEASURES]
