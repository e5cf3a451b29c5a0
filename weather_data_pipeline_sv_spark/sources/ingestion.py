"""Ingestion layer: BrightSky-shaped JSON → bronze tables.

Re-expresses the reference ingestion (`src/ingestion/*.py`) Spark-first:
the driver fetches JSON (HTTP stays driver-side, exactly as in the
reference — `brightsky_client.py:31-69`; here any fetcher or a JSON file
works), and everything from parsing onward is a DataFrame plan:

- S3 record normalizer (`brightsky_client.py:77-92`,
  `observations.py:289-310`): API field names → schema columns, ISO-Z
  timestamp parse
- S4 station-metadata extractor (`brightsky_client.py:95-123`)
- P7 observation-type routing (`observations.py:160-238`): join records to
  sources on source_id; historical→validated, synop/current→unvalidated,
  unknown→dropped
- P6 past/future temporal split (`observations.py:373-393`,
  `forecasts.py:180-201`)
- J5 new-station discovery anti join (`stations.py:89-154`)
- A8 ingest watermark (`observations.py:144-157`)

At scale this is the classic "JSON landing zone → bronze" hop: a
schema-declared ``spark.read.json`` (no inference) and per-batch merges.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import ntz_lit
from ..operators.merge import merge_first_wins, merge_update_wins

# raw API record schema (BrightSky /weather `weather[]` entries)
API_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.StringType()),  # ISO-8601 with Z
        T.StructField("source_id", T.LongType()),
        T.StructField("temperature", T.DoubleType()),
        T.StructField("precipitation", T.DoubleType()),
        T.StructField("wind_speed", T.DoubleType()),
        T.StructField("wind_direction", T.IntegerType()),
        T.StructField("cloud_cover", T.IntegerType()),
        T.StructField("pressure_msl", T.DoubleType()),
        T.StructField("sunshine", T.DoubleType()),
        T.StructField("visibility", T.DoubleType()),
        T.StructField("dew_point", T.DoubleType()),
        T.StructField("relative_humidity", T.IntegerType()),
    ]
)

# raw API source schema (`sources[]` entries)
API_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("observation_type", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("height", T.DoubleType()),
        T.StructField("station_name", T.StringType()),
        T.StructField("wmo_station_id", T.StringType()),
        T.StructField("first_record", T.StringType()),
        T.StructField("last_record", T.StringType()),
    ]
)

_KNOWN_TYPES = ("historical", "synop", "current")


def _parse_iso_z(col):
    """ISO-8601 'Z' string → naive UTC timestamp (brightsky_client.py:80).

    ``to_timestamp`` would apply the session zone to offset-less strings;
    stripping the offset textually and parsing to NTZ is exact and
    host-independent. Malformed strings become NULL (parse-to-NULL path,
    brightsky_client.py:103-113).
    """
    cleaned = F.regexp_replace(col, r"(Z|[+-][0-9]{2}:[0-9]{2})$", "")
    return F.try_to_timestamp(
        cleaned, F.lit("yyyy-MM-dd'T'HH:mm:ss")
    ).cast("timestamp_ntz")


def read_api_records(spark: SparkSession, path: str) -> DataFrame:
    """Landing-zone JSON(-lines) of weather records, schema-declared."""
    return spark.read.schema(API_RECORD_SCHEMA).json(path)


def read_api_sources(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(API_SOURCE_SCHEMA).json(path)


def normalize_records(records: DataFrame) -> DataFrame:
    """S3: API fields → bronze columns (relative_humidity→humidity,
    pressure_msl→pressure), ISO-Z parse."""
    return records.select(
        F.col("source_id"),
        _parse_iso_z(F.col("timestamp")).alias("timestamp"),
        F.col("temperature"),
        F.col("relative_humidity").alias("humidity"),
        F.col("pressure_msl").alias("pressure"),
        F.col("wind_speed"),
        F.col("wind_direction"),
        F.col("precipitation"),
        F.col("cloud_cover"),
        F.col("visibility"),
        F.col("sunshine"),
        F.col("dew_point"),
    )


def extract_stations(sources: DataFrame) -> DataFrame:
    """S4: `sources[]` → weather_stations rows (brightsky_client.py:95-123)."""
    return sources.select(
        F.coalesce(F.col("id").cast("string"), F.lit("unknown")).alias("station_id"),
        F.coalesce(F.col("station_name"), F.col("wmo_station_id")).alias(
            "station_name"
        ),
        F.col("lat").alias("latitude"),
        F.col("lon").alias("longitude"),
        F.col("height").alias("altitude"),
        F.lit("brightsky").alias("source"),
        _parse_iso_z(F.col("first_record")).alias("first_record_date"),
        _parse_iso_z(F.col("last_record")).alias("last_record_date"),
    )


def route_observations(records: DataFrame, sources: DataFrame) -> DataFrame:
    """P7: join records↔sources on source_id, set validated by type,
    drop unknown types (observations.py:160-238)."""
    src = F.broadcast(
        sources.select(
            F.col("id").alias("source_id"),
            F.coalesce(F.col("observation_type"), F.lit("unknown")).alias("obs_type"),
            F.col("lat"),
            F.col("lon"),
        )
    )
    return (
        records.join(src, "source_id", "left")
        .withColumn("obs_type", F.coalesce(F.col("obs_type"), F.lit("unknown")))
        .filter(F.col("obs_type").isin(*_KNOWN_TYPES))
        .select(
            F.col("source_id").cast("string").alias("station_id"),
            "timestamp",
            "temperature",
            "humidity",
            "pressure",
            "wind_speed",
            "wind_direction",
            "precipitation",
            "cloud_cover",
            "visibility",
            "sunshine",
            "dew_point",
            F.col("lat").alias("latitude"),
            F.col("lon").alias("longitude"),
            F.lit("brightsky").alias("source"),
            (F.col("obs_type") == "historical").alias("validated"),
            F.col("obs_type").alias("source_type"),
        )
    )


def split_past_future(
    normalized: DataFrame, asof: dt.datetime
) -> tuple[DataFrame, DataFrame]:
    """P6: records strictly before asof are observations; strictly after are
    forecasts (observations.py:373-393, forecasts.py:180-201)."""
    past = normalized.filter(F.col("timestamp") < ntz_lit(asof))
    future = normalized.filter(F.col("timestamp") > ntz_lit(asof))
    return past, future


def discover_new_stations(
    observed: DataFrame, stations: DataFrame, asof: dt.datetime
) -> DataFrame:
    """J5: station_ids present in data but absent from the dim → placeholder
    rows (stations.py:89-154)."""
    new_ids = (
        observed.select("station_id")
        .distinct()
        .join(stations.select("station_id"), "station_id", "left_anti")
    )
    return new_ids.select(
        "station_id",
        F.concat(F.lit("Station "), F.col("station_id")).alias("station_name"),
        F.lit(None).cast("double").alias("latitude"),
        F.lit(None).cast("double").alias("longitude"),
        F.lit(None).cast("double").alias("altitude"),
        F.lit("discovered").alias("source"),
        ntz_lit(asof).alias("first_record_date"),
        ntz_lit(asof).alias("last_record_date"),
    )


def upsert_stations(stations: DataFrame, incoming: DataFrame) -> DataFrame:
    """S7: station upsert with GREATEST(last_record_date) partial update
    (observations.py:119-128, stations.py:56-75)."""
    merged = merge_update_wins(
        stations.withColumn("__existing_last", F.col("last_record_date")),
        incoming.withColumn("__existing_last", F.lit(None).cast("timestamp_ntz")),
        keys=["station_id"],
    )
    old_last = F.broadcast(
        stations.select(
            "station_id", F.col("last_record_date").alias("__old_last")
        )
    )
    return (
        merged.drop("__existing_last")
        .join(old_last, "station_id", "left")
        .withColumn(
            "last_record_date",
            F.greatest(F.col("last_record_date"), F.col("__old_last")),
        )
        .drop("__old_last")
    )


def ingest_watermark(bronze_obs: DataFrame):
    """A8: MAX(timestamp) high-water mark (observations.py:144-157)."""
    return bronze_obs.agg(F.max("timestamp").alias("high_watermark")).first()[0]


def ingest_observations_batch(
    bronze: DataFrame,
    records: DataFrame,
    sources: DataFrame,
    asof: dt.datetime,
) -> DataFrame:
    """Full observation ingestion hop: normalize → route → past-only →
    update-wins merge into bronze (observations.py:321-407)."""
    routed = route_observations(normalize_records(records), sources)
    past, _ = split_past_future(routed, asof)
    batch = past.withColumn("_ingest_ts", ntz_lit(asof))
    return merge_update_wins(
        bronze, batch, keys=["station_id", "timestamp"], order_col="_ingest_ts"
    )


def ingest_forecasts_batch(
    bronze: DataFrame,
    records: DataFrame,
    sources: DataFrame,
    asof: dt.datetime,
) -> DataFrame:
    """Forecast ingestion hop: future-only, forecast_timestamp stamped with
    the run time (forecast versioning, forecasts.py:183-184), first-wins
    merge (DO NOTHING, forecasts.py:233-243)."""
    routed = route_observations(normalize_records(records), sources)
    _, future = split_past_future(routed, asof)
    batch = (
        future.withColumnRenamed("timestamp", "target_timestamp")
        .withColumn("forecast_timestamp", ntz_lit(asof))
        .withColumn("_ingest_ts", ntz_lit(asof))
        .drop("validated", "source_type")
    )
    batch = batch.select(*bronze.columns)
    return merge_first_wins(
        bronze,
        batch,
        keys=["station_id", "forecast_timestamp", "target_timestamp"],
        order_col="_ingest_ts",
    )
