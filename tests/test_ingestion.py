"""Ingestion-layer tests with file-based JSON fixtures standing in for the
BrightSky HTTP API (SURVEY.md §2.1 S1-S4, §2.2 P6/P7, §2.3 J5/S7)."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.plans import schemas
from weather_data_pipeline_sv_spark.sources.ingestion import (
    discover_new_stations,
    extract_stations,
    ingest_forecasts_batch,
    ingest_observations_batch,
    ingest_watermark,
    normalize_records,
    read_api_records,
    read_api_sources,
    route_observations,
    split_past_future,
    upsert_stations,
)

ASOF = dt.datetime(2025, 10, 10, 12, 0, 0)


def _record(ts, source_id, temp=10.0, **kw):
    base = {
        "timestamp": ts,
        "source_id": source_id,
        "temperature": temp,
        "precipitation": 0.0,
        "wind_speed": 5.0,
        "wind_direction": 90,
        "cloud_cover": 10,
        "pressure_msl": 1013.2,
        "sunshine": 30.0,
        "visibility": 10000.0,
        "dew_point": 4.0,
        "relative_humidity": 55,
    }
    base.update(kw)
    return base


_SOURCES = [
    {"id": 1, "observation_type": "historical", "lat": 52.5, "lon": 13.4,
     "height": 40.0, "station_name": "Alpha", "wmo_station_id": "W1",
     "first_record": "2020-01-01T00:00:00Z", "last_record": "2025-10-10T00:00:00Z"},
    {"id": 2, "observation_type": "synop", "lat": 52.6, "lon": 13.5,
     "height": 50.0, "station_name": None, "wmo_station_id": "W2",
     "first_record": "2021-01-01T00:00:00+00:00", "last_record": "not-a-date"},
    {"id": 3, "observation_type": "current", "lat": 52.7, "lon": 13.6,
     "height": 60.0, "station_name": "Gamma", "wmo_station_id": "W3",
     "first_record": None, "last_record": None},
    {"id": 4, "observation_type": "mystery", "lat": 52.8, "lon": 13.7,
     "height": 70.0, "station_name": "Delta", "wmo_station_id": "W4",
     "first_record": "2022-01-01T00:00:00Z", "last_record": "2025-01-01T00:00:00Z"},
]

_RECORDS = [
    _record("2025-10-10T10:00:00Z", 1, temp=11.5),
    _record("2025-10-10T11:00:00Z", 1, temp=12.5),
    _record("2025-10-10T11:00:00Z", 2, temp=13.5),
    _record("2025-10-10T11:00:00Z", 3, temp=14.5),
    _record("2025-10-10T11:00:00Z", 4, temp=15.5),   # unknown type → dropped
    _record("2025-10-10T14:00:00Z", 1, temp=16.5),   # future → forecast
    _record("2025-10-10T15:00:00Z", 1, temp=17.5),   # future → forecast
    _record("garbage-timestamp", 1, temp=18.5),      # parse-to-NULL
]


@pytest.fixture(scope="module")
def api_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("api_landing")
    (base / "records.jsonl").write_text(
        "\n".join(json.dumps(r) for r in _RECORDS)
    )
    (base / "sources.jsonl").write_text(
        "\n".join(json.dumps(s) for s in _SOURCES)
    )
    return base


@pytest.fixture(scope="module")
def api(spark, api_dir):
    return (
        read_api_records(spark, str(api_dir / "records.jsonl")),
        read_api_sources(spark, str(api_dir / "sources.jsonl")),
    )


def test_normalize_records(api):
    records, _ = api
    rows = {r["temperature"]: r for r in normalize_records(records).collect()}
    r = rows[11.5]
    assert r["timestamp"] == dt.datetime(2025, 10, 10, 10, 0, 0)
    assert r["humidity"] == 55 and r["pressure"] == 1013.2  # renamed fields
    assert rows[18.5]["timestamp"] is None  # malformed → NULL


def test_extract_stations(api):
    _, sources = api
    rows = {r["station_id"]: r for r in extract_stations(sources).collect()}
    assert rows["2"]["station_name"] == "W2"  # wmo fallback
    assert rows["2"]["last_record_date"] is None  # malformed date → NULL
    assert rows["1"]["first_record_date"] == dt.datetime(2020, 1, 1)
    assert rows["3"]["altitude"] == 60.0


def test_route_observations(api):
    records, sources = api
    routed = route_observations(normalize_records(records), sources)
    rows = routed.collect()
    assert all(r["station_id"] != "4" for r in rows)  # unknown dropped
    flags = {(r["station_id"], r["validated"], r["source_type"]) for r in rows}
    assert ("1", True, "historical") in flags
    assert ("2", False, "synop") in flags
    assert ("3", False, "current") in flags


def test_split_past_future(api):
    records, sources = api
    routed = route_observations(normalize_records(records), sources)
    past, future = split_past_future(routed, ASOF)
    assert past.filter(F.col("timestamp").isNotNull()).count() == 4
    assert future.count() == 2
    # NULL timestamps fall out of both (three-valued logic, as in reference
    # Python: None comparisons would throw; records without ts never ingest)
    assert past.filter(F.col("timestamp").isNull()).count() == 0


def test_discover_and_upsert_stations(spark, api):
    _, sources = api
    stations = extract_stations(sources).filter(F.col("station_id") != "3")
    observed = spark.createDataFrame(
        [("3",), ("99",)], "station_id string"
    )
    fresh = discover_new_stations(observed, stations, ASOF)
    ids = {r["station_id"] for r in fresh.collect()}
    assert ids == {"3", "99"}

    merged = upsert_stations(stations, fresh)
    rows = {r["station_id"]: r for r in merged.collect()}
    assert set(rows) == {"1", "2", "4", "3", "99"}
    assert rows["99"]["latitude"] is None  # placeholder
    # GREATEST(last_record_date): existing station keeps its newer date
    incoming_older = extract_stations(sources).withColumn(
        "last_record_date", F.lit(dt.datetime(2000, 1, 1)).cast("timestamp_ntz")
    )
    kept = upsert_stations(stations, incoming_older)
    assert {r["station_id"]: r for r in kept.collect()}["1"][
        "last_record_date"
    ] == dt.datetime(2025, 10, 10)


def test_ingest_observation_and_forecast_batches(spark, api):
    records, sources = api
    bronze_obs = spark.createDataFrame([], schemas.RAW_WEATHER_OBSERVATIONS)
    bronze_fcst = spark.createDataFrame([], schemas.RAW_WEATHER_FORECASTS)

    obs1 = ingest_observations_batch(bronze_obs, records, sources, ASOF)
    assert obs1.count() == 4
    wm = ingest_watermark(obs1)
    assert wm == dt.datetime(2025, 10, 10, 11, 0, 0)

    # idempotent re-delivery: same batch again → same rows (update-wins)
    obs2 = ingest_observations_batch(obs1, records, sources, ASOF)
    assert obs2.count() == 4

    fcst1 = ingest_forecasts_batch(bronze_fcst, records, sources, ASOF)
    rows = fcst1.collect()
    assert len(rows) == 2
    assert all(r["forecast_timestamp"] == ASOF for r in rows)  # issue stamped
    # re-delivery at a later issue time adds a new version (bitemporal), while
    # the same issue run would DO NOTHING
    fcst2 = ingest_forecasts_batch(fcst1, records, sources, ASOF)
    assert fcst2.count() == 2
    later = ASOF + dt.timedelta(hours=1)
    fcst3 = ingest_forecasts_batch(fcst1, records, sources, later)
    # both future targets re-issue under the 13:00 run → 2 old + 2 new versions
    assert fcst3.count() == 4
    issues = {r["forecast_timestamp"] for r in fcst3.collect()}
    assert issues == {ASOF, later}
