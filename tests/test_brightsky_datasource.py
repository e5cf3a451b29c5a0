"""Python Data Source: partition planning, determinism, filter pushdown."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.sources.brightsky_datasource import (
    BrightskyFixtureDataSource,
    BrightskyFixtureReader,
)


def _register(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(BrightskyFixtureDataSource)


def test_read_shape_and_determinism(spark):
    _register(spark)
    df = (
        spark.read.format("brightsky_fixture")
        .option("stations", "S1,S2")
        .option("start_date", "2025-10-01")
        .option("days", "3")
        .load()
    )
    assert df.count() == 2 * 3 * 24
    assert df.schema["timestamp"].dataType.typeName() == "timestamp_ntz"
    # deterministic: same options -> identical rows, run to run
    df2 = (
        spark.read.format("brightsky_fixture")
        .option("stations", "S1,S2")
        .option("start_date", "2025-10-01")
        .option("days", "3")
        .load()
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, df2.collect()))
    # values in physical ranges
    stats = df.agg(
        F.min("temperature"), F.max("temperature"),
        F.min("humidity"), F.max("humidity"),
        F.min("wind_direction"), F.max("wind_direction"),
        F.min("precipitation"),
    ).first()
    assert -5.0 <= stats[0] and stats[1] <= 30.0
    assert 30 <= stats[2] and stats[3] <= 100
    assert 0 <= stats[4] and stats[5] <= 359
    assert stats[6] >= 0.0


def test_station_filter_prunes_partitions_and_rows(spark):
    _register(spark)
    df = (
        spark.read.format("brightsky_fixture")
        .option("stations", "S1,S2,S3")
        .option("days", "2")
        .load()
        .filter(F.col("station_id") == "S2")
    )
    rows = df.collect()
    assert len(rows) == 2 * 24
    assert {r["station_id"] for r in rows} == {"S2"}

    # partition-level proof of the pushdown: a pushed station equality
    # shrinks the planned partitions from stations*days to days
    from pyspark.sql.datasource import EqualTo

    rd = BrightskyFixtureReader({"stations": "S1,S2,S3", "days": "2"})
    assert len(rd.partitions()) == 6
    rest = list(rd.pushFilters([EqualTo(("station_id",), "S2")]))
    assert rest == []  # fully consumed by the source
    assert len(rd.partitions()) == 2

    # non-station filters are left for Spark to evaluate
    rd2 = BrightskyFixtureReader({"stations": "S1", "days": "1"})
    from pyspark.sql.datasource import GreaterThan

    leftover = list(rd2.pushFilters([GreaterThan(("temperature",), 0.0)]))
    assert len(leftover) == 1


def test_feeds_existing_normalizer_pipeline(spark):
    """The source's output joins the batch pipeline exactly where the
    reference's normalized HTTP records do (S3/P6/P7 path)."""
    _register(spark)
    df = (
        spark.read.format("brightsky_fixture")
        .option("stations", "S1")
        .option("days", "1")
        .load()
    )
    validated = df.withColumn(
        "validated", F.col("observation_type") == "historical"
    ).filter(F.col("validated"))
    assert 0 < validated.count() <= 24
