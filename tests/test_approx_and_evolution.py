"""Approximate aggregates (the 100 TB substitutes for exact ops) and
parquet schema evolution under the engine's explicit-schema discipline.

The catalog keeps exact count-distinct/percentiles because gold parity
demands it (SURVEY A5), but at 100 TB the approximate forms are what a
user reaches for first — these tests pin their error contracts. Schema
evolution matters because a long-lived bronze dataset WILL gain columns;
the engine's explicit `StructType` reads must keep old files readable
(missing column → null) without a full rewrite.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from weather_data_pipeline_sv_spark.sources import load_tables

SF_DIR = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    li = load_tables(spark, SF_DIR, "lineitem")["lineitem"]
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
    ).first()
    # HLL++ rsd is a standard deviation, not a bound; 5 sigma is safe and
    # deterministic (the sketch itself is deterministic for fixed input)
    assert abs(row["approx"] - row["exact"]) <= 0.10 * row["exact"]


def test_approx_percentile_within_accuracy(spark):
    li = load_tables(spark, SF_DIR, "lineitem")["lineitem"]
    n = li.count()
    exact_median = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("m")
    ).first()["m"]
    approx_median = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("m")
    ).first()["m"]
    # guarantee: rank error <= n/accuracy; translate to a value tolerance
    # via the empirical rank of the approx answer
    rank_of_approx = li.filter(F.col("l_extendedprice") <= approx_median).count()
    assert abs(rank_of_approx - n / 2) <= n / 10000 + 1
    # and the values themselves are close on this distribution
    assert abs(approx_median - exact_median) / exact_median < 0.01


def test_explicit_schema_survives_column_addition(spark, tmp_path):
    path = str(tmp_path / "bronze_evolving")
    v1 = spark.createDataFrame(
        [("S1", 1.0), ("S2", 2.0)], "station_id string, temperature double"
    )
    v1.write.mode("append").parquet(path)
    # later files gain a column (schema evolution in the landing zone)
    v2 = spark.createDataFrame(
        [("S3", 3.0, 55)],
        "station_id string, temperature double, humidity int",
    )
    v2.write.mode("append").parquet(path)

    target = T.StructType(
        [
            T.StructField("station_id", T.StringType()),
            T.StructField("temperature", T.DoubleType()),
            T.StructField("humidity", T.IntegerType()),
        ]
    )
    got = {
        r["station_id"]: (r["temperature"], r["humidity"])
        for r in spark.read.schema(target).parquet(path).collect()
    }
    # old files: missing column arrives as null; new files carry the value
    assert got == {"S1": (1.0, None), "S2": (2.0, None), "S3": (3.0, 55)}

    # the reverse direction — narrowing the read schema — prunes freely
    narrow = spark.read.schema(
        T.StructType([T.StructField("station_id", T.StringType())])
    ).parquet(path)
    assert narrow.columns == ["station_id"] and narrow.count() == 3
