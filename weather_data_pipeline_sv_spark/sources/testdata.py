"""Readers for the driver-generated deterministic parquet testdata.

Tables (one parquet file each, see TESTDATA.md): TPC-H-ish star schema +
``events`` (stream-shaped) + ``documents``/``embeddings`` (training-data
pipeline substrate).

Scale notes: each ``spark.read.parquet`` is a columnar vectorized scan;
filters/projections applied by callers reach the scan via Catalyst
(PushedFilters / ReadSchema), so these helpers deliberately do NOT cache or
materialize anything.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import configure_session

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(
    spark: SparkSession, sf_dir: str, *names: str
) -> dict[str, DataFrame]:
    """Load the named testdata tables (all of them by default)."""
    configure_session(spark)
    use = names or TESTDATA_TABLES
    out = {}
    for n in use:
        df = spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))
        if n == "events":
            df = _fix_nanos(df, "ts")
        out[n] = df
    return out


def _fix_nanos(df: DataFrame, col: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
    ``configure_session`` sets ``spark.sql.legacy.parquet.nanosAsLong`` so it
    arrives as a bigint of epoch-nanos. Floor-truncate to micros — exactly
    what DuckDB's ns→us cast does — so both engines see identical values.

    The result is cast to TIMESTAMP_NTZ (session tz is UTC, so the cast is
    wall-clock preserving): plain TimestampType is an instant, and
    ``collect()`` renders instants through the *OS* timezone, which would
    shift values on a non-UTC driver host. NTZ collects as the naive UTC
    wall time everywhere — matching DuckDB and the other parquet tables.
    """
    if isinstance(df.schema[col].dataType, T.LongType):
        df = df.withColumn(
            col,
            F.expr(f"cast(timestamp_micros({col} div 1000) as timestamp_ntz)"),
        )
    return df


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register each table as a temp view so ``spark.sql`` can use it."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)
