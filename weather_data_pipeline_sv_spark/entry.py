"""Driver contract implementation (see repo-root ``__spark_entry__.py``)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .catalog import all_oracles, all_queries

DEFAULT_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing-summary hash aggregation) at sf0.001."""
    return all_queries()["q1_pricing_summary"](spark, DEFAULT_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
