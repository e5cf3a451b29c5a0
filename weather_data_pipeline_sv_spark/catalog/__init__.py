"""Query catalog: every operator from SURVEY.md §2 as an executable proof.

Each entry pairs a Spark DataFrame implementation (``(spark, sf_dir) ->
DataFrame``) with an equivalent ANSI SQL string the DuckDB oracle can run on
the same parquet tables. Column names AND types are aligned on both sides so
the driver's order-insensitive value-hash comparison holds.

Determinism rules used throughout (see SURVEY.md §7):
- no wall-clock: every time window is anchored to a scalar computed from the
  data itself (max timestamp), mirroring the reference's watermark pattern
- every floating-point aggregate is rounded at the same point on both sides
- every top-k / window ranking carries a unique-key tiebreaker
- integer-ish aggregates are cast to BIGINT on both sides (DuckDB's
  ``sum(int)`` would otherwise widen to HUGEINT)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every catalog module so its queries register."""
    from . import (  # noqa: F401
        composite,
        core,
        extras,
        hybrid,
        multimodal,
        text,
        text_bpe_sketch,
        text_chunks,
        text_dedup,
        text_retrieval,
        vector,
        weatherlike,
    )


def all_queries():
    load_all()
    return dict(QUERIES)


def all_oracles():
    load_all()
    return dict(ORACLES)
