"""Skew mitigation: salted aggregation and salted joins.

AQE (`spark.sql.adaptive.skewJoin`) already splits skewed SORT-MERGE join
partitions at runtime — prefer it and do nothing for plain joins. These
operators cover what AQE cannot:

- ``salted_aggregate``: a groupBy whose key space is tiny / hot (e.g. 3
  return-flag values across 600 B rows) reduces to a handful of final
  partitions no matter how many executors exist. Salting splits each key
  into ``n_salts`` partial groups (shuffle 1 is uniform), then re-aggregates
  the partials (shuffle 2 moves ~keys x n_salts tiny rows). Only algebraic
  aggregates decompose this way — sum/count/min/max directly, avg as
  sum/count — which is exactly what this helper exposes.
  NOTE: Spark's own partial aggregation (map-side combine) already handles
  most of this when upstream partitioning is uniform; explicit salting
  matters when the input is ALREADY hash-partitioned by the hot key (e.g.
  reading bucketed data, or aggregating after a keyed shuffle) so partials
  themselves land on one reducer.
- ``salted_broadcast_replicate_join``: equi join where one key dominates
  the probe side and the build side is small-but-not-tiny: the build side
  replicates every row ``n_salts`` times, the probe side picks a
  deterministic salt from a row hash, and the join key becomes
  (key, salt) — each hot key now spreads over n_salts reducers.

Everything is deterministic: salts come from ``xxhash64`` of caller-named
columns, never ``rand()``, so re-runs and oracle comparisons are stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DECOMP = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max, avg}. avg decomposes into sum+count internally.
    ``salt_cols``: columns hashed for the deterministic salt (default: all
    non-key columns).
    """
    salt_src = salt_cols or [c for c in df.columns if c not in keys]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(n_salts))

    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for out, (col, fn) in aggs.items():
        if fn == "avg":
            partial_exprs += [
                F.sum(col).alias(f"__s_{out}"),
                F.count(col).alias(f"__c_{out}"),
            ]
            final_exprs.append(
                (F.sum(f"__s_{out}") / F.sum(f"__c_{out}")).alias(out)
            )
        elif fn in _DECOMP:
            p, f_ = _DECOMP[fn]
            partial_exprs.append(p(col).alias(f"__p_{out}"))
            final_exprs.append(f_(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")

    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*partial_exprs)
    )
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_broadcast_replicate_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n_salts: int = 16,
    probe_salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi join resilient to probe-side key skew.

    The build side is exploded ``n_salts``× (acceptable when build is
    small); the probe side computes a deterministic salt, and the join runs
    on (key, salt). Row-for-row identical to ``probe.join(build, key)``.
    """
    salt_src = probe_salt_cols or [c for c in probe.columns if c != key]
    p = probe.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(n_salts))
    )
    b = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return p.join(b, [key, "__salt"]).drop("__salt")
