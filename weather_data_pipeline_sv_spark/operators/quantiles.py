"""Exact interpolated quantiles with bounded shuffled state.

Spark's builtin ``percentile`` is exact but holds a value→count map for
each group inside ONE aggregation buffer: state is O(distinct values) on
a single task, and for a raw measure column distinct count grows with the
data until the buffer is a driver-of-OOM at 100 TB. The histogram form
here computes the SAME interpolated quantile from a count-by-value
histogram + cumulative sum:

1. ``groupBy(group, value).count()`` — a partial-aggregating shuffle whose
   key space is (groups × value grid), bounded by VALUE-SPACE, not rows
   (prices live on a cent grid, quantities on integers);
2. one window pass per group ordered by value for the cumulative count —
   a distributed, spillable sort over at most |value grid| rows per group;
3. the two order statistics around position p·(n−1) picked via
   conditional aggregation, interpolated with exactly Spark's
   ``percentile`` formula ``(ceil(h)−h)·v_lo + (h−floor(h))·v_hi`` so the
   rewrite is bit-identical to the builtin (and to DuckDB
   ``quantile_cont``, which the builtin already hash-matches).

No driver collect, no global sort, no single-buffer map. The reference
pipeline computes no percentiles (its aggregations are avg/min/max/count
grain rollups); this operator exists on its own terms as the
bounded-state twin of Spark's builtin ``percentile`` — parity is proven
against the builtin and against DuckDB ``quantile_cont`` (the a18
oracle), not against the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import rnd


def grouped_exact_quantiles(
    df: DataFrame,
    group_cols: list[str],
    quantiles: dict[str, tuple[str, float]],
    grid_decimals: dict[str, int] | None = None,
) -> DataFrame:
    """Per-group exact continuous quantiles, one output column per entry of
    ``quantiles`` (``out_name -> (value_col, p)``).

    ``grid_decimals`` optionally snaps a value column to a fixed decimal
    grid (``rnd``, the engine-stable floor-round) BEFORE counting. On data
    already on that grid (cent prices, integer quantities) the snap is an
    identity — results and hashes are unchanged — but it makes the
    bounded-state guarantee structural: the histogram key space stays
    |grid| even if upstream float noise creeps in.
    """
    value_cols = sorted({col for col, _ in quantiles.values()})
    per_col = {
        col: {name: p for name, (c, p) in quantiles.items() if c == col}
        for col in value_cols
    }
    parts = [
        _one_column_quantiles(
            df, group_cols, col, per_col[col],
            (grid_decimals or {}).get(col),
        )
        for col in value_cols
    ]
    # every part carries EVERY group (all-null values become the null
    # histogram bucket — see _one_column_quantiles), so the multi-column
    # combine is an inner join; eqNullSafe keys keep groups whose group
    # KEY is null (plain equality would drop them, which the builtin
    # doesn't)
    out = parts[0]
    for part in parts[1:]:
        cond = None
        for c in group_cols:
            eq = out[c].eqNullSafe(part[c])
            cond = eq if cond is None else cond & eq
        out = out.join(part, cond).drop(*[part[c] for c in group_cols])
    return out


def _one_column_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps: dict[str, float],
    grid: int | None,
) -> DataFrame:
    v = F.col(value_col).cast("double")
    if grid is not None:
        v = rnd(v, grid)
    # NULL values get their OWN histogram bucket rather than a pre-filter:
    # the builtin `percentile` ignores nulls, and the when-guarded sums
    # below count only non-null buckets — but keeping the null bucket
    # means a group whose values are ALL null still reaches the final
    # groupBy (yielding null quantiles, exactly as the builtin renders
    # it) with no extra group-enumeration scan of the input
    hist = df.groupBy(*group_cols, v.alias("__v")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    nn = F.when(F.col("__v").isNotNull(), F.col("__c"))
    wg = Window.partitionBy(*group_cols)
    # nulls sort FIRST, contributing 0 to the when-guarded cumulative sum,
    # so __cum at each non-null bucket is the count of non-null values <=
    # it and __n the group's non-null total — positions match the builtin
    cum = hist.select(
        *group_cols,
        "__v",
        F.coalesce(
            F.sum(nn).over(
                wg.orderBy(F.asc_nulls_first("__v"))
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
            F.lit(0),
        ).alias("__cum"),
        F.coalesce(
            F.sum(nn).over(
                wg.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
            F.lit(0),
        ).alias("__n"),
    )
    aggs = []
    for name, p in ps.items():
        # h is constant within a group (a function of __n alone), so the
        # max() aggregates below just carry it out of the groupBy
        h = F.lit(float(p)) * (F.col("__n") - F.lit(1)).cast("double")
        v_lo = F.min(F.when(F.col("__cum") >= F.floor(h) + 1, F.col("__v")))
        v_hi = F.min(F.when(F.col("__cum") >= F.ceil(h) + 1, F.col("__v")))
        hc = F.max(h)
        q = F.when(F.ceil(hc) == F.floor(hc), v_lo).otherwise(
            (F.ceil(hc).cast("double") - hc) * v_lo
            + (hc - F.floor(hc).cast("double")) * v_hi
        )
        aggs.append(q.alias(name))
    return cum.groupBy(*group_cols).agg(*aggs)
