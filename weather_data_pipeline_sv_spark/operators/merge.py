"""Merge-by-key: the engine's replacement for Postgres ON CONFLICT.

The reference uses three distinct conflict policies (SURVEY.md §2.1 S5-S7,
§7 hard part 1):

- update-wins  — `ON CONFLICT … DO UPDATE SET *` (observations upsert,
  `observations.py:258-283`; gold upsert, `aggregation.py:205-222`)
- first-wins   — `ON CONFLICT … DO NOTHING` (forecasts,
  `forecasts.py:233-243`)
- partial-update — DO UPDATE on a *subset* of columns, keeping the old row's
  other columns (staging upserts, quirk Q8, `cleaning.py:153-163,296-299`)

All are expressed as distributed DataFrame ops — a union + one hash
aggregation (or join) keyed on the natural key. No collect, no loops.

At scale: the shuffle is on the merge key (e.g. station_id×ts — high
cardinality). For incremental runs pair this with date-partitioned gold and
``partitionOverwriteMode=dynamic`` so only touched date partitions rewrite
(see writers.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PRIO = "__merge_priority"
_RN = "__merge_rn"


def _dedup_incoming(incoming: DataFrame, keys: Sequence[str], order_col: str | None,
                    keep_first: bool) -> DataFrame:
    """Within one batch, keep a single row per key.

    Postgres raises on duplicate keys inside a single INSERT…ON CONFLICT;
    the reference avoids that only by construction. We resolve instead:
    by ``order_col`` descending for update-wins (latest delivery wins) or
    ascending for first-wins.
    """
    if order_col is None:
        return incoming.dropDuplicates(list(keys))
    direction = F.asc(order_col) if keep_first else F.desc(order_col)
    w = Window.partitionBy(*keys).orderBy(direction)
    return (
        incoming.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )


def merge_update_wins(
    existing: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
    order_col: str | None = None,
) -> DataFrame:
    """New rows replace existing rows with the same key (S5)."""
    incoming = _dedup_incoming(incoming, keys, order_col, keep_first=False)
    tagged = existing.withColumn(_PRIO, F.lit(0)).unionByName(
        incoming.withColumn(_PRIO, F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(F.desc(_PRIO))
    return (
        tagged.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_PRIO, _RN)
    )


def merge_first_wins(
    existing: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
    order_col: str | None = None,
) -> DataFrame:
    """Existing rows are kept; only genuinely new keys append (S6).

    Implemented as left-anti join + union — cheaper than the window variant
    when the incoming batch is small relative to existing (no reshuffle of
    existing beyond the join).
    """
    incoming = _dedup_incoming(incoming, keys, order_col, keep_first=True)
    fresh = incoming.join(existing.select(*keys).distinct(), list(keys), "left_anti")
    return existing.unionByName(fresh)


def merge_partial_update(
    existing: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str],
    order_col: str | None = None,
) -> DataFrame:
    """Update-wins, but only ``update_cols`` take the incoming value on
    conflict; every other column keeps the existing row's value (Q8/S7).
    New keys insert whole. Column-wise coalesce over a full outer join.
    """
    incoming = _dedup_incoming(incoming, keys, order_col, keep_first=False)
    cols = existing.columns
    joined = (
        existing.withColumn("__ex_present", F.lit(True))
        .alias("ex")
        .join(
            incoming.withColumn("__inc_present", F.lit(True)).alias("inc"),
            list(keys),
            "full_outer",
        )
        .withColumn("__ex_present", F.coalesce(F.col("__ex_present"), F.lit(False)))
        .withColumn("__inc_present", F.coalesce(F.col("__inc_present"), F.lit(False)))
    )
    out_cols = []
    for c in cols:
        if c in keys:
            out_cols.append(F.col(c))
        elif c in update_cols:
            # incoming wins when an incoming row exists for the key (a NULL
            # overwrite is intentional: DO UPDATE SET c = EXCLUDED.c
            # writes NULLs too)
            out_cols.append(
                F.when(F.col("__inc_present"), F.col(f"inc.{c}"))
                .otherwise(F.col(f"ex.{c}"))
                .alias(c)
            )
        else:
            out_cols.append(
                F.when(F.col("__ex_present"), F.col(f"ex.{c}"))
                .otherwise(F.col(f"inc.{c}"))
                .alias(c)
            )
    return joined.select(*out_cols)


def scd2_history(
    changes: DataFrame,
    keys: Sequence[str],
    state_cols: Sequence[str],
    ts_col: str,
    order_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type 2: turn a change log into versioned
    validity intervals.

    The reference's upsert sinks (S5-S7) keep only the latest row per key —
    update-wins history is lost. SCD2 is the standard warehouse answer: one
    row per (key, state version) with ``valid_from``/``valid_to`` interval,
    ``is_current`` flag and a monotonically increasing ``version``.

    Semantics:
    - within one (keys, ts) instant, the row with the highest ``order_col``
      wins (dedup of same-instant deliveries);
    - consecutive deliveries with an unchanged state tuple collapse into the
      earlier interval (no-op updates don't open a new version);
    - ``valid_to`` = next change's ts, NULL for the open (current) interval.

    Scale shape: everything is windows over (keys ORDER BY ts) — a single
    hash-partitioned shuffle on the entity key; no joins, no collect.
    """
    order_col = order_col or ts_col
    w_inst = Window.partitionBy(*keys, ts_col).orderBy(F.desc(order_col))
    w_key = Window.partitionBy(*keys).orderBy(ts_col)
    state = F.struct(*[F.col(c) for c in state_cols])
    dedup = (
        changes.withColumn(_RN, F.row_number().over(w_inst))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )
    collapsed = (
        dedup.withColumn("__prev", F.lag(state).over(w_key))
        # null-safe: the first row per key (prev NULL) always opens a version
        .filter(F.col("__prev").isNull() | ~F.col("__prev").eqNullSafe(state))
        .drop("__prev")
    )
    return (
        collapsed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w_key))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumn("version", F.row_number().over(w_key).cast("int"))
        .drop(ts_col)
    )
