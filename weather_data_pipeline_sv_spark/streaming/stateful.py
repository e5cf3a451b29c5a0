"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no stateful streaming (SURVEY.md §2.8) — this is part of
the engine's large-scale-pipeline surface: gap-based sessionization, the
canonical custom stateful operator Spark's built-in windows can't express
(``window()`` is fixed-width; ``session_window()`` exists but can't carry
custom per-session accumulators or emit custom close records).

Two implementations with identical semantics:

- ``sessionize_batch``: gaps-and-islands over window functions — the
  oracle-checkable batch form (catalog entry ``e1_sessionize``).
- ``sessionize_stream``: ``applyInPandasWithState`` keyed on user_id with a
  (open-session accumulator) state struct. Emits a session row when a new
  event arrives more than ``gap`` after the session's last event; the open
  session survives micro-batch (and restart — state lives in the
  checkpoint) boundaries. State per key is O(1), so total state is bounded
  by the number of active keys regardless of stream length.

Scale note: the stateful shuffle is keyed on user_id — the same hash
partitioning every micro-batch, so state stays local to its partition;
skewed users cost one hot partition (mitigate upstream by salting sessions
per day if a key is pathological).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEFAULT_GAP_MINUTES = 360

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

# open-session accumulator carried across micro-batches
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _micros(c):
    return F.unix_micros(c.cast("timestamp"))


def sessionize_batch(
    events: DataFrame,
    gap_minutes: int = DEFAULT_GAP_MINUTES,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessions as gaps-and-islands: a session breaks where the
    gap to the previous event exceeds ``gap_minutes``. One window pass +
    one aggregation, both shuffling on user_id only."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev.isNull() | ((_micros(F.col(ts_col)) - _micros(prev)) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        events.withColumn("__new", is_new)
        .withColumn("session_idx", F.sum("__new").over(wc))
        .groupBy(user_col, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = DEFAULT_GAP_MINUTES,
) -> DataFrame:
    """Streaming sessionization over (user_id, ts, value) with custom state.

    Emits CLOSED sessions only; the in-flight session per user stays in
    state until a later event (possibly batches later) exceeds the gap.
    Within a batch, events are folded in (ts ascending) order.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[Any], state: GroupState
    ) -> Iterator[Any]:
        import pandas as pd

        (user_id,) = key
        if state.exists:
            start_us, last_us, n_events, total_value = state.get
        else:
            start_us, last_us, n_events, total_value = None, None, 0, 0.0

        closed: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for ts, value in zip(pdf["ts"], pdf["value"]):
                t_us = int(pd.Timestamp(ts).value // 1_000)
                if last_us is not None and t_us - last_us > gap_us:
                    closed.append((user_id, start_us, last_us, n_events, total_value))
                    start_us, n_events, total_value = t_us, 0, 0.0
                if start_us is None:
                    start_us = t_us
                last_us = t_us
                n_events += 1
                total_value += float(value)

        state.update((start_us, last_us, n_events, total_value))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1] * 1_000) for c in closed],
                    "session_end": [pd.Timestamp(c[2] * 1_000) for c in closed],
                    "n_events": [c[3] for c in closed],
                    "total_value": [c[4] for c in closed],
                }
            )

    # watermark-free: state is driven purely by event arrival; timeouts
    # (ProcessingTimeTimeout) would flush idle sessions in production
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
