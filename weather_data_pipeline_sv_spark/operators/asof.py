"""As-of (backward-looking point-in-time) join.

Spark has no ASOF join operator; the naive theta-join
(``l.ts >= r.ts`` + argmax) explodes to O(N·M) per key. This is the
canonical scale-correct re-expression:

1. tag both inputs and UNION them (no join at all)
2. one window pass per key ordered by (ts, tag): ``last(right_payload,
   ignorenulls=True)`` carries the most recent right row forward
3. keep the left-tagged rows; the carried struct is their as-of match

Cost: a single shuffle on the ``by`` keys + one sort — the same price as
one window function, independent of how many right rows precede each left
row. Right rows at exactly ``l.ts == r.ts`` match (tag ordering puts the
right row first), mirroring DuckDB/pandas ``ASOF JOIN ... ON l.ts >= r.ts``
semantics, which is how the catalog oracle (``j8_asof_join``) checks this
operator end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance: Column | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.on <= left.on`` (per ``by`` keys); null columns when none.

    ``right_cols``: right payload columns to carry (default: all except
    ``on``/``by``). Carried columns are renamed ``<col><suffix>``; the
    matched right timestamp arrives as ``<on><suffix>``.
    ``tolerance``: optional max lookback (e.g. ``F.expr("INTERVAL 1 HOUR")``)
    — older matches become nulls, like pandas ``merge_asof(tolerance=...)``.
    """
    by = by or []
    payload_cols = right_cols or [
        c for c in right.columns if c != on and c not in by
    ]

    payload = F.struct(
        F.col(on).alias(on), *[F.col(c).alias(c) for c in payload_cols]
    )
    r = right.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(0).alias("__tag"),
        payload.alias("__p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by],
    )
    l_ = left.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        *[F.col(c) for c in left.columns if c not in by],
    )

    w = (
        Window.partitionBy(*by)
        .orderBy("__t", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l_).withColumn(
        "__m", F.last("__p", ignorenulls=True).over(w)
    )

    match = F.col("__m")
    if tolerance is not None:
        match = F.when(
            F.col("__m").isNotNull()
            & (F.col("__m")[on] >= F.col("__t") - tolerance),
            F.col("__m"),
        )

    out_left = [c for c in left.columns if c not in by]
    return (
        carried.filter(F.col("__tag") == 1)
        .withColumn("__mm", match)
        .select(
            *by,
            *out_left,
            F.col(f"__mm.{on}").alias(f"{on}{suffix}"),
            *[F.col(f"__mm.{c}").alias(f"{c}{suffix}") for c in payload_cols],
        )
    )
