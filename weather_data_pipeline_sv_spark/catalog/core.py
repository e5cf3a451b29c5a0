"""Core relational operators (SURVEY.md §2.1-§2.7) over the testdata.

Each query is the generic form of a reference operator (cited per-query) —
e.g. the IDW spatial range join (`aggregation.py:73-153` in the reference)
becomes a numeric range join + inverse-distance-weighted mean over
customer balances; the KNN stored function (`schema.sql:357-385`) becomes a
per-group top-k; the LAG temporal-consistency check (`cleaning.py:348-364`)
becomes a per-user jump detector over `events`.

Physical-plan intent at 100 TB (checked via .explain in tests/bench):
- dimension joins broadcast (nation/region/25-row center tables)
- range joins are broadcast-nested-loop against tiny build sides —
  never a cartesian shuffle of two big relations
- aggregations are partial+final hash aggs (map-side combine for free)
- top-k per group is a single window shuffle on the group key; global
  top-k is TakeOrderedAndProject (no full sort)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_tables
from ..functions.geo import haversine_km_sql
from ..functions.rounding import rnd, rnd_sql
from . import register


def _micros(c):
    """Exact epoch microseconds (bigint) — parity with DuckDB epoch_us().

    Cast via timestamp so TIMESTAMP_NTZ parquet columns work too (session
    timezone is pinned to UTC, so the cast is wall-clock preserving).
    """
    return F.unix_micros(c.cast("timestamp"))


def _trunc(unit: str, c) -> F.Column:
    """date_trunc that stays timezone-naive.

    Spark's date_trunc yields plain TimestampType (an instant) even for NTZ
    input, and instants collect through the OS timezone. Casting back to NTZ
    under the UTC session keeps results host-timezone-independent.
    """
    return F.date_trunc(unit, c).cast("timestamp_ntz")


# ---------------------------------------------------------------------------
# A1/A5/A7 — hash aggregation with multiple measures (flagship).
# Generic form of the gold-grain group-by `aggregation.py:112-153`.
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 100.0 + 0.5 + 1e-6) / 100.0                                  AS sum_qty,
           floor((sum(l_extendedprice)) * 100.0 + 0.5 + 1e-6) / 100.0                             AS sum_base_price,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5 + 1e-6) / 100.0          AS sum_disc_price,
           floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100.0 + 0.5 + 1e-6) / 100.0 AS sum_charge,
           floor((avg(l_quantity)) * 10000.0 + 0.5 + 1e-6) / 10000.0                                  AS avg_qty,
           floor((avg(l_extendedprice)) * 10000.0 + 0.5 + 1e-6) / 10000.0                             AS avg_price,
           floor((avg(l_discount)) * 10000.0 + 0.5 + 1e-6) / 10000.0                                  AS avg_disc,
           count(*)                                                   AS count_order
    FROM lineitem
    WHERE l_shipdate <= (SELECT max(l_shipdate) FROM lineitem) - INTERVAL 90 DAY
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    # data-anchored watermark, kept inside the plan (a broadcast 1-row cross
    # join, like the reference's scalar CTE): no wall-clock, no host-timezone
    # dependence, no driver round-trip
    hi = li.agg(F.max("l_shipdate").alias("_hi"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.crossJoin(F.broadcast(hi))
        .filter(F.col("l_shipdate") <= F.col("_hi") - F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
            rnd(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            rnd(F.sum(disc_price), 2).alias("sum_disc_price"),
            rnd(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            rnd(F.avg("l_quantity"), 4).alias("avg_qty"),
            rnd(F.avg("l_extendedprice"), 4).alias("avg_price"),
            rnd(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# P1 — time-window filter anchored to a data watermark (cleaning.py:143).
# ---------------------------------------------------------------------------
@register(
    "p1_time_window_filter",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 24 HOUR
    """,
)
def p1_time_window_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    hi = ev.agg(F.max("ts").alias("_hi"))
    return (
        ev.crossJoin(F.broadcast(hi))
        .filter(F.col("ts") >= F.col("_hi") - F.expr("INTERVAL 24 HOURS"))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# P2 — completeness filter: drop rows with >=2 NULLs among 3 critical
# fields (cleaning.py:144-149). NULLs synthesized via nullif sentinels.
# ---------------------------------------------------------------------------
@register(
    "p2_completeness_filter",
    oracle="""
    WITH c AS (
      SELECT l_orderkey, l_linenumber,
             nullif(l_discount, 0.0) AS crit_discount,
             nullif(l_tax, 0.0)      AS crit_tax,
             nullif(l_quantity, 1.0) AS crit_quantity
      FROM lineitem
    )
    SELECT * FROM c
    WHERE (CASE WHEN crit_discount IS NULL THEN 1 ELSE 0 END
         + CASE WHEN crit_tax      IS NULL THEN 1 ELSE 0 END
         + CASE WHEN crit_quantity IS NULL THEN 1 ELSE 0 END) <= 1
    """,
)
def p2_completeness_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    c = li.select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_discount"), F.lit(0.0)).alias("crit_discount"),
        F.nullif(F.col("l_tax"), F.lit(0.0)).alias("crit_tax"),
        F.nullif(F.col("l_quantity"), F.lit(1.0)).alias("crit_quantity"),
    )
    n_null = sum(
        F.when(F.col(c_).isNull(), 1).otherwise(0)
        for c_ in ("crit_discount", "crit_tax", "crit_quantity")
    )
    return c.filter(n_null <= 1)


# ---------------------------------------------------------------------------
# P5 — derived quality flags + first-match CASE score chain
# (cleaning.py:85-137, quirk Q2: branch order matters).
# ---------------------------------------------------------------------------
@register(
    "p5_quality_flags",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (l_discount = 0.0 OR l_tax = 0.0)                       AS has_missing_values,
           (l_quantity > 45.0 OR l_extendedprice > 90000.0
              OR l_discount > 0.08)                                AS has_outliers,
           CAST(CASE
             WHEN l_discount > 0.0 AND l_tax > 0.0
                  AND l_quantity <= 45.0 AND l_extendedprice <= 90000.0
                  AND l_discount <= 0.08                           THEN 1.0
             WHEN l_discount = 0.0 OR l_tax = 0.0                  THEN 0.6
             WHEN l_quantity > 45.0 OR l_extendedprice > 90000.0   THEN 0.3
             ELSE 0.5
           END AS DOUBLE)                                          AS data_quality_score,
           CASE WHEN l_quantity > 45.0
                THEN 'Quantity outlier: ' || CAST(CAST(l_quantity AS INTEGER) AS VARCHAR)
                ELSE 'ok' END                                      AS quality_notes
    FROM lineitem
    """,
)
def p5_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    d, t, q, p = (F.col(x) for x in ("l_discount", "l_tax", "l_quantity", "l_extendedprice"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        ((d == 0.0) | (t == 0.0)).alias("has_missing_values"),
        ((q > 45.0) | (p > 90000.0) | (d > 0.08)).alias("has_outliers"),
        F.when(
            (d > 0.0) & (t > 0.0) & (q <= 45.0) & (p <= 90000.0) & (d <= 0.08),
            F.lit(1.0),
        )
        .when((d == 0.0) | (t == 0.0), F.lit(0.6))
        .when((q > 45.0) | (p > 90000.0), F.lit(0.3))
        .otherwise(F.lit(0.5))
        .alias("data_quality_score"),
        F.when(
            q > 45.0,
            F.concat(F.lit("Quantity outlier: "), q.cast("int").cast("string")),
        )
        .otherwise(F.lit("ok"))
        .alias("quality_notes"),
    )


# ---------------------------------------------------------------------------
# P8 — 2-D bounding-box filter (stations.py:26-37).
# ---------------------------------------------------------------------------
@register(
    "p8_bbox_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity BETWEEN 10.0 AND 20.0
      AND l_extendedprice BETWEEN 10000.0 AND 20000.0
    """,
)
def p8_bbox_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.filter(
        F.col("l_quantity").between(10.0, 20.0)
        & F.col("l_extendedprice").between(10000.0, 20000.0)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


# ---------------------------------------------------------------------------
# J1 — fact ⨝ broadcast dims (aggregation.py:62-72).
# ---------------------------------------------------------------------------
@register(
    "j1_broadcast_dim_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def j1_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "nation", "region")
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "c_name", "c_mktsegment", "n_name", "r_name")
    )


# ---------------------------------------------------------------------------
# J2/A2 — range join + IDW weighted mean, the reference's spatial core
# (aggregation.py:73-153): each point joins every "centroid" within a
# radius; weight = 1/d² with a NULLIF zero-distance guard (quirk Q11).
# Numeric 1-D analogue: customers vs per-nation balance centers.
# ---------------------------------------------------------------------------
@register(
    "j2_idw_range_join",
    oracle="""
    WITH centers AS (
      SELECT c_nationkey AS center_key, floor((avg(c_acctbal)) * 1.0 + 0.5 + 1e-6) / 1.0 AS center
      FROM customer GROUP BY c_nationkey
    ),
    matched AS (
      SELECT ct.center_key, c.c_custkey, c.c_acctbal,
             abs(c.c_acctbal - ct.center) AS dist,
             1.0 / nullif(abs(c.c_acctbal - ct.center)
                          * abs(c.c_acctbal - ct.center), 0.0) AS w
      FROM customer c CROSS JOIN centers ct
      WHERE abs(c.c_acctbal - ct.center) <= 1000.0
    )
    SELECT center_key AS n_nationkey,
           count(*) AS n_points,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers,
           floor((avg(dist)) * 10000.0 + 0.5 + 1e-6) / 10000.0 AS avg_distance,
           floor((max(dist)) * 10000.0 + 0.5 + 1e-6) / 10000.0 AS max_distance,
           floor((sum(c_acctbal * w) / nullif(sum(w), 0.0)) * 10000.0 + 0.5 + 1e-6) / 10000.0 AS idw_acctbal
    FROM matched
    GROUP BY center_key
    """,
)
def j2_idw_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    centers = cust.groupBy(F.col("c_nationkey").alias("center_key")).agg(
        rnd(F.avg("c_acctbal"), 0).alias("center")
    )
    dist = F.abs(F.col("c_acctbal") - F.col("center"))
    matched = (
        cust.crossJoin(F.broadcast(centers))  # 25-row build side: BNL join
        .withColumn("dist", dist)
        .filter(F.col("dist") <= 1000.0)
        .withColumn("w", F.lit(1.0) / F.nullif(F.col("dist") * F.col("dist"), F.lit(0.0)))
    )
    return matched.groupBy(F.col("center_key").alias("n_nationkey")).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.countDistinct("c_custkey").alias("n_customers"),
        rnd(F.avg("dist"), 4).alias("avg_distance"),
        rnd(F.max("dist"), 4).alias("max_distance"),
        rnd(
            F.sum(F.col("c_acctbal") * F.col("w")) / F.nullif(F.sum("w"), F.lit(0.0)), 4
        ).alias("idw_acctbal"),
    )


# ---------------------------------------------------------------------------
# J3 — self equi-join + interval predicate (schema.sql:419-427):
# click→purchase funnel within 30 minutes per user.
# ---------------------------------------------------------------------------
@register(
    "j3_interval_self_join",
    oracle="""
    SELECT a.event_id AS click_id, b.event_id AS purchase_id,
           a.user_id AS user_id,
           (epoch_us(b.ts) - epoch_us(a.ts)) / 60000000.0 AS minutes_between
    FROM events a JOIN events b ON a.user_id = b.user_id
    WHERE a.event_type = 'click' AND b.event_type = 'purchase'
      AND b.ts >= a.ts
      AND epoch_us(b.ts) - epoch_us(a.ts) <= 1800000000
    """,
)
def j3_interval_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    a = ev.filter(F.col("event_type") == "click").alias("a")
    b = ev.filter(F.col("event_type") == "purchase").alias("b")
    gap_us = _micros(F.col("b.ts")) - _micros(F.col("a.ts"))
    return (
        a.join(b, F.col("a.user_id") == F.col("b.user_id"))
        .filter((F.col("b.ts") >= F.col("a.ts")) & (gap_us <= 1_800_000_000))
        .select(
            F.col("a.event_id").alias("click_id"),
            F.col("b.event_id").alias("purchase_id"),
            F.col("a.user_id").alias("user_id"),
            (gap_us / F.lit(60_000_000.0)).alias("minutes_between"),
        )
    )


# ---------------------------------------------------------------------------
# J4/A8 — cross join against a 1-row scalar aggregate (schema.sql:347).
# ---------------------------------------------------------------------------
@register(
    "j4_cross_scalar_join",
    oracle="""
    WITH hi AS (SELECT max(o_orderdate) AS max_date FROM orders)
    SELECT o_orderkey, o_orderdate,
           (epoch_us(hi.max_date) - epoch_us(o_orderdate)) / 3600000000.0 AS age_hours
    FROM orders CROSS JOIN hi
    """,
)
def j4_cross_scalar_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    hi = o.agg(F.max("o_orderdate").alias("max_date"))
    return o.crossJoin(F.broadcast(hi)).select(
        "o_orderkey",
        "o_orderdate",
        (
            (_micros(F.col("max_date")) - _micros(F.col("o_orderdate")))
            / F.lit(3_600_000_000.0)
        ).alias("age_hours"),
    )


# ---------------------------------------------------------------------------
# J5 — anti join: new-entity discovery (stations.py:101-118).
# ---------------------------------------------------------------------------
@register(
    "j5_anti_join",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j5_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    return t["customer"].join(
        t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


# ---------------------------------------------------------------------------
# J6 — semi join: existence check (observations.py:85-88).
# ---------------------------------------------------------------------------
@register(
    "j6_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def j6_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return t["customer"].join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# A4 — circular (vector) weighted mean of a direction, with the ±360
# one-wrap normalization (aggregation.py:132-135, 176-183; quirk Q6).
# ---------------------------------------------------------------------------
@register(
    "a4_circular_mean",
    oracle="""
    WITH d AS (
      SELECT l_returnflag,
             CAST(l_partkey % 360 AS DOUBLE) AS direction,
             l_quantity AS w
      FROM lineitem
    ), s AS (
      SELECT l_returnflag,
             count(*) AS n_rows,
             degrees(atan2(sum(sin(radians(direction)) * w),
                           sum(cos(radians(direction)) * w))) AS ang
      FROM d GROUP BY l_returnflag
    )
    SELECT l_returnflag, n_rows,
           floor((CASE WHEN ang < 0 THEN ang + 360 WHEN ang >= 360 THEN ang - 360 ELSE ang END) * 10000.0 + 0.5 + 1e-6) / 10000.0 AS direction_avg
    FROM s
    """,
)
def a4_circular_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    d = li.select(
        "l_returnflag",
        (F.col("l_partkey") % 360).cast("double").alias("direction"),
        F.col("l_quantity").alias("w"),
    )
    ang = F.degrees(
        F.atan2(
            F.sum(F.sin(F.radians(F.col("direction"))) * F.col("w")),
            F.sum(F.cos(F.radians(F.col("direction"))) * F.col("w")),
        )
    )
    s = d.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"), ang.alias("ang")
    )
    a = F.col("ang")
    return s.select(
        "l_returnflag",
        "n_rows",
        rnd(
            F.when(a < 0, a + 360).when(a >= 360, a - 360).otherwise(a), 4
        ).alias("direction_avg"),
    )


# ---------------------------------------------------------------------------
# A9 — conditional aggregation (transform.py:217-224).
# ---------------------------------------------------------------------------
@register(
    "a9_conditional_agg",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(count(*) FILTER (WHERE o_totalprice > 200000.0) AS BIGINT) AS n_high_value,
           floor((count(*) FILTER (WHERE o_totalprice > 200000.0) * 1.0 / count(*)) * 10000.0 + 0.5 + 1e-6) / 10000.0
             AS share_high_value
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def a9_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    high = F.sum(F.when(F.col("o_totalprice") > 200000.0, 1).otherwise(0))
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        high.cast("long").alias("n_high_value"),
        rnd(high * 1.0 / F.count(F.lit(1)), 4).alias("share_high_value"),
    )


# ---------------------------------------------------------------------------
# A10 — UNION ALL layer-count report (README.md:144-153).
# ---------------------------------------------------------------------------
@register(
    "a10_union_report",
    oracle="""
    SELECT 'orders' AS layer, count(*) AS n_rows FROM orders
    UNION ALL SELECT 'customer' AS layer, count(*) AS n_rows FROM customer
    UNION ALL SELECT 'lineitem' AS layer, count(*) AS n_rows FROM lineitem
    """,
)
def a10_union_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer", "lineitem")
    parts = [
        t[name].agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(name).alias("layer"), "n_rows"
        )
        for name in ("orders", "customer", "lineitem")
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# A8 — scalar watermark aggregates (observations.py:150-153).
# ---------------------------------------------------------------------------
@register(
    "a8_watermark_scalar",
    oracle="""
    SELECT max(ts) AS high_watermark, min(ts) AS low_watermark,
           count(*) AS n_rows
    FROM events
    """,
)
def a8_watermark_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    return ev.agg(
        F.max("ts").alias("high_watermark"),
        F.min("ts").alias("low_watermark"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# W1 — LAG-based temporal-consistency check (cleaning.py:348-364):
# flag jumps |Δvalue| > 50 between consecutive events ≤ 1h apart.
# ---------------------------------------------------------------------------
@register(
    "w1_lag_jump_check",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id, ts, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
             lag(ts)    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    SELECT user_id, event_id, ts, value, prev_value,
           value - prev_value AS delta_value,
           epoch_us(ts) - epoch_us(prev_ts) AS gap_us
    FROM w
    WHERE prev_value IS NOT NULL
      AND abs(value - prev_value) > 50.0
      AND epoch_us(ts) - epoch_us(prev_ts) <= 3600000000
    """,
)
def w1_lag_jump_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = _micros(F.col("ts")) - _micros(F.col("prev_ts"))
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.lag("value").over(w).alias("prev_value"),
            F.lag("ts").over(w).alias("prev_ts"),
        )
        .filter(
            F.col("prev_value").isNotNull()
            & (F.abs(F.col("value") - F.col("prev_value")) > 50.0)
            & (gap <= 3_600_000_000)
        )
        .select(
            "user_id",
            "event_id",
            "ts",
            "value",
            "prev_value",
            (F.col("value") - F.col("prev_value")).alias("delta_value"),
            gap.alias("gap_us"),
        )
    )


# ---------------------------------------------------------------------------
# W2 — argmax-per-group / latest row per key (schema.sql:312-328).
# ---------------------------------------------------------------------------
@register(
    "w2_latest_per_key",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice, o_orderstatus
    FROM (
      SELECT o.*, row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders o
    ) WHERE rn = 1
    """,
)
def w2_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# O1 — global order+limit with unique tiebreak (weather.py:46-47).
# Physically TakeOrderedAndProject in Spark — no full sort at scale.
# ---------------------------------------------------------------------------
@register(
    "o1_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def o1_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    )


# ---------------------------------------------------------------------------
# O3 — KNN top-k per group by distance (schema.sql:357-385): the 3
# customers whose balance is nearest each nation's (rounded) mean.
# ---------------------------------------------------------------------------
@register(
    "o3_knn_topk",
    oracle="""
    WITH centers AS (
      SELECT c_nationkey AS center_key, floor((avg(c_acctbal)) * 1.0 + 0.5 + 1e-6) / 1.0 AS center
      FROM customer GROUP BY c_nationkey
    ), d AS (
      SELECT c.c_nationkey AS n_nationkey, c.c_custkey, c.c_acctbal,
             abs(c.c_acctbal - ct.center) AS dist,
             CAST(row_number() OVER (
               PARTITION BY c.c_nationkey
               ORDER BY abs(c.c_acctbal - ct.center) ASC, c.c_custkey ASC
             ) AS INTEGER) AS rank
      FROM customer c JOIN centers ct ON c.c_nationkey = ct.center_key
    )
    SELECT n_nationkey, c_custkey, c_acctbal, dist, rank
    FROM d WHERE rank <= 3
    """,
)
def o3_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    centers = cust.groupBy(F.col("c_nationkey").alias("center_key")).agg(
        rnd(F.avg("c_acctbal"), 0).alias("center")
    )
    d = cust.join(
        F.broadcast(centers), F.col("c_nationkey") == F.col("center_key")
    ).withColumn("dist", F.abs(F.col("c_acctbal") - F.col("center")))
    w = Window.partitionBy("c_nationkey").orderBy(F.asc("dist"), F.asc("c_custkey"))
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            F.col("c_nationkey").alias("n_nationkey"),
            "c_custkey",
            "c_acctbal",
            "dist",
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# S3 — record normalizer: rename / JSON-extract / uppercase
# (brightsky_client.py:77-92, observations.py:289-310).
# ---------------------------------------------------------------------------
@register(
    "s3_normalize_rename",
    oracle="""
    SELECT event_id,
           ts AS event_ts,
           user_id,
           upper(event_type) AS event_type_uc,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
           coalesce(value, 0.0) AS value_filled
    FROM events
    """,
)
def s3_normalize_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    return ev.select(
        "event_id",
        F.col("ts").alias("event_ts"),
        "user_id",
        F.upper(F.col("event_type")).alias("event_type_uc"),
        F.get_json_object(F.col("props"), "$.k").cast("int").alias("prop_k"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value_filled"),
    )


# ---------------------------------------------------------------------------
# F1 — scalar-function showcase (SURVEY §2.7): round/abs/least/greatest/
# coalesce/nullif/concat/cast/date_trunc.
# ---------------------------------------------------------------------------
@register(
    "f1_scalar_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor((l_extendedprice) * 10.0 + 0.5 + 1e-6) / 10.0                         AS rounded_price,
           abs(l_discount - 0.05)                            AS abs_disc_delta,
           least(l_quantity, l_discount * 100.0, l_tax * 100.0)    AS least3,
           greatest(l_quantity, l_discount * 100.0, l_tax * 100.0) AS greatest3,
           coalesce(nullif(l_returnflag, 'N'), 'none')       AS flag_or_none,
           'qty=' || CAST(CAST(l_quantity AS INTEGER) AS VARCHAR) AS qty_note,
           CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month
    FROM lineitem
    """,
)
def f1_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rnd(F.col("l_extendedprice"), 1).alias("rounded_price"),
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc_delta"),
        F.least(
            F.col("l_quantity"), F.col("l_discount") * 100.0, F.col("l_tax") * 100.0
        ).alias("least3"),
        F.greatest(
            F.col("l_quantity"), F.col("l_discount") * 100.0, F.col("l_tax") * 100.0
        ).alias("greatest3"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
        F.concat(F.lit("qty="), F.col("l_quantity").cast("int").cast("string")).alias(
            "qty_note"
        ),
        _trunc("month", F.col("l_shipdate")).alias("ship_month"),
    )


# ---------------------------------------------------------------------------
# A1 — tumbling-window (hourly) aggregation via date_trunc
# (aggregation.py:112-153): events per hour × type.
# ---------------------------------------------------------------------------
@register(
    "a1_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_ts, event_type,
           count(*) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           floor((avg(value)) * 10000.0 + 0.5 + 1e-6) / 10000.0 AS avg_value,
           floor((sum(value)) * 100.0 + 0.5 + 1e-6) / 100.0 AS sum_value,
           floor((min(value)) * 10000.0 + 0.5 + 1e-6) / 10000.0 AS min_value,
           floor((max(value)) * 10000.0 + 0.5 + 1e-6) / 10000.0 AS max_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def a1_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    return ev.groupBy(
        _trunc("hour", F.col("ts")).alias("hour_ts"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        rnd(F.avg("value"), 4).alias("avg_value"),
        rnd(F.sum("value"), 2).alias("sum_value"),
        rnd(F.min("value"), 4).alias("min_value"),
        rnd(F.max("value"), 4).alias("max_value"),
    )


# ---------------------------------------------------------------------------
# E1 — gap-based sessionization (gaps-and-islands; 6h gap). The batch twin
# of streaming/stateful.py::sessionize_stream — tests assert the stateful
# streaming operator emits exactly these sessions (minus each user's open
# last session).
# ---------------------------------------------------------------------------
_SESSION_GAP_US = 360 * 60 * 1_000_000


@register(
    "e1_sessionize",
    oracle=f"""
    WITH w AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                     > CAST({_SESSION_GAP_US} AS BIGINT)
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ), s AS (
      SELECT user_id, ts, value,
             CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
      FROM w
    )
    SELECT user_id, session_idx,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events, {rnd_sql('sum(value)', 2)} AS total_value
    FROM s GROUP BY user_id, session_idx
    """,
)
def e1_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import sessionize_batch

    ev = load_tables(spark, sf_dir, "events")["events"]
    s = sessionize_batch(ev, gap_minutes=360)
    return s.select(
        "user_id",
        F.col("session_idx").cast("long").alias("session_idx"),
        "session_start",
        "session_end",
        "n_events",
        rnd(F.col("total_value"), 2).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# J7 — grid-bucketed spatial range join (SURVEY.md X4, the 100 TB scale
# path for J2's ST_DWithin). Deterministic lat/lon synthesized from
# customer/nation keys; the Spark side goes through the cell-bucketed
# equi join while the oracle brute-forces the cross join — proving the
# bucketing prunes nothing.
# ---------------------------------------------------------------------------
_GEO_RADIUS_KM = 500.0


@register(
    "j7_grid_spatial_join",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey, (c_custkey % 125) - 62.0 AS lat,
             ((c_custkey * 7) % 360) - 180.0 AS lon
      FROM customer
    ),
    cents AS (
      SELECT n_nationkey, (n_nationkey * 5) - 60.0 AS c_lat,
             (n_nationkey * 14) - 168.0 AS c_lon
      FROM nation
    ),
    matched AS (
      SELECT n_nationkey, c_custkey,
             {haversine_km_sql('lat', 'lon', 'c_lat', 'c_lon')} AS distance_km
      FROM pts CROSS JOIN cents
    )
    SELECT n_nationkey, count(*) AS n_points,
           {rnd_sql('avg(distance_km)', 4)} AS avg_distance_km,
           {rnd_sql('max(distance_km)', 4)} AS max_distance_km
    FROM matched WHERE distance_km <= {_GEO_RADIUS_KM}
    GROUP BY n_nationkey
    """,
)
def j7_grid_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.spatial import bucketed_range_join

    t = load_tables(spark, sf_dir, "customer", "nation")
    pts = t["customer"].select(
        "c_custkey",
        ((F.col("c_custkey") % 125) - 62.0).cast("double").alias("lat"),
        (((F.col("c_custkey") * 7) % 360) - 180.0).cast("double").alias("lon"),
    )
    cents = t["nation"].select(
        "n_nationkey",
        ((F.col("n_nationkey") * 5) - 60.0).cast("double").alias("c_lat"),
        ((F.col("n_nationkey") * 14) - 168.0).cast("double").alias("c_lon"),
    )
    joined = bucketed_range_join(pts, cents, radius_km=_GEO_RADIUS_KM)
    return joined.groupBy("n_nationkey").agg(
        F.count(F.lit(1)).alias("n_points"),
        rnd(F.avg("distance_km"), 4).alias("avg_distance_km"),
        rnd(F.max("distance_km"), 4).alias("max_distance_km"),
    )


# ---------------------------------------------------------------------------
# A13 — salted two-phase aggregation on a pathologically-hot key space
# (l_returnflag: 3 values — at 100 TB a plain groupBy funnels into 3 final
# partitions when the input is already partitioned by the key). The oracle
# is the plain one-shot aggregation: salting must be value-identical.
# ---------------------------------------------------------------------------
@register(
    "a13_salted_agg",
    oracle=f"""
    SELECT l_returnflag,
           {rnd_sql('sum(l_quantity)', 2)} AS sum_qty,
           count(*) AS n_rows,
           {rnd_sql('min(l_extendedprice)', 2)} AS min_price,
           {rnd_sql('max(l_extendedprice)', 2)} AS max_price,
           {rnd_sql('avg(l_discount)', 4)} AS avg_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a13_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_aggregate

    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    out = salted_aggregate(
        li,
        keys=["l_returnflag"],
        aggs={
            "sum_qty": ("l_quantity", "sum"),
            "n_rows": ("l_orderkey", "count"),
            "min_price": ("l_extendedprice", "min"),
            "max_price": ("l_extendedprice", "max"),
            "avg_disc": ("l_discount", "avg"),
        },
        n_salts=16,
        salt_cols=["l_orderkey", "l_linenumber"],
    )
    return out.select(
        "l_returnflag",
        rnd(F.col("sum_qty"), 2).alias("sum_qty"),
        "n_rows",
        rnd(F.col("min_price"), 2).alias("min_price"),
        rnd(F.col("max_price"), 2).alias("max_price"),
        rnd(F.col("avg_disc"), 4).alias("avg_disc"),
    )


# ---------------------------------------------------------------------------
# J8 — as-of (point-in-time) join: each click event picks up the most
# recent error event at-or-before it per user. Spark re-expression is
# union + carry-forward window (operators/asof.py) — one shuffle, no
# theta-join explosion; the oracle is DuckDB's native ASOF LEFT JOIN.
# ---------------------------------------------------------------------------
@register(
    "j8_asof_join",
    oracle="""
    SELECT l.event_id, l.ts, l.user_id, l.value,
           r.ts AS ts_asof, r.value AS err_value_asof
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def j8_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = load_tables(spark, sf_dir, "events")["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("value").alias("err_value")
    )
    out = asof_join(clicks, errors, on="ts", by=["user_id"], right_cols=["err_value"])
    return out.select(
        "event_id", "ts", "user_id", "value", "ts_asof", "err_value_asof"
    )


# ---------------------------------------------------------------------------
# W3 — hourly gap-fill + forward fill (hypertable-style regularization):
# irregular events → per-user regular hourly series, gaps materialized and
# forward-filled. Spine via per-key sequence() explode (map-side), fill via
# one window pass (operators/timeseries.py).
# ---------------------------------------------------------------------------
@register(
    "w3_gap_fill",
    oracle=f"""
    WITH lph AS (
      SELECT user_id, hour, value FROM (
        SELECT user_id, date_trunc('hour', ts) AS hour, value,
               row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ),
    bounds AS (
      SELECT user_id, min(hour) AS mn, max(hour) AS mx FROM lph GROUP BY user_id
    ),
    spine AS (
      SELECT b.user_id, u.h AS hour
      FROM bounds b, unnest(generate_series(b.mn, b.mx, INTERVAL 1 HOUR)) AS u(h)
    ),
    joined AS (
      SELECT s.user_id, s.hour, l.value
      FROM spine s LEFT JOIN lph l ON s.user_id = l.user_id AND s.hour = l.hour
    )
    SELECT user_id, hour,
           {rnd_sql("last_value(value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", 2)} AS value_ff,
           (value IS NULL) AS is_gap
    FROM joined
    """,
)
def w3_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import gap_fill_hourly

    ev = load_tables(spark, sf_dir, "events")["events"]
    out = gap_fill_hourly(
        ev, keys=["user_id"], ts_col="ts", value_col="value",
        tiebreak_col="event_id",
    )
    return out.select(
        "user_id", "hour", rnd(F.col("value_ff"), 2).alias("value_ff"), "is_gap"
    )


# ---------------------------------------------------------------------------
# A14 — hierarchical rollup cascade (continuous-aggregate / hypertable
# pattern): daily stats REAGGREGATED from hourly partials (sums add,
# counts add, min/max nest, avg = total/n). The oracle aggregates the raw
# rows directly per day — proving the cascade is exact, not approximate
# (a mean-of-means would fail this check on uneven hours).
# ---------------------------------------------------------------------------
@register(
    "a14_rollup_cascade",
    oracle=f"""
    SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) AS n,
           {rnd_sql('sum(value)', 2)} AS total,
           {rnd_sql('avg(value)', 4)} AS avg_value,
           {rnd_sql('min(value)', 2)} AS mn,
           {rnd_sql('max(value)', 2)} AS mx
    FROM events GROUP BY user_id, date_trunc('day', ts)
    """,
)
def a14_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import hourly_partials, reaggregate

    ev = load_tables(spark, sf_dir, "events")["events"]
    hourly = hourly_partials(ev, ["user_id"], "ts", "value")
    daily = reaggregate(hourly, ["user_id"], "hour", "day", "day")
    return daily.select(
        "user_id",
        "day",
        "n",
        rnd(F.col("total"), 2).alias("total"),
        rnd(F.col("total") / F.col("n"), 4).alias("avg_value"),
        rnd(F.col("mn"), 2).alias("mn"),
        rnd(F.col("mx"), 2).alias("mx"),
    )


# ---------------------------------------------------------------------------
# A15 — set operations beyond A10's UNION ALL: EXCEPT and INTERSECT
# (customers with orders vs without, as key sets).
# ---------------------------------------------------------------------------
@register(
    "a15_set_ops",
    oracle="""
    WITH with_orders AS (SELECT DISTINCT o_custkey AS ck FROM orders),
    all_cust AS (SELECT c_custkey AS ck FROM customer),
    no_orders AS (SELECT ck FROM all_cust EXCEPT SELECT ck FROM with_orders),
    have_orders AS (SELECT ck FROM all_cust INTERSECT SELECT ck FROM with_orders)
    SELECT 'no_orders' AS grp, count(*) AS n FROM no_orders
    UNION ALL
    SELECT 'with_orders' AS grp, count(*) AS n FROM have_orders
    """,
)
def a15_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    all_cust = t["customer"].select(F.col("c_custkey").alias("ck"))
    with_orders = t["orders"].select(F.col("o_custkey").alias("ck")).distinct()
    no_orders = all_cust.exceptAll(with_orders).distinct()
    both = all_cust.intersect(with_orders)
    return (
        no_orders.agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("no_orders").alias("grp"), "n")
        .unionByName(
            both.agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit("with_orders").alias("grp"), "n")
        )
    )


# ---------------------------------------------------------------------------
# A16 — ROLLUP grouping sets (multi-grain totals in one pass: per
# (returnflag, linestatus), per returnflag, grand total) with GROUPING()
# markers. One shuffle computes every grain.
# ---------------------------------------------------------------------------
@register(
    "a16_rollup_grouping_sets",
    oracle=f"""
    SELECT coalesce(l_returnflag, '<all>') AS returnflag,
           coalesce(l_linestatus, '<all>') AS linestatus,
           CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
           CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
           count(*) AS n,
           {rnd_sql('sum(l_quantity)', 2)} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a16_rollup_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
            rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "g_flag",
            "g_status",
            "n",
            "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
# A17 — pivot (event_type → columns). The oracle uses conditional
# aggregation, which is also what Spark's pivot compiles to.
# ---------------------------------------------------------------------------
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "a17_pivot",
    oracle=f"""
    SELECT user_id,
           {', '.join(f"count(*) FILTER (WHERE event_type = '{t}') AS n_{t}"
                      for t in _EVENT_TYPES)}
    FROM events GROUP BY user_id
    """,
)
def a17_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    p = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES],
    )


# ---------------------------------------------------------------------------
# A18 — exact percentiles (continuous interpolation): median and p90 per
# group, via the bounded-state histogram form (operators/quantiles.py):
# count-by-value + cumulative sum + Spark-`percentile`-identical
# interpolation. The builtin `percentile` holds an O(distinct-values) map
# in ONE aggregation buffer — for a raw measure like l_extendedprice that
# buffer grows with the data; the histogram's shuffled state is bounded by
# the value GRID (cents / integer quantities) at any corpus size. Values
# are identical to the builtin (same formula), so the oracle stays
# DuckDB's `quantile_cont` — proving the rewrite exact, not approximate.
# ---------------------------------------------------------------------------
@register(
    "a18_percentiles",
    oracle=f"""
    SELECT l_returnflag,
           {rnd_sql('quantile_cont(l_extendedprice, 0.5)', 4)} AS median_price,
           {rnd_sql('quantile_cont(l_extendedprice, 0.9)', 4)} AS p90_price,
           {rnd_sql('quantile_cont(l_quantity, 0.5)', 4)} AS median_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a18_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantiles import grouped_exact_quantiles

    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    q = grouped_exact_quantiles(
        li,
        ["l_returnflag"],
        {
            "median_price": ("l_extendedprice", 0.5),
            "p90_price": ("l_extendedprice", 0.9),
            "median_qty": ("l_quantity", 0.5),
        },
        # identity on this data (prices are exact cents, quantities
        # integers) — the snap just pins the histogram key space to the
        # grid; hashes unchanged vs the builtin-percentile form
        grid_decimals={"l_extendedprice": 2, "l_quantity": 2},
    )
    return q.select(
        "l_returnflag",
        rnd(F.col("median_price"), 4).alias("median_price"),
        rnd(F.col("p90_price"), 4).alias("p90_price"),
        rnd(F.col("median_qty"), 4).alias("median_qty"),
    )


# ---------------------------------------------------------------------------
# W4 — explicit window frames: rolling 4-row mean and running total per
# user (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW / UNBOUNDED PRECEDING).
# ---------------------------------------------------------------------------
@register(
    "w4_rolling_frames",
    oracle=f"""
    SELECT event_id, user_id, ts,
           {rnd_sql('avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)', 4)} AS rolling_avg4,
           {rnd_sql('sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)', 2)} AS running_total
    FROM events
    """,
)
def w4_rolling_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        rnd(F.avg("value").over(w.rowsBetween(-3, 0)), 4).alias("rolling_avg4"),
        rnd(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_total"),
    )


# ---------------------------------------------------------------------------
# F2 — JSON column processing: extract a typed field from the `props` JSON
# string (get_json_object — JVM-side JSON path, no UDF) and aggregate it.
# ---------------------------------------------------------------------------
@register(
    "f2_json_extract",
    oracle=f"""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           {rnd_sql("avg(CAST(json_extract(props, '$.k') AS INTEGER))", 4)} AS avg_k,
           CAST(min(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
           CAST(max(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
    FROM events GROUP BY event_type
    """,
)
def f2_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            rnd(F.avg("k"), 4).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# F3 — string similarity: Levenshtein edit distance between customer name
# and a normalized variant; both engines implement the same classic DP.
# ---------------------------------------------------------------------------
@register(
    "f3_edit_distance",
    oracle="""
    SELECT c_custkey,
           CAST(levenshtein(c_name, replace(c_name, '0', '')) AS INTEGER) AS d_zero,
           CAST(levenshtein(c_name, upper(c_name)) AS INTEGER) AS d_case,
           CAST(levenshtein(c_name, c_mktsegment) AS INTEGER) AS d_segment
    FROM customer
    """,
)
def f3_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, "customer")["customer"]
    return c.select(
        "c_custkey",
        F.levenshtein(F.col("c_name"), F.regexp_replace("c_name", "0", ""))
        .cast("int").alias("d_zero"),
        F.levenshtein(F.col("c_name"), F.upper("c_name")).cast("int").alias("d_case"),
        F.levenshtein(F.col("c_name"), F.col("c_mktsegment")).cast("int").alias("d_segment"),
    )


# ---------------------------------------------------------------------------
# S5/S6/S7 — the three ON CONFLICT merge policies (operators/merge.py),
# oracle-checked: existing = orders not divisible by 3, incoming = a
# modified copy of the even-keyed orders (new custkey/status, doubled
# total). Each policy's full merged table is hash-compared.
# ---------------------------------------------------------------------------
_DUCK_MERGE_INPUTS = """
    ex AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 3 <> 0
    ),
    inc AS (
      SELECT o_orderkey, o_custkey + 1000000 AS o_custkey,
             'X' AS o_orderstatus, o_totalprice * 2 AS o_totalprice
      FROM orders WHERE o_orderkey % 2 = 0
    )
"""


def _merge_inputs(spark: SparkSession, sf_dir: str):
    o = load_tables(spark, sf_dir, "orders")["orders"]
    ex = o.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    inc = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        (F.col("o_custkey") + 1000000).alias("o_custkey"),
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
    )
    return ex, inc


def _merge_out(df: DataFrame) -> DataFrame:
    return df.select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        rnd(F.col("o_totalprice"), 2).alias("total"),
    )


@register(
    "s5_merge_update_wins",
    oracle=f"""
    WITH {_DUCK_MERGE_INPUTS}
    SELECT coalesce(i.o_orderkey, e.o_orderkey) AS o_orderkey,
           CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_custkey ELSE e.o_custkey END AS o_custkey,
           CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_orderstatus ELSE e.o_orderstatus END AS o_orderstatus,
           {rnd_sql('CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_totalprice ELSE e.o_totalprice END', 2)} AS total
    FROM ex e FULL OUTER JOIN inc i ON e.o_orderkey = i.o_orderkey
    """,
)
def s5_merge_update_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.merge import merge_update_wins

    ex, inc = _merge_inputs(spark, sf_dir)
    return _merge_out(merge_update_wins(ex, inc, ["o_orderkey"]))


@register(
    "s6_merge_first_wins",
    oracle=f"""
    WITH {_DUCK_MERGE_INPUTS}
    SELECT o_orderkey, o_custkey, o_orderstatus,
           {rnd_sql('o_totalprice', 2)} AS total
    FROM ex
    UNION ALL
    SELECT i.o_orderkey, i.o_custkey, i.o_orderstatus,
           {rnd_sql('i.o_totalprice', 2)} AS total
    FROM inc i LEFT JOIN ex e ON i.o_orderkey = e.o_orderkey
    WHERE e.o_orderkey IS NULL
    """,
)
def s6_merge_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.merge import merge_first_wins

    ex, inc = _merge_inputs(spark, sf_dir)
    return _merge_out(merge_first_wins(ex, inc, ["o_orderkey"]))


@register(
    "s7_merge_partial_update",
    oracle=f"""
    WITH {_DUCK_MERGE_INPUTS}
    SELECT coalesce(i.o_orderkey, e.o_orderkey) AS o_orderkey,
           CASE WHEN e.o_orderkey IS NOT NULL THEN e.o_custkey ELSE i.o_custkey END AS o_custkey,
           CASE WHEN e.o_orderkey IS NOT NULL THEN e.o_orderstatus ELSE i.o_orderstatus END AS o_orderstatus,
           {rnd_sql('CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_totalprice ELSE e.o_totalprice END', 2)} AS total
    FROM ex e FULL OUTER JOIN inc i ON e.o_orderkey = i.o_orderkey
    """,
)
def s7_merge_partial_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.merge import merge_partial_update

    ex, inc = _merge_inputs(spark, sf_dir)
    return _merge_out(
        merge_partial_update(ex, inc, ["o_orderkey"], update_cols=["o_totalprice"])
    )


# ---------------------------------------------------------------------------
# O2 — global top-1 (ORDER BY ... DESC LIMIT 1, weather.py:91-92 shape)
# with a unique tiebreak for determinism.
# ---------------------------------------------------------------------------
@register(
    "o2_global_top1",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 1
    """,
)
def o2_global_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    return (
        ev.orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(1)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# O4 — plain multi-column sort + limit (ORDER BY postal_code, timestamp
# shape, schema.sql:350) — TakeOrderedAndProject, no full sort.
# ---------------------------------------------------------------------------
@register(
    "o4_multi_sort",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate, o_orderpriority
    FROM orders ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 100
    """,
)
def o4_multi_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    return (
        o.orderBy(F.desc("o_orderdate"), F.asc("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# P9 — the serving-API query shape (weather.py:28-51 generic form):
# equality + range predicates anchored to the data watermark, ordered
# descending with a limit (covers P3 equality filtering and O1 ordering).
# ---------------------------------------------------------------------------
@register(
    "p9_api_history",
    oracle="""
    WITH hi AS (SELECT max(ts) AS h FROM events)
    SELECT event_id, ts, user_id, event_type, value
    FROM events, hi
    WHERE user_id = 42 AND event_type IN ('click', 'view')
      AND ts >= hi.h - INTERVAL 240 HOUR
    ORDER BY ts DESC, event_id DESC LIMIT 50
    """,
)
def p9_api_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    hi = ev.agg(F.max("ts").alias("_h"))
    return (
        ev.crossJoin(F.broadcast(hi))
        .filter(
            (F.col("user_id") == 42)
            & F.col("event_type").isin("click", "view")
            & (F.col("ts") >= F.col("_h") - F.expr("INTERVAL 240 HOURS"))
        )
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(50)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# P6 — past/future temporal split (observations.py:373-393 generic form):
# route rows around an anchor timestamp (the data midpoint) and count
# each side, as the ingest router does with NOW().
# ---------------------------------------------------------------------------
@register(
    "p6_temporal_split",
    oracle="""
    WITH b AS (
      SELECT make_timestamp((epoch_us(min(ts)) + epoch_us(max(ts))) // 2) AS anchor
      FROM events
    )
    SELECT CASE WHEN ts < b.anchor THEN 'past' ELSE 'future' END AS side,
           count(*) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events, b GROUP BY 1
    """,
)
def p6_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    # integer-micros midpoint, floor division on both engines
    b = ev.agg(
        F.expr(
            "cast(timestamp_micros((unix_micros(cast(min(ts) as timestamp)) "
            "+ unix_micros(cast(max(ts) as timestamp))) div 2) as timestamp_ntz)"
        ).alias("anchor")
    )
    return (
        ev.crossJoin(F.broadcast(b))
        .select(
            F.when(F.col("ts") < F.col("anchor"), "past")
            .otherwise("future")
            .alias("side"),
            "user_id",
        )
        .groupBy("side")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# J9 — salted replicate join on a skew-prone fact key: lineitem ⋈ supplier
# through operators/skew.py::salted_broadcast_replicate_join (build side
# exploded n_salts×, probe side deterministically salted, join on
# (key, salt)), then a per-nation revenue rollup. The oracle is the PLAIN
# join + aggregate — the salting must be row-for-row invisible. At 100 TB
# this is the fallback when one fact key floods a partition and AQE's
# skew-split can't help (e.g. a sort-merge join forced by a non-broadcast
# build side); the replicate factor bounds any single task at 1/n_salts of
# the hot key. The build side must be a BOUNDED dimension — the round-3
# 10×/30× bench caught the original part-table variant replicating a
# table that grows with the data (1.6M broadcast rows at 10×, 19 s);
# supplier is the dim whose key actually skews lineitem. Skew-split
# behaviour of the UNSALTED path is pinned in tests/test_scale_guards.py.
# ---------------------------------------------------------------------------
@register(
    "j9_salted_skew_join",
    oracle=f"""
    SELECT s.s_nationkey,
           CAST(count(*) AS BIGINT) AS n_lines,
           {rnd_sql('sum(l.l_extendedprice * (1 - l.l_discount))', 2)} AS revenue,
           {rnd_sql('avg(l.l_quantity)', 4)} AS avg_qty
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY s.s_nationkey
    """,
)
def j9_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_broadcast_replicate_join

    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    li = t["lineitem"].select(
        F.col("l_suppkey").alias("s_suppkey"),
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount",
        "l_quantity",
    )
    supp = t["supplier"].select("s_suppkey", "s_nationkey")
    joined = salted_broadcast_replicate_join(
        li, supp, key="s_suppkey", n_salts=8,
        probe_salt_cols=["l_orderkey", "l_linenumber"],
    )
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        rnd(F.avg("l_quantity"), 4).alias("avg_qty"),
    )


# ---------------------------------------------------------------------------
# W6 — windowed exponential moving average (alpha=0.3 over the trailing 20
# events per user): the time-decayed smoother every metrics/feature
# pipeline ships. Deliberately the TRUNCATED form — the closed-form
# q^-i trick overflows doubles past ~700 rows and an unbounded recursive
# fold can't partition; a 20-row frame keeps the residual below q^20
# ≈ 8e-4 of the signal while the window stays a single per-user shuffle.
# Both engines fold the frame sequentially oldest-to-newest (Spark
# F.aggregate, DuckDB list_reduce with a prepended zero init), so the
# result is bit-identical, not merely close.
# ---------------------------------------------------------------------------
_EWMA_ALPHA = 0.3
_EWMA_WIN = 20


@register(
    "w6_ewma",
    oracle=f"""
    SELECT event_id, user_id,
           {rnd_sql(f'list_reduce(list_prepend(0.0, w), (a, b) -> a * {1 - _EWMA_ALPHA} + {_EWMA_ALPHA} * b)', 6)}
             AS ewma20
    FROM (
      SELECT event_id, user_id,
             list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {_EWMA_WIN - 1} PRECEDING AND CURRENT ROW
             ) AS w
      FROM events
    ) q
    """,
)
def w6_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_WIN - 1), 0)
    )
    frame = F.collect_list("value").over(w)
    fold = F.aggregate(
        frame,
        F.lit(0.0),
        lambda acc, x: acc * F.lit(1 - _EWMA_ALPHA) + F.lit(_EWMA_ALPHA) * x,
    )
    return ev.select("event_id", "user_id", rnd(fold, 6).alias("ewma20"))
