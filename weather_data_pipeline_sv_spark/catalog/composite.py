"""Composite multi-join analytical queries (TPC-H-shaped).

The reference's relational surface is mostly single-join pipelines
(`aggregation.py:61-153` is its deepest chain: 2 joins + group-by). A
100 TB engine must also handle the *compositions* users actually write:
deep multi-way joins, decorrelated EXISTS, scalar-correlated subqueries,
HAVING-subquery filters, and ranking-window families. Each entry here is
one such shape over the testdata star schema, oracle-checked like
everything else.

Physical intent at scale (pinned in tests/test_plan_quality.py for the
family, spot-checked here via bench):
- dim tables (region/nation) broadcast; fact-to-fact joins shuffle on the
  join key with partial aggregation BELOW the join where algebra allows
- EXISTS / IN (subquery) become left-semi hash joins, never per-row
  subquery execution
- correlated scalar subqueries decorrelate into a grouped aggregate +
  equi join (the classic Neumann unnesting result) — expressed directly
  in DataFrame form so Catalyst never sees a correlation at all
- top-k after aggregation is TakeOrderedAndProject (no global sort)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_tables
from ..functions.rounding import rnd, rnd_sql
from . import register


# ---------------------------------------------------------------------------
# c1 — shipping-priority top-k (TPC-H Q3 shape): segment-filtered customer
# dim ⨝ orders ⨝ lineitem, revenue per order, top 10. Two big-side joins on
# the natural keys; the customer filter prunes before the join (pushdown).
# ---------------------------------------------------------------------------
@register(
    "c1_shipping_priority",
    oracle=f"""
    WITH anchor AS (
      SELECT max(o_orderdate) - INTERVAL 180 DAY AS cut FROM orders
    )
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           {rnd_sql("sum(l_extendedprice * (1 - l_discount))", 2)} AS revenue
    FROM customer, orders, lineitem, anchor
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < cut
      AND l_shipdate > cut
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def c1_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    cut = t["orders"].agg(
        (F.max("o_orderdate") - F.expr("INTERVAL 180 DAYS")).alias("cut")
    )
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return (
        t["orders"]
        .crossJoin(F.broadcast(cut))
        .filter(F.col("o_orderdate") < F.col("cut"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        # the filtered orders⨝customer intermediate GROWS WITH THE DATA:
        # broadcasting it is never right at scale, and locally the static
        # 64 MB estimate sat just under the threshold at the 10× dir,
        # building a ~750k-row driver broadcast (11.2 s — the one
        # mid-curve cliff in SCALE.md r3). shuffle_hash keeps the hash
        # build but shuffles both sides on the order key: no driver
        # round-trip, no estimate cliff, AQE still splits skew.
        .hint("shuffle_hash")
        .join(
            t["lineitem"].alias("l"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("cut"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# c2 — EXISTS decorrelation (TPC-H Q4 shape): priority counts over orders
# having at least one heavy lineitem. EXISTS = left-semi join; the probe
# (orders) never duplicates even when many lineitems match.
# ---------------------------------------------------------------------------
@register(
    "c2_exists_priority_count",
    oracle="""
    WITH anchor AS (
      SELECT max(o_orderdate) - INTERVAL 365 DAY AS lo FROM orders
    )
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders, anchor
    WHERE o_orderdate >= lo
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_quantity > 45
      )
    GROUP BY o_orderpriority
    """,
)
def c2_exists_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    lo = t["orders"].agg(
        (F.max("o_orderdate") - F.expr("INTERVAL 365 DAYS")).alias("lo")
    )
    heavy = t["lineitem"].filter(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        t["orders"]
        .crossJoin(F.broadcast(lo))
        .filter(F.col("o_orderdate") >= F.col("lo"))
        .join(heavy, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# c3 — deep multi-way join (TPC-H Q5 shape): region→nation→(customer,
# supplier)→orders→lineitem with the cross-dimension equality
# c_nationkey = s_nationkey. Join-order pressure: the two dims broadcast;
# the fact-fact joins shuffle on orderkey/suppkey only.
# ---------------------------------------------------------------------------
@register(
    "c3_region_supplier_volume",
    oracle=f"""
    WITH anchor AS (
      SELECT max(o_orderdate) - INTERVAL 365 DAY AS lo FROM orders
    )
    SELECT n_name,
           {rnd_sql("sum(l_extendedprice * (1 - l_discount))", 2)} AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey,
      anchor
    WHERE r_name = 'EUROPE' AND o_orderdate >= lo
    GROUP BY n_name
    """,
)
def c3_region_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    lo = t["orders"].agg(
        (F.max("o_orderdate") - F.expr("INTERVAL 365 DAYS")).alias("lo")
    )
    euro_nations = (
        t["nation"]
        .join(
            t["region"].filter(F.col("r_name") == "EUROPE"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    return (
        t["orders"]
        .crossJoin(F.broadcast(lo))
        .filter(F.col("o_orderdate") >= F.col("lo"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(euro_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# c4 — scalar-correlated subquery, decorrelated (TPC-H Q17 shape): lineitems
# below 0.2× the per-part average quantity. The correlation becomes a
# grouped aggregate joined back on the key — one extra shuffle instead of a
# per-row subquery. Comparison is FP-safe: quantities are small integers in
# doubles, so per-part sums (hence avgs, hence the 0.2× cut) are exact and
# engine-order-independent.
# ---------------------------------------------------------------------------
@register(
    "c4_small_quantity_revenue",
    oracle=f"""
    SELECT {rnd_sql("coalesce(sum(l_extendedprice), 0.0) / 7.0", 2)} AS avg_yearly
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN (
        SELECT l_partkey AS a_partkey, 0.2 * avg(l_quantity) AS qty_cut
        FROM lineitem GROUP BY l_partkey
      ) ON a_partkey = p_partkey
    WHERE p_brand = 'Brand#23' AND l_quantity < qty_cut
    """,
)
def c4_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    cuts = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("a_partkey"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut"))
    )
    brand_parts = t["part"].filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    return (
        t["lineitem"]
        .join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(cuts, F.col("a_partkey") == F.col("p_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            rnd(F.coalesce(F.sum("l_extendedprice"), F.lit(0.0)) / 7.0, 2).alias(
                "avg_yearly"
            )
        )
    )


# ---------------------------------------------------------------------------
# c5 — HAVING-subquery membership (TPC-H Q18 shape): orders whose total
# quantity exceeds a threshold, joined back to customer detail, top 20.
# The IN (grouped HAVING) subquery is a semi join against an aggregate.
# ---------------------------------------------------------------------------
@register(
    "c5_large_order_detail",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           {rnd_sql("max(o_totalprice)", 2)} AS total_price,
           {rnd_sql("sum(l_quantity)", 2)} AS sum_qty
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 250
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate
    ORDER BY total_price DESC, o_orderkey
    LIMIT 20
    """,
)
def c5_large_order_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_tot"))
        .filter(F.col("_tot") > 250)
        .select("l_orderkey")
    )
    return (
        t["orders"]
        .join(big.withColumnRenamed("l_orderkey", "b_orderkey"),
              F.col("o_orderkey") == F.col("b_orderkey"), "left_semi")
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate")
        .agg(
            rnd(F.max("o_totalprice"), 2).alias("total_price"),
            rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy(F.desc("total_price"), "o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# w5 — ranking-window family: rank / dense_rank / ntile / percent_rank /
# cume_dist / lead in one window pass (one shuffle on user_id). The
# reference's only windows are LAG and argmax (SURVEY §2.5); this completes
# the analytic-function family a serving layer would expose. Ordering
# carries the unique event_id tiebreaker so ranks are engine-deterministic.
# ---------------------------------------------------------------------------
@register(
    "w5_rank_family",
    oracle=f"""
    SELECT event_id, user_id, value,
           rank()        OVER w AS rnk,
           dense_rank()  OVER w AS drnk,
           ntile(4)      OVER w AS quartile,
           {rnd_sql("percent_rank() OVER w", 6)} AS pct_rank,
           {rnd_sql("cume_dist() OVER w", 6)} AS cdist,
           lead(event_id) OVER w AS next_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
    """,
)
def w5_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        rnd(F.percent_rank().over(w), 6).alias("pct_rank"),
        rnd(F.cume_dist().over(w), 6).alias("cdist"),
        F.lead("event_id").over(w).alias("next_event"),
    )


# ---------------------------------------------------------------------------
# c6 — left outer join with residual predicate + double aggregation (TPC-H
# Q13 shape): orders-per-customer distribution INCLUDING zero-order
# customers. The outer join keeps unmatched probe rows; count(o_orderkey)
# ignores the nulls they carry. Two shuffles: custkey join, then the tiny
# c_count regroup.
# ---------------------------------------------------------------------------
@register(
    "c6_order_count_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def c6_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"]
        .join(
            t["orders"],
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# c7 — NOT EXISTS anti join gated by a scalar aggregate (TPC-H Q22 shape):
# above-average-balance customers who never ordered, summarized per nation.
# The scalar avg stays in-plan (broadcast 1-row cross join); NOT EXISTS is
# a left-anti hash join on custkey.
# ---------------------------------------------------------------------------
@register(
    "c7_dormant_rich_customers",
    oracle=f"""
    WITH avg_bal AS (
      SELECT avg(c_acctbal) AS cut FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, count(*) AS numcust,
           {rnd_sql("sum(c_acctbal)", 2)} AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > cut
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def c7_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    cut = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("cut"))
    )
    return (
        t["customer"]
        .crossJoin(F.broadcast(cut))
        .filter(F.col("c_acctbal") > F.col("cut"))
        .join(
            t["orders"].select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            rnd(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# c8 — cross-nation volume shipping (TPC-H Q7 shape): lineitem ⨝ supplier ⨝
# orders ⨝ customer with BOTH nation dims broadcast, revenue per
# (supp_nation, cust_nation, year) for an ordered nation pair in a 2-year
# window. The fact-fact joins shuffle on l_orderkey; the four dim lookups
# are map-side.
# ---------------------------------------------------------------------------
@register(
    "c8_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           {rnd_sql("sum(l_extendedprice * (1 - l_discount))", 2)} AS revenue
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey
      AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey
      AND s_nationkey = n1.n_nationkey
      AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def c8_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "supplier", "lineitem", "orders",
                    "customer", "nation")
    n1 = t["nation"].select(F.col("n_nationkey").alias("s_nk"),
                            F.col("n_name").alias("supp_nation"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("c_nk"),
                            F.col("n_name").alias("cust_nation"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    return (
        li.join(F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
                F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"].select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"].select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
    )


# ---------------------------------------------------------------------------
# c9 — returned-item reporting (TPC-H Q10 shape): revenue lost to returns
# per customer over one quarter, top 20. Orders date-filter prunes before
# the lineitem join; nation broadcast; top-k is TakeOrderedAndProject.
# ---------------------------------------------------------------------------
@register(
    "c9_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {rnd_sql("sum(l_extendedprice * (1 - l_discount))", 2)} AS revenue,
           n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def c9_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    ).select("o_orderkey", "o_custkey")
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"].select("c_custkey", "c_name", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"].select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


# ---------------------------------------------------------------------------
# c10 — promotion revenue share (TPC-H Q14 shape): conditional aggregation
# over one month of shipments with the part dim broadcast. One scan, one
# broadcast join, a two-branch conditional sum — no shuffle beyond the
# final 1-row agg.
# ---------------------------------------------------------------------------
@register(
    "c10_promo_share",
    oracle=f"""
    SELECT {rnd_sql("100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) / sum(l_extendedprice * (1 - l_discount))", 4)} AS promo_share
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def c10_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(t["part"].select("p_partkey", "p_type")),
                F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            rnd(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_share")
        )
    )


# ---------------------------------------------------------------------------
# c11 — disjunctive multi-attribute predicate (TPC-H Q19 shape): an OR of
# three (brand × quantity-range × size-range) conjuncts across the
# lineitem ⨝ part join. Catalyst pushes the common l_quantity bounds to
# the scan and evaluates the residual disjunction after the broadcast join.
# ---------------------------------------------------------------------------
@register(
    "c11_disjunctive_pred",
    oracle=f"""
    SELECT {rnd_sql("sum(l_extendedprice * (1 - l_discount))", 2)} AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
        OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
        OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15))
    """,
)
def c11_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")

    def arm(brand: str, qlo: int, qhi: int, slo: int, shi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("l_quantity").between(qlo, qhi)
            & F.col("p_size").between(slo, shi)
        )

    return (
        t["lineitem"]
        .join(F.broadcast(t["part"].select("p_partkey", "p_brand", "p_size")),
              F.col("l_partkey") == F.col("p_partkey"))
        .filter(arm("Brand#1", 1, 11, 1, 5)
                | arm("Brand#2", 10, 20, 1, 10)
                | arm("Brand#3", 20, 30, 1, 15))
        .agg(rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
    )


# ---------------------------------------------------------------------------
# c12 — top supplier by quarterly revenue (TPC-H Q15 shape): grouped
# revenue per supplier, keep the argmax row(s). The scalar MAX
# decorrelates into a 1-row broadcast cross join; equality is decided on
# the 2-dp-rounded revenue so double summation order can't flip
# membership between engines.
# ---------------------------------------------------------------------------
@register(
    "c12_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             {rnd_sql("sum(l_extendedprice * (1 - l_discount))", 2)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, rev
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def c12_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    rev = (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= "1996-01-01")
                & (F.col("l_shipdate") < "1996-04-01"))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
              F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# c13 — forecast revenue change (TPC-H Q6 shape): the purest
# scan-efficiency probe in the suite — single table, three range
# predicates, one global sum. All three predicates reach the parquet scan
# as PushedFilters (year bounds on l_shipdate, discount band, quantity
# cap); at 100 TB this query is I/O-bound and its cost is exactly the
# pruned scan.
# ---------------------------------------------------------------------------
@register(
    "c13_forecast_revenue",
    oracle=f"""
    SELECT {rnd_sql('sum(l_extendedprice * l_discount)', 2)} AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def c13_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# c14 — national market share inside a region (TPC-H Q8 shape): the
# deepest join in the catalog — lineitem ⨝ part ⨝ supplier ⨝ orders ⨝
# customer ⨝ nation×2 ⨝ region (7 joins, nation joined twice under two
# roles). Plan intent: every dimension side broadcasts (part/supplier/
# customer are bounded; nation/region tiny), so the fact table is scanned
# once and never shuffled until the final (year) aggregation — at 100 TB
# the query costs one fact pass + an 8-row agg.
# ---------------------------------------------------------------------------
@register(
    "c14_market_share",
    oracle=f"""
    WITH vol AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    SELECT o_year,
           {rnd_sql("sum(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0 END) / sum(volume)", 6)}
             AS mkt_share,
           {rnd_sql('sum(volume)', 2)} AS total_volume
    FROM vol GROUP BY o_year
    """,
)
def c14_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir,
        "lineitem", "part", "supplier", "orders", "customer", "nation", "region",
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_regionkey").alias("c_regionkey"),
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    reg = t["region"].filter(F.col("r_name") == "ASIA").select(
        F.col("r_regionkey").alias("c_regionkey")
    )
    vol = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_type") == "PROMO")),
            t["lineitem"]["l_partkey"] == t["part"]["p_partkey"],
        )
        .join(
            F.broadcast(t["supplier"]),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["customer"]),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(n1), "c_nationkey")
        .join(F.broadcast(reg), "c_regionkey")
        .join(F.broadcast(n2), "s_nationkey")
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    share = F.sum(
        F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(0.0)
    ) / F.sum("volume")
    return vol.groupBy("o_year").agg(
        rnd(share, 6).alias("mkt_share"),
        rnd(F.sum("volume"), 2).alias("total_volume"),
    )


# ---------------------------------------------------------------------------
# c15 — profit by supplier nation and year (TPC-H Q9 shape, adapted: the
# testdata has no partsupp, so unit cost is 80% of p_retailprice). Two
# fact-dim broadcasts + one fact-fact equi-join, then a (nation, year)
# rollup — the grouped key domain is bounded (25 × 7), so the final agg is
# tiny regardless of fact size.
# ---------------------------------------------------------------------------
@register(
    "c15_profit_by_nation",
    oracle=f"""
    WITH pl AS (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.8 * p.p_retailprice * l.l_quantity AS amount
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%gear%'
    )
    SELECT nation, o_year, {rnd_sql('sum(amount)', 2)} AS sum_profit
    FROM pl GROUP BY nation, o_year
    """,
)
def c15_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, "lineitem", "part", "supplier", "orders", "nation"
    )
    nat = t["nation"].select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("nation"),
    )
    pl = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").like("%gear%"))),
            t["lineitem"]["l_partkey"] == t["part"]["p_partkey"],
        )
        .join(
            F.broadcast(t["supplier"]),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nat), "s_nationkey")
        .select(
            "nation",
            F.year("o_orderdate").cast("int").alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - 0.8 * F.col("p_retailprice") * F.col("l_quantity")
            ).alias("amount"),
        )
    )
    return pl.groupBy("nation", "o_year").agg(
        rnd(F.sum("amount"), 2).alias("sum_profit")
    )


# ---------------------------------------------------------------------------
# j10 — FULL OUTER reconciliation: ordered revenue by day (orders) vs
# shipped revenue by day (lineitem), full-outer on the date so days with
# activity on only one side surface with NULL-coalesced zeros — the
# standard two-ledger reconciliation shape (and the one join type the
# catalog didn't yet exercise explicitly). Both inputs are pre-aggregated
# to the join key before the join, so the full-outer runs on two
# date-cardinality tables regardless of fact size.
# ---------------------------------------------------------------------------
@register(
    "j10_full_outer_reconcile",
    oracle=f"""
    WITH o AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(o_totalprice) AS ordered_total,
             count(*) AS n_orders
      FROM orders GROUP BY 1
    ),
    l AS (
      SELECT CAST(l_shipdate AS DATE) AS d,
             sum(l_extendedprice * (1 - l_discount)) AS shipped_total,
             count(*) AS n_lines
      FROM lineitem GROUP BY 1
    )
    SELECT coalesce(o.d, l.d) AS d,
           {rnd_sql('coalesce(o.ordered_total, 0)', 2)} AS ordered_total,
           CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
           {rnd_sql('coalesce(l.shipped_total, 0)', 2)} AS shipped_total,
           CAST(coalesce(l.n_lines, 0) AS BIGINT) AS n_lines,
           (o.d IS NULL OR l.d IS NULL) AS one_sided
    FROM o FULL OUTER JOIN l ON o.d = l.d
    """,
)
def j10_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    o = (
        t["orders"]
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum("o_totalprice").alias("ordered_total"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    l = (
        t["lineitem"]
        .groupBy(F.col("l_shipdate").cast("date").alias("d"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "shipped_total"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    od, ld = o.alias("o"), l.alias("l")
    return (
        od.join(ld, F.col("o.d") == F.col("l.d"), "full_outer")
        .select(
            F.coalesce(F.col("o.d"), F.col("l.d")).alias("d"),
            rnd(F.coalesce(F.col("ordered_total"), F.lit(0)), 2).alias(
                "ordered_total"
            ),
            F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("n_orders"),
            rnd(F.coalesce(F.col("shipped_total"), F.lit(0)), 2).alias(
                "shipped_total"
            ),
            F.coalesce(F.col("n_lines"), F.lit(0)).cast("long").alias("n_lines"),
            (F.col("o.d").isNull() | F.col("l.d").isNull()).alias("one_sided"),
        )
    )


# ---------------------------------------------------------------------------
# a20 — UNPIVOT (melt): the per-returnflag quantity/price/discount
# aggregate turned into (flag, metric, value) long form — the inverse of
# a17's pivot and the shape every metrics store ingests. Spark expresses
# it with stack(); the oracle uses DuckDB's UNPIVOT. The unpivot itself
# is a narrow map over an already-tiny aggregate: no extra shuffle.
# ---------------------------------------------------------------------------
@register(
    "a20_unpivot_metrics",
    oracle=f"""
    WITH agg AS (
      SELECT l_returnflag,
             {rnd_sql('sum(l_quantity)', 2)} AS sum_qty,
             {rnd_sql('avg(l_extendedprice)', 2)} AS avg_price,
             {rnd_sql('avg(l_discount)', 4)} AS avg_disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, metric, value
    FROM agg UNPIVOT (value FOR metric IN (sum_qty, avg_price, avg_disc))
    """,
)
def a20_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    agg = li.groupBy("l_returnflag").agg(
        rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
        rnd(F.avg("l_extendedprice"), 2).alias("avg_price"),
        rnd(F.avg("l_discount"), 4).alias("avg_disc"),
    )
    return agg.select(
        "l_returnflag",
        F.expr(
            "stack(3, 'sum_qty', sum_qty, 'avg_price', avg_price,"
            " 'avg_disc', avg_disc) AS (metric, value)"
        ),
    )
