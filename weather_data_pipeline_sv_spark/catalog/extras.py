"""Surface-rounding entries: collection aggregates, the datetime function
family, the raw ``spark.sql`` API, and corpus vocabulary extraction.

These close the remaining gaps a reference user would hit day-one that no
§2 row names explicitly: grouped array building (PostgreSQL users reach
for array_agg constantly), calendar-field extraction beyond
DATE_TRUNC('hour') (`aggregation.py:116` is the reference's only calendar
op), querying through SQL text instead of the DataFrame builder, and
term-frequency/vocabulary extraction over `documents` (the first step of
every tokenizer-training / TF-IDF pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import rnd
from ..sources import load_tables
from . import register


# ---------------------------------------------------------------------------
# a19 — grouped collection aggregate: per-user sorted distinct event types.
# collect_set is a partial-aggregating hash agg (map-side combine), so the
# shuffle carries one partially-built set per (user × map partition) — at
# scale bounded by the value domain (event types), not the row count.
# ---------------------------------------------------------------------------
@register(
    "a19_grouped_array_agg",
    oracle="""
    SELECT user_id,
           list_sort(list(DISTINCT event_type)) AS event_types,
           count(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def a19_grouped_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    return ev.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("event_types"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# f4 — calendar/datetime function family: field extraction, interval
# arithmetic, month bucketing, month-end. All JVM built-ins inside
# whole-stage codegen. Engine quirk handled explicitly: Spark's dayofweek
# is 1-based Sunday, DuckDB's 0-based Sunday — normalized to 0=Sunday.
# ---------------------------------------------------------------------------
@register(
    "f4_datetime_family",
    oracle="""
    SELECT event_id,
           year(ts) AS y, month(ts) AS mo, day(ts) AS d,
           hour(ts) AS hr, minute(ts) AS mi,
           dayofyear(ts) AS doy,
           dayofweek(ts) AS dow,
           ts + INTERVAL 7 DAY AS next_week,
           CAST(date_trunc('month', ts) AS DATE) AS month_start,
           last_day(ts) AS month_end
    FROM events
    """,
)
def f4_datetime_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    ts = F.col("ts")
    return ev.select(
        "event_id",
        F.year(ts).alias("y"),
        F.month(ts).alias("mo"),
        F.dayofmonth(ts).alias("d"),
        F.hour(ts).alias("hr"),
        F.minute(ts).alias("mi"),
        F.dayofyear(ts).alias("doy"),
        (F.dayofweek(ts) - 1).alias("dow"),
        (ts + F.expr("INTERVAL 7 DAYS")).alias("next_week"),
        F.date_trunc("month", ts).cast("date").alias("month_start"),
        F.last_day(ts).alias("month_end"),
    )


# Dialect-portable SQL: runs verbatim on Spark SQL and DuckDB, so the oracle
# string IS the implementation — proving the engine's SQL text surface, not
# just the DataFrame builder. Rounding is spelled with an explicit
# CAST(... AS DOUBLE): Spark SQL parses the bare literal `100.0` as
# DECIMAL, which would silently turn bigint/100.0 into a Decimal column
# (DuckDB keeps doubles) — the cast pins both engines to IEEE doubles.


def _rnd_shared(expr: str, n: int) -> str:
    f = 10**n
    return (
        f"CAST(floor(({expr}) * {f}.0 + 0.5 + 1e-6) AS DOUBLE) / CAST({f} AS DOUBLE)"
    )


_SQL1 = f"""
    WITH spend AS (
      SELECT o_custkey, sum(o_totalprice) AS total_spend
      FROM orders GROUP BY o_custkey
    )
    SELECT c_nationkey,
           count(*) AS n_customers,
           {_rnd_shared("sum(total_spend)", 2)} AS nation_spend,
           {_rnd_shared("max(total_spend)", 2)} AS top_customer_spend
    FROM customer LEFT JOIN spend ON o_custkey = c_custkey
    GROUP BY c_nationkey
"""


@register("sql1_sql_text_api", oracle=_SQL1)
def sql1_sql_text_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    t["customer"].createOrReplaceTempView("customer")
    t["orders"].createOrReplaceTempView("orders")
    return spark.sql(_SQL1)


# ---------------------------------------------------------------------------
# t7 — vocabulary extraction: top-20 terms per language by document
# frequency. explode(array_distinct(split)) counts each term once per doc;
# the group-by partial-aggregates on (lang, term) so the shuffle carries
# combined counts, and the per-lang top-k is one window shuffle on lang.
# First step of tokenizer training / TF-IDF / stopword discovery at corpus
# scale.
# ---------------------------------------------------------------------------
@register(
    "t7_term_frequency",
    oracle=r"""
    WITH terms AS (
      SELECT lang,
             unnest(list_distinct(string_split_regex(lower(text), '\s+'))) AS term
      FROM documents
    ), doc_freq AS (
      SELECT lang, term, count(*) AS doc_freq
      FROM terms WHERE term <> '' GROUP BY lang, term
    )
    SELECT lang, term, doc_freq FROM (
      SELECT lang, term, doc_freq,
             row_number() OVER (PARTITION BY lang ORDER BY doc_freq DESC, term) AS rn
      FROM doc_freq
    ) WHERE rn <= 20
    """,
)
def t7_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    terms = docs.select(
        "lang",
        F.explode(F.array_distinct(F.split(F.lower("text"), r"\s+"))).alias("term"),
    ).filter(F.col("term") != "")
    freq = terms.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("doc_freq"))
    w = Window.partitionBy("lang").orderBy(F.desc("doc_freq"), "term")
    return (
        freq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("lang", "term", "doc_freq")
    )


# ---------------------------------------------------------------------------
# s8 — SCD2 dimension history: the events change log versioned into
# validity intervals (valid_from / valid_to / is_current / version).
# Extends the reference's latest-row-only upsert sinks (S5-S7,
# observations.py:258-283) with the standard warehouse history answer.
# Scale shape: windows over (user_id ORDER BY ts) — one hash-partitioned
# shuffle on the entity key, no joins, no collect.
# ---------------------------------------------------------------------------
@register(
    "s8_scd2_history",
    oracle="""
    WITH d AS (
      SELECT user_id, ts, event_type FROM (
        SELECT user_id, ts, event_type,
               row_number() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ),
    ch AS (
      SELECT user_id, ts, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      FROM d
    ),
    c2 AS (
      SELECT user_id, ts, event_type FROM ch
      WHERE prev IS NULL OR prev IS DISTINCT FROM event_type
    )
    SELECT user_id, state, valid_from, valid_to,
           (valid_to IS NULL) AS is_current, version
    FROM (
      SELECT user_id, event_type AS state, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts) AS INTEGER) AS version
      FROM c2
    )
    """,
)
def s8_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.merge import scd2_history

    ev = load_tables(spark, sf_dir, "events")["events"]
    out = scd2_history(
        ev.select("user_id", "ts", "event_type", "event_id"),
        keys=["user_id"],
        state_cols=["event_type"],
        ts_col="ts",
        order_col="event_id",
    )
    return out.select(
        "user_id",
        F.col("event_type").alias("state"),
        "valid_from",
        "valid_to",
        "is_current",
        "version",
    )


# ---------------------------------------------------------------------------
# e2 — ordered funnel: users who viewed, then clicked strictly AFTER their
# first view, then purchased strictly AFTER that first qualifying click.
# The classic product-analytics shape (strict event ordering per user —
# NOT three independent EXISTS). Plan: three filtered passes over one
# events scan, each reduced to a per-user min timestamp joined into the
# next step's filter — per-user tables are AQE-sized at runtime
# (broadcast while small, shuffle join at user counts that outgrow it;
# no explicit broadcast pin); the wide table is never self-joined
# row-to-row.
# ---------------------------------------------------------------------------
@register(
    "e2_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS users_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS users_click,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS users_purchase,
           floor(((SELECT count(*) FROM c) * 1.0 / (SELECT count(*) FROM v)) * 10000.0 + 0.5 + 1e-6) / 10000.0 AS view_to_click,
           floor(((SELECT count(*) FROM p) * 1.0 / (SELECT count(*) FROM c)) * 10000.0 + 0.5 + 1e-6) / 10000.0 AS click_to_purchase
    """,
)
def e2_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("users_view"))
    nc = c.agg(F.count(F.lit(1)).alias("users_click"))
    np_ = p.agg(F.count(F.lit(1)).alias("users_purchase"))
    return (
        nv.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .select(
            "users_view", "users_click", "users_purchase",
            rnd(F.col("users_click") * 1.0 / F.col("users_view"), 4).alias(
                "view_to_click"
            ),
            rnd(
                F.col("users_purchase") * 1.0 / F.col("users_click"), 4
            ).alias("click_to_purchase"),
        )
    )


# ---------------------------------------------------------------------------
# e3 — weekly retention cohorts: users bucketed by first-activity week,
# then for each (cohort, weeks-since) the distinct active users and the
# retention rate against the cohort's size. The other half of the
# product-analytics pair with e2. Plan: one per-user min (hash agg), one
# equi-join of events to their user's cohort (per-user table, AQE-sized),
# distinct (cohort, week_no, user) partial-aggregated, then a tiny
# per-cohort rollup joined back — no self-join of the events table.
# ---------------------------------------------------------------------------
@register(
    "e3_retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT f.cohort_week, e.user_id,
             CAST(date_diff('day', f.cohort_week, date_trunc('week', e.ts)) // 7 AS INTEGER)
               AS week_no
      FROM events e JOIN first_seen f ON f.user_id = e.user_id
    ),
    sizes AS (
      SELECT cohort_week, count(*) AS cohort_size
      FROM first_seen GROUP BY cohort_week
    ),
    ret AS (
      SELECT cohort_week, week_no, count(*) AS n_active
      FROM activity GROUP BY cohort_week, week_no
    )
    SELECT CAST(r.cohort_week AS DATE) AS cohort_week, r.week_no,
           CAST(r.n_active AS BIGINT) AS n_active,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           floor((r.n_active * 1.0 / s.cohort_size) * 10000.0 + 0.5 + 1e-6) / 10000.0
             AS retention
    FROM ret r JOIN sizes s USING (cohort_week)
    """,
)
def e3_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    week = lambda c: F.date_trunc("week", c).cast("timestamp_ntz")  # noqa: E731
    first_seen = ev.groupBy("user_id").agg(
        week(F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "cohort_week",
            "user_id",
            F.floor(
                F.datediff(week(F.col("ts")), F.col("cohort_week")) / 7
            ).cast("int").alias("week_no"),
        )
        .distinct()
    )
    sizes = first_seen.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    ret = activity.groupBy("cohort_week", "week_no").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    return ret.join(sizes, "cohort_week").select(
        F.col("cohort_week").cast("date").alias("cohort_week"),
        "week_no",
        "n_active",
        "cohort_size",
        rnd(F.col("n_active") * 1.0 / F.col("cohort_size"), 4).alias("retention"),
    )


# ---------------------------------------------------------------------------
# e4 — Markov transition matrix over per-user event sequences: for every
# (prev_type -> event_type) pair, the transition count and the conditional
# probability P(next | prev). The standard substrate for session-flow
# analysis and sequence-model sanity checks over behavioural logs.
# Plan: one window (LAG) keyed on user_id — the same shuffle a sessionize
# pays — then a hash agg over a domain-bounded key pair (|event types|²
# rows at most), so the final stages are tiny no matter the corpus size.
# Ordering inside a user is (ts, event_id): event_id breaks timestamp ties
# deterministically in both engines.
# ---------------------------------------------------------------------------
@register(
    "e4_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    pairs AS (
      SELECT prev_type, event_type, count(*) AS n_transitions
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, event_type, CAST(n_transitions AS BIGINT) AS n_transitions,
           floor((n_transitions * 1.0 /
                  sum(n_transitions) OVER (PARTITION BY prev_type)) * 10000.0 + 0.5 + 1e-6) / 10000.0
             AS prob
    FROM pairs
    """,
)
def e4_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    per_prev = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "event_type",
        "n_transitions",
        rnd(
            F.col("n_transitions") * 1.0 / F.sum("n_transitions").over(per_prev), 4
        ).alias("prob"),
    )


# ---------------------------------------------------------------------------
# a21 — fixed-width value histogram per event type: the binning shape
# every metrics dashboard and feature-binning pipeline runs. Bin id is
# floor(value/10) — one integer function of the row, identical IEEE
# division in both engines — so the histogram is a single hash agg with
# map-side partial aggregation; the per-type share comes from a window
# over the (already tiny) histogram itself, never over the events.
# ---------------------------------------------------------------------------
@register(
    "a21_value_histogram",
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST(floor(value / 10.0) AS BIGINT) AS bin,
             count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, bin, CAST(n AS BIGINT) AS n,
           floor((n * 1.0 / sum(n) OVER (PARTITION BY event_type)) * 10000.0 + 0.5 + 1e-6) / 10000.0
             AS share
    FROM h
    """,
)
def a21_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    h = ev.groupBy(
        "event_type",
        F.floor(F.col("value") / 10.0).cast("long").alias("bin"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type")
    return h.select(
        "event_type",
        "bin",
        "n",
        rnd(F.col("n") * 1.0 / F.sum("n").over(w), 4).alias("share"),
    )


# ---------------------------------------------------------------------------
# a22 — statistical aggregate family: Pearson correlation, sample
# covariance, and least-squares slope/intercept of price on quantity per
# return flag. Both engines implement the textbook one-pass formulas over
# doubles (verified to agree within 1e-9 on this data); output rounds at
# 4 dp. All four are algebraic aggregates — map-side partial state
# (sums/products/counts), one shuffle on the group key.
#
# Degenerate groups (zero variance / single row) are a real hazard with
# the builtins: Spark 4's ANSI mode makes corr/regr_slope THROW
# DIVIDE_BY_ZERO on a constant group (and DuckDB returns NULL), so a
# single constant-quantity flag would kill the whole query. Both sides
# therefore compute the SAME explicit co-moment algebra over raw sums —
# guarded with nullif so degenerate groups yield NULL in both engines —
# rather than each engine's builtin. Identical formula text ⇒ identical
# doubles up to summation order, the same tolerance class the builtin
# pairing already relied on. (The one-pass expansion is numerically safe
# here: the cancellation term is ~1e-12 relative at these magnitudes,
# orders below the 4-dp rounding.)
#
# The variance moments (cxx, cyy) carry an epsilon degeneracy guard, not
# a bare nullif: a constant NON-DYADIC value (e.g. all 0.1) cancels to
# ±1e-17 noise rather than exactly 0.0, and dividing by that noise makes
# engine-divergent garbage. |moment| ≤ 1e-12·(its sum of squares) is
# 4 orders above double cancellation noise and ~12 below any genuine
# variance, and both engines evaluate the identical predicate.
# ---------------------------------------------------------------------------
# shared corr/covar/regression algebra over the raw sums (x = quantity,
# y = price): valid Spark SQL and DuckDB SQL verbatim
_A22_STATS = {
    "corr_qty_price":
        "cxy / nullif(sqrt(greatest(cxx * cyy, 0.0)), 0.0)",
    "covar_qty_price": "cxy / nullif(n - 1.0, 0.0)",
    "slope_price_on_qty": "cxy / nullif(cxx, 0.0)",
    "intercept_price_on_qty":
        "(sy - (cxy / nullif(cxx, 0.0)) * sx) / n",
}
_A22_MOMENTS = {
    "cxy": "sxy - sx * sy / n",
    "cxx": "CASE WHEN abs(sxx - sx * sx / n) <= 1e-12 * sxx"
           " THEN NULL ELSE sxx - sx * sx / n END",
    "cyy": "CASE WHEN abs(syy - sy * sy / n) <= 1e-12 * syy"
           " THEN NULL ELSE syy - sy * sy / n END",
}



@register(
    "a22_stat_aggregates",
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             sum(l_quantity::DOUBLE) AS sx,
             sum(l_extendedprice::DOUBLE) AS sy,
             sum(l_quantity::DOUBLE * l_quantity::DOUBLE) AS sxx,
             sum(l_extendedprice::DOUBLE * l_extendedprice::DOUBLE) AS syy,
             sum(l_quantity::DOUBLE * l_extendedprice::DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    ),
    m AS (
      SELECT *, {', '.join(f'{e} AS {c}' for c, e in _A22_MOMENTS.items())}
      FROM s
    )
    SELECT l_returnflag,
           {', '.join(
               f'floor(({e}) * 10000.0 + 0.5 + 1e-6) / 10000.0 AS {c}'
               for c, e in _A22_STATS.items()
           )},
           CAST(n AS BIGINT) AS n_rows
    FROM m
    """,
)
def a22_stat_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    x = F.col("l_quantity").cast("double")
    y = F.col("l_extendedprice").cast("double")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    moments = sums.withColumns(
        {c: F.expr(e) for c, e in _A22_MOMENTS.items()}
    )
    return moments.select(
        "l_returnflag",
        *[rnd(F.expr(e), 4).alias(c) for c, e in _A22_STATS.items()],
        F.col("n").cast("long").alias("n_rows"),
    )
