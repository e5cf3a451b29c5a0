"""Round-3 catalog entries: semantic dedup (v10), substring rewrite (d9),
soft quality sampling (smp4), salted skew join (j9), Markov transitions
(e4), token entropy (t13).

The oracle sweep (tools/driver_sim.py) checks value parity with DuckDB;
these tests pin the *semantic invariants* each operator promises — the
properties that must survive refactoring even if the oracle SQL is edited
in lockstep with the Spark code.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.catalog import all_queries
from weather_data_pipeline_sv_spark.catalog.vector import (
    _SEM_TAU,
    cosine,
)
from weather_data_pipeline_sv_spark.sources import load_tables


@pytest.fixture(scope="module")
def queries():
    return all_queries()


# ---------------------------------------------------------------------------
# v10 — SemDeDup
# ---------------------------------------------------------------------------
def test_v10_dropped_have_lower_id_witness(spark, sf_dir, queries):
    """Every dropped vector has a KEPT-or-dropped lower-id cluster-mate at
    cosine >= tau; every kept vector has none (the defining predicate)."""
    out = queries["v10_semantic_dedup"](spark, sf_dir)
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"].select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    full = out.join(emb, "vec_id")
    a = full.select(
        F.col("vec_id").alias("id_a"), F.col("emb").alias("emb_a"), "list_id"
    )
    b = full.select(
        F.col("vec_id").alias("id_b"),
        F.col("emb").alias("emb_b"),
        "list_id",
        F.col("kept").alias("kept_b"),
    )
    pairs = (
        a.join(b, "list_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine(F.col("emb_a"), F.col("emb_b")))
    )
    witness = (
        pairs.filter(F.col("cos") >= _SEM_TAU)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    flags = {r["vec_id"]: r["kept"] for r in out.collect()}
    witnessed = {r["vec_id"] for r in witness.collect()}
    for vid, kept in flags.items():
        assert kept == (vid not in witnessed), vid


def test_v10_partition_invariant(spark, sf_dir, queries):
    out = queries["v10_semantic_dedup"](spark, sf_dir)
    base = sorted(map(tuple, out.collect()))
    again = sorted(map(tuple, out.repartition(13).collect()))
    assert base == again


# ---------------------------------------------------------------------------
# d9 — exact-substring rewrite
# ---------------------------------------------------------------------------
def test_d9_counts_consistent_with_d8(spark, sf_dir, queries):
    """Docs that d8 reports with zero duplicated windows must lose zero
    tokens in d9; docs with dup windows must lose >= window length."""
    d8 = {
        r["doc_id"]: r["n_dup_windows"]
        for r in queries["d8_exact_substring_spans"](spark, sf_dir).collect()
    }
    d9 = queries["d9_substring_rewrite"](spark, sf_dir).collect()
    for r in d9:
        dup = d8.get(r["doc_id"], 0)
        if dup == 0:
            assert r["n_removed"] == 0, r
        else:
            assert r["n_removed"] >= 8, r  # at least one full window cut
        assert 0 <= r["n_removed"] <= r["n_tokens"]


def test_d9_clean_md5_matches_manual_rebuild(spark, sf_dir, queries):
    """Recompute one affected doc's cleaned text in plain Python."""
    rows = queries["d9_substring_rewrite"](spark, sf_dir)
    affected = rows.filter(F.col("n_removed") > 0).orderBy("doc_id").first()
    if affected is None:
        pytest.skip("no duplicated windows at this SF")
    docs = {
        r["doc_id"]: r["text"]
        for r in load_tables(spark, sf_dir, "documents")["documents"].collect()
    }
    L = 8
    # recompute global dup window hashes
    import hashlib

    def windows(text):
        toks = text.strip().lower().split()
        return toks, [
            " ".join(toks[i : i + L]) for i in range(len(toks) - L + 1)
        ]

    seen: dict[str, set[int]] = {}
    for did, text in docs.items():
        for w in set(windows(text)[1]):
            seen.setdefault(w, set()).add(did)
    dup = {w for w, dids in seen.items() if len(dids) > 1}
    toks, wins = windows(docs[affected["doc_id"]])
    covered = set()
    for i, w in enumerate(wins):
        if w in dup:
            covered.update(range(i, i + L))
    clean = " ".join(t for i, t in enumerate(toks) if i not in covered)
    assert hashlib.md5(clean.encode()).hexdigest() == affected["clean_md5"]
    assert affected["n_removed"] == len(covered)


# ---------------------------------------------------------------------------
# smp4 — soft quality sampling
# ---------------------------------------------------------------------------
def test_smp4_deterministic_and_weight_monotone(spark, sf_dir, queries):
    out = queries["smp4_soft_quality_sample"](spark, sf_dir)
    once = sorted(map(tuple, out.collect()))
    again = sorted(map(tuple, out.repartition(7).collect()))
    assert once == again
    # weight-1 docs are kept iff u < 1 (always); all weights in (0, 1]
    for r in once:
        assert 0 < r[3] <= 1.0


def test_smp4_is_subset_of_documents(spark, sf_dir, queries):
    kept = queries["smp4_soft_quality_sample"](spark, sf_dir)
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    missing = kept.join(docs, "doc_id", "left_anti")
    assert missing.count() == 0


# ---------------------------------------------------------------------------
# j9 — salted skew join
# ---------------------------------------------------------------------------
def test_j9_equals_plain_join(spark, sf_dir, queries):
    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    plain = (
        t["lineitem"]
        .join(
            t["supplier"],
            t["lineitem"]["l_suppkey"] == t["supplier"]["s_suppkey"],
        )
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
    expected = {r["s_nationkey"]: r["n_lines"] for r in plain.collect()}
    got = {
        r["s_nationkey"]: r["n_lines"]
        for r in queries["j9_salted_skew_join"](spark, sf_dir).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# e4 — Markov transitions
# ---------------------------------------------------------------------------
def test_e4_probs_sum_to_one_per_prev(spark, sf_dir, queries):
    rows = queries["e4_markov_transitions"](spark, sf_dir).collect()
    by_prev: dict[str, float] = {}
    for r in rows:
        by_prev[r["prev_type"]] = by_prev.get(r["prev_type"], 0.0) + r["prob"]
        assert 0 < r["prob"] <= 1.0
        assert r["n_transitions"] > 0
    for prev, total in by_prev.items():
        assert abs(total - 1.0) < 5e-4, (prev, total)  # rounding at 4 dp


def test_e4_transition_total_matches_event_count(spark, sf_dir, queries):
    """Σ transitions = Σ (events per user - 1) over users with >= 1 event."""
    ev = load_tables(spark, sf_dir, "events")["events"]
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    expected = (
        per_user.agg(F.sum(F.col("n") - 1).alias("t")).first()["t"]
    )
    got = (
        queries["e4_markov_transitions"](spark, sf_dir)
        .agg(F.sum("n_transitions").alias("t"))
        .first()["t"]
    )
    assert got == expected


# ---------------------------------------------------------------------------
# t13 — token entropy
# ---------------------------------------------------------------------------
def test_t13_entropy_bounds(spark, sf_dir, queries):
    rows = queries["t13_token_entropy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 0 <= H <= log2(n_types) <= log2(n_tokens), TTR in (0, 1]
        assert -1e-4 <= r["entropy"] <= math.log2(max(r["n_types"], 1)) + 1e-4, r
        assert 0 < r["type_token_ratio"] <= 1.0
        assert r["n_types"] <= r["n_tokens"]


def test_t13_uniform_doc_hits_log2_bound(spark, sf_dir, queries):
    """A doc whose tokens are all distinct has H = log2(n) exactly."""
    rows = queries["t13_token_entropy"](spark, sf_dir).collect()
    for r in rows:
        if r["n_types"] == r["n_tokens"]:
            assert abs(r["entropy"] - round(math.log2(r["n_tokens"]), 4)) < 1e-3


# ---------------------------------------------------------------------------
# g1 — PageRank
# ---------------------------------------------------------------------------
def test_g1_mass_conserved_and_positive(spark, sf_dir, queries):
    rows = queries["g1_pagerank"](spark, sf_dir).collect()
    total = sum(r["pagerank"] for r in rows)
    # teleport + damped mass over a dangling-free graph sums to 1
    assert abs(total - 1.0) < 1e-5, total
    assert all(r["pagerank"] > 0 for r in rows)
    n_nodes = len(rows)
    # every node emits k=3 edges (block size > k in the testdata), so
    # total in-degree is 3N
    assert sum(r["in_deg"] for r in rows) == 3 * n_nodes


def test_g1_high_indegree_outranks_orphans(spark, sf_dir, queries):
    rows = queries["g1_pagerank"](spark, sf_dir).collect()
    orphans = [r["pagerank"] for r in rows if r["in_deg"] == 0]
    hubs = [r["pagerank"] for r in rows if r["in_deg"] >= 6]
    if orphans and hubs:
        assert max(orphans) < max(hubs)


# ---------------------------------------------------------------------------
# c13/c14/c15 — TPC-H Q6/Q8/Q9 shapes
# ---------------------------------------------------------------------------
def _plan(spark, sf_dir, queries, name):
    return (
        queries[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_c13_scan_efficiency(spark, sf_dir, queries):
    """Q6 shape: predicates pushed to the scan, pruned column set, no
    shuffle other than the single-row aggregation."""
    plan = _plan(spark, sf_dir, queries, "c13_forecast_revenue")
    assert "PushedFilters: [IsNotNull" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # projection pruned: the scan must not read l_orderkey/l_partkey
    scan = [l for l in plan.splitlines() if "FileScan" in l][0]
    assert "l_orderkey" not in scan and "l_returnflag" not in scan
    assert plan.count("CartesianProduct") == 0


def test_c14_single_fact_shuffle(spark, sf_dir, queries):
    """Q8 shape: all seven dimension joins broadcast; the only shuffle is
    the final (year) aggregation exchange."""
    plan = _plan(spark, sf_dir, queries, "c14_market_share")
    assert plan.count("BroadcastHashJoin") >= 6
    assert plan.count("SortMergeJoin") == 0
    assert plan.count("CartesianProduct") == 0
    assert plan.count("Exchange hashpartitioning") <= 1


def test_c14_shares_in_unit_interval(spark, sf_dir, queries):
    for r in queries["c14_market_share"](spark, sf_dir).collect():
        assert 0.0 <= r["mkt_share"] <= 1.0
        assert r["total_volume"] > 0


def test_c15_group_domain_bounded(spark, sf_dir, queries):
    rows = queries["c15_profit_by_nation"](spark, sf_dir).collect()
    assert rows
    # (nation, year) key domain is bounded: 25 nations x 8 years
    assert len(rows) <= 25 * 8
    assert len({(r["nation"], r["o_year"]) for r in rows}) == len(rows)


# ---------------------------------------------------------------------------
# w6 — windowed EWMA
# ---------------------------------------------------------------------------
def test_w6_first_event_is_alpha_x(spark, sf_dir, queries):
    """Each user's first event (singleton frame) folds to alpha * value."""
    from weather_data_pipeline_sv_spark.functions.rounding import rnd as _rnd

    ev = load_tables(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", _rnd(0.3 * F.col("value"), 6).alias("expect"))
    )
    got = queries["w6_ewma"](spark, sf_dir).join(first, "event_id")
    bad = got.filter(F.col("ewma20") != F.col("expect")).count()
    assert bad == 0


def test_w6_bounded_by_frame_extremes(spark, sf_dir, queries):
    """0 <= |ewma| <= max|value| * (1 - q^20)/(1)  — loose sanity: the
    fold of a 20-frame with zero init is a convex-ish combination scaled
    by < 1, so |ewma| can never exceed the global max |value|."""
    ev = load_tables(spark, sf_dir, "events")["events"]
    vmax = ev.agg(F.max(F.abs("value")).alias("m")).first()["m"]
    mx = (
        queries["w6_ewma"](spark, sf_dir)
        .agg(F.max(F.abs("ewma20")).alias("m"))
        .first()["m"]
    )
    assert mx <= vmax + 1e-9


# ---------------------------------------------------------------------------
# v11 — ANN recall eval
# ---------------------------------------------------------------------------
def test_v11_matches_set_intersection(spark, sf_dir, queries):
    truth = {}
    for r in queries["v1_cosine_topk"](spark, sf_dir).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ann = {}
    for r in queries["v3_ann_lsh"](spark, sf_dir).collect():
        ann.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {r["query_id"]: r for r in queries["v11_ann_recall"](spark, sf_dir).collect()}
    assert set(got) == set(truth)
    for qid, t in truth.items():
        hits = len(t & ann.get(qid, set()))
        assert got[qid]["n_hit"] == hits
        assert 0.0 <= got[qid]["recall_at_k"] <= 1.0


# ---------------------------------------------------------------------------
# j10 — full-outer reconciliation / a20 — unpivot
# ---------------------------------------------------------------------------
def test_j10_covers_both_sides(spark, sf_dir, queries):
    rows = queries["j10_full_outer_reconcile"](spark, sf_dir).collect()
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    n_order_days = t["orders"].select(
        F.col("o_orderdate").cast("date")
    ).distinct().count()
    n_ship_days = t["lineitem"].select(
        F.col("l_shipdate").cast("date")
    ).distinct().count()
    days = {r["d"] for r in rows}
    assert len(days) == len(rows)  # one row per date
    assert len(days) >= max(n_order_days, n_ship_days)
    for r in rows:
        if r["one_sided"]:
            assert r["n_orders"] == 0 or r["n_lines"] == 0


def test_a20_unpivot_is_pivot_inverse(spark, sf_dir, queries):
    rows = queries["a20_unpivot_metrics"](spark, sf_dir).collect()
    by_flag: dict[str, dict[str, float]] = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], {})[r["metric"]] = r["value"]
    assert all(
        set(m) == {"sum_qty", "avg_price", "avg_disc"} for m in by_flag.values()
    )


# ---------------------------------------------------------------------------
# a21 — histogram / a22 — statistical aggregates
# ---------------------------------------------------------------------------
def test_a21_shares_sum_to_one(spark, sf_dir, queries):
    rows = queries["a21_value_histogram"](spark, sf_dir).collect()
    per_type: dict[str, float] = {}
    per_type_n: dict[str, int] = {}
    for r in rows:
        per_type[r["event_type"]] = per_type.get(r["event_type"], 0.0) + r["share"]
        per_type_n[r["event_type"]] = per_type_n.get(r["event_type"], 0) + r["n"]
    ev = load_tables(spark, sf_dir, "events")["events"]
    totals = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_type_n == totals  # histogram partitions the events exactly
    for t, s in per_type.items():
        assert abs(s - 1.0) < 5e-3, (t, s)  # 4-dp rounding per bin


def test_a22_corr_bounded_and_slope_consistent(spark, sf_dir, queries):
    for r in queries["a22_stat_aggregates"](spark, sf_dir).collect():
        assert -1.0 <= r["corr_qty_price"] <= 1.0
        # slope and covariance must share a sign (var(qty) > 0)
        if r["covar_qty_price"] != 0:
            assert (r["slope_price_on_qty"] > 0) == (r["covar_qty_price"] > 0)


def test_a22_degenerate_group_yields_null_not_error(spark):
    # Spark 4 ANSI mode makes the BUILTIN corr/regr_* throw DIVIDE_BY_ZERO
    # on a zero-variance group (and DuckDB returns NULL) — a single
    # constant-quantity flag would kill the whole query. a22 therefore
    # computes the explicit nullif-guarded co-moment algebra; this pins
    # that degenerate groups yield NULL, in both engines (round-3 review).
    from weather_data_pipeline_sv_spark.catalog.extras import (
        _A22_MOMENTS,
        _A22_STATS,
    )

    df = spark.createDataFrame(
        [("A", 5.0, 10.0), ("A", 5.0, 20.0), ("B", 1.0, 2.0),
         ("C", 2.0, 4.0), ("C", 4.0, 8.0),
         # non-dyadic constant: sxx - sx*sx/n cancels to ~1e-17 NOISE, not
         # 0.0 — the epsilon guard (not bare nullif) must catch it
         ("D", 0.1, 1.0), ("D", 0.1, 2.0), ("D", 0.1, 3.0)],
        "flag string, q double, p double",
    )
    sums = df.groupBy("flag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("q").alias("sx"), F.sum("p").alias("sy"),
        F.sum(F.col("q") * F.col("q")).alias("sxx"),
        F.sum(F.col("p") * F.col("p")).alias("syy"),
        F.sum(F.col("q") * F.col("p")).alias("sxy"),
    ).withColumns({c: F.expr(e) for c, e in _A22_MOMENTS.items()})
    rows = {
        r["flag"]: r
        for r in sums.select(
            "flag", *[F.expr(e).alias(c) for c, e in _A22_STATS.items()]
        ).collect()
    }
    # constant q in A (dyadic) and D (non-dyadic) -> NULL; single-row B
    # -> NULL; C is exact
    for col in ("corr_qty_price", "slope_price_on_qty"):
        assert rows["A"][col] is None and rows["B"][col] is None
        assert rows["D"][col] is None
    assert rows["B"]["covar_qty_price"] is None  # n-1 = 0
    assert abs(rows["C"]["corr_qty_price"] - 1.0) < 1e-12
    assert abs(rows["C"]["slope_price_on_qty"] - 2.0) < 1e-12
    assert abs(rows["C"]["intercept_price_on_qty"]) < 1e-12

    # and the identical formula text in DuckDB agrees on the NULLs
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        "('A', 5.0, 10.0), ('A', 5.0, 20.0), ('B', 1.0, 2.0)) v(flag, q, p)"
    )
    moments = ", ".join(f"{e} AS {c}" for c, e in _A22_MOMENTS.items())
    stats = ", ".join(f"{e} AS {c}" for c, e in _A22_STATS.items())
    out = con.execute(
        "WITH s AS (SELECT flag, CAST(count(*) AS DOUBLE) AS n, "
        "sum(q) AS sx, sum(p) AS sy, sum(q*q) AS sxx, sum(p*p) AS syy, "
        "sum(q*p) AS sxy FROM t GROUP BY flag), "
        f"m AS (SELECT *, {moments} FROM s) "
        f"SELECT flag, {stats} FROM m ORDER BY flag"
    ).fetchall()
    assert out[0][1] is None and out[1][1] is None  # corr NULL for A and B
