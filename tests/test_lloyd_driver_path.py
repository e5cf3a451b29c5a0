"""The bounded-corpus driver-side Lloyd fast path (round-10 optimization).

ivf_centroids / pq_train / ivfpq_train / ivf_ann_topk route training
through lloyd_np when the training frame fits the IVFPQ_DRIVER_TRAIN
bound, falling back to the distributed loop otherwise. These tests pin:

- the fast path's codebooks agree with the forced-distributed loop to
  ULP-class tolerance (row-summation order of the per-list means is the
  only freedom — not contractual in either engine, nor in the DuckDB
  oracle, which sums in its own order);
- the ASSIGNMENTS the two codebook sets induce are identical (the 9-dp
  rounded argmin absorbs the mean-order ULPs — this is the property the
  entry oracles actually depend on);
- the fallback triggers on over-bound and empty inputs.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.operators import similarity as sim

N_LISTS = 8


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


def _flat(cent_df):
    return [
        (int(r["list_id"]), [float(x) for x in r["centroid"]])
        for r in cent_df.orderBy("list_id").collect()
    ]


def test_fast_path_matches_distributed(emb):
    fast = _flat(sim.ivf_centroids(emb, n_lists=N_LISTS, n_iter=2))
    dist = _flat(
        sim.ivf_centroids(
            emb, n_lists=N_LISTS, n_iter=2, driver_train_max_rows=0
        )
    )
    assert [lid for lid, _ in fast] == [lid for lid, _ in dist]
    for (_, a), (_, b) in zip(fast, dist):
        assert all(abs(x - y) < 1e-9 for x, y in zip(a, b))
    # the property the oracles depend on: identical induced assignments
    af = sorted(
        (r["vec_id"], r["list_id"])
        for r in sim.ivf_assign(emb, fast).collect()
    )
    ad = sorted(
        (r["vec_id"], r["list_id"])
        for r in sim.ivf_assign(emb, dist).collect()
    )
    assert af == ad


def test_pq_fast_path_matches_distributed(emb):
    fast = sim.pq_train(emb, n_sub=4, k_codes=4, sub_dim=16, n_iter=2)
    dist = sim.pq_train(
        emb, n_sub=4, k_codes=4, sub_dim=16, n_iter=2,
        driver_train_max_rows=0,
    )
    assert len(fast) == len(dist) == 4
    for bf, bd in zip(fast, dist):
        assert [lid for lid, _ in bf] == [lid for lid, _ in bd]
        for (_, a), (_, b) in zip(bf, bd):
            assert all(abs(x - y) < 1e-9 for x, y in zip(a, b))


def test_over_bound_falls_back(emb):
    n = emb.count()
    # a bound one short of the corpus forces the distributed loop; the
    # result must be the distributed books exactly
    capped = _flat(
        sim.ivf_centroids(
            emb, n_lists=N_LISTS, n_iter=1, driver_train_max_rows=n - 1
        )
    )
    dist = _flat(
        sim.ivf_centroids(
            emb, n_lists=N_LISTS, n_iter=1, driver_train_max_rows=0
        )
    )
    assert capped == dist


def test_empty_train_matches_distributed_empty_behavior(spark):
    # an empty training frame routes to the distributed loop (lloyd_np
    # cannot seed from zero rows), which is loud about it — the fast
    # path must not change that behavior, in either direction
    from pyspark.errors.exceptions.captured import AnalysisException

    empty = spark.createDataFrame([], "vec_id long, emb array<double>")
    with pytest.raises(AnalysisException):
        sim.ivf_centroids(empty, n_lists=4, n_iter=1).collect()
    with pytest.raises(AnalysisException):
        sim.ivf_centroids(
            empty, n_lists=4, n_iter=1, driver_train_max_rows=0
        ).collect()


def test_ivf_ann_topk_fast_path_matches_distributed(emb):
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    fast = sim.ivf_ann_topk(emb, q, k=3, n_lists=N_LISTS, n_probe=3)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    rows_fast = sorted(
        (key(r), r["neighbor_id"], r["cosine"]) for r in fast.collect()
    )
    assert len(rows_fast) > 0
    # the property the entry oracle depends on: the full top-k ranking
    # (ids, ranks AND rounded cosines) from the fast-path trainer equals
    # the forced-distributed run's, row for row
    dist = sim.ivf_ann_topk(
        emb, q, k=3, n_lists=N_LISTS, n_probe=3, driver_train_max_rows=0
    )
    rows_dist = sorted(
        (key(r), r["neighbor_id"], r["cosine"]) for r in dist.collect()
    )
    assert rows_fast == rows_dist
    # and the induced assignments agree (the stronger internal invariant)
    dist_books = sim._centroid_rows(
        sim.ivf_centroids(
            emb, n_lists=N_LISTS, n_iter=2, driver_train_max_rows=0
        )
    )
    fast_books = sim._centroid_rows(
        sim.ivf_centroids(emb, n_lists=N_LISTS, n_iter=2)
    )
    af = sorted(
        (r["vec_id"], r["list_id"])
        for r in sim.ivf_assign(emb, fast_books).collect()
    )
    ad = sorted(
        (r["vec_id"], r["list_id"])
        for r in sim.ivf_assign(emb, dist_books).collect()
    )
    assert af == ad
