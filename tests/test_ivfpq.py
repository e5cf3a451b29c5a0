"""IVFADC (operators/similarity.py ivfpq_*): joint coarse+PQ training
parity, in-memory vs persisted-index probe parity, partition pruning on
the code table, and the pruning-semantics pin (probed candidates are
exactly the probed lists' members, ranked by the same ADC as flat PQ)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.operators import similarity as sim

N_LISTS, N_PROBE, K = 8, 3, 4
N_SUB, K_CODES, SUB_DIM = 8, 16, 8


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


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )


@pytest.fixture(scope="module")
def index_path(emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq") / "index")
    coarse, books = sim.write_ivfpq_index(
        emb, path, n_lists=N_LISTS, n_sub=N_SUB, k_codes=K_CODES,
        sub_dim=SUB_DIM, n_iter=2,
    )
    assert len(coarse) == N_LISTS and len(books) == N_SUB
    return path


def test_joint_training_matches_solo_training(emb):
    # the coarse book riding the PQ Lloyd jobs must equal training it
    # alone (ivf_centroids/_ivf_train), and the PQ books must equal
    # pq_train — joint training is a job-count optimization, not a
    # semantics change
    coarse_j, books_j = sim.ivfpq_train(
        emb, N_LISTS, N_SUB, K_CODES, SUB_DIM, n_iter=2
    )
    coarse_solo = sim._centroid_rows(
        sim.ivf_centroids(emb, n_lists=N_LISTS, n_iter=2)
    )
    books_solo = sim.pq_train(emb, N_SUB, K_CODES, SUB_DIM, n_iter=2)
    assert sim._centroid_rows(coarse_j) == coarse_solo
    assert books_j == books_solo


def test_driver_lloyd_matches_distributed_lloyd(emb):
    # lloyd_np is the same algorithm as _joint_lloyd with row-summation
    # order as the only freedom (not contractual in either engine);
    # codebooks must agree to ULP-class tolerance and the rounded
    # assignments they induce must be identical
    coarse_s, books_s = sim.ivfpq_train(
        emb, N_LISTS, N_SUB, K_CODES, SUB_DIM, n_iter=2
    )
    coarse_n, books_n = sim.ivfpq_train_np(
        emb, N_LISTS, N_SUB, K_CODES, SUB_DIM, n_iter=2
    )
    def flat(bk):
        return [x for _, v in bk for x in v]
    for bs, bn in zip([coarse_s, *books_s], [coarse_n, *books_n]):
        assert all(
            abs(a - b) < 1e-9 for a, b in zip(flat(bs), flat(bn))
        )


def test_probe_matches_in_memory_operator(spark, emb, queries, index_path):
    from_index = sim.probe_ivfpq_index(
        spark, index_path, queries, k=K, n_probe=N_PROBE
    )
    in_memory = sim.ivfpq_topk(
        emb, queries, k=K, n_lists=N_LISTS, n_probe=N_PROBE,
        n_sub=N_SUB, k_codes=K_CODES, sub_dim=SUB_DIM, n_iter=2,
    )
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["adc_dist"])  # noqa: E731
    assert sorted(map(key, from_index.collect())) == sorted(
        map(key, in_memory.collect())
    )


def test_index_stores_codes_not_vectors(spark, index_path):
    cols = set(spark.read.parquet(index_path).columns)
    assert {f"code_{s}" for s in range(N_SUB)} <= cols
    assert "emb" not in cols  # the 64x compression is real, not alongside


def test_probe_scan_prunes_partitions(spark, index_path):
    probed = spark.read.parquet(index_path).filter(F.col("list_id").isin([0, 1]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    after = plan.split("PartitionFilters", 1)[1][:200]
    assert "list_id" in after
    assert 0 < probed.count() < spark.read.parquet(index_path).count()


def test_pruning_semantics_vs_flat_pq(spark, emb, queries):
    # v16's result must equal "flat v14 ADC ranking restricted to the
    # probed lists", computed through the CATALYST expression chain
    # (ivf_assign + pq_encode + per-pair fold ADC) with the SAME books —
    # a bit-parity cross-check of the numpy kernel + LUT scoring against
    # the fold implementation the v13/v14 oracles already pin
    coarse, books = sim.ivfpq_train_np(
        emb, N_LISTS, N_SUB, K_CODES, SUB_DIM, n_iter=2
    )
    assigned = sim.ivf_assign(emb, coarse)
    enc = sim.pq_encode(assigned, books, SUB_DIM, keep_cols=["list_id"])
    qcents = sim._cent_literal(sim._centroid_rows(coarse))
    probe_lists = F.transform(
        F.slice(
            F.array_sort(sim._dist_structs_over(F.col("qemb"), qcents)),
            1, N_PROBE,
        ),
        lambda s: s["list_id"],
    )
    # the round-10 LUT hoist made _adc_rank consume the per-query ADC
    # lookup-table columns — attach them the same way the production
    # chain does (on the query side, below the probe join)
    probes = sim._with_adc_luts(queries, books, SUB_DIM, "qemb").select(
        "query_id", "qemb",
        *[f"__dt{s}" for s in range(N_SUB)],
        F.explode(probe_lists).alias("list_id"),
    )
    manual_pairs = probes.join(enc, "list_id").filter(
        F.col("query_id") != F.col("vec_id")
    )
    manual = sim._adc_rank(
        manual_pairs, books, SUB_DIM, K, "vec_id", "query_id", "qemb"
    )
    composed = sim.ivfpq_topk(
        emb, queries, k=K, n_lists=N_LISTS, n_probe=N_PROBE,
        n_sub=N_SUB, k_codes=K_CODES, sub_dim=SUB_DIM, n_iter=2,
    )
    key = lambda r: tuple(r)  # noqa: E731
    assert sorted(map(key, manual.collect())) == sorted(
        map(key, composed.collect())
    )


def test_probe_candidates_bounded_by_probed_lists(spark, emb, queries):
    # structural scale pin: every candidate pair's corpus row belongs to a
    # probed list — the join key is list_id, so no unprobed row can leak in
    coarse, books = sim.ivfpq_train_np(
        emb, N_LISTS, N_SUB, K_CODES, SUB_DIM, n_iter=2
    )
    assigned = sim.ivf_assign(emb, coarse).select("vec_id", "list_id")
    out = sim.ivfpq_topk(
        emb, queries, k=K, n_lists=N_LISTS, n_probe=N_PROBE,
        n_sub=N_SUB, k_codes=K_CODES, sub_dim=SUB_DIM, n_iter=2,
    )
    qcents = sim._cent_literal(sim._centroid_rows(coarse))
    probe_lists = F.transform(
        F.slice(
            F.array_sort(sim._dist_structs_over(F.col("qemb"), qcents)),
            1, N_PROBE,
        ),
        lambda s: s["list_id"],
    )
    probed = {
        (r["query_id"], r["list_id"])
        for r in queries.select(
            "query_id", F.explode(probe_lists).alias("list_id")
        ).collect()
    }
    member = {r["vec_id"]: r["list_id"] for r in assigned.collect()}
    for r in out.collect():
        assert (r["query_id"], member[r["neighbor_id"]]) in probed


def test_train_np_empty_training_set_raises_clearly(spark):
    """Round-5 advisory: a 0-row training set must fail with a clear
    ValueError, not an opaque numpy IndexError from the seed slice."""
    empty = spark.createDataFrame([], "vec_id long, emb array<double>")
    with pytest.raises(ValueError, match="empty"):
        sim.ivfpq_train_np(empty, n_lists=2, n_sub=2, k_codes=2, sub_dim=2)
    with pytest.raises(ValueError, match="empty"):
        sim.lloyd_np([], [(0, 2, 2)], n_iter=1)


def test_dir_has_parquet_is_fs_api_backed(spark, tmp_path):
    """Round-5 advisory: the empty-index guard must go through the Hadoop
    FileSystem API (FS-agnostic), not os.walk — exercised here via an
    explicit file: URI, the same code path any hdfs://, s3a:// scheme
    takes. Metadata (`_`/`.`-prefixed components) must not count."""
    root = tmp_path / "idx"
    (root / "_centroids").mkdir(parents=True)
    (root / "_centroids" / "part-0.parquet").write_bytes(b"x")
    uri = f"file://{root}"
    assert sim._dir_has_parquet(spark, uri) is False          # metadata only
    assert sim._dir_has_parquet(spark, uri + "/nope") is False  # missing
    (root / "list_id=0").mkdir()
    (root / "list_id=0" / "part-0.parquet").write_bytes(b"x")
    assert sim._dir_has_parquet(spark, uri) is True
    assert sim._dir_has_parquet(spark, str(root)) is True     # schemeless too
