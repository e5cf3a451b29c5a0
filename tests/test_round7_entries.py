"""Round-7 operators: BM25 retrieval, chunking/pooling, boilerplate,
leakage-free split, and the two-level global shuffle order."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.operators.chunking import (
    chunk_by_tokens,
    mean_pool,
    mean_pool_vectors,
)
from weather_data_pipeline_sv_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    bm25_topk,
)
from weather_data_pipeline_sv_spark.operators.sampling import (
    global_hash_order,
)


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------
def _np_bm25(corpus: dict[int, list[str]], query: list[str], k1, b):
    """Reference BM25 in plain Python for the hand-check."""
    n = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n
    out = {}
    for doc, toks in corpus.items():
        s = 0.0
        for term in set(query):
            tf = toks.count(term)
            if tf == 0:
                continue
            df = sum(1 for t in corpus.values() if term in t)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if s > 0:
            out[doc] = s
    return out


def test_bm25_matches_reference_formula(spark):
    corpus = {
        1: "the cat sat on the mat".split(),
        2: "the dog sat".split(),
        3: "cats and dogs".split(),
        4: "weather data pipeline".split(),
    }
    doc_terms = spark.createDataFrame(
        [(d, t) for d, toks in corpus.items() for t in toks],
        ["doc_id", "term"],
    )
    query = ["cat", "sat"]
    qt = spark.createDataFrame([(0, t) for t in query], ["query_id", "term"])
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(doc_terms, qt, k=10).collect()
    }
    want = _np_bm25(corpus, query, BM25_K1, BM25_B)
    assert set(got) == set(want)  # doc 4 shares no term -> never scored
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-4)


def test_bm25_rank_and_k(spark):
    # doc 1 contains the term twice, doc 2 once but shorter -> both
    # scored; rank is 1-based, dense, capped at k, doc_id breaks ties
    doc_terms = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (3, "z")],
        ["doc_id", "term"],
    )
    qt = spark.createDataFrame([(7, "x")], ["query_id", "term"])
    rows = bm25_topk(doc_terms, qt, k=1).collect()
    assert len(rows) == 1 and rows[0]["rank"] == 1
    rows = bm25_topk(doc_terms, qt, k=10).orderBy("rank").collect()
    assert [r["rank"] for r in rows] == [1, 2]
    assert {r["doc_id"] for r in rows} == {1, 2}


# ---------------------------------------------------------------------------
# Chunking
# ---------------------------------------------------------------------------
def _chunks(spark, toks, window=4, stride=3):
    df = spark.createDataFrame([(1, toks)], ["doc_id", "tokens"])
    return (
        chunk_by_tokens(df, "doc_id", "tokens", window=window, stride=stride)
        .orderBy("chunk_idx")
        .collect()
    )


def test_chunking_edges(spark):
    toks = [f"w{i}" for i in range(1, 11)]  # 10 tokens, window 4 stride 3
    rows = _chunks(spark, toks)
    # starts 1,4,7,10 -> lengths 4,4,4,1
    assert [r["start_tok"] for r in rows] == [1, 4, 7, 10]
    assert [r["n_chunk_tokens"] for r in rows] == [4, 4, 4, 1]
    assert [r["chunk_idx"] for r in rows] == [1, 2, 3, 4]
    assert rows[0]["chunk_text"] == "w1 w2 w3 w4"
    assert rows[-1]["chunk_text"] == "w10"
    # every token covered at least once
    covered = set()
    for r in rows:
        covered.update(r["chunk_text"].split())
    assert covered == set(toks)

    # shorter than one window -> exactly one chunk
    rows = _chunks(spark, ["a", "b"])
    assert len(rows) == 1 and rows[0]["chunk_text"] == "a b"
    # exactly one window -> one full chunk... plus the stride-3 tail at 4
    rows = _chunks(spark, ["a", "b", "c", "d"])
    assert [r["n_chunk_tokens"] for r in rows] == [4, 1]
    # empty array -> no rows
    df = spark.createDataFrame([(1, [])], "doc_id: long, tokens: array<string>")
    assert chunk_by_tokens(df).count() == 0


def test_chunking_validates_params(spark):
    df = spark.createDataFrame([(1, ["a"])], ["doc_id", "tokens"])
    with pytest.raises(ValueError):
        chunk_by_tokens(df, window=0)
    with pytest.raises(ValueError):
        chunk_by_tokens(df, stride=0)


def test_chunking_is_shuffle_free(spark, sf_dir):
    from weather_data_pipeline_sv_spark.catalog import all_queries

    plan = (
        all_queries()["t24_chunk_documents"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # pure map-side generator: the ONLY allowed exchange is the
    # ensure_min_parallelism round-robin fan-out of the single local
    # parquet file — no hash or range shuffle anywhere
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan


# ---------------------------------------------------------------------------
# Mean pooling
# ---------------------------------------------------------------------------
def test_mean_pool_and_vector_form_agree(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("a", [3.0, 6.0]), ("b", [5.0, 5.0])],
        ["g", "embedding"],
    )
    long = {
        (r["g"], r["pos"]): (r["n_vecs"], r["pooled"])
        for r in mean_pool(df, "g").collect()
    }
    assert long[("a", 0)] == (2, 2.0) and long[("a", 1)] == (2, 4.0)
    assert long[("b", 0)] == (1, 5.0)
    vecs = {
        r["g"]: r["pooled_vec"]
        for r in mean_pool_vectors(df, "g").collect()
    }
    assert vecs["a"] == [2.0, 4.0] and vecs["b"] == [5.0, 5.0]


# ---------------------------------------------------------------------------
# Global hash order
# ---------------------------------------------------------------------------
def test_global_hash_order_matches_naive_window(spark):
    from pyspark.sql import Window

    df = spark.createDataFrame([(i,) for i in range(500)], ["doc_id"])
    got = global_hash_order(df, "doc_id", salt="s", n_buckets=8)
    # naive single-window replay
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("s"), F.lit(":"),
                           F.col("doc_id").cast("string"))), 1, 8
        ), 16, 10,
    ).cast("bigint")
    naive = df.withColumn(
        "position",
        F.row_number().over(Window.orderBy(h.asc(), F.col("doc_id").asc())),
    )
    g = {r["doc_id"]: r["position"] for r in got.collect()}
    n = {r["doc_id"]: r["position"] for r in naive.collect()}
    assert g == n
    assert sorted(g.values()) == list(range(1, 501))  # dense, 1-based


def test_global_hash_order_validates_buckets(spark):
    df = spark.createDataFrame([(1,)], ["doc_id"])
    with pytest.raises(ValueError):
        global_hash_order(df, "doc_id", n_buckets=48)


def test_smp9_plan_has_no_global_corpus_window(spark, sf_dir):
    """The corpus-sized window must be partitioned by bucket; the only
    single-partition structure allowed is the n_buckets-row offsets
    aggregate."""
    from weather_data_pipeline_sv_spark.catalog import all_queries

    df = all_queries()["smp9_curriculum_order"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # corpus window partitioned by bucket
    assert "partitionBy" not in plan or True  # textual form varies; check below
    import re

    # every Window over __h must carry the __bucket partition spec
    for m in re.finditer(r"Window \[(.*?)\]", plan):
        if "__rank" in m.group(0):
            assert "__bucket" in m.group(0)


# ---------------------------------------------------------------------------
# Leakage-free split
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "entry", ["smp8_leakage_free_split", "smp8b_leakage_split_banded"]
)
def test_smp8_no_component_straddles_splits(spark, sf_dir, entry):
    """The no-straddle property, pinned on BOTH candidate paths — the
    banded path (round-8) must preserve it, not just match the oracle."""
    from weather_data_pipeline_sv_spark.catalog import all_queries

    df = all_queries()[entry](spark, sf_dir)
    bad = (
        df.groupBy("component")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert bad == 0
    # exhaustive: every doc got a split label
    assert df.filter(F.col("split").isNull()).count() == 0


def test_smp10_no_shared_chunk_straddles_splits(spark, sf_dir):
    """The no-straddle property AT CHUNK GRANULARITY: every pair of
    documents sharing a context-window fingerprint carries ONE split
    label — the contamination unit for pretraining evals is the window,
    not the document. Checked directly against the chunk fingerprints,
    not just via components."""
    from weather_data_pipeline_sv_spark.catalog import all_queries
    from weather_data_pipeline_sv_spark.catalog.text import (
        _docs_with_tokens,
    )
    from weather_data_pipeline_sv_spark.catalog.text_chunks import (
        _CHUNK_S,
        _CHUNK_W,
    )
    from weather_data_pipeline_sv_spark.operators.chunking import (
        chunk_by_tokens,
    )

    split = all_queries()["smp10_chunk_leakage_split"](spark, sf_dir)
    # component-level: no component straddles, every doc labeled
    assert (
        split.groupBy("component")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
        == 0
    )
    assert split.filter(F.col("split").isNull()).count() == 0
    # chunk-level: every shared NON-BOILERPLATE fingerprint sees exactly
    # one split (fingerprints over the stop-fingerprint cap are excluded
    # from the guarantee by design — round-9 cap, see
    # operators/chunking.py::CHUNK_MAX_DF; inert at this corpus size,
    # filtered here so the test pins the operator's actual contract)
    from weather_data_pipeline_sv_spark.operators.chunking import (
        CHUNK_MAX_DF,
    )

    d = _docs_with_tokens(spark, sf_dir)
    ch = (
        chunk_by_tokens(
            d.select("doc_id", "tokens"), "doc_id", "tokens",
            window=_CHUNK_W, stride=_CHUNK_S,
        )
        .select("doc_id", F.md5("chunk_text").alias("h"))
        .distinct()
    )
    hot = (
        ch.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > CHUNK_MAX_DF)
        .select("h")
    )
    ch = ch.join(hot, "h", "left_anti")
    straddling = (
        ch.join(split.select("doc_id", "split"), "doc_id")
        .groupBy("h")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert straddling == 0
    # sanity: the property is non-vacuous — shared fingerprints exist
    shared = (
        ch.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .count()
    )
    assert shared > 0


def test_leakage_split_banded_equals_naive(spark, sf_dir):
    """Banding is result-invisible on this corpus: identical
    (doc, component, split) assignment row-for-row, and an unknown
    candidates mode raises."""
    from weather_data_pipeline_sv_spark.catalog import all_queries
    from weather_data_pipeline_sv_spark.operators.sampling import (
        leakage_free_split,
    )

    q = all_queries()
    a = sorted(
        map(tuple, q["smp8_leakage_free_split"](spark, sf_dir).collect())
    )
    b = sorted(
        map(tuple, q["smp8b_leakage_split_banded"](spark, sf_dir).collect())
    )
    assert a == b and len(a) > 0
    with pytest.raises(ValueError, match="candidates"):
        leakage_free_split(
            spark.range(1).select(
                F.col("id").alias("doc_id"), F.lit("x").alias("text")
            ),
            "doc_id", "text", candidates="bogus",
        )


# ---------------------------------------------------------------------------
# Boilerplate
# ---------------------------------------------------------------------------
def test_d11_ratio_and_bounds(spark, sf_dir):
    from weather_data_pipeline_sv_spark.catalog import all_queries

    rows = all_queries()["d11_boilerplate_shingles"](spark, sf_dir).collect()
    assert rows  # corpus has docs with >= 3 tokens
    for r in rows:
        assert 0 <= r["n_boiler"] <= r["n_shingles"]
        assert r["boiler_ratio"] == pytest.approx(
            math.floor(r["n_boiler"] / r["n_shingles"] * 1e6 + 0.5 + 1e-6)
            / 1e6
        )


# ---------------------------------------------------------------------------
# Persisted BM25 index (t25) / incremental maintenance (t26) / pipe7
# ---------------------------------------------------------------------------
def _toy_doc_terms(spark):
    corpus = {
        1: "the cat sat on the mat".split(),
        2: "the dog sat".split(),
        3: "cats and dogs".split(),
        4: "weather data pipeline".split(),
    }
    return spark.createDataFrame(
        [(d, t) for d, toks in corpus.items() for t in toks],
        ["doc_id", "term"],
    )


def test_persisted_probe_matches_from_scratch(spark, tmp_path):
    from weather_data_pipeline_sv_spark.operators.retrieval import (
        bm25_topk,
        probe_bm25_index,
        write_bm25_index,
    )

    doc_terms = _toy_doc_terms(spark)
    qt = spark.createDataFrame(
        [(0, "cat"), (0, "sat"), (1, "weather")], ["query_id", "term"]
    )
    path = str(tmp_path / "bm25_idx")
    write_bm25_index(doc_terms, path)
    scratch = sorted(map(tuple, bm25_topk(doc_terms, qt, k=10).collect()))
    probed = sorted(
        map(tuple, probe_bm25_index(spark, path, qt, k=10).collect())
    )
    assert scratch == probed


def test_persisted_probe_prunes_buckets(spark, tmp_path):
    """The probe scan must carry the bucket isin as a PartitionFilter
    (planning-time pruning), and read a strict subset of the postings."""
    from weather_data_pipeline_sv_spark.operators.retrieval import (
        _term_bucket,
        probe_bm25_index,
        write_bm25_index,
    )

    doc_terms = _toy_doc_terms(spark)
    qt = spark.createDataFrame([(0, "cat")], ["query_id", "term"])
    path = str(tmp_path / "bm25_idx2")
    write_bm25_index(doc_terms, path)
    out = probe_bm25_index(spark, path, qt, k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters", 1)[1][:200]
    # a single-bucket isin simplifies to an equality — accept both forms
    assert "bucket" in seg and ("IN" in seg or "=" in seg)
    # behavioral: probed postings are a strict subset (one bucket of 64)
    bucket = qt.select(_term_bucket(F.col("term"), 64).alias("b")).collect()[0]["b"]
    probed_rows = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("bucket") == bucket)
        .count()
    )
    total_rows = spark.read.parquet(f"{path}/postings").count()
    assert 0 < probed_rows < total_rows


def test_merged_partials_match_one_shot(spark):
    from weather_data_pipeline_sv_spark.operators.retrieval import (
        bm25_score_topk,
        bm25_topk,
        merge_bm25_partials,
        term_stats_partial,
    )

    doc_terms = _toy_doc_terms(spark)
    qt = spark.createDataFrame(
        [(0, "cat"), (0, "sat"), (1, "the")], ["query_id", "term"]
    )
    slices = [doc_terms.filter(F.col("doc_id") % 2 == i) for i in range(2)]
    parts = [term_stats_partial(sl) for sl in slices]
    tf, df, stats = merge_bm25_partials(
        [p[0] for p in parts], [p[1] for p in parts], [p[2] for p in parts]
    )
    merged = sorted(
        map(tuple, bm25_score_topk(tf, df, stats, qt, k=10).collect())
    )
    oneshot = sorted(map(tuple, bm25_topk(doc_terms, qt, k=10).collect()))
    assert merged == oneshot
    # avgdl recomposes exactly: (6 + 3 + 3 + 3) / 4
    srow = stats.collect()[0]
    assert srow["n_docs"] == 4 and srow["avgdl"] == pytest.approx(15 / 4)


def test_pipe7_never_flags_eval_docs(spark, sf_dir):
    from weather_data_pipeline_sv_spark.catalog import all_queries

    out = all_queries()["pipe7_retrieval_decontaminate"](spark, sf_dir)
    rows = out.collect()
    assert rows  # the synthetic corpus shares vocabulary -> hits exist
    for r in rows:
        assert r["doc_id"] % 17 != 0  # eval docs are not in the corpus
        assert 1 <= r["best_rank"] <= 5
        assert r["n_hits"] >= 1


def test_probe_uses_index_bucket_stamp(spark, tmp_path):
    """The probe must hash with the INDEX's stamped n_buckets, not a
    caller default — a layout mismatch would silently prune to wrong
    directories and miss postings."""
    from weather_data_pipeline_sv_spark.operators.retrieval import (
        bm25_topk,
        probe_bm25_index,
        write_bm25_index,
    )

    doc_terms = _toy_doc_terms(spark)
    qt = spark.createDataFrame(
        [(0, "cat"), (0, "sat"), (1, "weather")], ["query_id", "term"]
    )
    path = str(tmp_path / "bm25_idx16")
    write_bm25_index(doc_terms, path, n_buckets=16)  # != the 64 default
    probed = sorted(
        map(tuple, probe_bm25_index(spark, path, qt, k=10).collect())
    )
    scratch = sorted(map(tuple, bm25_topk(doc_terms, qt, k=10).collect()))
    assert probed == scratch


def test_probe_rejects_unstamped_index(spark, tmp_path):
    from weather_data_pipeline_sv_spark.operators.retrieval import (
        probe_bm25_index,
        term_stats,
        write_bm25_index,
    )

    doc_terms = _toy_doc_terms(spark)
    qt = spark.createDataFrame([(0, "cat")], ["query_id", "term"])
    path = str(tmp_path / "bm25_old_layout")
    write_bm25_index(doc_terms, path)
    # simulate an older/foreign layout: stats without the stamp
    _, _, stats = term_stats(doc_terms)
    stats.coalesce(1).write.mode("overwrite").parquet(f"{path}/_stats")
    with pytest.raises(ValueError, match="n_buckets stamp"):
        probe_bm25_index(spark, path, qt)


def test_pipe8_keeper_semantics(spark, sf_dir):
    """Exact-dup docs chunk identically: the smallest doc_id keeps its
    chunks, later copies' chunks are all duplicates."""
    from weather_data_pipeline_sv_spark.catalog import all_queries
    from weather_data_pipeline_sv_spark.operators.chunking import (
        chunk_by_tokens,
    )
    from pyspark.sql import Window

    toks = [f"w{i}" for i in range(1, 40)]
    df = spark.createDataFrame(
        [(1, toks), (2, toks), (3, ["unique", "tokens", "here"])],
        ["doc_id", "tokens"],
    )
    chunks = chunk_by_tokens(df).select(
        "doc_id", "chunk_idx", F.md5("chunk_text").alias("h")
    )
    w = Window.partitionBy("h").orderBy(F.asc("doc_id"), F.asc("chunk_idx"))
    rk = chunks.withColumn("rn", F.row_number().over(w))
    per_doc = {
        r["doc_id"]: (r["n"], r["dups"])
        for r in rk.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("dups"),
        )
        .collect()
    }
    assert per_doc[1][1] == 0                  # keeper
    assert per_doc[2] == (per_doc[1][0], per_doc[1][0])  # all dups
    assert per_doc[3][1] == 0                  # unique content

    # the catalog entry is non-degenerate on shared testdata
    out = all_queries()["pipe8_chunk_dedup"](spark, sf_dir)
    assert out.agg(F.sum("n_dup")).collect()[0][0] > 0
