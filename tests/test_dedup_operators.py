"""Unit tests for operators/dedup.py — the reusable dedup library behind
catalog entries d1-d5 (exact hash, n-gram Jaccard, MinHash+LSH, SimHash).

Covers the properties the oracle parity test can't see:
- LSH banding candidate generation loses no pair the brute-force verifier
  would accept (MinHash probabilistically at high thresholds on crafted
  near-dups; SimHash *deterministically* by pigeonhole at hamming <= 3)
- greedy drop_near_duplicates collapses transitive chains in one anti join
- the stop-shingle frequency cap actually removes hot shingles
"""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.operators import dedup as dd


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = "the quick brown fox jumps over the lazy dog near the old river bank today"


def test_exact_duplicates_canonical_is_min_id(spark):
    df = _docs(
        spark,
        [
            (1, "Hello  World"),
            (2, "  hello world "),  # same after trim+lower+split? no — double space
            (3, "hello world"),
            (4, "something else"),
        ],
    )
    out = {r["doc_id"]: r for r in dd.exact_duplicates(df, "doc_id", "text").collect()}
    # 2 and 3 normalize identically ("hello world"); 1 has a double space so
    # trim+lower alone does NOT fold it — exact dedup is byte-exact by design
    assert out[2]["canonical_id"] == 2 and out[2]["is_canonical"]
    assert out[3]["canonical_id"] == 2 and not out[3]["is_canonical"]
    assert out[1]["is_canonical"] and out[4]["is_canonical"]


def test_jaccard_pairs_identical_docs_score_one(spark):
    df = _docs(spark, [(1, BASE), (2, BASE), (3, "completely different words here entirely")])
    pairs = dd.jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.9).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(1, 2)]
    assert abs(pairs[0]["jaccard"] - 1.0) < 1e-12


def test_minhash_lsh_finds_crafted_near_dups(spark):
    # 1/2: one word changed out of 15 -> shingle Jaccard ~ (13-3+1... high);
    # 3: unrelated. With 16 hashes x 4 bands the detection probability for
    # J~0.8 is 1-(1-0.8^4)^4 ~ 0.92 per pair; md5 family is deterministic so
    # this test is stable (not flaky): it either always passes or never does.
    df = _docs(
        spark,
        [
            (1, BASE),
            (2, BASE.replace("lazy", "sleepy")),
            (3, "metal oxide semiconductors amplify tiny currents in modern chips"),
        ],
    )
    pairs = dd.minhash_lsh_pairs(
        df, "doc_id", "text", n=3, n_hashes=16, band_size=4, threshold=0.3
    ).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(1, 2)]
    jac = pairs[0]["jaccard"]
    assert 0.3 <= jac < 1.0


def test_minhash_jaccard_matches_true_jaccard(spark):
    """The LSH path's verified jaccard equals the brute-force jaccard."""
    df = _docs(spark, [(1, BASE), (2, BASE.replace("lazy", "sleepy"))])
    brute = dd.jaccard_pairs(df, "doc_id", "text", threshold=0.0).collect()[0]["jaccard"]
    lsh = dd.minhash_lsh_pairs(df, "doc_id", "text", threshold=0.0).collect()
    assert lsh and abs(lsh[0]["jaccard"] - brute) < 1e-12


def test_simhash_identical_docs_zero_hamming(spark):
    df = _docs(spark, [(1, BASE), (2, BASE)])
    sigs = {r["doc_id"]: r for r in dd.simhash(df, "doc_id", "text").collect()}
    assert sigs[1]["simhash_hi"] == sigs[2]["simhash_hi"]
    assert sigs[1]["simhash_lo"] == sigs[2]["simhash_lo"]
    # both halves fit in 32 bits (unsigned) — stored in longs, never negative
    for s in sigs.values():
        assert 0 <= s["simhash_hi"] < 2**32 and 0 <= s["simhash_lo"] < 2**32
    pairs = dd.simhash_pairs(df, "doc_id", "text", max_hamming=3).collect()
    assert [(p["doc_a"], p["doc_b"], p["hamming"]) for p in pairs] == [(1, 2, 0)]


def test_simhash_banding_is_pigeonhole_complete(spark, sf_dir):
    """Banded candidates == brute-force all-pairs at hamming <= 3 on the real
    documents table (the property the d4 oracle relies on)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dd.simhash_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    }
    sig = dd.simhash(docs, "doc_id", "text")
    a, b = sig.alias("a"), sig.alias("b")
    ham = F.bit_count(
        F.col("a.simhash_hi").bitwiseXOR(F.col("b.simhash_hi"))
    ) + F.bit_count(F.col("a.simhash_lo").bitwiseXOR(F.col("b.simhash_lo")))
    brute = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == brute


def test_drop_near_duplicates_collapses_transitive_chain(spark):
    df = _docs(spark, [(i, f"doc {i}") for i in range(1, 6)])
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.9), (4, 5, 0.95)],  # chain 1-2-3 and pair 4-5
        "doc_a long, doc_b long, jaccard double",
    )
    kept = sorted(
        r["doc_id"] for r in dd.drop_near_duplicates(df, "doc_id", pairs).collect()
    )
    assert kept == [1, 4]


def test_stop_shingle_cap_drops_hot_shingles(spark):
    # "a b c" appears in all 4 docs -> dropped at cap 3; unique tails survive
    df = _docs(spark, [(i, f"a b c unique{i} tail{i} word{i}") for i in range(4)])
    sh_all = dd.explode_shingles(df, "doc_id", "text", n=3)
    sh_cap = dd.explode_shingles(df, "doc_id", "text", n=3, max_shingle_df=3)
    hot = {r["shingle"] for r in sh_all.collect()} - {r["shingle"] for r in sh_cap.collect()}
    assert "a b c" in hot
    # no doc pair shares a capped shingle anymore -> zero jaccard pairs
    assert not dd.jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.01, max_shingle_df=3
    ).collect()


def test_connected_components_transitive_chain(spark):
    from weather_data_pipeline_sv_spark.operators.graph import (
        connected_components,
    )

    vertices = spark.createDataFrame([(i,) for i in range(1, 9)], "id long")
    # chain 1-2-3-4, pair 5-6, isolated 7, 8
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "src long, dst long"
    )
    comp = {r["id"]: r["component"]
            for r in connected_components(vertices, edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7, 8: 8}


def test_connected_components_long_path_converges(spark):
    from weather_data_pipeline_sv_spark.operators.graph import (
        connected_components,
    )

    n = 12  # diameter 11 > default rounds needed by small clusters
    vertices = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    comp = {r["id"]: r["component"]
            for r in connected_components(vertices, edges).collect()}
    assert set(comp.values()) == {0} and len(comp) == n


def test_ngram_decontaminate_flags_overlapping_docs(spark):
    eval_df = _docs(spark, [(100, BASE)])
    corpus = _docs(
        spark,
        [
            (1, BASE),  # full overlap -> contamination 1.0
            (2, "the quick brown fox jumps over something unrelated and new"),
            (3, "completely different words here entirely unrelated text"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in dd.ngram_decontaminate(
            corpus, eval_df, "doc_id", "text", n=3, threshold=0.2
        ).collect()
    }
    assert out[1]["contamination"] == 1.0 and out[1]["is_contaminated"]
    # doc 2 shares exactly the shingles inside "the quick brown fox jumps
    # over": 4 of its 8 shingles
    assert out[2]["n_shingles"] == 8 and out[2]["n_eval_hits"] == 4
    assert out[2]["is_contaminated"]
    assert out[3]["n_eval_hits"] == 0 and not out[3]["is_contaminated"]


def test_ngram_decontaminate_eval_side_is_broadcast(spark):
    eval_df = _docs(spark, [(100, BASE)])
    corpus = _docs(spark, [(1, BASE)])
    plan = dd.ngram_decontaminate(
        corpus, eval_df, "doc_id", "text"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_jaccard_cap_matches_capped_oracle(spark, tmp_path):
    """When the stop-shingle cap BINDS, Spark jaccard_pairs and the capped
    DuckDB CTE (the `shc` mirror in catalog/text.py) must still agree.

    Corpus: 5 docs all sharing one hot boilerplate shingle run, two of them
    genuine near-dups beyond it. cap=3 < 5 so the boilerplate shingles are
    dropped by BOTH engines; an uncapped oracle would disagree on the
    jaccard value (the round-2 ADVICE finding this test pins)."""
    import duckdb

    boiler = "all rights reserved contact us today"
    rows = [
        (1, f"alpha beta gamma delta epsilon zeta {boiler}"),
        (2, f"alpha beta gamma delta epsilon eta {boiler}"),
        (3, f"one two three four five six {boiler}"),
        (4, f"seven eight nine ten eleven twelve {boiler}"),
        (5, f"red green blue cyan magenta yellow {boiler}"),
    ]
    cap = 3
    df = _docs(spark, rows)
    got = sorted(
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 10))
        for r in dd.jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.05, max_shingle_df=cap
        ).collect()
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(
        (a, b, round(j, 10))
        for a, b, j in con.execute(f"""
        WITH tk AS (
          SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS tokens
          FROM documents
        ), sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            generate_series(1, len(tokens) - 2),
            i -> tokens[i] || ' ' || tokens[i + 1] || ' ' || tokens[i + 2]))) AS shingle
          FROM tk WHERE len(tokens) >= 3
        ), shc AS (
          SELECT s.doc_id, s.shingle FROM sh s
          JOIN (SELECT shingle FROM sh GROUP BY shingle
                HAVING count(*) <= {cap}) k USING (shingle)
        ), counts AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
          FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT p.doc_a, p.doc_b,
               p.inter * 1.0 / (ca.n_sh + cb.n_sh - p.inter) AS jaccard
        FROM pairs p
        JOIN counts ca ON p.doc_a = ca.doc_id
        JOIN counts cb ON p.doc_b = cb.doc_id
        WHERE p.inter * 1.0 / (ca.n_sh + cb.n_sh - p.inter) >= 0.05
        """).fetchall()
    )
    # the cap must actually bind in this fixture (boilerplate df = 5 > 3)
    assert got == want and len(got) > 0
    # and the capped result must DIFFER from uncapped — otherwise this test
    # wouldn't detect an engine that ignores the cap
    uncapped = sorted(
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 10))
        for r in dd.jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.05, max_shingle_df=None
        ).collect()
    )
    assert uncapped != got
