"""BPE tokenizer + sketch entries (split out of catalog/text.py along
the family seam — round-10 verdict #6; entry names and oracles
verbatim):

- t16/t17 — BPE training (iterative merge loop) and encoding
- t18/t20 — HLL distinct-shingle counts, one-shot and incremental
- t19     — count-min-sketch heavy hitters
- t21/t22 — bottom-k quantile sketch, one-shot and incremental
- smp7    — weighted sampling; pipe6 — tokenized-corpus pipeline
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import hash_uniform_sql
from ..sources import load_tables
from ..functions.caching import stage_cache
from ..functions.partitioning import ensure_min_parallelism
from ..functions.rounding import rnd, rnd_sql
from . import register
from .text import (
    _DUCK_TOKENS,
    _SMP6_ALPHA,
    _SPARK_SHINGLES,
    _SPARK_TOKENS,
    _docs_with_tokens,
    _exact_dedup_lowest_id,
    _quality_kept,
)

# ---------------------------------------------------------------------------
# T16/T17 — BPE tokenizer training + encoding (operators/bpe.py): the
# round-6 close of the tokenizer boundary. Training is the Lloyd-style
# iterative loop (distributed pair counts, 1-row argmax collect per
# merge, loop_cache-pinned state); the oracle UNROLLS the identical loop
# as a materialized-CTE chain (MATERIALIZED is load-bearing: each state
# CTE has two consumers, and DuckDB would otherwise inline/recompute the
# chain exponentially). Sentinel-wrapped symbol strings make the merge a
# literal replace() with identical greedy left-to-right semantics in
# both engines — see operators/bpe.py for the full argument.
# ---------------------------------------------------------------------------
_BPE_MERGES = 24


def _duck_bpe_wrap(expr: str) -> str:
    return f"regexp_replace({expr}, '(.)', chr(1)||'\\1'||chr(2), 'g')"


def _duck_bpe_ctes(n_merges: int, docs_rel: str = "documents") -> str:
    """The unrolled training chain: wf -> w0 -> (p_i, m_i, w_i)* ->
    merges. Mirrors bpe_train step for step. ``docs_rel`` points the
    trainer at any relation exposing ``text`` (pipe6 trains on quality
    survivors)."""
    parts = [
        f"""wf AS MATERIALIZED (
      SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
                 AS word
        FROM {docs_rel}
      )
      WHERE length(word) > 0
        AND NOT contains(word, chr(1)) AND NOT contains(word, chr(2))
      GROUP BY word
    )""",
        f"""w0 AS MATERIALIZED (
      SELECT freq, {_duck_bpe_wrap('word')} AS sym FROM wf
    )""",
    ]
    for i in range(1, n_merges + 1):
        parts.append(f"""p{i} AS MATERIALIZED (
      SELECT t.syms[u.i] AS a, t.syms[u.i + 1] AS b,
             CAST(sum(t.freq) AS BIGINT) AS cnt
      FROM (
        SELECT freq,
               string_split(substr(sym, 2, length(sym) - 2),
                            chr(2)||chr(1)) AS syms
        FROM w{i - 1} WHERE length(sym) > 0
      ) t, unnest(generate_series(1, len(t.syms) - 1)) AS u(i)
      GROUP BY 1, 2
    )""")
        parts.append(f"""m{i} AS MATERIALIZED (
      SELECT a, b, cnt FROM p{i} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
    )""")
        parts.append(f"""w{i} AS MATERIALIZED (
      SELECT freq,
             replace(sym,
                     (SELECT chr(1)||a||chr(2)||chr(1)||b||chr(2) FROM m{i}),
                     (SELECT chr(1)||a||b||chr(2) FROM m{i})) AS sym
      FROM w{i - 1}
    )""")
    union = "\n      UNION ALL ".join(
        f"SELECT {i} AS step, a AS left_sym, b AS right_sym, "
        f"a||b AS merged, cnt AS pair_count FROM m{i}"
        for i in range(1, n_merges + 1)
    )
    parts.append(f"merges AS ({union})")
    return ",\n    ".join(parts)


def _duck_bpe_encode_expr(n_merges: int) -> str:
    s = _duck_bpe_wrap("word")
    for i in range(1, n_merges + 1):
        s = (
            f"replace({s},\n"
            f"          (SELECT chr(1)||a||chr(2)||chr(1)||b||chr(2) "
            f"FROM m{i}),\n"
            f"          (SELECT chr(1)||a||b||chr(2) FROM m{i}))"
        )
    return s


@register(
    "t16_bpe_train",
    oracle=f"""
    WITH {_duck_bpe_ctes(_BPE_MERGES)}
    SELECT CAST(step AS INTEGER) AS step, left_sym, right_sym, merged,
           pair_count
    FROM merges
    """,
)
def t16_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_train, word_frequencies

    d = ensure_min_parallelism(
        load_tables(spark, sf_dir, "documents")["documents"]
    )
    merges = bpe_train(word_frequencies(d), _BPE_MERGES)
    return spark.createDataFrame(
        merges,
        "step int, left_sym string, right_sym string, merged string, "
        "pair_count bigint",
    )


@register(
    "t17_bpe_encode",
    oracle=f"""
    WITH {_duck_bpe_ctes(_BPE_MERGES)},
    dw AS (
      SELECT doc_id, word FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
                 AS word
        FROM documents
      )
      WHERE length(word) > 0
        AND NOT contains(word, chr(1)) AND NOT contains(word, chr(2))
    ),
    enc AS (
      SELECT doc_id, {_duck_bpe_encode_expr(_BPE_MERGES)} AS s FROM dw
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(length(s) - length(replace(s, chr(2), ''))) AS BIGINT)
             AS n_bpe_tokens
    FROM enc GROUP BY doc_id
    """,
)
def t17_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # trains via bpe_train_auto: the driver-side twin when the word
    # table fits the collect ceiling (bit-identical merges, pinned in
    # tests/test_bpe.py; ~58x cheaper since the loop cost is per-round
    # job scheduling), falling back to the distributed loop on a
    # too-big vocabulary instead of hard-failing — t16 keeps the
    # distributed loop under oracle check, this entry proves the
    # production split: distributed word-count shuffle + driver merge
    # loop + distributed full-corpus encode, hash-identical either way
    from ..operators.bpe import (
        bpe_token_counts,
        bpe_train_auto,
        word_frequencies,
    )

    d = ensure_min_parallelism(
        load_tables(spark, sf_dir, "documents")["documents"]
    )
    merges = bpe_train_auto(word_frequencies(d), _BPE_MERGES)
    return bpe_token_counts(d, merges)


# ---------------------------------------------------------------------------
# T18 — per-source distinct 3-gram (shingle) count via engine-mirrored
# HyperLogLog (operators/sketches.py): exact count(distinct shingle)
# shuffles every distinct value (billions of rows per group at 100 TB);
# the HLL register table is bounded at groups x 1024 rows BY DESIGN.
# Spark's builtin approx_count_distinct is an HLL too but
# engine-private — this one is md5-derived, so DuckDB reproduces the
# registers bit-for-bit and the ESTIMATE itself is hash-checked (est,
# exact, and relative error all in the oracle). p=10 -> standard error
# 3.25%. Shingles, not words: ~10.8k distinct per source at sf0.1
# exercises the HLL estimator proper; the smaller dirs land in the
# linear-counting branch — both correction regimes are hash-checked.
# ---------------------------------------------------------------------------
_HLL_P = 10

from ..operators.sketches import duck_hll_sql as _duck_hll_sql  # noqa: E402


@register(
    "t18_hll_distinct",
    oracle=f"""
    WITH tk AS (
      SELECT source, {_DUCK_TOKENS} AS tokens FROM documents
    ),
    flt AS (
      SELECT source, tokens[i] || ' ' || tokens[i + 1] || ' ' ||
             tokens[i + 2] AS shingle
      FROM tk, unnest(generate_series(1, len(tokens) - 2)) AS u(i)
    ),
    {_duck_hll_sql('SELECT source, shingle FROM flt', ['source'], 'shingle', _HLL_P).strip()},
    ex AS (
      SELECT source,
             CAST(count(DISTINCT shingle) AS BIGINT) AS exact_distinct
      FROM flt GROUP BY source
    )
    SELECT h.source, {rnd_sql('h.est', 6)} AS est_distinct,
           ex.exact_distinct,
           {rnd_sql(
               f"abs(({rnd_sql('h.est', 6)}) - ex.exact_distinct)"
               " / ex.exact_distinct", 4)}
             AS rel_err
    FROM hll_est h JOIN ex ON h.source IS NOT DISTINCT FROM ex.source
    """,
)
def t18_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import hll_distinct

    shingles = (
        ensure_min_parallelism(
            load_tables(spark, sf_dir, "documents")["documents"]
        )
        .withColumn("tokens", F.expr(_SPARK_TOKENS))
        .filter(F.size("tokens") >= 3)
        .select(
            "source",
            F.explode(F.expr(_SPARK_SHINGLES)).alias("shingle"),
        )
    )
    est = hll_distinct(shingles, ["source"], "shingle", p=_HLL_P)
    exact = shingles.groupBy("source").agg(
        F.countDistinct("shingle").alias("exact_distinct")
    )
    return (
        est.withColumnRenamed("source", "__s")
        .join(exact, F.col("__s").eqNullSafe(F.col("source")))
        .select(
            "source",
            "est_distinct",
            "exact_distinct",
            rnd(
                F.abs(F.col("est_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_err"),
        )
    )


# ---------------------------------------------------------------------------
# SMP7 — weighted sampling without replacement (Efraimidis–Spirakis
# A-ES, operators/sampling.py): exactly k docs per source with inclusion
# probability proportional to doc length — the "exactly k, weighted"
# mixing primitive Bernoulli keep/drop (smp1/smp4) and unweighted
# exact-k (smp2) can't express. Rank key ln(u)/w (monotone in u^(1/w)),
# u the md5 variate shifted to (0,1], 9-dp-rounded with id tie-break —
# the full ranking replayed by the oracle. One per-group top-k window,
# state k per group.
# ---------------------------------------------------------------------------
_SMP7_K = 5


@register(
    "smp7_weighted_sample",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source, n_chars,
             {rnd_sql(
                 "ln((CAST('0x' || substr(md5('wsample' || ':' || "
                 "CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 1) / "
                 "4294967296.0) / CAST(n_chars AS DOUBLE)", 9)} AS rk
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    r AS (
      SELECT doc_id, source, n_chars,
             CAST(row_number() OVER (
               PARTITION BY source ORDER BY rk DESC, doc_id ASC)
               AS INTEGER) AS sample_rank
      FROM w
    )
    SELECT doc_id, source, n_chars, sample_rank
    FROM r WHERE sample_rank <= {_SMP7_K}
    """,
)
def smp7_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import weighted_sample_without_replacement

    d = load_tables(spark, sf_dir, "documents")["documents"]
    out = weighted_sample_without_replacement(
        d.select("doc_id", "source", "n_chars"),
        "source", "doc_id", "n_chars", k=_SMP7_K,
    )
    return out.select("doc_id", "source", "n_chars", "sample_rank")


# ---------------------------------------------------------------------------
# T19 — heavy-hitter frequencies via Count-Min sketch
# (operators/sketches.py): estimate term counts from a 4x256-counter
# table — bounded state at any vocabulary size, mergeable by SUM (the
# linear-sketch property) — and compare against the exact counts of the
# exact top-20 terms. Pure integer md5 math, so the counter table AND
# every estimate hash-match in DuckDB; the overcount column exhibits the
# one-sided error guarantee (est >= exact, always).
# ---------------------------------------------------------------------------
from ..operators.sketches import duck_cms_sql as _duck_cms_sql  # noqa: E402

_CMS_TOPK = 20
_CMS_W = 256


@register(
    "t19_cms_heavy_hitters",
    oracle=f"""
    WITH tk AS (
      SELECT {_DUCK_TOKENS} AS tokens FROM documents
    ),
    toks AS (
      SELECT term FROM (SELECT unnest(tokens) AS term FROM tk)
      WHERE length(term) > 0
    ),
    {_duck_cms_sql('SELECT term FROM toks', 'term', width=_CMS_W).strip()},
    exact AS (
      SELECT term, CAST(count(*) AS BIGINT) AS exact_cnt
      FROM toks GROUP BY term
    ),
    top AS (
      SELECT term, exact_cnt FROM exact
      ORDER BY exact_cnt DESC, term ASC LIMIT {_CMS_TOPK}
    ),
    pe AS (
      SELECT t.term, s.s,
             CAST('0x' || substr(md5(s.s || ':' || CAST(t.term AS VARCHAR)),
                  1, 8) AS BIGINT) % {_CMS_W} AS b
      FROM top t CROSS JOIN cms_salts s
    ),
    est AS (
      SELECT pe.term, CAST(min(coalesce(m.c, 0)) AS BIGINT) AS cms_est
      FROM pe LEFT JOIN cms m ON m.s = pe.s AND m.b = pe.b
      GROUP BY pe.term
    )
    SELECT t.term, t.exact_cnt, e.cms_est,
           e.cms_est - t.exact_cnt AS overcount
    FROM top t JOIN est e USING (term)
    """,
)
def t19_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import cms_estimate, cms_table

    toks = (
        ensure_min_parallelism(
            load_tables(spark, sf_dir, "documents")["documents"]
        )
        .select(
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("term")
        )
        .filter(F.length("term") > 0)
    )
    cms = cms_table(toks, "term", width=_CMS_W)
    exact = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    top = exact.orderBy(
        F.desc("exact_cnt"), F.asc("term")
    ).limit(_CMS_TOPK)
    est = cms_estimate(cms, top.select("term"), "term", width=_CMS_W)
    return top.join(est, "term").select(
        "term", "exact_cnt", "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
    )


# ---------------------------------------------------------------------------
# T20 — incremental sketch rollup ≡ batch (the pipe3-style theorem for
# sketches): per-source HLL registers built INDEPENDENTLY over three
# doc_id slices, merged by element-wise max, then folded to the
# estimate. The oracle computes the ONE-SHOT whole-corpus estimate — a
# hash match proves merge-of-slices ≡ batch exactly (the property that
# lets 1000 executors, daily increments, or per-store sketches roll up
# without ever rescanning history). Same item/grouping as t18.
# ---------------------------------------------------------------------------
@register(
    "t20_incremental_hll",
    oracle=f"""
    WITH tk AS (
      SELECT source, {_DUCK_TOKENS} AS tokens FROM documents
    ),
    flt AS (
      SELECT source, tokens[i] || ' ' || tokens[i + 1] || ' ' ||
             tokens[i + 2] AS shingle
      FROM tk, unnest(generate_series(1, len(tokens) - 2)) AS u(i)
    ),
    {_duck_hll_sql('SELECT source, shingle FROM flt', ['source'], 'shingle', _HLL_P).strip()}
    SELECT source, {rnd_sql('est', 6)} AS est_distinct FROM hll_est
    """,
)
def t20_incremental_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import hll_estimate, hll_registers

    base = (
        ensure_min_parallelism(
            load_tables(spark, sf_dir, "documents")["documents"]
        )
        .withColumn("tokens", F.expr(_SPARK_TOKENS))
        .filter(F.size("tokens") >= 3)
        .select(
            "doc_id", "source",
            F.explode(F.expr(_SPARK_SHINGLES)).alias("shingle"),
        )
    )
    slices = [
        base.filter(F.col("doc_id") % 3 == i).drop("doc_id")
        for i in range(3)
    ]
    regs = [
        hll_registers(sl, ["source"], "shingle", p=_HLL_P) for sl in slices
    ]
    merged = (
        regs[0].unionAll(regs[1]).unionAll(regs[2])
        .groupBy("source", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    return hll_estimate(merged, ["source"], p=_HLL_P)


# ---------------------------------------------------------------------------
# PIPE6 — the tokenizer-era corpus pipeline, composing the round-6
# operators end to end: quality filter -> exact dedup -> BPE trained ON
# THE SURVIVORS (the order real pipelines use — the tokenizer must not
# learn from junk or duplicates) -> full-corpus encode -> temperature
# resample (mT5 alpha-mix over the tokenized corpus) -> per-source token
# accounting. The oracle replays every stage including all 24 merge
# decisions, so the final token budgets are hash-checked through the
# entire composition. Scale shape: each stage's inventory is its own
# entry's (t5/d1/t16/t17/smp6); the composition adds no new shuffles.
# ---------------------------------------------------------------------------
@register(
    "pipe6_tokenized_corpus",
    oracle=f"""
    WITH q_tk AS (
      SELECT doc_id, source, text, {_DUCK_TOKENS} AS tokens
      FROM documents WHERE length(text) > 0
    ), q_m AS (
      SELECT doc_id, source, text, tokens, len(tokens) AS n_tokens,
             CAST(list_sum(list_transform(tokens, t -> length(t))) AS DOUBLE)
               / len(tokens) AS mean_tok_len,
             CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
               / length(text) AS symbol_ratio,
             len(regexp_extract_all(lower(text), '\\b(the|a|of|and|is)\\b')) > 0
               AS has_stopword
      FROM q_tk WHERE len(tokens) > 0
    ), q_kept AS (
      SELECT doc_id, source, text FROM q_m
      WHERE n_tokens BETWEEN 5 AND 5000
        AND mean_tok_len BETWEEN 2.0 AND 12.0
        AND symbol_ratio < 0.3 AND has_stopword
    ), uniq AS (
      SELECT doc_id, source, text FROM (
        SELECT *, row_number() OVER (PARTITION BY md5(text)
                                     ORDER BY doc_id) AS rn
        FROM q_kept
      ) WHERE rn = 1
    ),
    {_duck_bpe_ctes(_BPE_MERGES, docs_rel="uniq")},
    dw AS (
      SELECT doc_id, source, word FROM (
        SELECT doc_id, source,
               unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
                 AS word
        FROM uniq
      )
      WHERE length(word) > 0
        AND NOT contains(word, chr(1)) AND NOT contains(word, chr(2))
    ),
    enc AS (
      SELECT doc_id, source, {_duck_bpe_encode_expr(_BPE_MERGES)} AS s
      FROM dw
    ),
    dtok AS (
      SELECT doc_id, source,
             CAST(sum(length(s) - length(replace(s, chr(2), ''))) AS BIGINT)
               AS n_bpe
      FROM enc GROUP BY doc_id, source
    ),
    c AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM dtok GROUP BY source
    ),
    t AS (
      SELECT CAST(sum(n) AS DOUBLE) AS nn,
             sum(pow(CAST(n AS DOUBLE), {_SMP6_ALPHA})) AS z
      FROM c
    ),
    r AS (
      SELECT source,
             {rnd_sql(
                 f'pow(CAST(n AS DOUBLE), {_SMP6_ALPHA}) / t.z * t.nn'
                 ' / CAST(n AS DOUBLE)', 9)} AS rate
      FROM c CROSS JOIN t
    ),
    du AS (
      SELECT dtok.*, {hash_uniform_sql('doc_id', 'temp')} AS u FROM dtok
    ),
    kk AS (
      SELECT du.doc_id, du.source, du.n_bpe,
             CAST(floor(r.rate)
                  + CASE WHEN du.u < {rnd_sql('r.rate - floor(r.rate)', 9)}
                         THEN 1 ELSE 0 END AS BIGINT) AS copies
      FROM du JOIN r ON du.source IS NOT DISTINCT FROM r.source
    ),
    rs AS (
      SELECT kk.* FROM kk, unnest(generate_series(1, kk.copies)) AS g(i)
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_copies,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_unique_docs,
           CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens
    FROM rs GROUP BY source
    """,
)
def pipe6_tokenized_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import (
        bpe_token_counts,
        bpe_train_auto,
        word_frequencies,
    )
    from ..operators.sampling import temperature_resample

    d = _docs_with_tokens(spark, sf_dir).filter(
        (F.length("text") > 0) & (F.col("n_tokens") > 0)
    )
    # survivors head three consumers (train, encode, source join)
    uniq = _exact_dedup_lowest_id(
        _quality_kept(d), ["doc_id", "source", "text"]
    ).transform(stage_cache)
    merges = bpe_train_auto(word_frequencies(uniq), _BPE_MERGES)
    dtok = bpe_token_counts(uniq, merges).select(
        "doc_id", F.col("n_bpe_tokens").alias("n_bpe")
    )
    dtok_src = dtok.join(uniq.select("doc_id", "source"), "doc_id")
    rs = temperature_resample(
        dtok_src.select("doc_id", "source", "n_bpe"),
        "source", "doc_id", alpha=_SMP6_ALPHA, salt="temp",
    )
    return rs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.countDistinct("doc_id").alias("n_unique_docs"),
        F.sum("n_bpe").alias("total_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# T21 — mergeable quantile sketch (bottom-k / KMV, operators/
# sketches.py): the rank summary that completes the profiling family
# (t18 HLL = distinct, t19 CMS = frequency, this = quantiles) for
# CONTINUOUS value domains — a18's value-grid histogram assumes a
# bounded domain. State is k rows per group at any corpus size; the
# kept set is a pure multiset function (md5 variate bottom-k), so the
# SAME sketch — and therefore the same estimate, an actual data value —
# is reproduced by the DuckDB oracle, unlike approx_percentile (engine-
# private). Estimates carry the measured error against the exact
# quantile computed by the identical rank rule on the full table.
# k=128 already binds at sf0.01 (en has 218 docs), so the hash check
# exercises the LOSSY path, not a trivial pass-through.
# ---------------------------------------------------------------------------
from ..operators.sketches import (  # noqa: E402
    duck_qsk_sql as _duck_qsk_sql,
    duck_quantile_sql as _duck_quantile_sql,
)

_QSK_K = 128
_QSK_QS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


@register(
    "t21_quantile_sketch",
    oracle=f"""
    WITH
    {_duck_qsk_sql(
        'SELECT lang, doc_id, n_chars FROM documents',
        ['lang'], 'n_chars', 'doc_id', _QSK_K).strip()},
    {_duck_quantile_sql('qsk', ['lang'], _QSK_QS, out='qest').strip()},
    ex_src AS (
      SELECT lang, CAST(doc_id AS VARCHAR) AS qsk_id, n_chars AS qsk_v
      FROM documents
    ),
    {_duck_quantile_sql('ex_src', ['lang'], _QSK_QS, out='qex').strip()}
    SELECT e.lang, e.q, e.est AS est_value, x.est AS exact_value,
           {rnd_sql(
               'abs(CAST(e.est AS DOUBLE) - CAST(x.est AS DOUBLE))'
               ' / greatest(CAST(x.est AS DOUBLE), 1.0)', 6)} AS rel_err
    FROM qest e JOIN qex x
      ON e.lang IS NOT DISTINCT FROM x.lang AND e.q = x.q
    """,
)
def t21_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import qsketch, sample_quantiles

    d = ensure_min_parallelism(
        load_tables(spark, sf_dir, "documents")["documents"]
    ).select("lang", "doc_id", "n_chars")
    sk = qsketch(d, ["lang"], "n_chars", "doc_id", k=_QSK_K)
    est = sample_quantiles(sk, ["lang"], _QSK_QS)
    exact = sample_quantiles(
        d.select(
            "lang",
            F.col("n_chars").alias("qsk_v"),
            F.col("doc_id").cast("string").alias("qsk_id"),
        ),
        ["lang"], _QSK_QS,
    ).select(
        F.col("lang").alias("__l"), F.col("q").alias("__q"),
        F.col("est").alias("exact_value"),
    )
    return (
        est.join(
            exact,
            est["lang"].eqNullSafe(exact["__l"])
            & (est["q"] == exact["__q"]),
        )
        .select(
            "lang", "q",
            F.col("est").alias("est_value"),
            "exact_value",
            rnd(
                F.abs(
                    F.col("est").cast("double")
                    - F.col("exact_value").cast("double")
                )
                / F.greatest(
                    F.col("exact_value").cast("double"), F.lit(1.0)
                ),
                6,
            ).alias("rel_err"),
        )
    )


# ---------------------------------------------------------------------------
# T22 — the quantile-sketch rollup theorem (t20's companion): three
# disjoint doc_id slices are sketched INDEPENDENTLY (the per-executor /
# per-day state), merged by union + re-bottom-k, and estimated — while
# the oracle computes the ONE-SHOT sketch over the full table. Hash
# equality of the estimates IS the proof that bottom-k merge is exact
# (bottomk(A∪B) == bottomk(bottomk(A)∪bottomk(B))) — the property that
# lets 1000 executors (or 1000 daily increments) each keep k rows and
# still answer global quantiles, with no re-scan of history.
# ---------------------------------------------------------------------------
@register(
    "t22_incremental_quantile",
    oracle=f"""
    WITH
    {_duck_qsk_sql(
        'SELECT lang, doc_id, n_chars FROM documents',
        ['lang'], 'n_chars', 'doc_id', _QSK_K).strip()},
    {_duck_quantile_sql('qsk', ['lang'], _QSK_QS, out='qest').strip()}
    SELECT lang, q, est AS est_value FROM qest
    """,
)
def t22_incremental_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import (
        qsketch,
        qsketch_merge,
        sample_quantiles,
    )

    d = ensure_min_parallelism(
        load_tables(spark, sf_dir, "documents")["documents"]
    ).select("lang", "doc_id", "n_chars")
    slices = [d.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    sketches = [
        qsketch(sl, ["lang"], "n_chars", "doc_id", k=_QSK_K)
        for sl in slices
    ]
    merged = qsketch_merge(sketches, ["lang"], k=_QSK_K)
    return sample_quantiles(merged, ["lang"], _QSK_QS).select(
        "lang", "q", F.col("est").alias("est_value")
    )


