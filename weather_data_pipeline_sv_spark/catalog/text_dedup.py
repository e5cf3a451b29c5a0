"""Decontamination + exact-substring dedup entries (split out of
catalog/text.py along the family seam — round-10 verdict #6; entry
names and oracles verbatim, see text.py for the family's shared token/
shingle helpers):

- d7/d10 — n-gram and Bloom benchmark decontamination
- d8/d9  — exact-substring duplication spans and the destructive rewrite
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..sources import load_tables
from ..functions.rounding import rnd
from . import register
from .text import (
    _DUCK_DOC_SHINGLES,
    _DUCK_TOKENS,
    _docs_with_tokens,
)

# ---------------------------------------------------------------------------
# D7 — benchmark decontamination: per-corpus-doc n-gram overlap against a
# held-out eval set (the GPT-3/PaLM 13-gram check, 3-gram here so sf0.01
# has hits). Eval set = every 17th doc_id; corpus = the rest. The eval
# side collapses to a DISTINCT shingle set and BROADCASTS — the corpus is
# probed map-side and never shuffled on the shingle key; the only shuffle
# is the per-doc partial+final aggregation. See
# operators/dedup.py::ngram_decontaminate for the scale rationale.
# ---------------------------------------------------------------------------
_DECON_MOD = 17
_DECON_THRESH = 0.2

_D7_ORACLE = f"""
    {_DUCK_DOC_SHINGLES},
      eval_sh AS (
        SELECT DISTINCT shingle FROM sh WHERE doc_id % {_DECON_MOD} = 0
      ),
      agg AS (
        SELECT c.doc_id,
               count(*) AS n_shingles,
               sum(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END) AS n_eval_hits
        FROM sh c LEFT JOIN eval_sh e ON c.shingle = e.shingle
        WHERE c.doc_id % {_DECON_MOD} <> 0
        GROUP BY c.doc_id
      )
    SELECT doc_id,
           CAST(n_shingles AS INTEGER) AS n_shingles,
           CAST(n_eval_hits AS INTEGER) AS n_eval_hits,
           floor((n_eval_hits * 1.0 / n_shingles) * 10000.0 + 0.5 + 1e-6) / 10000.0
             AS contamination,
           (n_eval_hits * 1.0 / n_shingles >= {_DECON_THRESH}) AS is_contaminated
    FROM agg
    """


def _decon_result(res: DataFrame) -> DataFrame:
    return res.select(
        "doc_id",
        "n_shingles",
        "n_eval_hits",
        rnd(F.col("contamination"), 4).alias("contamination"),
        "is_contaminated",
    )


@register("d7_decontaminate", oracle=_D7_ORACLE)
def d7_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    eval_df = d.filter(F.col("doc_id") % _DECON_MOD == 0)
    corpus = d.filter(F.col("doc_id") % _DECON_MOD != 0)
    res = dd.ngram_decontaminate(
        corpus, eval_df, "doc_id", "text", n=3, threshold=_DECON_THRESH
    )
    return _decon_result(res)


# ---------------------------------------------------------------------------
# D10 — Bloom-prefiltered decontamination: the SAME semantics as d7 (it
# shares d7's oracle verbatim — a hash match proves the Bloom layer is
# result-invisible), routed through a 2^20-bit bitmap built with
# bit_or/xxhash64 built-ins and broadcast at ≤128 KB regardless of eval-
# set size. d7's shape broadcasts the distinct eval SHINGLE STRINGS,
# which stops fitting when the decontamination list covers every eval
# suite; here only bloom-passing shingles (true hits + ~1% false
# positives) reach the exact-confirm join. See
# operators/dedup.py::bloom_decontaminate for the construction.
# ---------------------------------------------------------------------------
@register("d10_bloom_decontaminate", oracle=_D7_ORACLE)
def d10_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    eval_df = d.filter(F.col("doc_id") % _DECON_MOD == 0)
    corpus = d.filter(F.col("doc_id") % _DECON_MOD != 0)
    res = dd.bloom_decontaminate(
        corpus, eval_df, "doc_id", "text", n=3, threshold=_DECON_THRESH
    )
    return _decon_result(res)

# ---------------------------------------------------------------------------
# D8 — exact-substring duplication spans (the ExactSubstr half of modern
# dedup stacks, complementing doc-level Jaccard d2/d3): every L-token
# window is hashed; windows whose hash occurs in MORE THAN ONE document
# are duplicated spans. Per doc we report how many of its windows are
# duplicated and the duplicated fraction — the "remove copied spans, not
# whole docs" signal.
#
# Scale shape: the window explode is map-side; the only shuffles are the
# (hash → distinct-doc-count) partial+final agg and the per-doc rollup.
# No self-join at all — cross-doc duplication is detected through the
# aggregated df, so the worst-case cost is linear in total windows even
# when one boilerplate span occurs in 10^6 documents (the case that makes
# pairwise approaches quadratic).
# ---------------------------------------------------------------------------
_SUBSTR_L = 8


@register(
    "d8_exact_substring_spans",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {_DUCK_TOKENS} AS tokens FROM documents
    ), win AS (
      SELECT doc_id,
             md5(array_to_string(tokens[i:i+{_SUBSTR_L - 1}], ' ')) AS wh
      FROM tk, unnest(generate_series(1, len(tokens) - {_SUBSTR_L - 1})) AS u(i)
      WHERE len(tokens) >= {_SUBSTR_L}
    ), df AS (
      SELECT wh, count(DISTINCT doc_id) AS n_docs FROM win GROUP BY wh
    )
    SELECT w.doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN df.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_windows,
           floor((sum(CASE WHEN df.n_docs > 1 THEN 1 ELSE 0 END) * 1.0
                  / count(*)) * 10000.0 + 0.5 + 1e-6) / 10000.0 AS dup_frac
    FROM win w JOIN df USING (wh)
    GROUP BY w.doc_id
    """,
)
def d8_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _docs_with_tokens(spark, sf_dir).filter(
        F.col("n_tokens") >= _SUBSTR_L
    )
    # L-token sliding windows, hashed; NOT distinct per doc — a doc
    # repeating its own span still counts each occurrence in n_windows
    win_expr = (
        f"transform(sequence(1, size(tokens) - {_SUBSTR_L - 1}), "
        f"i -> md5(concat_ws(' ', slice(tokens, i, {_SUBSTR_L}))))"
    )
    win = base.select("doc_id", F.explode(F.expr(win_expr)).alias("wh"))
    df_ = win.groupBy("wh").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    dup = F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
    return (
        win.join(df_, "wh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            dup.cast("long").alias("n_dup_windows"),
            rnd(dup * 1.0 / F.count(F.lit(1)), 4).alias("dup_frac"),
        )
    )



# ---------------------------------------------------------------------------
# D9 — exact-substring dedup REWRITE (the destructive half of d8): every
# token covered by an 8-token window that appears verbatim in more than
# one document is cut, and the document is reassembled from the surviving
# tokens (Lee et al. 2022's "deduplicating training data" applied at
# window granularity). Output carries md5(clean_text) so the oracle checks
# the reconstruction byte-for-byte without shipping full texts through the
# hash compare. Plan: window-hash explode → per-hash distinct-doc agg →
# dup-start join → covered-position explode (≤ L× the dup starts, never
# the corpus) → anti join on (doc_id, pos) → one sort-free per-doc rebuild
# via sort_array(collect_list(struct)). No self-join of the corpus at any
# stage — boilerplate shared by 10⁶ docs costs one row per occurrence.
# ---------------------------------------------------------------------------
@register(
    "d9_substring_rewrite",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {_DUCK_TOKENS} AS tokens FROM documents
    ), win AS (
      SELECT doc_id, u.i,
             md5(array_to_string(tokens[u.i:u.i+{_SUBSTR_L - 1}], ' ')) AS wh
      FROM tk, unnest(generate_series(1, len(tokens) - {_SUBSTR_L - 1})) AS u(i)
      WHERE len(tokens) >= {_SUBSTR_L}
    ), dupw AS (
      SELECT wh FROM win GROUP BY wh HAVING count(DISTINCT doc_id) > 1
    ), covered AS (
      SELECT DISTINCT w.doc_id, c.pos
      FROM win w JOIN dupw USING (wh),
           unnest(generate_series(w.i, w.i + {_SUBSTR_L - 1})) AS c(pos)
    ), toks AS (
      SELECT t.doc_id, u.pos, t.tokens[u.pos] AS token
      FROM tk t, unnest(generate_series(1, len(t.tokens))) AS u(pos)
    ), kept AS (
      SELECT k.doc_id,
             count(*) AS n_kept,
             md5(string_agg(k.token, ' ' ORDER BY k.pos)) AS clean_md5
      FROM toks k
      WHERE NOT EXISTS (SELECT 1 FROM covered c
                        WHERE c.doc_id = k.doc_id AND c.pos = k.pos)
      GROUP BY k.doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.tokens) AS BIGINT) AS n_tokens,
           CAST(len(t.tokens) - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed,
           floor(((len(t.tokens) - coalesce(k.n_kept, 0)) * 1.0 / len(t.tokens))
                 * 10000.0 + 0.5 + 1e-6) / 10000.0 AS removed_frac,
           coalesce(k.clean_md5, md5('')) AS clean_md5
    FROM tk t LEFT JOIN kept k USING (doc_id)
    """,
)
def d9_substring_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _docs_with_tokens(spark, sf_dir)
    win_expr = (
        f"transform(sequence(1, size(tokens) - {_SUBSTR_L - 1}), "
        f"i -> md5(concat_ws(' ', slice(tokens, i, {_SUBSTR_L}))))"
    )
    win = (
        base.filter(F.col("n_tokens") >= _SUBSTR_L)
        .select("doc_id", F.posexplode(F.expr(win_expr)).alias("p0", "wh"))
        .select("doc_id", (F.col("p0") + 1).alias("i"), "wh")
    )
    dupw = (
        win.groupBy("wh")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .select("wh")
    )
    covered = (
        win.join(dupw, "wh")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + F.lit(_SUBSTR_L - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    toks = base.select(
        "doc_id", F.posexplode("tokens").alias("p0", "token")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "token")
    kept = (
        toks.join(covered, ["doc_id", "pos"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("pos", "token"))
                        ),
                        lambda x: x["token"],
                    ),
                )
            ).alias("clean_md5"),
        )
    )
    n_removed = F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0))
    return (
        base.select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"))
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            n_removed.cast("long").alias("n_removed"),
            rnd(n_removed * 1.0 / F.col("n_tokens"), 4).alias("removed_frac"),
            F.coalesce(F.col("clean_md5"), F.md5(F.lit(""))).alias("clean_md5"),
        )
    )


