"""Deduplication operators for large-scale text corpora.

First-class components of the engine (beyond the weather reference's own
surface): exact hash dedup, n-gram Jaccard, MinHash+LSH, SimHash. All are
pure DataFrame compositions — hashing via md5 (engine-independent, so the
DuckDB oracle in the catalog can replay MinHash exactly), bit math via
built-ins — no Python UDFs anywhere, so every stage stays in whole-stage
codegen.

Scale design:
- the shingle explode is map-side (no shuffle until the first groupBy)
- candidate generation shuffles on (band_id, band_key) / shingle — selective
  keys; a stop-shingle cap (``max_shingle_df``) bounds worst-case skew the
  same way stop-word removal does
- verification only runs on candidate pairs, never all O(n²) pairs
- min/vote aggregations partial-aggregate map-side, so the shuffles carry
  ~docs x n_hashes combined rows, not tokens x n_hashes

Benchmarked pitfalls (measured at sf0.1, see round-1 history — do NOT
"optimize" back into these):
- replacing the exploded minhash/simhash aggregations with higher-order-
  function folds (transform/aggregate/zip_with accumulators) was 20-100x
  SLOWER: HOF lambdas evaluate interpreted, outside whole-stage codegen
- materializing the shingle array through an extra named projection before
  exploding made Catalyst's projection collapsing inline the split() into
  the lambda body — re-tokenizing per shingle, O(tokens²) per doc. Keep the
  two-step shape in ``explode_shingles``: materialize ``__tok`` in one
  select, explode ``word_shingles(__tok)`` in the next.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.caching import stage_cache
from ..functions.partitioning import ensure_min_parallelism

TOKEN_PATTERN = r"\s+"


def tokens(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), TOKEN_PATTERN)


def word_shingles(tok: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a token array (1-based element_at)."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(tok) - (n - 1), F.lit(0))),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tok, i + j) for j in range(n)]
            ),
        )
    )


def explode_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(id, shingle) distinct pairs. ``max_shingle_df``: drop shingles that
    occur in more than this many docs (stop-shingles → join-skew guard)."""
    tok = tokens(F.col(text_col))
    sh = (
        ensure_min_parallelism(df)
        .select(F.col(id_col).alias("doc_id"), tok.alias("__tok"))
        .filter(F.size("__tok") >= n)
        .select("doc_id", F.explode(word_shingles(F.col("__tok"), n)).alias("shingle"))
    )
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
    return sh


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup by normalized-content hash; canonical = min id."""
    h = F.md5(F.trim(F.lower(F.col(text_col))))
    w = Window.partitionBy("content_hash")
    return (
        df.select(F.col(id_col).alias("doc_id"), h.alias("content_hash"))
        .withColumn("canonical_id", F.min("doc_id").over(w))
        .withColumn("is_canonical", F.col("doc_id") == F.col("canonical_id"))
    )


def _materialize(sh: DataFrame, enabled: bool) -> DataFrame:
    """Materialize the exploded shingle set (functions/caching mode).

    The shingle frame is consumed 3-4x downstream (signatures, counts, and
    both sides of the verification join); without materialization each
    consumer re-tokenizes and re-explodes the corpus. Measured at 66k docs:
    ~5x end-to-end speedup. Durability follows SPARK_GRAFT_CACHE_MODE (see
    functions/caching.py for the executor-loss trade). Callers running
    inside Structured Streaming must pass materialize=False (checkpointing
    a streaming DF is unsupported)."""
    return stage_cache(sh) if enabled else sh


#: Default stop-shingle cap for the shared-shingle self-join: a shingle
#: occurring in more than this many documents is dropped before the join.
#: The join is quadratic INSIDE each shingle bucket (df² pairs per
#: shingle), so one boilerplate sentence shared by 10^6 docs would emit
#: 10^12 pairs; capping df bounds the worst bucket at JACCARD_MAX_SHINGLE_DF²
#: regardless of corpus size — the same reasoning as stop-word removal,
#: and standard practice in suffix-array/shingle dedup pipelines. Pass
#: max_shingle_df=None to disable (exact all-shingle semantics).
JACCARD_MAX_SHINGLE_DF = 1000


def jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = JACCARD_MAX_SHINGLE_DF,
    materialize: bool = True,
) -> DataFrame:
    """All pairs with shingle-set Jaccard ≥ threshold (shared-shingle join →
    pair count → |A∪B| via per-doc counts).

    The default ``max_shingle_df`` cap makes the naive call safe on a large
    corpus: hot shingles (df > cap) are excluded from BOTH the join and the
    per-doc union counts, so the semantics are "Jaccard over non-stop
    shingles". Near-dup pairs are unaffected in practice — a shingle shared
    by >1000 documents carries no similarity signal — and the worst-case
    join fan-out drops from O(max_df²) to O(cap²) per shingle."""
    sh = _materialize(
        explode_shingles(df, id_col, text_col, n, max_shingle_df), materialize
    )
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return _attach_jaccard(inter, counts, threshold)


def _attach_jaccard(inter: DataFrame, counts: DataFrame, threshold: float) -> DataFrame:
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    # ``counts`` is one row per document — a post-shuffle aggregate whose
    # size AQE measures EXACTLY at runtime, so it broadcasts while small
    # and degrades to a shuffle join automatically when the corpus
    # outgrows the threshold. No manual hint: forcing shuffle_hash here
    # benched 1.7x SLOWER at the 30x dir (the broadcast is genuinely
    # right up to tens of millions of docs).
    return (
        inter.join(
            counts.select(
                F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")
            ),
            "doc_a",
        )
        .join(
            counts.select(
                F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")
            ),
            "doc_b",
        )
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


_MINHASH_MOD = 1 << 32


def minhash_signatures(
    sh: DataFrame, n_hashes: int = 16
) -> DataFrame:
    """Wide signature: one row per doc, columns ``s0..s{n-1}`` (bigint).

    Hash family is Kirsch-Mitzenmacher: ``h_i(s) = (h1 + i*h2) mod 2^32``
    with h1/h2 the two 32-bit halves of ONE md5 per shingle — statistically
    equivalent to n independent hashes for MinHash, and still
    engine-independent (md5 + integer arithmetic), so the DuckDB oracle
    replays signatures exactly.

    Why not md5 per (seed, shingle): the seed-exploded form computes
    n_hashes× the digests and shuffles docs × shingles × n_hashes rows —
    measured at 200k docs / 12M shingles it spilled and went superlinear
    (365 s vs 28 s at 66k). This form digests each shingle once and
    shuffles ONE combined row per doc (map-side min over each s_i), so
    signature cost scales with the shingle count alone.
    """
    d = F.md5(F.col("shingle"))
    base = sh.select(
        "doc_id",
        F.conv(F.substring(d, 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(d, 9, 8), 16, 10).cast("long").alias("h2"),
    )
    return base.groupBy("doc_id").agg(
        *[
            F.min((F.col("h1") + i * F.col("h2")) % _MINHASH_MOD).alias(f"s{i}")
            for i in range(n_hashes)
        ]
    )


def band_table(
    sig: DataFrame, n_hashes: int = 16, band_size: int = 4
) -> DataFrame:
    """(doc_id, band_id, band_key) from a wide minhash signature: each band
    is the md5 of its ``band_size`` signature slots joined with '|'. The
    single source of the banding used by both the batch LSH
    (:func:`minhash_lsh_pairs`) and the incremental store
    (``operators/incremental.py``) — the two MUST agree or incremental
    results drift from the batch rerun they are checked against."""
    band_keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"s{b * band_size + r}") for r in range(band_size)]
                )
            )
            for b in range(n_hashes // band_size)
        ]
    )
    return sig.select(
        "doc_id", F.posexplode(band_keys).alias("band_id", "band_key")
    )


def minhash_lsh_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3,
    n_hashes: int = 16, band_size: int = 4, threshold: float = 0.5,
    max_shingle_df: int | None = None, materialize: bool = True,
) -> DataFrame:
    """MinHash + banding candidates, verified with true shingle Jaccard."""
    sh = _materialize(
        explode_shingles(df, id_col, text_col, n, max_shingle_df), materialize
    )
    sig = minhash_signatures(sh, n_hashes)
    bands = band_table(sig, n_hashes, band_size)
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sh.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return _attach_jaccard(inter, counts, threshold)


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash as two 32-bit halves (hi, lo).

    Per token: md5 → two 32-bit words; per bit: vote +1/-1; sign of the vote
    sum sets the bit. Two longs avoid 64-bit-unsigned overflow and make
    Hamming distance a pair of bit_count(xor) calls — all built-ins.

    Shape: the per-bit votes are NOT exploded (the original form emitted
    tokens × 32 rows through two groupBys). Instead one groupBy(doc_id)
    carries 64 per-bit set-counts plus the token count — plain
    ``sum(shiftright(h, b) & 1)`` column aggregates that partial-aggregate
    map-side, so the shuffle moves ONE 65-column row per document and the
    explode stage disappears entirely (same wide-aggregation trick as
    ``minhash_signatures``; measured 6.1 s → ~2 s at sf0.1). The +1/-1
    vote sum is recovered exactly: sum(votes_b) > 0 ⟺ 2·cnt_b > n_tokens,
    so signatures are bit-identical to the exploded form.
    """
    ex = (
        ensure_min_parallelism(df)
        .select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("t"))
        .withColumn("h", F.md5(F.col("t")))
        .select(
            "doc_id",
            F.conv(F.substring("h", 1, 8), 16, 10).cast("long").alias("hi"),
            F.conv(F.substring("h", 9, 8), 16, 10).cast("long").alias("lo"),
        )
    )
    counts = ex.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"),
        *[
            F.sum(F.shiftright(F.col(half), b).bitwiseAND(1)).alias(f"c_{half}_{b}")
            for half in ("hi", "lo")
            for b in range(32)
        ],
    )

    def _pack(half: str) -> Column:
        sig = F.lit(0).cast("long")
        for b in range(32):
            sig = sig + F.when(
                2 * F.col(f"c_{half}_{b}") > F.col("n_tok"),
                F.lit(1 << b).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        return sig

    return counts.select(
        "doc_id", _pack("hi").alias("simhash_hi"), _pack("lo").alias("simhash_lo")
    )


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Candidates via 4 bands of 16 bits (pigeonhole: ≤3 differing bits ⇒ at
    least one of 4 bands identical), then exact Hamming verification.
    """
    s = _materialize(simhash(df, id_col, text_col), materialize)
    bands = s.select(
        "doc_id", "simhash_hi", "simhash_lo",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.shiftright(col, shift).bitwiseAND(0xFFFF).alias("band_key"),
                    )
                    for i, (col, shift) in enumerate(
                        [(F.col("simhash_hi"), 16), (F.col("simhash_hi"), 0),
                         (F.col("simhash_lo"), 16), (F.col("simhash_lo"), 0)]
                    )
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash_hi", "simhash_lo", "band.band_id", "band.band_key")
    hamming = (
        F.bit_count(F.col("a.simhash_hi").bitwiseXOR(F.col("b.simhash_hi")))
        + F.bit_count(F.col("a.simhash_lo").bitwiseXOR(F.col("b.simhash_lo")))
    )
    return (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def drop_near_duplicates(df: DataFrame, id_col: str, pairs: DataFrame) -> DataFrame:
    """Greedy dedup: for every near-dup pair keep the lower id, drop the
    higher (doc_b side). One anti join — no iterative connected components;
    transitive chains collapse because every non-minimal member appears as a
    doc_b in at least one pair."""
    losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def ngram_decontaminate(
    corpus: DataFrame, eval_df: DataFrame,
    id_col: str = "doc_id", text_col: str = "text", n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Benchmark decontamination: per-corpus-document n-gram overlap with a
    held-out eval set (the GPT-3/PaLM-style 13-gram check, here n-gram
    parameterized).

    Returns (doc_id, n_shingles, n_eval_hits, contamination, is_contaminated)
    for every corpus doc with >= n tokens, where ``contamination`` is the
    fraction of the doc's distinct shingles that also occur anywhere in the
    eval set.

    Scale shape: eval sets are small (10^3-10^5 docs) while the corpus is the
    100 TB side — so the eval side collapses to a DISTINCT shingle set and
    BROADCASTS, making the probe a map-side hash join against the exploded
    corpus; the only shuffle is the final per-doc aggregation, which
    partial-aggregates to one combined row per document. The corpus is never
    joined against itself and never shuffled on the shingle key.
    """
    corp_sh = explode_shingles(corpus, id_col, text_col, n)
    eval_sh = (
        explode_shingles(eval_df, id_col, text_col, n)
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    frac = F.col("n_eval_hits") / F.col("n_shingles")
    return (
        corp_sh.join(F.broadcast(eval_sh), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_shingles"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("int").alias("n_eval_hits"),
        )
        .select(
            "doc_id", "n_shingles", "n_eval_hits",
            frac.alias("contamination"),
            (frac >= threshold).alias("is_contaminated"),
        )
    )


def bloom_decontaminate(
    corpus: DataFrame, eval_df: DataFrame,
    id_col: str = "doc_id", text_col: str = "text", n: int = 3,
    threshold: float = 0.2, n_bits: int = 1 << 20, n_hashes: int = 2,
) -> DataFrame:
    """:func:`ngram_decontaminate` behind a Bloom-filter prefilter — the
    variant for eval sets whose DISTINCT shingle set is too large to
    broadcast whole. Output is ROW-IDENTICAL to the exact operator (the
    catalog entry shares d7's oracle): the Bloom filter has no false
    negatives, and its false positives are removed by the exact-confirm
    join, so the filter only ever changes WORK, never results.

    Spark 4 doesn't expose ``bloom_filter_agg``/``might_contain`` to SQL,
    so the filter is built from built-ins: each eval shingle sets
    ``n_hashes`` bits of an ``n_bits`` bitmap stored as an
    (``word_idx``, 64-bit word) table — ``xxhash64(shingle, seed)`` →
    bit index, ``bit_or`` aggregate per word. At the default 2^20 bits
    the whole bitmap is 16 K words ≤ 128 KB no matter how many shingles
    the eval set holds (vs. a broadcast of the shingle strings
    themselves, which grows without bound); probing is ``n_hashes``
    broadcast hash joins on the word index plus a mask test — map-side,
    zero shuffle of the corpus stream. Shingles that pass every bit test
    (true hits + ~(1-e^(-kn/m))^k false positives) continue into the
    exact confirm join, which at scale runs as a shuffle join over that
    small surviving stream; everything else short-circuits map-side.
    Size ``n_bits`` ≈ 10× the expected distinct-shingle count for a ~1%
    FP rate — an under-sized filter degrades speed, not correctness.

    Plan shape: TWO map-side passes over the corpus stream — a join-free
    per-doc shingle count, and the bloom probe whose survivors alone
    enter the exact-confirm inner join — then a doc-cardinality join of
    the two aggregates. A single-pass variant (exact-confirm as a LEFT
    join with ``passed`` in the condition) would shuffle EVERY corpus
    shingle on the shingle key to preserve the non-passing rows,
    defeating the prefilter; two cheap scans beat one full shuffle at
    corpus scale."""
    corp_sh = explode_shingles(corpus, id_col, text_col, n)
    eval_sh = stage_cache(
        explode_shingles(eval_df, id_col, text_col, n)
        .select("shingle")
        .distinct()
    )

    def _bit(h: int) -> tuple[Column, Column]:
        b = F.pmod(F.xxhash64(F.col("shingle"), F.lit(h)), F.lit(n_bits))
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(pmod(xxhash64(shingle, {h}), {n_bits}) % 64 AS INT))"
        )
        return F.shiftright(b, 6).cast("long"), mask

    words = None
    for h in range(n_hashes):
        widx, mask = _bit(h)
        wt = eval_sh.select(widx.alias("word_idx"), mask.alias("m"))
        words = wt if words is None else words.unionByName(wt)
    word_table = words.groupBy("word_idx").agg(
        F.expr("bit_or(m)").alias("word")
    )

    probe = corp_sh
    passed = F.lit(True)
    for h in range(n_hashes):
        widx, mask = _bit(h)
        probe = probe.withColumn(f"__w{h}", widx).withColumn(f"__m{h}", mask)
        wt = word_table.select(
            F.col("word_idx").alias(f"__wi{h}"),
            F.col("word").alias(f"__word{h}"),
        )
        probe = probe.join(
            F.broadcast(wt), F.col(f"__w{h}") == F.col(f"__wi{h}"), "left"
        )
        passed = passed & F.coalesce(
            F.col(f"__word{h}").bitwiseAND(F.col(f"__m{h}")) != 0,
            F.lit(False),
        )

    # branch 1: per-doc shingle count, no join anywhere near it
    per_doc = corp_sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_shingles")
    )
    # branch 2: only bloom survivors reach the exact-confirm inner join
    # (eval side is distinct, so each surviving occurrence matches <= 1 row)
    ev = eval_sh.select(F.col("shingle").alias("__esh"))
    hits = (
        probe.filter(passed)
        .join(ev, F.col("shingle") == F.col("__esh"), "inner")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_eval_hits"))
    )
    frac = F.col("n_eval_hits") / F.col("n_shingles")
    return (
        per_doc.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce(F.col("n_eval_hits"), F.lit(0)).cast("int")
            .alias("n_eval_hits"),
        )
        .select(
            "doc_id", "n_shingles", "n_eval_hits",
            frac.alias("contamination"),
            (frac >= threshold).alias("is_contaminated"),
        )
    )


def boilerplate_report(
    sh: DataFrame, dfq: DataFrame, tot: DataFrame, nd: DataFrame,
    min_df: int, frac: float,
) -> DataFrame:
    """The C4/RefinedWeb boilerplate rule's shared tail: threshold from
    (df, n_docs) stats — boilerplate = shingle df >= max(min_df,
    ceil(frac * n_docs)), corpus-relative at any scale — then a
    tiny-vocabulary semi-join back to the doc-shingle table and the
    per-doc ratio. ONE expression tree serves the batch entry (d11),
    the incremental entry (d12), and the streaming store
    (operators/boilerplate.py), so none can drift from the rule the
    others are hash-proven against."""
    from ..functions.rounding import rnd

    boiler = (
        dfq.crossJoin(F.broadcast(nd))
        .filter(
            F.col("df")
            >= F.greatest(
                F.lit(min_df).cast("double"),
                F.ceil(F.lit(frac) * F.col("n_docs")).cast("double"),
            )
        )
        .select("shingle")
    )
    nb = sh.join(boiler, "shingle").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_boiler")
    )
    return (
        tot.join(nb, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.coalesce(F.col("n_boiler"), F.lit(0))
            .cast("long").alias("n_boiler"),
            rnd(
                F.coalesce(F.col("n_boiler"), F.lit(0)) * 1.0
                / F.col("n_shingles"),
                6,
            ).alias("boiler_ratio"),
        )
    )
