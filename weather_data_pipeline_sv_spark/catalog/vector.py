"""Similarity search over the `embeddings` table (array<float> columns).

Brute-force cosine top-k is the correctness baseline; the LSH/IVF scale
path lives in ``operators/similarity.py`` (bucketed candidate generation,
verified in pytest — random-projection planes are engine-specific so that
variant is not oracle-checked).

All vector math is JVM-side (`zip_with` + `aggregate` fold), Arrow-free and
UDF-free. Both engines fold the dot product left-to-right over doubles, so
results match bitwise; ordering uses floor((cos) * 1000000.0 + 0.5 + 1e-6) / 1000000.0 + id tiebreak so ranking
is stable under any remaining ULP noise.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.caching import loop_cache, stage_cache
from ..functions.partitioning import ensure_min_parallelism
from ..functions.rounding import rnd, rnd_sql
from ..operators import similarity as sim
from ..sources import load_tables
from . import register

_N_QUERIES = 10
_TOP_K = 5


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _as_double(c):
    return F.transform(c, lambda x: x.cast("double"))


def cosine(a, b):
    """Cosine similarity between two array<double> columns.

    Pair joins do NOT call this directly: they hoist the two
    ``sqrt(_dot(v, v))`` factors into per-row columns below the join
    (``sim.norm``) and compute ``_dot(a, b) / (nrm_a * nrm_b)`` — one
    interpreted fold per pair instead of three, bit-identical (same
    float ops in the same IEEE order; the t27 dense leg measured
    79 s -> 28 s at the 10x dir from the same rewrite)."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


# ---------------------------------------------------------------------------
# V1 — brute-force cosine top-k neighbors for the first N vectors.
# Physical plan: tiny query side broadcast → BNL join against the corpus,
# then per-query top-k via window (shuffle keyed on query_id).
# ---------------------------------------------------------------------------
@register(
    "v1_cosine_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    q AS (SELECT vec_id AS query_id, emb AS qemb FROM v WHERE vec_id < {_N_QUERIES}),
    pairs AS (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             list_dot_product(q.qemb, v.emb)
               / (sqrt(list_dot_product(q.qemb, q.qemb))
                  * sqrt(list_dot_product(v.emb, v.emb))) AS cos
      FROM q JOIN v ON v.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY floor((cos) * 1000000.0 + 0.5 + 1e-6) / 1000000.0 DESC, neighbor_id ASC) AS INTEGER) AS rank
      FROM pairs
    )
    SELECT query_id, neighbor_id, floor((cos) * 10000.0 + 0.5 + 1e-6) / 10000.0 AS cosine, rank
    FROM ranked WHERE rank <= {_TOP_K}
    """,
)
def v1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (
        ensure_min_parallelism(
            load_tables(spark, sf_dir, "embeddings")["embeddings"]
        )
        .select("vec_id", _as_double(F.col("embedding")).alias("emb"))
        # per-row norm hoisted below the pair join (see cosine())
        .withColumn("nrm", F.sqrt(_dot(F.col("emb"), F.col("emb"))))
    )
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("nrm").alias("qnrm"),
    )
    pairs = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (_dot(F.col("qemb"), F.col("emb"))
             / (F.col("qnrm") * F.col("nrm"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(rnd(F.col("cos"), 6)), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", rnd("cos", 4).alias("cosine"), "rank")
    )


# ---------------------------------------------------------------------------
# V2 — per-cluster embedding norm statistics.
# ---------------------------------------------------------------------------
@register(
    "v2_norm_stats",
    oracle="""
    WITH v AS (
      SELECT label, sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    )
    SELECT label, count(*) AS n_vectors,
           floor((avg(nrm)) * 10000.0 + 0.5 + 1e-6) / 10000.0 AS avg_norm,
           floor((min(nrm)) * 10000.0 + 0.5 + 1e-6) / 10000.0 AS min_norm,
           floor((max(nrm)) * 10000.0 + 0.5 + 1e-6) / 10000.0 AS max_norm
    FROM v GROUP BY label
    """,
)
def v2_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = ensure_min_parallelism(
        load_tables(spark, sf_dir, "embeddings")["embeddings"]
    ).select(
        "label", _as_double(F.col("embedding")).alias("emb")
    )
    nrm = F.sqrt(_dot(F.col("emb"), F.col("emb")))
    return (
        emb.withColumn("nrm", nrm)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            rnd(F.avg("nrm"), 4).alias("avg_norm"),
            rnd(F.min("nrm"), 4).alias("min_norm"),
            rnd(F.max("nrm"), 4).alias("max_norm"),
        )
    )


def _corpus_and_queries(spark: SparkSession, sf_dir: str):
    emb = ensure_min_parallelism(
        load_tables(spark, sf_dir, "embeddings")["embeddings"]
    ).select(
        "vec_id", _as_double(F.col("embedding")).alias("emb")
    )
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    return emb, q


# ---------------------------------------------------------------------------
# V3 — LSH ANN top-k: 32 md5-derived random hyperplanes, 8 bands × 4 sign
# bits → bucket equi-join candidates → exact cosine verify → top-5.
# The md5 plane matrix is engine-independent, so the DuckDB oracle rebuilds
# the *identical* buckets — the approximation itself is oracle-checked,
# not just the verify step. (Recall vs brute force ≈ 0.7 on this corpus;
# measured in tests/test_similarity_operators.py.)
# ---------------------------------------------------------------------------
_N_PLANES = 32
_BAND_SIZE = 4
_DIM = 64

_DUCK_PLANES = f"""
    planes AS (
      SELECT j.j, list_transform(generate_series(0, {_DIM - 1}),
        d -> CAST('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 8) AS BIGINT)
             / 4294967296.0 - 0.5) AS w
      FROM (SELECT unnest(generate_series(0, {_N_PLANES - 1})) AS j) j
    )
"""

_DUCK_COS = (
    "list_dot_product(qv.emb, cv.emb) / "
    "(sqrt(list_dot_product(qv.emb, qv.emb)) * sqrt(list_dot_product(cv.emb, cv.emb)))"
)

# v3's banding chain (signature bits → banded buckets → distinct candidate
# pairs for the first N_QUERIES queries) as shared oracle CTEs, so every
# LSH-candidate entry (v3 top-k, v15 hard negatives) analyzes exactly the
# same candidate set on the oracle side too
_DUCK_LSH_CAND = f"""bits AS (
      SELECT v.vec_id, p.j,
             CASE WHEN {rnd_sql('list_dot_product(v.emb, p.w)', 9)} >= 0
                  THEN '1' ELSE '0' END AS bit
      FROM v CROSS JOIN planes p
    ),
    sig AS (SELECT vec_id, string_agg(bit, '' ORDER BY j) AS s FROM bits GROUP BY vec_id),
    bands AS (
      SELECT vec_id, b.b AS band_id, substr(s, b.b * {_BAND_SIZE} + 1, {_BAND_SIZE}) AS band_key
      FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {_N_PLANES // _BAND_SIZE - 1})) AS b) b
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM bands q JOIN bands c ON q.band_id = c.band_id AND q.band_key = c.band_key
      WHERE q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id
    )"""


@register(
    "v3_ann_lsh",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    {_DUCK_PLANES},
    {_DUCK_LSH_CAND},
    pairs AS (
      SELECT cand.query_id, cand.neighbor_id, {_DUCK_COS} AS cos
      FROM cand
      JOIN v qv ON qv.vec_id = cand.query_id
      JOIN v cv ON cv.vec_id = cand.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY {rnd_sql('cos', 6)} DESC, neighbor_id ASC) AS INTEGER) AS rank
      FROM pairs
    )
    SELECT query_id, neighbor_id, {rnd_sql('cos', 4)} AS cosine, rank
    FROM ranked WHERE rank <= {_TOP_K}
    """,
)
def v3_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, q = _corpus_and_queries(spark, sf_dir)
    out = sim.lsh_ann_topk(
        emb, q, spark, k=_TOP_K,
        n_planes=_N_PLANES, band_size=_BAND_SIZE, dim=_DIM,
    )
    return out.withColumn("rank", F.col("rank").cast("int"))


# ---------------------------------------------------------------------------
# V15 — hard-negative mining for contrastive embedding training: for each
# query, the top-k highest-cosine candidates whose LABEL DIFFERS — the
# near-misses a contrastive loss learns the most from (in-batch randoms
# are too easy; exhaustive search is n²). Candidates come from the SAME
# v3 banding chain (shared _DUCK_LSH_CAND oracle CTEs), so this is the
# production shape: bucket join → label-mismatch prune → exact cosine →
# per-query top-k. No new shuffle class beyond v3 — the label filter
# runs before ranking, and the query side stays bounded at N_QUERIES.
# ---------------------------------------------------------------------------
@register(
    "v15_hard_negative_mining",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    {_DUCK_PLANES},
    {_DUCK_LSH_CAND},
    lab AS (SELECT vec_id, label FROM embeddings),
    pairs AS (
      SELECT cand.query_id, cand.neighbor_id, cl.label AS neg_label,
             {_DUCK_COS} AS cos
      FROM cand
      JOIN v qv ON qv.vec_id = cand.query_id
      JOIN v cv ON cv.vec_id = cand.neighbor_id
      JOIN lab ql ON ql.vec_id = cand.query_id
      JOIN lab cl ON cl.vec_id = cand.neighbor_id
      WHERE ql.label <> cl.label
    ),
    ranked AS (
      SELECT query_id, neighbor_id, neg_label, cos,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY {rnd_sql('cos', 6)} DESC, neighbor_id ASC) AS INTEGER) AS rank
      FROM pairs
    )
    SELECT query_id, neighbor_id, neg_label,
           {rnd_sql('cos', 4)} AS cosine, rank
    FROM ranked WHERE rank <= {_TOP_K}
    """,
)
def v15_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = ensure_min_parallelism(
        load_tables(spark, sf_dir, "embeddings")["embeddings"]
    ).select("vec_id", _as_double(F.col("embedding")).alias("emb"), "label")
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("label").alias("qlabel"),
    )
    out = sim.lsh_ann_topk(
        emb, q, spark, k=_TOP_K,
        n_planes=_N_PLANES, band_size=_BAND_SIZE, dim=_DIM,
        pair_filter=F.col("qlabel") != F.col("label"),
        carry_cols={"neg_label": "label"},
    )
    return out.withColumn("rank", F.col("rank").cast("int"))


# ---------------------------------------------------------------------------
# V4 — IVF ANN top-k: deterministic coarse quantizer (seeds = 16 lowest
# vec_ids, 2 Lloyd steps), probe the 4 nearest lists, exact cosine inside.
# Fully oracle-replayed, including both k-means iterations.
# ---------------------------------------------------------------------------
_N_LISTS = 16
_N_PROBE = 4

_D2 = "list_sum(list_transform(generate_series(1, {dim}), i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"


def _duck_assign(
    name: str,
    cent: str,
    table: str = "v",
    dim: int = _DIM,
    with_d: bool = False,
) -> str:
    """Lloyd assignment CTE — one generator for the full-dim chains
    (v4/v10/v12/pipe4) AND the PQ per-subspace chains (v13/v14), which
    differ only in the source view, the dimension constant, and whether
    the winning distance is carried out (PQ distortion)."""
    d2 = rnd_sql(_D2.format(dim=dim, a="v.emb", b="c.centroid"), 9)
    dcol = ", d" if with_d else ""
    return f"""
    {name} AS (
      SELECT vec_id, emb, list_id{dcol} FROM (
        SELECT v.vec_id, v.emb, c.list_id, {d2} AS d,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {d2} ASC, c.list_id ASC) AS rn
        FROM {table} v CROSS JOIN {cent} c
      ) WHERE rn = 1
    )"""


def _duck_recompute(
    name: str, assigned: str, prev: str, dims: str = "dims"
) -> str:
    return f"""
    {name}_m AS (
      SELECT list_id, list(m ORDER BY d) AS new_centroid FROM (
        SELECT a.list_id, {dims}.d, avg(a.emb[{dims}.d]) AS m
        FROM {assigned} a CROSS JOIN {dims} GROUP BY a.list_id, {dims}.d
      ) GROUP BY list_id
    ),
    {name} AS (
      SELECT p.list_id, coalesce(m.new_centroid, p.centroid) AS centroid
      FROM {prev} p LEFT JOIN {name}_m m ON p.list_id = m.list_id
    )"""


@register(
    "v4_ann_ivf",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    dims AS (SELECT unnest(generate_series(1, {_DIM})) AS d),
    c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS list_id,
             emb AS centroid
      FROM v ORDER BY vec_id LIMIT {_N_LISTS}
    ),
    {_duck_assign('a0', 'c0')},
    {_duck_recompute('c1', 'a0', 'c0')},
    {_duck_assign('a1', 'c1')},
    {_duck_recompute('c2', 'a1', 'c1')},
    {_duck_assign('assigned', 'c2')},
    probes AS (
      SELECT query_id, qemb, list_id FROM (
        SELECT v.vec_id AS query_id, v.emb AS qemb, c.list_id,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY {rnd_sql(_D2.format(dim=_DIM, a='v.emb', b='c.centroid'), 9)} ASC,
                          c.list_id ASC) AS rn
        FROM v CROSS JOIN c2 c WHERE v.vec_id < {_N_QUERIES}
      ) WHERE rn <= {_N_PROBE}
    ),
    pairs AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             list_dot_product(p.qemb, a.emb)
               / (sqrt(list_dot_product(p.qemb, p.qemb)) * sqrt(list_dot_product(a.emb, a.emb))) AS cos
      FROM probes p JOIN assigned a ON a.list_id = p.list_id AND a.vec_id <> p.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY {rnd_sql('cos', 6)} DESC, neighbor_id ASC) AS INTEGER) AS rank
      FROM pairs
    )
    SELECT query_id, neighbor_id, {rnd_sql('cos', 4)} AS cosine, rank
    FROM ranked WHERE rank <= {_TOP_K}
    """,
)
def v4_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, q = _corpus_and_queries(spark, sf_dir)
    out = sim.ivf_ann_topk(
        emb, q, k=_TOP_K, n_lists=_N_LISTS, n_probe=_N_PROBE, n_iter=2,
    )
    return out.withColumn("rank", F.col("rank").cast("int"))


# ---------------------------------------------------------------------------
# V5 — embedding-cosine near-duplicate pairs (exact; the LSH/IVF candidate
# generators above are the scale path for the same predicate).
# ---------------------------------------------------------------------------
_NEAR_DUP_COS = 0.45


@register(
    "v5_embedding_near_dup",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_dot_product(a.emb, b.emb)
               / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) AS cos
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, {rnd_sql('cos', 4)} AS cosine
    FROM p WHERE {rnd_sql('cos', 6)} >= {_NEAR_DUP_COS}
    """,
)
def v5_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, _ = _corpus_and_queries(spark, sf_dir)
    return sim.cosine_near_dup_pairs(emb, "vec_id", "emb", threshold=_NEAR_DUP_COS)


# ---------------------------------------------------------------------------
# V6 — blocked kNN-graph construction: EVERY vector gets its top-3
# neighbors, searched within its cluster block (label = the IVF-list
# stand-in). The kNN graph is the substrate of graph-based dedup,
# agglomerative clustering, and kNN-descent; unblocked it is O(n²) —
# blocking bounds pairs at Σ n_block², and the shuffle is one hash
# exchange on the block id followed by a per-vector window. The exact
# variant of the same shape is v1 (brute force); the recall/cost trade is
# the same one v4's IVF probe count tunes.
#
# Scale guard (round-3 fix, found by the 30× bench): label blocks GROW
# with the corpus (group-by attributes are fixed-cardinality), so pure
# label blocking is quadratic in disguise — 6k-vector blocks at 30× drove
# the g1 PageRank edge build to 380 s. Blocks larger than _BLOCK_CAP are
# sub-bucketed by vec_id % ceil(n_label/_BLOCK_CAP) — the same integer
# rule both engines evaluate, so the approximation itself stays
# oracle-checked. At the correctness scales (≤250-vector blocks) the
# bucket count is 1 and results are bit-identical to unbucketed blocking.
# ---------------------------------------------------------------------------
_KNN_K = 3
_BLOCK_CAP = 250

_DUCK_BLOCKED_V = f"""
    v AS (
      SELECT vec_id, label, emb,
             vec_id % CAST(greatest(1, ceil(nl / {_BLOCK_CAP}.0)) AS BIGINT)
               AS bkt
      FROM (
        SELECT vec_id, label, embedding::DOUBLE[] AS emb,
               count(*) OVER (PARTITION BY label) AS nl
        FROM embeddings
      )
    )
"""


def _blocked_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = ensure_min_parallelism(
        load_tables(spark, sf_dir, "embeddings")["embeddings"]
    ).select("vec_id", "label", _as_double(F.col("embedding")).alias("emb"))
    nl = emb.groupBy("label").agg(F.count(F.lit(1)).alias("__nl"))
    nb = F.greatest(
        F.lit(1).cast("long"), F.ceil(F.col("__nl") / F.lit(float(_BLOCK_CAP)))
    )
    return (
        emb.join(F.broadcast(nl), "label")
        .withColumn("bkt", (F.col("vec_id") % nb).cast("long"))
        .drop("__nl")
    )


@register(
    "v6_knn_graph",
    oracle=f"""
    WITH {_DUCK_BLOCKED_V},
    pairs AS (
      SELECT a.vec_id, b.vec_id AS neighbor_id,
             list_dot_product(a.emb, b.emb)
               / (sqrt(list_dot_product(a.emb, a.emb))
                  * sqrt(list_dot_product(b.emb, b.emb))) AS cos
      FROM v a JOIN v b
        ON a.label = b.label AND a.bkt = b.bkt AND a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT vec_id, neighbor_id, cos,
             CAST(row_number() OVER (
               PARTITION BY vec_id
               ORDER BY floor((cos) * 1000000.0 + 0.5 + 1e-6) / 1000000.0 DESC,
                        neighbor_id ASC) AS INTEGER) AS rank
      FROM pairs
    )
    SELECT vec_id, neighbor_id,
           floor((cos) * 10000.0 + 0.5 + 1e-6) / 10000.0 AS cosine, rank
    FROM ranked WHERE rank <= {_KNN_K}
    """,
)
def v6_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-row norms hoisted below the block self-join (see cosine())
    emb = _blocked_corpus(spark, sf_dir).withColumn(
        "nrm", F.sqrt(_dot(F.col("emb"), F.col("emb")))
    )
    other = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("n_label"),
        F.col("bkt").alias("n_bkt"),
        F.col("emb").alias("n_emb"),
        F.col("nrm").alias("n_nrm"),
    )
    pairs = emb.join(
        other,
        (F.col("label") == F.col("n_label"))
        & (F.col("bkt") == F.col("n_bkt"))
        & (F.col("vec_id") != F.col("neighbor_id")),
    ).select(
        "vec_id",
        "neighbor_id",
        (_dot(F.col("emb"), F.col("n_emb"))
         / (F.col("nrm") * F.col("n_nrm"))).alias("cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc(rnd(F.col("cos"), 6)), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _KNN_K)
        .select("vec_id", "neighbor_id", rnd("cos", 4).alias("cosine"), "rank")
    )


# ---------------------------------------------------------------------------
# V7 — int8 scalar quantization report: per-vector scale (max|x|/127),
# mean absolute reconstruction error, and cosine(original, dequantized).
# The storage/bandwidth lever for ANN at scale (int8 corpus ≈ 4× smaller
# than float32); q = floor(x/scale + 0.5) is spelled out because engines
# disagree on negative-half round(), and this formula is bit-portable.
# ---------------------------------------------------------------------------
@register(
    "v7_quantize_int8",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    s AS (
      SELECT vec_id, emb,
             greatest(list_max(list_transform(emb, x -> abs(x))) / 127.0, 1e-12) AS q_scale
      FROM v
    ),
    d AS (
      SELECT vec_id, emb, q_scale,
             list_transform(emb, x -> floor(x / q_scale + 0.5) * q_scale) AS deq
      FROM s
    )
    SELECT vec_id,
           {rnd_sql('q_scale', 6)} AS q_scale,
           {rnd_sql(f'list_sum(list_transform(generate_series(1, {_DIM}), i -> abs(emb[i] - deq[i]))) / {_DIM}', 6)} AS mae,
           {rnd_sql('list_dot_product(emb, deq) / (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product(deq, deq)))', 4)} AS cosine_deq
    FROM d
    """,
)
def v7_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = ensure_min_parallelism(
        load_tables(spark, sf_dir, "embeddings")["embeddings"]
    ).select("vec_id", _as_double(F.col("embedding")).alias("emb"))
    return sim.quantization_report(emb, "vec_id", "emb")


# ---------------------------------------------------------------------------
# V8 — near-dup pairs through LSH candidates: the SCALE PATH for v5's
# predicate. Candidates = id_a < id_b sharing >= 1 sign-LSH band (equi-join
# on (band_id, band_key) — selective keys, never the corpus square); exact
# cosine verify runs on candidates only. The md5 hyperplanes are
# engine-independent, so the oracle rebuilds the identical buckets — the
# approximation itself is oracle-checked, not just the verify arithmetic.
#
# SELF-SIZING bands: with a fixed 4-bit band, a 20k-vector corpus packs
# ~1250 vectors per bucket and the candidate join degenerates quadratic
# (measured: 196 s at the 10x bench dir vs ~5 s properly sized). Band
# width therefore grows with the corpus through an INTEGER breakpoint
# chain (target ~50 vectors/bucket, doubling per 2 bits) that both
# engines evaluate identically — no float log2 at a boundary. 8 bands
# always; only the width scales (suggest_lsh_params' rule, made
# executable and oracle-checked).
# ---------------------------------------------------------------------------
_V8_BANDS = 8
_V8_BREAKPOINTS = [(800, 4), (3200, 6), (12800, 8), (51200, 10), (204800, 12), (819200, 14)]
_V8_BS_MAX = 16


def _v8_band_size(n: int) -> int:
    for limit, bs in _V8_BREAKPOINTS:
        if n <= limit:
            return bs
    return _V8_BS_MAX


_V8_BS_SQL = (
    "CASE "
    + " ".join(
        f"WHEN n <= {limit} THEN {bs}" for limit, bs in _V8_BREAKPOINTS
    )
    + f" ELSE {_V8_BS_MAX} END"
)

_V8_PLANE_COMP = (
    "CAST('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 8) AS BIGINT)"
    " / 4294967296.0 - 0.5"
)


@register(
    "v8_near_dup_lsh",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    params AS (
      SELECT {_V8_BS_SQL} AS bs FROM (SELECT count(*) AS n FROM v)
    ),
    planes AS (
      SELECT j.j, list_transform(generate_series(0, {_DIM - 1}),
        d -> {_V8_PLANE_COMP}) AS w
      FROM params, unnest(generate_series(0, {_V8_BANDS} * params.bs - 1)) AS j(j)
    ),
    bits AS (
      SELECT v.vec_id, p.j,
             CASE WHEN {rnd_sql('list_dot_product(v.emb, p.w)', 9)} >= 0
                  THEN '1' ELSE '0' END AS bit
      FROM v CROSS JOIN planes p
    ),
    sig AS (SELECT vec_id, string_agg(bit, '' ORDER BY j) AS s FROM bits GROUP BY vec_id),
    bands AS (
      SELECT vec_id, b.b AS band_id, substr(s, b.b * params.bs + 1, params.bs) AS band_key
      FROM sig CROSS JOIN params,
           unnest(generate_series(0, {_V8_BANDS - 1})) AS b(b)
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.vec_id < b.vec_id
    ),
    p AS (
      SELECT c.id_a, c.id_b,
             list_dot_product(va.emb, vb.emb)
               / (sqrt(list_dot_product(va.emb, va.emb))
                  * sqrt(list_dot_product(vb.emb, vb.emb))) AS cos
      FROM cand c
      JOIN v va ON va.vec_id = c.id_a
      JOIN v vb ON vb.vec_id = c.id_b
    )
    SELECT id_a, id_b, {rnd_sql('cos', 4)} AS cosine
    FROM p WHERE {rnd_sql('cos', 6)} >= {_NEAR_DUP_COS}
    """,
)
def v8_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, _ = _corpus_and_queries(spark, sf_dir)
    bs = _v8_band_size(emb.count())
    return sim.cosine_near_dup_pairs_lsh(
        emb, spark, threshold=_NEAR_DUP_COS,
        n_planes=_V8_BANDS * bs, band_size=bs, dim=_DIM,
    )


# ---------------------------------------------------------------------------
# V9 — matryoshka truncation quality: rank the corpus by cosine on the
# FIRST 16 dims vs the full 64, and report per-query top-5 overlap. The
# standard eval for serving truncated (matryoshka) embeddings: truncation
# cuts ANN storage/bandwidth 4× IF the short prefix preserves ranking —
# this entry measures exactly that retention, oracle-checked. Plan shape:
# two broadcast-NL rankings over one corpus scan each, then a tiny
# per-query join+agg; at scale the truncated pass is the cheap
# first-stage filter and the full-dim pass reranks its survivors.
# ---------------------------------------------------------------------------
_TRUNC_DIM = 16


def _duck_rank(vec_expr: str, name: str) -> str:
    return f"""
    {name} AS (
      SELECT query_id, neighbor_id, rnk FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {rnd_sql(f'list_dot_product({vec_expr.format(t="q")}, {vec_expr.format(t="c")}) / (sqrt(list_dot_product({vec_expr.format(t="q")}, {vec_expr.format(t="q")})) * sqrt(list_dot_product({vec_expr.format(t="c")}, {vec_expr.format(t="c")})))', 6)} DESC,
                          c.vec_id ASC) AS rnk
        FROM v q JOIN v c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {_N_QUERIES}
      ) WHERE rnk <= {_TOP_K}
    )"""


@register(
    "v9_matryoshka_overlap",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    {_duck_rank('{t}.emb', 'full_rank')},
    {_duck_rank('{t}.emb[1:' + str(_TRUNC_DIM) + ']', 'trunc_rank')}
    SELECT f.query_id,
           CAST(count(t.neighbor_id) AS INTEGER) AS n_shared,
           {rnd_sql(f'count(t.neighbor_id) * 1.0 / {_TOP_K}', 4)} AS overlap_at_k
    FROM full_rank f
    LEFT JOIN trunc_rank t
      ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
    GROUP BY f.query_id
    """,
)
def v9_matryoshka_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, q = _corpus_and_queries(spark, sf_dir)

    def topk(qv, cv):
        # slice + per-row norm hoisted below the pair join (see
        # cosine()): the truncated variant also slices once per ROW
        # instead of once per pair
        qn = q.select("query_id", qv.alias("__qv")).withColumn(
            "__qn", F.sqrt(_dot(F.col("__qv"), F.col("__qv")))
        )
        cn = emb.select("vec_id", cv.alias("__cv")).withColumn(
            "__cn", F.sqrt(_dot(F.col("__cv"), F.col("__cv")))
        )
        pairs = (
            F.broadcast(qn)
            .join(cn, F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                (_dot(F.col("__qv"), F.col("__cv"))
                 / (F.col("__qn") * F.col("__cn"))).alias("cos"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc(rnd(F.col("cos"), 6)), F.asc("neighbor_id")
        )
        return (
            pairs.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= _TOP_K)
            .select("query_id", "neighbor_id")
        )

    full = topk(F.col("qemb"), F.col("emb"))
    trunc = topk(
        F.slice(F.col("qemb"), 1, _TRUNC_DIM), F.slice(F.col("emb"), 1, _TRUNC_DIM)
    ).select(
        F.col("query_id").alias("t_query"),
        F.col("neighbor_id").alias("t_neighbor"),
    )
    shared = F.count(F.col("t_neighbor"))
    return (
        full.join(
            trunc,
            (F.col("query_id") == F.col("t_query"))
            & (F.col("neighbor_id") == F.col("t_neighbor")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            shared.cast("int").alias("n_shared"),
            rnd(shared * 1.0 / _TOP_K, 4).alias("overlap_at_k"),
        )
    )


# ---------------------------------------------------------------------------
# V10 — semantic dedup (SemDeDup, Abbas et al. 2023): cluster the corpus
# with the SAME deterministic k-means as v4 (lowest-id seeds, 2 Lloyd
# steps), then inside each cluster drop every vector that has a
# lower-id cluster-mate with cosine ≥ τ. The cluster blocking is the
# whole point at scale: candidate pairs are Σ n_cluster², never n².
#
# Scale sizing (round-3 fix, found by the 30× bench): a FIXED cluster
# count is quadratic in disguise — 8 lists over 180k vectors meant 2e9
# within-cluster pairs (173 s at 30×). Cluster count now scales as
# ceil(n/250) (target block ≈ 250 → pairs ≈ 125·n, linear) and Lloyd
# trains on a deterministic id-stride sample whose TARGET SIZE scales
# with k — max(4000, 4k) — because the seeds are the sample's k lowest
# ids: a fixed 4000-row sample would silently cap the effective list
# count at 4000 once n exceeds ~1M, re-creating the quadratic
# within-block blow-up this sizing exists to prevent. Both knobs are
# integer functions of the corpus count that the DuckDB oracle evaluates
# identically, so the clustering REMAINS value-checked at every scale;
# at every tested scale point (n ≤ ~250k, where 4k ≤ 4000·…) the stride
# is unchanged and results are bit-identical to the fixed-sample form.
#
# Cost model at scale, stated honestly: the pair stage is linear
# (≈ 125·n candidate pairs), but the nearest-centroid assignment is a
# map-side n×k distance pass — with k = n/250 that term is n²/250 flops
# (distributed, no shuffle, but still the asymptotic bottleneck past
# ~10M vectors). The scale path beyond that is a two-level quantizer
# (coarse v4-style index → fine lists within each coarse cell), which
# drops assignment to n·2√k; this flat variant is the value-checked
# reference implementation of the semantics.
# ---------------------------------------------------------------------------
_SEM_TAU = sim.SEM_TAU
_SEM_BLOCK = 250
_SEM_TRAIN = 4000


def _greedy_drop(assigned: DataFrame, block_col: str, keep_cols: list[str]) -> DataFrame:
    """The SemDeDup greedy rule shared by v10 (flat blocks) and v12
    (hierarchical blocks): inside each ``block_col`` block, drop every
    vector with a lower-id block-mate at cosine ≥ τ. One definition so a
    τ or tie-break change cannot silently diverge the two variants.
    ``assigned`` must carry (vec_id, emb, block_col [, keep_cols…]);
    returns (vec_id, *keep_cols, kept). The dropped-id set is computed by
    ``similarity.semdedup_dropped_ids`` — a grouped numpy kernel with the
    same per-dimension IEEE fold order and 6-dp rounding as the block
    self-join + interpreted-fold form it replaced (bit-identical, pinned
    in tests/test_similarity_operators.py): one exchange on the block key
    instead of two plus sum(|block|^2) interpreted pair folds."""
    dropped = sim.semdedup_dropped_ids(
        assigned, block_col, tau=_SEM_TAU
    ).withColumn("__dropped", F.lit(True))
    return assigned.join(dropped, "vec_id", "left").select(
        "vec_id", *keep_cols, F.col("__dropped").isNull().alias("kept")
    )


def _dense_count(emb: DataFrame) -> int:
    """Corpus count for the semantic-dedup sizing, with the DENSE-ID
    precondition checked in the same single job: the ``vec_id % m``
    training stride only guarantees >= k sample rows when vec_id is
    dense 0..n-1 (round-3 ADVICE). Sparse ids would silently cap the
    effective list count and weaken the quadratic-blowup guard, so ids
    that aren't dense are a loud error here, not a quiet degradation.
    (All shipped corpora are dense: testdata generates sequential
    vec_id and tools/make_scaled_dir.py's disjoint-universe shift
    preserves density.)"""
    row = emb.agg(
        F.count("*").alias("n"),
        F.min("vec_id").alias("lo"),
        F.max("vec_id").alias("hi"),
        # duplicates would let {0,1,1,3} pass a min/max/count-only check
        F.countDistinct("vec_id").alias("nd"),
    ).first()
    n = int(row["n"])
    if n and (
        int(row["lo"]) != 0
        or int(row["hi"]) != n - 1
        or int(row["nd"]) != n
    ):
        raise ValueError(
            "semantic dedup requires dense UNIQUE vec_id 0..n-1 (got "
            f"min={row['lo']}, max={row['hi']}, distinct={row['nd']}, "
            f"n={n}); re-rank ids first"
        )
    return n


def _sem_params(n: int) -> tuple[int, int]:
    """(n_lists, train_stride) for a corpus of ``n`` vectors — the integer
    sizing both engines evaluate (mirrored in the oracle's ``prm`` CTE).
    Invariant: given dense ids 0..n-1 (checked by ``_dense_count``), the
    strided sample always holds at least ``k`` rows, so the k lowest-id
    seeds exist and the effective list count never saturates below the
    requested one (tests/test_scale_guards.py pins this)."""
    k = max(8, -(-n // _SEM_BLOCK))
    m = max(1, n // max(_SEM_TRAIN, 4 * k))
    return k, m


@register(
    "v10_semantic_dedup",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    dims AS (SELECT unnest(generate_series(1, {_DIM})) AS d),
    prm AS (
      SELECT CAST(greatest(8, ceil(count(*) / {_SEM_BLOCK}.0)) AS BIGINT) AS k,
             CAST(greatest(1, count(*) // greatest({_SEM_TRAIN},
                    4 * CAST(greatest(8, ceil(count(*) / {_SEM_BLOCK}.0))
                        AS BIGINT))) AS BIGINT) AS m
      FROM v
    ),
    vt AS (SELECT v.* FROM v CROSS JOIN prm WHERE v.vec_id % prm.m = 0),
    c0 AS (
      SELECT list_id, centroid FROM (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
                 AS list_id,
               emb AS centroid
        FROM vt
      ) x CROSS JOIN prm WHERE x.list_id < prm.k
    ),
    {_duck_assign('a0', 'c0', 'vt')},
    {_duck_recompute('c1', 'a0', 'c0')},
    {_duck_assign('a1', 'c1', 'vt')},
    {_duck_recompute('c2', 'a1', 'c1')},
    {_duck_assign('assigned', 'c2')},
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_dot_product(a.emb, b.emb)
               / (sqrt(list_dot_product(a.emb, a.emb))
                  * sqrt(list_dot_product(b.emb, b.emb))) AS cos
      FROM assigned a JOIN assigned b
        ON a.list_id = b.list_id AND a.vec_id < b.vec_id
    ),
    dropped AS (
      SELECT DISTINCT id_b AS vec_id FROM pairs
      WHERE {rnd_sql('cos', 6)} >= {_SEM_TAU}
    )
    SELECT s.vec_id, s.list_id, d.vec_id IS NULL AS kept
    FROM assigned s LEFT JOIN dropped d USING (vec_id)
    """,
)
def v10_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, _ = _corpus_and_queries(spark, sf_dir)
    # k and the training stride are integer functions of the corpus count
    # (mirrored in the oracle's `prm` CTE); the count is one columnar
    # scan, the same driver-side scalar the Lloyd trainer needs anyway —
    # and it validates the dense-id stride precondition in the same job
    n = _dense_count(emb)
    k, m = _sem_params(n)
    train = emb.filter(F.col("vec_id") % m == 0)
    cent = sim.ivf_centroids(train, n_lists=k, n_iter=2)
    # the assignment heads three consumers (both pair sides + the final
    # join): checkpoint so the nearest-centroid pass runs once, not 3×
    # (measured 146 → ~30 s at the 30× dir together with the
    # literal-path crossover fix in operators/similarity.py)
    assigned = stage_cache(sim.ivf_assign(emb, cent))
    return _greedy_drop(assigned, "list_id", ["list_id"])


# ---------------------------------------------------------------------------
# V12 — two-level semantic dedup: the >10M-vector scale path the flat v10
# sizing note defers to. Level 1 is the same Lloyd coarse quantizer with
# k1 = ceil(sqrt(ktot)) lists; level 2 picks, inside each coarse cell, the
# k2 = ceil(ktot/k1) lowest-id members as FINE SEEDS and maps every vector
# to its nearest seed (operators/similarity.fine_seed_assign — no second
# Lloyd, so the whole hierarchy stays deterministic and the oracle replays
# it with a window rank). Near-dup pairs are blocked on the fine seed id.
#
# Why this scales where flat v10 eventually can't: total effective lists
# are still ktot ≈ n/250 (block ≈ 250 → pairs ≈ 125·n), but the
# per-vector assignment work drops from ktot distances to k1 + k2 ≈
# 2·sqrt(ktot) — at n = 100M that is ~1.3k distances instead of 400k.
# Recall differs from flat v10 only where a vector's nearest fine seed
# sits across a coarse boundary (the standard IVF trade); τ and the
# greedy lower-id-wins rule are identical.
# ---------------------------------------------------------------------------
def _sem2_params(n: int) -> tuple[int, int, int]:
    """(k1, k2, train_stride): integer sizing both engines evaluate.
    k1·k2 ≥ ktot = max(8, ceil(n/250)); the coarse trainer's sample only
    needs ≥ k1 rows now (sqrt-sized), so the stride target is 4·k1.
    Same dense-id precondition as ``_sem_params`` (``_dense_count``)."""
    ktot = max(8, -(-n // _SEM_BLOCK))
    k1 = math.ceil(math.sqrt(ktot))
    k2 = -(-ktot // k1)
    m = max(1, n // max(_SEM_TRAIN, 4 * k1))
    return k1, k2, m


@register(
    "v12_semantic_dedup_2level",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    dims AS (SELECT unnest(generate_series(1, {_DIM})) AS d),
    prm0 AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(greatest(8, ceil(count(*) / {_SEM_BLOCK}.0)) AS BIGINT)
               AS ktot
      FROM v
    ),
    prm AS (
      SELECT n, ktot,
             CAST(ceil(sqrt(ktot)) AS BIGINT) AS k1,
             (ktot + CAST(ceil(sqrt(ktot)) AS BIGINT) - 1)
               // CAST(ceil(sqrt(ktot)) AS BIGINT) AS k2,
             greatest(1, n // greatest({_SEM_TRAIN},
                 4 * CAST(ceil(sqrt(ktot)) AS BIGINT))) AS m
      FROM prm0
    ),
    vt AS (SELECT v.* FROM v CROSS JOIN prm WHERE v.vec_id % prm.m = 0),
    c0 AS (
      SELECT list_id, centroid FROM (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
                 AS list_id,
               emb AS centroid
        FROM vt
      ) x CROSS JOIN prm WHERE x.list_id < prm.k1
    ),
    {_duck_assign('a0', 'c0', 'vt')},
    {_duck_recompute('c1', 'a0', 'c0')},
    {_duck_assign('a1', 'c1', 'vt')},
    {_duck_recompute('c2', 'a1', 'c1')},
    {_duck_assign('coarse', 'c2')},
    seeds AS (
      SELECT list_id AS coarse_id, vec_id AS fine_id, emb
      FROM (
        SELECT c.*, row_number() OVER (
                 PARTITION BY c.list_id ORDER BY c.vec_id) AS rn
        FROM coarse c
      ) x CROSS JOIN prm WHERE x.rn <= prm.k2
    ),
    fine AS (
      SELECT vec_id, coarse_id, fine_id FROM (
        SELECT c.vec_id, c.list_id AS coarse_id, s.fine_id,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY {rnd_sql(_D2.format(dim=_DIM, a='c.emb', b='s.emb'), 9)} ASC,
                          s.fine_id ASC) AS rn
        FROM coarse c JOIN seeds s ON s.coarse_id = c.list_id
      ) WHERE rn = 1
    ),
    p AS (
      SELECT f.vec_id, f.coarse_id, f.fine_id, v.emb
      FROM fine f JOIN v USING (vec_id)
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_dot_product(a.emb, b.emb)
               / (sqrt(list_dot_product(a.emb, a.emb))
                  * sqrt(list_dot_product(b.emb, b.emb))) AS cos
      FROM p a JOIN p b
        ON a.fine_id = b.fine_id AND a.vec_id < b.vec_id
    ),
    dropped AS (
      SELECT DISTINCT id_b AS vec_id FROM pairs
      WHERE {rnd_sql('cos', 6)} >= {_SEM_TAU}
    )
    SELECT p.vec_id, p.coarse_id, p.fine_id, d.vec_id IS NULL AS kept
    FROM p LEFT JOIN dropped d USING (vec_id)
    """,
)
def v12_semantic_dedup_2level(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, _ = _corpus_and_queries(spark, sf_dir)
    n = _dense_count(emb)
    k1, k2, m = _sem2_params(n)
    train = emb.filter(F.col("vec_id") % m == 0)
    cent = sim.ivf_centroids(train, n_lists=k1, n_iter=2)
    # coarse heads two consumers inside fine_seed_assign (the seed rank
    # and the assignment join) — checkpoint so the nearest-centroid pass
    # runs once; same again for fine, which heads three consumers
    # (both pair sides + the final join)
    coarse = stage_cache(
        sim.ivf_assign(emb, cent).withColumnRenamed("list_id", "coarse_id")
    )
    fine = stage_cache(
        sim.fine_seed_assign(coarse, k2, coarse_col="coarse_id")
    )
    return _greedy_drop(fine, "fine_id", ["coarse_id", "fine_id"])


# ---------------------------------------------------------------------------
# G1 — PageRank (3 unrolled iterations, d=0.85) over the v6 kNN graph:
# the canonical iterative-graph workload, exercised the way a Spark
# cluster actually runs it — edges checkpointed once, each iteration one
# equi-join + hash agg on the destination key, rank vector rebuilt against
# the full node set so zero-in-degree nodes keep the teleport mass. The
# oracle unrolls the same three iterations as CTEs, so every intermediate
# rank vector is value-checked, not just the fixed point. Per-node
# centrality over a kNN graph is the standard diversity/representativeness
# signal for corpus curation (cf. graph-based data pruning).
# ---------------------------------------------------------------------------
_PR_D = 0.85
_PR_ITERS = 3

# v6's kNN edge list as shared oracle CTEs (pairs -> ranked -> e), used by
# every graph entry (g1 PageRank, g2 triangles) so the graph being analyzed
# has exactly one definition on the oracle side too
_DUCK_KNN_EDGES = f"""pairs AS (
      SELECT a.vec_id, b.vec_id AS neighbor_id,
             list_dot_product(a.emb, b.emb)
               / (sqrt(list_dot_product(a.emb, a.emb))
                  * sqrt(list_dot_product(b.emb, b.emb))) AS cos
      FROM v a JOIN v b
        ON a.label = b.label AND a.bkt = b.bkt AND a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT vec_id, neighbor_id,
             CAST(row_number() OVER (
               PARTITION BY vec_id
               ORDER BY floor((cos) * 1000000.0 + 0.5 + 1e-6) / 1000000.0 DESC,
                        neighbor_id ASC) AS INTEGER) AS rank
      FROM pairs
    ),
    e AS (
      SELECT vec_id AS src, neighbor_id AS dst FROM ranked
      WHERE rank <= {_KNN_K}
    )"""


def _duck_pr_iter(name: str, prev: str) -> str:
    return f"""
    {name} AS (
      SELECT n.vec_id,
             (1 - {_PR_D}) / nn.n
               + {_PR_D} * coalesce(sum(p.r / od.od), 0) AS r
      FROM v n CROSS JOIN nn
      LEFT JOIN e ON e.dst = n.vec_id
      LEFT JOIN {prev} p ON p.vec_id = e.src
      LEFT JOIN od ON od.src = e.src
      GROUP BY n.vec_id, nn.n
    )"""


@register(
    "g1_pagerank",
    oracle=f"""
    WITH {_DUCK_BLOCKED_V},
    {_DUCK_KNN_EDGES},
    od AS (SELECT src, count(*) AS od FROM e GROUP BY src),
    nn AS (SELECT count(*) AS n FROM v),
    r0 AS (SELECT v.vec_id, 1.0 / nn.n AS r FROM v CROSS JOIN nn),
    {_duck_pr_iter('r1', 'r0')},
    {_duck_pr_iter('r2', 'r1')},
    {_duck_pr_iter('r3', 'r2')},
    deg AS (SELECT dst, count(*) AS in_deg FROM e GROUP BY dst)
    SELECT r3.vec_id,
           floor((r3.r) * 1000000000.0 + 0.5 + 1e-6) / 1000000000.0
             AS pagerank,
           CAST(coalesce(deg.in_deg, 0) AS BIGINT) AS in_deg
    FROM r3 LEFT JOIN deg ON deg.dst = r3.vec_id
    """,
)
def g1_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = (
        v6_knn_graph(spark, sf_dir)
        .select(F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst"))
    )
    # three iterations re-read the edge list; materialize the kNN search
    # once instead of running it per iteration
    edges = stage_cache(edges)
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    ew = edges.join(outdeg, "src")
    nodes = (
        ensure_min_parallelism(load_tables(spark, sf_dir, "embeddings")["embeddings"])
        .select("vec_id")
    )
    n_df = nodes.agg(F.count(F.lit(1)).alias("__n"))
    base = nodes.crossJoin(F.broadcast(n_df))
    ranks = base.select("vec_id", (F.lit(1.0) / F.col("__n")).alias("r"))
    for _ in range(_PR_ITERS):
        contrib = (
            ew.join(ranks.withColumnRenamed("vec_id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("od")).alias("__c"))
        )
        ranks = (
            base.join(contrib, base["vec_id"] == contrib["dst"], "left")
            .select(
                "vec_id",
                (
                    (1 - _PR_D) / F.col("__n")
                    + _PR_D * F.coalesce(F.col("__c"), F.lit(0.0))
                ).alias("r"),
            )
        )
    in_deg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("in_deg"))
    return (
        ranks.join(in_deg, ranks["vec_id"] == in_deg["dst"], "left")
        .select(
            "vec_id",
            rnd(F.col("r"), 9).alias("pagerank"),
            F.coalesce(F.col("in_deg"), F.lit(0)).cast("long").alias("in_deg"),
        )
    )


# ---------------------------------------------------------------------------
# G2 — triangle counting + local clustering coefficient over the v6 kNN
# graph (undirected: an edge exists when EITHER direction ranked top-k).
# The standard community-density signal for graph-based corpus curation,
# computed the distributed way: canonicalize each edge to (a<b), join
# wedges a-b-c (a<b<c) against the closing edge (a,c) — degree is bounded
# by 2k so the wedge join is O(n·k²), never quadratic in n. Per-node
# clustering coefficient 2T/(d(d-1)) is rounded identically on both sides.
# ---------------------------------------------------------------------------
@register(
    "g2_triangle_count",
    oracle=f"""
    WITH {_DUCK_BLOCKED_V},
    {_DUCK_KNN_EDGES},
    und AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e
    ),
    tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM und e1
      JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    corners AS (
      SELECT a AS vec_id FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    ),
    tc AS (SELECT vec_id, count(*) AS tri_count FROM corners GROUP BY vec_id),
    degu AS (
      SELECT vec_id, count(*) AS degree FROM (
        SELECT a AS vec_id FROM und UNION ALL SELECT b AS vec_id FROM und
      ) GROUP BY vec_id
    )
    SELECT v.vec_id,
           CAST(coalesce(degu.degree, 0) AS BIGINT) AS degree,
           CAST(coalesce(tc.tri_count, 0) AS BIGINT) AS tri_count,
           {rnd_sql(
               'CASE WHEN coalesce(degu.degree, 0) >= 2 '
               'THEN 2.0 * coalesce(tc.tri_count, 0) '
               '/ (degu.degree * (degu.degree - 1)) ELSE 0.0 END', 6)}
             AS clustering_coeff
    FROM v
    LEFT JOIN degu ON degu.vec_id = v.vec_id
    LEFT JOIN tc ON tc.vec_id = v.vec_id
    """,
)
def g2_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = v6_knn_graph(spark, sf_dir).select("vec_id", "neighbor_id")
    und = (
        edges.select(
            F.least("vec_id", "neighbor_id").alias("a"),
            F.greatest("vec_id", "neighbor_id").alias("b"),
        ).distinct()
    )
    # three self-join consumers (both wedge sides + the closing edge) —
    # materialize the kNN search once instead of three times
    und = stage_cache(und)
    wedge = (
        und.alias("e1")
        .join(und.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(
            F.col("e1.a").alias("a"),
            F.col("e1.b").alias("b"),
            F.col("e2.b").alias("c"),
        )
    )
    tri = wedge.alias("w").join(
        und.alias("e3"),
        (F.col("w.a") == F.col("e3.a")) & (F.col("w.c") == F.col("e3.b")),
    ).select(F.col("w.a").alias("a"), F.col("w.b").alias("b"), F.col("w.c").alias("c"))
    corners = (
        tri.select(F.col("a").alias("vec_id"))
        .unionAll(tri.select(F.col("b").alias("vec_id")))
        .unionAll(tri.select(F.col("c").alias("vec_id")))
    )
    tc = corners.groupBy("vec_id").agg(F.count(F.lit(1)).alias("tri_count"))
    degu = (
        und.select(F.col("a").alias("vec_id"))
        .unionAll(und.select(F.col("b").alias("vec_id")))
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    nodes = ensure_min_parallelism(
        load_tables(spark, sf_dir, "embeddings")["embeddings"]
    ).select("vec_id")
    deg = F.coalesce(F.col("degree"), F.lit(0))
    t = F.coalesce(F.col("tri_count"), F.lit(0))
    return (
        nodes.join(degu, "vec_id", "left")
        .join(tc, "vec_id", "left")
        .select(
            "vec_id",
            deg.cast("long").alias("degree"),
            t.cast("long").alias("tri_count"),
            rnd(
                F.when(
                    deg >= 2, F.lit(2.0) * t / (deg * (deg - 1))
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("clustering_coeff"),
        )
    )


# ---------------------------------------------------------------------------
# G3 — connected components over the v6 kNN graph (undirected closure):
# the cluster structure of the embedding corpus — the vector-side twin of
# d6's text-pair clustering, and the grouping SemDeDup-style pipelines
# sample from when near-dup CLUSTERS (not just drop decisions) are
# needed. Spark side is the same iterative min-label propagation
# operator d6 uses (operators/graph.py, edge list pinned per round);
# the oracle walks the identical graph with a RECURSIVE CTE.
# ---------------------------------------------------------------------------
@register(
    "g3_knn_components",
    oracle=f"""
    WITH RECURSIVE
    {_DUCK_BLOCKED_V.strip()},
    {_DUCK_KNN_EDGES},
    und AS (
      SELECT src AS s, dst AS t FROM e
      UNION SELECT dst, src FROM e
    ),
    walk(x, l) AS (
      SELECT vec_id, vec_id FROM v
      UNION
      SELECT e.t, w.l FROM walk w JOIN und e ON e.s = w.x
    )
    SELECT x AS vec_id, CAST(min(l) AS BIGINT) AS component
    FROM walk GROUP BY x
    """,
)
def g3_knn_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    edges = v6_knn_graph(spark, sf_dir).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    nodes = ensure_min_parallelism(
        load_tables(spark, sf_dir, "embeddings")["embeddings"]
    ).select("vec_id")
    return connected_components(
        nodes, edges, vertex_col="vec_id", src_col="src", dst_col="dst"
    ).select("vec_id", F.col("component").cast("long").alias("component"))


# ---------------------------------------------------------------------------
# V11 — ANN quality evaluation as a query: recall@5 of the v3 LSH index
# against the v1 brute-force ground truth, per query and summarized. The
# eval every ANN deployment runs before trading exactness for speed — and
# because BOTH rankings' chains are engine-independent (md5 planes,
# rounded tie-breaks), the recall numbers themselves are oracle-checked,
# not just eyeballed. Plan: the ground-truth side is a broadcast-NL top-k
# over N_QUERIES rows (bounded), the ANN side is the banded candidate
# join — the eval costs no more than running both retrievals once.
# ---------------------------------------------------------------------------
@register(
    "v11_ann_recall",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    {_DUCK_PLANES},
    bits AS (
      SELECT v.vec_id, p.j,
             CASE WHEN {rnd_sql('list_dot_product(v.emb, p.w)', 9)} >= 0
                  THEN '1' ELSE '0' END AS bit
      FROM v CROSS JOIN planes p
    ),
    sig AS (SELECT vec_id, string_agg(bit, '' ORDER BY j) AS s FROM bits GROUP BY vec_id),
    bands AS (
      SELECT vec_id, b.b AS band_id, substr(s, b.b * {_BAND_SIZE} + 1, {_BAND_SIZE}) AS band_key
      FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {_N_PLANES // _BAND_SIZE - 1})) AS b) b
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM bands q JOIN bands c ON q.band_id = c.band_id AND q.band_key = c.band_key
      WHERE q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id
    ),
    ann AS (
      SELECT query_id, neighbor_id FROM (
        SELECT cand.query_id, cand.neighbor_id,
               row_number() OVER (
                 PARTITION BY cand.query_id
                 ORDER BY {rnd_sql(_DUCK_COS, 6)} DESC, cand.neighbor_id ASC) AS rank
        FROM cand
        JOIN v qv ON qv.vec_id = cand.query_id
        JOIN v cv ON cv.vec_id = cand.neighbor_id
      ) WHERE rank <= {_TOP_K}
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {rnd_sql("list_dot_product(q.emb, c.emb) / (sqrt(list_dot_product(q.emb, q.emb)) * sqrt(list_dot_product(c.emb, c.emb)))", 6)} DESC,
                          c.vec_id ASC) AS rank
        FROM v q JOIN v c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {_N_QUERIES}
      ) WHERE rank <= {_TOP_K}
    )
    SELECT t.query_id,
           CAST(count(a.neighbor_id) AS INTEGER) AS n_hit,
           floor((count(a.neighbor_id) * 1.0 / {_TOP_K}) * 10000.0 + 0.5 + 1e-6) / 10000.0
             AS recall_at_k
    FROM truth t
    LEFT JOIN ann a ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
    GROUP BY t.query_id
    """,
)
def v11_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    truth = v1_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    ann = v3_ann_lsh(spark, sf_dir).select(
        F.col("query_id").alias("a_query"), F.col("neighbor_id").alias("a_neighbor")
    )
    hit = F.count(F.col("a_neighbor"))
    return (
        truth.join(
            ann,
            (F.col("query_id") == F.col("a_query"))
            & (F.col("neighbor_id") == F.col("a_neighbor")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            hit.cast("int").alias("n_hit"),
            rnd(hit * 1.0 / _TOP_K, 4).alias("recall_at_k"),
        )
    )


# ---------------------------------------------------------------------------
# PIPE4 — incremental semantic dedup: the daily-slice counterpart of v10
# (operators/incremental_vectors.py), the vector twin of pipe3. The coarse
# quantizer is trained ONCE on the first slice and FIXED; each subsequent
# slice is assigned map-side against those centroids and greedy-dropped
# against the accumulated store (store-vs-batch + within-batch pairs, the
# batch side broadcast so the store is never shuffled).
#
# The oracle deliberately computes the ONE-SHOT semantics — train on
# slice 1, assign ALL vectors, greedy-drop within lists over the full id
# order — so a hash match proves correctness AND the incremental ≡ batch
# equivalence in a single check (same proof shape as pipe3's batch-
# equality invariant: dropped(v) only quantifies over ids < v, which are
# all in the store when v's slice arrives).
# ---------------------------------------------------------------------------
@register(
    "pipe4_incremental_semantic_dedup",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    dims AS (SELECT unnest(generate_series(1, {_DIM})) AS d),
    prm0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
    prm1 AS (SELECT n, (n - 1) // 3 AS cut1 FROM prm0),
    prm AS (
      SELECT n, cut1,
             CAST(greatest(8, ceil((cut1 + 1) / {_SEM_BLOCK}.0)) AS BIGINT)
               AS k,
             CAST(greatest(1, (cut1 + 1) // greatest({_SEM_TRAIN},
                    4 * CAST(greatest(8, ceil((cut1 + 1) / {_SEM_BLOCK}.0))
                        AS BIGINT))) AS BIGINT) AS m
      FROM prm1
    ),
    vt AS (
      SELECT v.* FROM v CROSS JOIN prm
      WHERE v.vec_id <= prm.cut1 AND v.vec_id % prm.m = 0
    ),
    c0 AS (
      SELECT list_id, centroid FROM (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
                 AS list_id,
               emb AS centroid
        FROM vt
      ) x CROSS JOIN prm WHERE x.list_id < prm.k
    ),
    {_duck_assign('a0', 'c0', 'vt')},
    {_duck_recompute('c1', 'a0', 'c0')},
    {_duck_assign('a1', 'c1', 'vt')},
    {_duck_recompute('c2', 'a1', 'c1')},
    {_duck_assign('assigned', 'c2')},
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_dot_product(a.emb, b.emb)
               / (sqrt(list_dot_product(a.emb, a.emb))
                  * sqrt(list_dot_product(b.emb, b.emb))) AS cos
      FROM assigned a JOIN assigned b
        ON a.list_id = b.list_id AND a.vec_id < b.vec_id
    ),
    dropped AS (
      SELECT DISTINCT id_b AS vec_id FROM pairs
      WHERE {rnd_sql('cos', 6)} >= {_SEM_TAU}
    )
    SELECT s.vec_id, s.list_id, d.vec_id IS NULL AS kept
    FROM assigned s LEFT JOIN dropped d USING (vec_id)
    """,
)
def pipe4_incremental_semantic_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators import incremental_vectors as ivec

    emb, _ = _corpus_and_queries(spark, sf_dir)
    n = _dense_count(emb)
    cut1, cut2 = (n - 1) // 3, 2 * (n - 1) // 3
    # slice-1 count is cut1+1 exactly because ids are dense (checked)
    k, m = _sem_params(cut1 + 1)
    slices = [
        emb.filter(F.col("vec_id") <= cut1),
        emb.filter((F.col("vec_id") > cut1) & (F.col("vec_id") <= cut2)),
        emb.filter(F.col("vec_id") > cut2),
    ]
    train = slices[0].filter(F.col("vec_id") % m == 0)
    # trained once on slice 1, fixed for every later slice; collected once
    # (k x dim doubles) so the three assignment passes share the literal
    cent_rows = sim._centroid_rows(
        sim.ivf_centroids(train, n_lists=k, n_iter=2)
    )
    store: DataFrame | None = None
    for sl in slices:
        # slices here grow with the corpus (n/3 each), so the bounded-
        # daily-slice broadcast default does not apply
        delta = ivec.process_vector_batch(
            sl, cent_rows, store, broadcast_batch=False
        )
        # loop state: truncate per slice (same reasoning as pipe3's store).
        # EAGER: a lazy localCheckpoint here first materializes inside the
        # NEXT slice's join job, and the released prior-store handle then
        # races straggler tasks — measured 17 "non-existent accumulator"
        # DAGScheduler traces per run (0 with eager, same wall-clock).
        store = delta if store is None else loop_cache(
            store.unionByName(delta), eager=True
        )
    return store.select("vec_id", "list_id", "kept")


# ---------------------------------------------------------------------------
# PIPE5 — quantizer-aging migration (operators/incremental_vectors.py
# VectorStore.retrain): the incremental store is built exactly like pipe4
# (fixed slice-1 quantizer, three arriving slices greedy-deduped against
# persisted state — here through the REAL parquet VectorStore, exactly-
# once batch renames included), then the aged quantizer is replaced:
# re-train on the store's survivors (k2 sized from the SURVIVOR count,
# training stride from the dense full-corpus count — both mirrored in
# prm2/prm3), re-assign every stored vector (dropped ones included — the
# greedy rule needs them), re-run the one-shot SemDeDup drop inside the
# new lists, and atomically swap the rebuilt state in. The oracle replays
# the ENTIRE lifecycle — incremental build AND the post-migration
# one-shot — so the hash match proves retrain ≡ "batch job under the new
# quantizer", the pipe4 theorem extended across a re-quantization.
#
# Scale shape: the migration is one sampled Lloyd train + one
# assign/greedy pass over the store (the catalog-v10 batch job), paid
# only when list_occupancy drift triggers it; the store is written
# partitioned by the NEW list_id before a backup-rename swap, so a crash
# before the swap leaves the old store untouched and the swap window
# keeps the old state recoverable at vectors.replaced (migrations run
# out-of-band of probes).
# ---------------------------------------------------------------------------
@register(
    "pipe5_quantizer_retrain",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    dims AS (SELECT unnest(generate_series(1, {_DIM})) AS d),
    prm0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
    prm1 AS (SELECT n, (n - 1) // 3 AS cut1 FROM prm0),
    prm AS (
      SELECT n, cut1,
             CAST(greatest(8, ceil((cut1 + 1) / {_SEM_BLOCK}.0)) AS BIGINT)
               AS k,
             CAST(greatest(1, (cut1 + 1) // greatest({_SEM_TRAIN},
                    4 * CAST(greatest(8, ceil((cut1 + 1) / {_SEM_BLOCK}.0))
                        AS BIGINT))) AS BIGINT) AS m
      FROM prm1
    ),
    vt AS (
      SELECT v.* FROM v CROSS JOIN prm
      WHERE v.vec_id <= prm.cut1 AND v.vec_id % prm.m = 0
    ),
    c0 AS (
      SELECT list_id, centroid FROM (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
                 AS list_id,
               emb AS centroid
        FROM vt
      ) x CROSS JOIN prm WHERE x.list_id < prm.k
    ),
    {_duck_assign('a0', 'c0', 'vt')},
    {_duck_recompute('c1', 'a0', 'c0')},
    {_duck_assign('a1', 'c1', 'vt')},
    {_duck_recompute('c2', 'a1', 'c1')},
    {_duck_assign('assigned', 'c2')},
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_dot_product(a.emb, b.emb)
               / (sqrt(list_dot_product(a.emb, a.emb))
                  * sqrt(list_dot_product(b.emb, b.emb))) AS cos
      FROM assigned a JOIN assigned b
        ON a.list_id = b.list_id AND a.vec_id < b.vec_id
    ),
    dropped AS (
      SELECT DISTINCT id_b AS vec_id FROM pairs
      WHERE {rnd_sql('cos', 6)} >= {_SEM_TAU}
    ),
    surv AS (
      SELECT s.vec_id, s.emb FROM assigned s
      LEFT JOIN dropped d USING (vec_id) WHERE d.vec_id IS NULL
    ),
    prm2 AS (
      SELECT CAST(greatest(8, ceil(count(*) / {_SEM_BLOCK}.0)) AS BIGINT)
               AS k2
      FROM surv
    ),
    prm3 AS (
      SELECT CAST(greatest(1, prm0.n // greatest({_SEM_TRAIN},
                   4 * prm2.k2)) AS BIGINT) AS m2
      FROM prm0 CROSS JOIN prm2
    ),
    vt2 AS (
      SELECT surv.* FROM surv CROSS JOIN prm3
      WHERE surv.vec_id % prm3.m2 = 0
    ),
    c0b AS (
      SELECT list_id, centroid FROM (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
                 AS list_id,
               emb AS centroid
        FROM vt2
      ) x CROSS JOIN prm2 WHERE x.list_id < prm2.k2
    ),
    {_duck_assign('a0b', 'c0b', 'vt2')},
    {_duck_recompute('c1b', 'a0b', 'c0b')},
    {_duck_assign('a1b', 'c1b', 'vt2')},
    {_duck_recompute('c2b', 'a1b', 'c1b')},
    {_duck_assign('assigned2', 'c2b')},
    pairs2 AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_dot_product(a.emb, b.emb)
               / (sqrt(list_dot_product(a.emb, a.emb))
                  * sqrt(list_dot_product(b.emb, b.emb))) AS cos
      FROM assigned2 a JOIN assigned2 b
        ON a.list_id = b.list_id AND a.vec_id < b.vec_id
    ),
    dropped2 AS (
      SELECT DISTINCT id_b AS vec_id FROM pairs2
      WHERE {rnd_sql('cos', 6)} >= {_SEM_TAU}
    )
    SELECT s.vec_id, s.list_id, d.vec_id IS NULL AS kept
    FROM assigned2 s LEFT JOIN dropped2 d USING (vec_id)
    """,
)
def pipe5_quantizer_retrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.incremental_vectors import VectorStore

    emb, _ = _corpus_and_queries(spark, sf_dir)
    n = _dense_count(emb)
    cut1, cut2 = (n - 1) // 3, 2 * (n - 1) // 3
    k, m = _sem_params(cut1 + 1)
    root = tempfile.mkdtemp(prefix="wdp_pipe5_store_")
    try:
        vs = VectorStore(spark, root)
        vs.initialize(
            emb.filter((F.col("vec_id") <= cut1) & (F.col("vec_id") % m == 0)),
            n_lists=k, n_iter=2,
        )
        slices = [
            emb.filter(F.col("vec_id") <= cut1),
            emb.filter((F.col("vec_id") > cut1) & (F.col("vec_id") <= cut2)),
            emb.filter(F.col("vec_id") > cut2),
        ]
        for bid, sl in enumerate(slices):
            # slices grow with the corpus: no batch broadcast (j9 class)
            vs.process_and_append(sl, batch_id=bid, broadcast_batch=False)
        # retrain sizing: k2 from the SURVIVOR count (the aged-store
        # signal), stride from the dense full-corpus count so the
        # strided-sample-holds->=k invariant keeps its dense-id proof
        # (survivor ids are sparse; at tau=0.45 survival stays high, and
        # both engines take min(k2, sample) seeds if it ever thins)
        n_surv = vs.survivors().count()
        k2 = max(8, -(-n_surv // _SEM_BLOCK))
        m2 = max(1, n // max(_SEM_TRAIN, 4 * k2))
        vs.retrain(
            k2, train=vs.survivors().filter(F.col("vec_id") % m2 == 0)
        )
        # pin before the tempdir is deleted — the store plan reads it
        out = loop_cache(
            vs.vectors().select("vec_id", "list_id", "kept"), eager=True
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# V13/V14 — product quantization (Jégou et al. 2011, operators/similarity.py
# pq_*): M=8 contiguous subspaces × K=16 codewords, each codebook the same
# deterministic Lloyd as the IVF coarse quantizer (lowest-id seeds, 2
# steps) replayed per-subspace by the oracle, so codes, distortion, AND
# the ADC ranking are value-checked end-to-end. v13 is the encoder
# (64× compression: 8 code bytes replace 512 vector bytes); v14 is
# asymmetric-distance top-k over the CODES — the search path that never
# touches raw corpus vectors. K is a design constant (2^bits), so encode
# is a fixed M·K-distance map pass at any corpus size — no corpus-scaled
# knob, no quadratic-in-disguise.
# ---------------------------------------------------------------------------
_PQ_SUB = 8
_PQ_SUBDIM = _DIM // _PQ_SUB
_PQ_K = 16

def _duck_pq_assign(
    name: str, s: int, cent: str, with_d: bool = False, table: str | None = None
) -> str:
    return _duck_assign(
        name, cent, table=table or f"sv{s}", dim=_PQ_SUBDIM, with_d=with_d
    )


def _duck_pq_recompute(name: str, assigned: str, prev: str) -> str:
    return _duck_recompute(name, assigned, prev, dims="subdims")


def _duck_pq_prefix(
    train_src: str = "v", extra: list[str] | None = None,
    v_body: str = "SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings",
) -> str:
    """Shared WITH-body: per-subspace slice views + the 2-step Lloyd chain
    ending in codebook s{s}c2 and final assignment s{s}e (code + distance).
    ``train_src`` optionally points the TRAINING chain (seeds + both Lloyd
    steps) at a sampled view of v (v16's corpus-count-derived stride,
    defined via ``extra`` CTEs) while the final assignment s{s}e always
    covers the full corpus; the default trains on all of v — v13/v14's
    chains are byte-identical to the pre-parameter form. ``v_body``
    redefines what the corpus CTE ``v`` selects (t28 restricts it to
    the hybrid universe; the default is every embedding)."""
    parts = [
        f"v AS ({v_body})",
        f"subdims AS (SELECT unnest(generate_series(1, {_PQ_SUBDIM})) AS d)",
        *(extra or []),
    ]
    for s in range(_PQ_SUB):
        off = s * _PQ_SUBDIM
        parts.append(
            f"sv{s} AS (SELECT vec_id, emb[{off + 1}:{off + _PQ_SUBDIM}]"
            " AS emb FROM v)"
        )
        if train_src == "v":
            tt = f"sv{s}"
        else:
            tt = f"svt{s}"
            parts.append(
                f"svt{s} AS (SELECT vec_id, emb[{off + 1}:{off + _PQ_SUBDIM}]"
                f" AS emb FROM {train_src})"
            )
        parts.append(f"""s{s}c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
               AS list_id,
             emb AS centroid
      FROM {tt} ORDER BY vec_id LIMIT {_PQ_K}
    )""")
        parts.append(
            _duck_pq_assign(f"s{s}a0", s, f"s{s}c0", table=tt).strip()
        )
        parts.append(_duck_pq_recompute(f"s{s}c1", f"s{s}a0", f"s{s}c0").strip())
        parts.append(
            _duck_pq_assign(f"s{s}a1", s, f"s{s}c1", table=tt).strip()
        )
        parts.append(_duck_pq_recompute(f"s{s}c2", f"s{s}a1", f"s{s}c1").strip())
        parts.append(
            _duck_pq_assign(f"s{s}e", s, f"s{s}c2", with_d=True).strip()
        )
    return ",\n    ".join(parts)


_PQ_CODE_CONCAT = ", ".join(
    f"CAST(s{s}e.list_id AS VARCHAR)" for s in range(_PQ_SUB)
)
_PQ_ERR_SUM = " + ".join(f"s{s}e.d" for s in range(_PQ_SUB))
_PQ_ENC_JOINS = "\n    ".join(
    f"JOIN s{s}e ON s{s}e.vec_id = v.vec_id" for s in range(_PQ_SUB)
)


@register(
    "v13_pq_encode",
    oracle=f"""
    WITH {_duck_pq_prefix()}
    SELECT v.vec_id,
           concat_ws('-', {_PQ_CODE_CONCAT}) AS code,
           {rnd_sql(_PQ_ERR_SUM, 6)} AS recon_err
    FROM v
    {_PQ_ENC_JOINS}
    """,
)
def v13_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, _ = _corpus_and_queries(spark, sf_dir)
    books = sim.pq_train(emb, _PQ_SUB, _PQ_K, _PQ_SUBDIM, n_iter=2)
    enc = sim.pq_encode(emb, books, _PQ_SUBDIM)
    return enc.select(
        "vec_id",
        F.concat_ws(
            "-", *[F.col(f"code_{s}") for s in range(_PQ_SUB)]
        ).alias("code"),
        rnd(F.col("recon_err"), 6).alias("recon_err"),
    )


_PQ_DT_JOINS = "\n      ".join(
    f"JOIN s{s}e e{s} ON e{s}.vec_id = x.vec_id\n      "
    f"JOIN dt{s} ON dt{s}.query_id = q.query_id AND dt{s}.code = e{s}.list_id"
    for s in range(_PQ_SUB)
)
_PQ_ADC_SUM = " + ".join(f"dt{s}.d" for s in range(_PQ_SUB))


def _duck_pq_dts(query_pred: str | None = None) -> str:
    """Per-subspace query slices + ADC distance tables. ``query_pred``
    overrides the query-selection predicate over ``v`` (default: the
    v14/v16 convention ``vec_id < _N_QUERIES``; t28 passes the BM25
    query rule so both hybrid legs share one query set)."""
    pred = query_pred or f"vec_id < {_N_QUERIES}"
    parts = []
    for s in range(_PQ_SUB):
        off = s * _PQ_SUBDIM
        parts.append(
            f"""qs{s} AS (
      SELECT vec_id AS query_id, emb[{off + 1}:{off + _PQ_SUBDIM}] AS emb
      FROM v WHERE {pred}
    )"""
        )
        d2 = rnd_sql(
            _D2.format(dim=_PQ_SUBDIM, a="q.emb", b="c.centroid"), 9
        )
        parts.append(
            f"""dt{s} AS (
      SELECT q.query_id, c.list_id AS code, {d2} AS d
      FROM qs{s} q CROSS JOIN s{s}c2 c
    )"""
        )
    return ",\n    ".join(parts)


@register(
    "v14_pq_adc_topk",
    oracle=f"""
    WITH {_duck_pq_prefix()},
    {_duck_pq_dts()},
    pairs AS (
      SELECT q.query_id, x.vec_id AS neighbor_id, {_PQ_ADC_SUM} AS adc
      FROM (SELECT DISTINCT query_id FROM qs0) q
      CROSS JOIN v x
      {_PQ_DT_JOINS}
      WHERE x.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, adc,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY {rnd_sql('adc', 6)} ASC, neighbor_id ASC) AS INTEGER)
               AS rank
      FROM pairs
    )
    SELECT query_id, neighbor_id, {rnd_sql('adc', 4)} AS adc_dist, rank
    FROM ranked WHERE rank <= {_TOP_K}
    """,
)
def v14_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, q = _corpus_and_queries(spark, sf_dir)
    books = sim.pq_train(emb, _PQ_SUB, _PQ_K, _PQ_SUBDIM, n_iter=2)
    enc = sim.pq_encode(emb, books, _PQ_SUBDIM)
    out = sim.pq_adc_topk(enc, q, books, _PQ_SUBDIM, _TOP_K)
    return out.withColumn("rank", F.col("rank").cast("int"))


# ---------------------------------------------------------------------------
# V16 — IVFADC (IVF + PQ composed, operators/similarity.py ivfpq_topk):
# the production ANN serving shape (FAISS IVFPQ). A coarse quantizer
# routes codes into inverted lists; the PQ codebooks compress vectors
# 64×; a query probes its _N_PROBE nearest lists and ranks by asymmetric
# distance over CODES within the probed lists only — the broadcast hash
# join on list_id drops unprobed rows map-side, so the rank stage
# touches n_probe/n_lists of the codes where v14 ranks all of them. (The
# in-memory entry still encodes every vector once — that is v13's
# unavoidable pass; against a PERSISTED index the probed-list set is a
# planning-time partition filter and the code SCAN itself prunes —
# write_ivfpq_index/probe_ivfpq_index, pinned in tests/test_ivfpq.py.)
#
# Two deliberate differences from the v13/v14 chain, both the production
# norm and both oracle-replayed:
# 1. SAMPLED TRAINING: coarse + all 8 subspace codebooks train on a
#    corpus-count-derived stride (m = max(1, n // _V16_TRAIN), mirrored
#    in the prm CTE per the oracle-mirrored-sizing rule) — at 100 TB
#    nobody Lloyd-trains on the full corpus; quantizer quality needs
#    representative data, not all of it. v13/v14 keep the full-corpus
#    train as the oracle-strict exact form. The full corpus is still
#    touched exactly once: assign + encode fuse into one plan-literal
#    projection over one scan.
# 2. JOINT TRAINING: the coarse book is a 9th full-width _joint_lloyd
#    spec riding the same (sampled) scans as the subspaces —
#    bit-identical to training it alone, pinned in tests/test_ivfpq.py.
#
# n_lists is the small-k oracle constant here (matching v4); production
# sizes it sqrt-N via suggest_ivf_params, and ivf_assign's literal→
# broadcast crossover (IVF_LITERAL_MAX_LISTS) keeps the plan bounded
# there. Everything hash-checked: sampled chains, codes, routing, probe
# set, and the pruned ADC ranking.
# ---------------------------------------------------------------------------
_V16_TRAIN = 2048

_V16_DT_JOINS = "\n      ".join(
    f"JOIN s{s}e e{s} ON e{s}.vec_id = x.vec_id\n      "
    f"JOIN dt{s} ON dt{s}.query_id = p.query_id AND dt{s}.code = e{s}.list_id"
    for s in range(_PQ_SUB)
)

_V16_EXTRA = [
    f"""prm AS (
      SELECT greatest(1, CAST(count(*) AS BIGINT) // {_V16_TRAIN}) AS m
      FROM v
    )""",
    "vt AS (SELECT v.* FROM v CROSS JOIN prm WHERE v.vec_id % prm.m = 0)",
]


@register(
    "v16_ivfpq_topk",
    oracle=f"""
    WITH {_duck_pq_prefix(train_src="vt", extra=_V16_EXTRA)},
    dims AS (SELECT unnest(generate_series(1, {_DIM})) AS d),
    c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS list_id,
             emb AS centroid
      FROM vt ORDER BY vec_id LIMIT {_N_LISTS}
    ),
    {_duck_assign('a0', 'c0', table='vt')},
    {_duck_recompute('c1', 'a0', 'c0')},
    {_duck_assign('a1', 'c1', table='vt')},
    {_duck_recompute('c2', 'a1', 'c1')},
    {_duck_assign('assigned', 'c2')},
    probes AS (
      SELECT query_id, list_id FROM (
        SELECT v.vec_id AS query_id, c.list_id,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY {rnd_sql(_D2.format(dim=_DIM, a='v.emb', b='c.centroid'), 9)} ASC,
                          c.list_id ASC) AS rn
        FROM v CROSS JOIN c2 c WHERE v.vec_id < {_N_QUERIES}
      ) WHERE rn <= {_N_PROBE}
    ),
    {_duck_pq_dts()},
    pairs AS (
      SELECT p.query_id, x.vec_id AS neighbor_id, {_PQ_ADC_SUM} AS adc
      FROM probes p
      JOIN assigned x ON x.list_id = p.list_id AND x.vec_id <> p.query_id
      {_V16_DT_JOINS}
    ),
    ranked AS (
      SELECT query_id, neighbor_id, adc,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY {rnd_sql('adc', 6)} ASC, neighbor_id ASC) AS INTEGER)
               AS rank
      FROM pairs
    )
    SELECT query_id, neighbor_id, {rnd_sql('adc', 4)} AS adc_dist, rank
    FROM ranked WHERE rank <= {_TOP_K}
    """,
)
def v16_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, q = _corpus_and_queries(spark, sf_dir)
    m = max(1, _dense_count(emb) // _V16_TRAIN)
    train = emb.filter(F.col("vec_id") % m == 0)
    out = sim.ivfpq_topk(
        emb, q, k=_TOP_K,
        n_lists=_N_LISTS, n_probe=_N_PROBE,
        n_sub=_PQ_SUB, k_codes=_PQ_K, sub_dim=_PQ_SUBDIM, n_iter=2,
        train=train,
    )
    return out.withColumn("rank", F.col("rank").cast("int"))


# ---------------------------------------------------------------------------
# V17 — IVFADC retrieval quality (round-5 verdict #1): recall@k of v16's
# compressed, probe-pruned answer against the EXACT cosine top-k (v1).
# The v16 speedup (4–6.5× over exhaustive ADC at the scale dirs) is only
# half a result without the number this entry measures: what sampled
# training + 8-byte PQ codes + n_probe/n_lists pruning cost in retrieval
# quality. Same composition shape as v11 (flat-IVF recall); the oracle
# replays the ENTIRE v16 chain as CTEs, derives the exact truth, and
# aggregates hits — so the recall number itself is hash-checked, not
# just the rankings it is derived from. The recall-vs-n_probe curve at
# the 300k-vector dir is measured by tools/v17_recall_curve.py and
# recorded in SCALE.md next to the v16 speed numbers.
# ---------------------------------------------------------------------------
@register(
    "v17_ivfpq_recall",
    oracle=f"""
    WITH {_duck_pq_prefix(train_src="vt", extra=_V16_EXTRA)},
    dims AS (SELECT unnest(generate_series(1, {_DIM})) AS d),
    c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS list_id,
             emb AS centroid
      FROM vt ORDER BY vec_id LIMIT {_N_LISTS}
    ),
    {_duck_assign('a0', 'c0', table='vt')},
    {_duck_recompute('c1', 'a0', 'c0')},
    {_duck_assign('a1', 'c1', table='vt')},
    {_duck_recompute('c2', 'a1', 'c1')},
    {_duck_assign('assigned', 'c2')},
    probes AS (
      SELECT query_id, list_id FROM (
        SELECT v.vec_id AS query_id, c.list_id,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY {rnd_sql(_D2.format(dim=_DIM, a='v.emb', b='c.centroid'), 9)} ASC,
                          c.list_id ASC) AS rn
        FROM v CROSS JOIN c2 c WHERE v.vec_id < {_N_QUERIES}
      ) WHERE rn <= {_N_PROBE}
    ),
    {_duck_pq_dts()},
    pairs AS (
      SELECT p.query_id, x.vec_id AS neighbor_id, {_PQ_ADC_SUM} AS adc
      FROM probes p
      JOIN assigned x ON x.list_id = p.list_id AND x.vec_id <> p.query_id
      {_V16_DT_JOINS}
    ),
    ann AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY {rnd_sql('adc', 6)} ASC, neighbor_id ASC) AS rank
        FROM pairs
      ) WHERE rank <= {_TOP_K}
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {rnd_sql("list_dot_product(q.emb, c.emb) / (sqrt(list_dot_product(q.emb, q.emb)) * sqrt(list_dot_product(c.emb, c.emb)))", 6)} DESC,
                          c.vec_id ASC) AS rank
        FROM v q JOIN v c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {_N_QUERIES}
      ) WHERE rank <= {_TOP_K}
    )
    SELECT t.query_id,
           CAST(count(a.neighbor_id) AS INTEGER) AS n_hit,
           floor((count(a.neighbor_id) * 1.0 / {_TOP_K}) * 10000.0 + 0.5 + 1e-6) / 10000.0
             AS recall_at_k
    FROM truth t
    LEFT JOIN ann a ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
    GROUP BY t.query_id
    """,
)
def v17_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    truth = v1_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    ann = v16_ivfpq_topk(spark, sf_dir).select(
        F.col("query_id").alias("a_query"),
        F.col("neighbor_id").alias("a_neighbor"),
    )
    hit = F.count(F.col("a_neighbor"))
    return (
        truth.join(
            ann,
            (F.col("query_id") == F.col("a_query"))
            & (F.col("neighbor_id") == F.col("a_neighbor")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            hit.cast("int").alias("n_hit"),
            rnd(hit * 1.0 / _TOP_K, 4).alias("recall_at_k"),
        )
    )


# ---------------------------------------------------------------------------
# V18 — IVFPQ with exact re-ranking (the FAISS "refine" composition):
# ADC ranks a SHORTLIST of R = 20k candidates inside the probed lists
# (compressed reads only), then exactly re-ranks the shortlist by true
# cosine — R full vectors fetched per query instead of the corpus. This
# is the standard production answer when PQ code fidelity binds (the
# round-6 recall measurement: on the 300k dir code error, not routing,
# costs nearly all the recall — flat-IVF probe-1 scores 1.0 while ADC
# scores ≤0.12 at any n_probe; rerank recall == shortlist coverage,
# measured in RECALL_V17.json). Shuffle shape: v16's probe join + one
# broadcast-shortlist equi-join back to the corpus — per-query cost R,
# a constant, at any corpus size.
# ---------------------------------------------------------------------------
_RERANK_R = 20 * _TOP_K


@register(
    "v18_ivfpq_rerank",
    oracle=f"""
    WITH {_duck_pq_prefix(train_src="vt", extra=_V16_EXTRA)},
    dims AS (SELECT unnest(generate_series(1, {_DIM})) AS d),
    c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS list_id,
             emb AS centroid
      FROM vt ORDER BY vec_id LIMIT {_N_LISTS}
    ),
    {_duck_assign('a0', 'c0', table='vt')},
    {_duck_recompute('c1', 'a0', 'c0')},
    {_duck_assign('a1', 'c1', table='vt')},
    {_duck_recompute('c2', 'a1', 'c1')},
    {_duck_assign('assigned', 'c2')},
    probes AS (
      SELECT query_id, list_id FROM (
        SELECT v.vec_id AS query_id, c.list_id,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY {rnd_sql(_D2.format(dim=_DIM, a='v.emb', b='c.centroid'), 9)} ASC,
                          c.list_id ASC) AS rn
        FROM v CROSS JOIN c2 c WHERE v.vec_id < {_N_QUERIES}
      ) WHERE rn <= {_N_PROBE}
    ),
    {_duck_pq_dts()},
    adc_pairs AS (
      SELECT p.query_id, x.vec_id AS neighbor_id, {_PQ_ADC_SUM} AS adc
      FROM probes p
      JOIN assigned x ON x.list_id = p.list_id AND x.vec_id <> p.query_id
      {_V16_DT_JOINS}
    ),
    shortlist AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY {rnd_sql('adc', 6)} ASC, neighbor_id ASC) AS rank
        FROM adc_pairs
      ) WHERE rank <= {_RERANK_R}
    ),
    rer AS (
      SELECT s.query_id, s.neighbor_id,
             list_dot_product(q.emb, c.emb)
               / (sqrt(list_dot_product(q.emb, q.emb))
                  * sqrt(list_dot_product(c.emb, c.emb))) AS cos
      FROM shortlist s
      JOIN v q ON q.vec_id = s.query_id
      JOIN v c ON c.vec_id = s.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY {rnd_sql('cos', 6)} DESC, neighbor_id ASC)
               AS INTEGER) AS rank
      FROM rer
    )
    SELECT query_id, neighbor_id, {rnd_sql('cos', 4)} AS cosine, rank
    FROM ranked WHERE rank <= {_TOP_K}
    """,
)
def v18_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, q = _corpus_and_queries(spark, sf_dir)
    m = max(1, _dense_count(emb) // _V16_TRAIN)
    train = emb.filter(F.col("vec_id") % m == 0)
    shortlist = sim.ivfpq_topk(
        emb, q, k=_RERANK_R,
        n_lists=_N_LISTS, n_probe=_N_PROBE,
        n_sub=_PQ_SUB, k_codes=_PQ_K, sub_dim=_PQ_SUBDIM, n_iter=2,
        train=train,
    ).select("query_id", "neighbor_id")
    # exact re-rank: per-query cost is the CONSTANT R, never the corpus —
    # shortlist and queries broadcast, the corpus is probed by equi-join.
    # Per-row norms hoisted below the joins (see cosine()).
    rer = (
        F.broadcast(shortlist)
        .join(
            emb.withColumn("nrm", F.sqrt(_dot(F.col("emb"), F.col("emb")))),
            F.col("vec_id") == F.col("neighbor_id"),
        )
        .join(
            F.broadcast(
                q.withColumn(
                    "qnrm", F.sqrt(_dot(F.col("qemb"), F.col("qemb")))
                )
            ),
            "query_id",
        )
        .select(
            "query_id", "neighbor_id",
            (_dot(F.col("qemb"), F.col("emb"))
             / (F.col("qnrm") * F.col("nrm"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(rnd(F.col("cos"), 6)), F.asc("neighbor_id")
    )
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select(
            "query_id", "neighbor_id", rnd("cos", 4).alias("cosine"), "rank"
        )
    )


# ---------------------------------------------------------------------------
# V19 — positional mean pooling (chunk/sentence-embedding aggregation):
# average the vectors of each group elementwise — the standard pooling
# that turns chunk embeddings back into a document embedding (or label
# members into a class centroid, as here on the labeled corpus). Long
# (group, pos) form is the hash-checked contract;
# operators/chunking.py::mean_pool_vectors reassembles arrays when a
# vector column is needed downstream (unit-tested equivalence).
# Shuffle: ONE partial-agg exchange keyed on (group, pos) — key space
# |groups| x dim, bounded by design; map-side combine collapses each
# partition to one partial sum per key, so the exchange volume is
# independent of corpus size.
# ---------------------------------------------------------------------------
@register(
    "v19_mean_pool",
    oracle=f"""
    WITH dims AS (SELECT unnest(generate_series(1, {_DIM})) AS d)
    SELECT label, CAST(d - 1 AS INTEGER) AS pos,
           CAST(count(*) AS BIGINT) AS n_vecs,
           {rnd_sql('avg(CAST(embedding[d] AS DOUBLE))', 6)} AS pooled
    FROM embeddings CROSS JOIN dims
    GROUP BY label, d
    """,
)
def v19_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.chunking import mean_pool

    e = ensure_min_parallelism(
        load_tables(spark, sf_dir, "embeddings")["embeddings"]
    )
    out = mean_pool(e, "label", "embedding")
    return out.select(
        "label",
        F.col("pos").cast("int").alias("pos"),
        F.col("n_vecs").cast("long").alias("n_vecs"),
        rnd("pooled", 6).alias("pooled"),
    )
