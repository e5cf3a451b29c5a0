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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_tables
from ..functions.rounding import rnd
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
    """Cosine similarity between two array<double> columns."""
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
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"].select(
        "vec_id", _as_double(F.col("embedding")).alias("emb")
    )
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    pairs = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qemb"), F.col("emb")).alias("cos"),
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
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"].select(
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
