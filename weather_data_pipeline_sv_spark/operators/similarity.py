"""Approximate-nearest-neighbor search over embedding columns.

Scale paths for the brute-force cosine baseline in ``catalog/vector.py``:

- **Random-hyperplane (sign) LSH**: 1-row broadcast plane matrix derived
  from md5 (engine-independent, so the DuckDB oracle reproduces the exact
  same buckets) → per-row signature via ``zip_with``/``aggregate`` folds
  (fully map-side, no shuffle) → banded bucket equi-join for candidates →
  exact cosine verify → per-query top-k.
- **IVF (inverted-file)**: deterministic coarse quantizer (seeds = lowest
  ids, fixed Lloyd iterations), corpus partitioned by nearest-centroid
  list, queries probe the ``n_probe`` nearest lists only.

At 100 TB the wins are structural: candidate generation is an equi-join on
(band_id, band_key) / list_id — a shuffle on selective keys instead of an
O(N·Q) cross join — and the verify step touches only the candidate rows.
All vector math is JVM-side (no UDFs): dot products are left-to-right
``aggregate`` folds over doubles, bitwise-reproducible by the oracle.

Cross-engine determinism: bucket boundaries (sign of a dot, argmin of a
distance) are decided on values rounded via ``functions.rounding.rnd`` so a
ULP of summation noise can't flip a bucket between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import rnd

_TWO32 = 4294967296.0


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def md5_hyperplanes(spark: SparkSession, n_planes: int, dim: int) -> DataFrame:
    """1-row DataFrame with ``planes: array<array<double>>`` (n_planes × dim).

    Component (j, d) = md5(j ':' d) first 8 hex digits / 2^32 - 0.5 —
    uniform in [-0.5, 0.5), identical in any engine with md5.
    """
    comp = (
        "cast(conv(substr(md5(concat(cast(j as string), ':', cast(d as string))), "
        f"1, 8), 16, 10) as bigint) / {_TWO32} - 0.5"
    )
    return spark.range(1).select(
        F.expr(
            f"transform(sequence(0, {n_planes - 1}), "
            f"j -> transform(sequence(0, {dim - 1}), d -> {comp}))"
        ).alias("planes")
    )


def lsh_buckets(
    df: DataFrame, id_col: str, vec_col: str,
    planes_df: DataFrame, band_size: int,
) -> DataFrame:
    """(id, band_id, band_key) — one row per band.

    The signature is computed map-side against the broadcast 1-row plane
    matrix; the only shuffle a consumer pays is its own join on
    (band_id, band_key). Sign decided on the dot rounded to 9 dp.
    """
    bits = F.transform(
        F.col("planes"),
        lambda w: F.when(rnd(dot(F.col(vec_col), w), 9) >= 0, F.lit("1")).otherwise(
            F.lit("0")
        ),
    )
    out = (
        df.crossJoin(F.broadcast(planes_df))
        .select(F.col(id_col), bits.alias("bits"))
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    # sequence over band starts: 1, 1+band_size, ...
                    F.sequence(
                        F.lit(1), F.size("bits") - (band_size - 1), F.lit(band_size)
                    ),
                    lambda start: F.array_join(F.slice("bits", start, band_size), ""),
                )
            ).alias("band_id", "band_key"),
        )
    )
    return out


def lsh_ann_topk(
    corpus: DataFrame, queries: DataFrame, spark: SparkSession,
    k: int = 5, n_planes: int = 32, band_size: int = 4, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "emb",
    query_id_col: str = "query_id", query_vec_col: str = "qemb",
) -> DataFrame:
    """Top-k by cosine among LSH-bucket candidates.

    Returns (query_id, neighbor_id, cosine, rank); a true neighbor sharing
    no band with the query is missed — that is the ANN tradeoff (recall
    measured in tests; ~0.7 @ 32 planes / 8×4 bands on the test corpus).
    """
    planes = md5_hyperplanes(spark, n_planes, dim)
    cb = lsh_buckets(corpus, id_col, vec_col, planes, band_size)
    qb = lsh_buckets(queries, query_id_col, query_vec_col, planes, band_size)
    cand = (
        qb.join(cb, ["band_id", "band_key"])
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(query_id_col, id_col)
        .distinct()
    )
    pairs = (
        cand.join(queries, query_id_col)
        .join(corpus, id_col)
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            cosine(F.col(query_vec_col), F.col(vec_col)).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc(rnd(F.col("cos"), 6)), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col, "neighbor_id", rnd("cos", 4).alias("cosine"), "rank"
        )
    )


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "emb",
    query_id_col: str = "query_id", query_vec_col: str = "qemb",
) -> DataFrame:
    """Exact cosine top-k (broadcast queries × corpus) — the recall oracle."""
    pairs = (
        F.broadcast(queries)
        .join(corpus, F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            cosine(F.col(query_vec_col), F.col(vec_col)).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc(rnd(F.col("cos"), 6)), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", rnd("cos", 4).alias("cosine"), "rank")
    )


def _sq_l2(a: Column, b: Column) -> Column:
    d = F.zip_with(a, b, lambda x, y: x - y)
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x * x)


def ivf_centroids(
    corpus: DataFrame, n_lists: int, n_iter: int = 2,
    id_col: str = "vec_id", vec_col: str = "emb",
) -> DataFrame:
    """Deterministic coarse quantizer: seeds = vectors of the ``n_lists``
    lowest ids, then ``n_iter`` Lloyd steps (empty lists keep their old
    centroid). Returns (list_id, centroid).

    Each iteration's result is MATERIALIZED to the driver and re-literalized
    (k×dim doubles — tiny, the standard Lloyd-loop shape, same as MLlib
    KMeans): without this, every downstream consumer would re-execute the
    whole iteration chain, and iteration i's plan would nest i full corpus
    scans. Values are bit-identical either way (doubles round-trip exactly).
    """
    spark = corpus.sparkSession

    def _literalize(df: DataFrame) -> DataFrame:
        # k×dim doubles round-trip the driver exactly (bit-identical), so
        # re-literalizing changes nothing numerically
        return spark.createDataFrame(
            [(r["list_id"], [float(x) for x in r["centroid"]]) for r in df.collect()],
            "list_id long, centroid array<double>",
        )

    # the loop scans the corpus once per iteration (plus once for seeds) and
    # every scan ends in a driver collect inside this function, so a persist
    # here is self-contained: materialized on the first action, released
    # before returning. Same pattern MLlib KMeans uses for its Lloyd loop.
    corpus = corpus.persist()
    w = Window.orderBy(id_col)
    cent = _literalize(
        corpus.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_lists)
        .select((F.col("__rn") - 1).alias("list_id"), F.col(vec_col).alias("centroid"))
    )
    for _ in range(n_iter):
        assigned = ivf_assign(corpus, cent, id_col=id_col, vec_col=vec_col)
        means = (
            assigned.select("list_id", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("list_id", "pos")
            .agg(F.avg("v").alias("m"))
            .groupBy("list_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("new_centroid")
            )
        )
        # materialize EVERY iteration: Catalyst has no common-subplan reuse
        # across joins, so a lazily-nested Lloyd chain re-executes iteration
        # i-1's full assign inside each place iteration i references it —
        # near-exponential recomputation in n_iter. A literal per round keeps
        # each iteration's plan one crossJoin + two aggregations deep (the
        # standard Lloyd-loop shape, same as MLlib KMeans).
        cent = _literalize(
            cent.join(means, "list_id", "left")
            .select(
                "list_id",
                F.coalesce("new_centroid", "centroid").alias("centroid"),
            )
        )
    corpus.unpersist()
    return cent


def ivf_assign(
    corpus: DataFrame, centroids: DataFrame,
    id_col: str = "vec_id", vec_col: str = "emb",
) -> DataFrame:
    """Nearest-centroid assignment: (id, vec, list_id). Ties break to the
    lower list_id on the distance rounded to 9 dp (engine-stable).

    argmin via ``min(struct(distance, list_id))`` — a hash aggregation that
    partial-aggregates map-side, so the shuffle carries one combined row
    per vector, NOT the k-replicated cross-join rows a window-rank argmin
    would move."""
    d = rnd(_sq_l2(F.col(vec_col), F.col("centroid")), 9)
    return (
        corpus.crossJoin(F.broadcast(centroids))
        .select(id_col, vec_col, F.struct(d.alias("d"), F.col("list_id").alias("list_id")).alias("__dl"))
        .groupBy(id_col)
        .agg(
            F.any_value(F.col(vec_col)).alias(vec_col),
            F.min("__dl").alias("__best"),
        )
        .select(id_col, vec_col, F.col("__best.list_id").alias("list_id"))
    )


def ivf_ann_topk(
    corpus: DataFrame, queries: DataFrame,
    k: int = 5, n_lists: int = 16, n_probe: int = 4, n_iter: int = 2,
    id_col: str = "vec_id", vec_col: str = "emb",
    query_id_col: str = "query_id", query_vec_col: str = "qemb",
) -> DataFrame:
    """IVF ANN: probe the n_probe nearest lists, exact cosine inside them.

    At scale the corpus is written partitioned by list_id, so a probe reads
    n_probe/n_lists of the data — the candidate join is an equi-join on
    list_id against a broadcast probe set.
    """
    cent = ivf_centroids(corpus, n_lists, n_iter, id_col=id_col, vec_col=vec_col)
    assigned = ivf_assign(corpus, cent, id_col=id_col, vec_col=vec_col)
    qd = rnd(_sq_l2(F.col(query_vec_col), F.col("centroid")), 9)
    wq = Window.partitionBy(query_id_col).orderBy(F.asc("__d"), F.asc("list_id"))
    probes = (
        queries.crossJoin(F.broadcast(cent))
        .select(query_id_col, query_vec_col, "list_id", qd.alias("__d"))
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= n_probe)
        .select(query_id_col, query_vec_col, "list_id")
    )
    pairs = (
        probes.join(assigned, "list_id")
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            cosine(F.col(query_vec_col), F.col(vec_col)).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc(rnd(F.col("cos"), 6)), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", rnd("cos", 4).alias("cosine"), "rank")
    )


def cosine_near_dup_pairs(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "emb",
    threshold: float = 0.9,
) -> DataFrame:
    """Exact embedding near-dup pairs: cosine >= threshold, id_a < id_b.

    Quadratic verify — the LSH/IVF candidate generators above are the scale
    path; this exact form is the correctness baseline and the oracle twin.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    c = cosine(F.col("va"), F.col("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", c)
        .filter(rnd(F.col("cos"), 6) >= threshold)
        .select("id_a", "id_b", rnd("cos", 4).alias("cosine"))
    )


def suggest_lsh_params(
    n_vectors: int, n_bands: int = 6, target_bucket: int = 50
) -> tuple[int, int]:
    """(n_planes, band_size) sized to the corpus.

    A band with b sign bits hashes into 2^b buckets: recall lives in the
    number of bands (OR-amplification), pruning lives in the band width.
    Width must grow with the corpus — measured at 50k vectors, the small-
    corpus default (32 planes / 4-bit bands = 16 buckets) degenerated to a
    near-full scan (91s, vs 4.7-6.9s with 16-bit bands; brute force 17s).
    Rule: 2^band_size ≈ n_vectors / target_bucket, floor 4 bits.
    """
    import math

    band_size = max(4, math.ceil(math.log2(max(n_vectors, 2) / target_bucket)))
    return n_bands * band_size, band_size


def suggest_ivf_params(n_vectors: int) -> tuple[int, int]:
    """(n_lists, n_probe): sqrt-N lists (the standard IVF rule), probing
    ~1/8 of them. Training (fixed Lloyd passes over the corpus) is paid
    once and amortized — persist the assignment table partitioned by
    list_id and per-query cost is the probe fraction of one scan."""
    import math

    n_lists = max(4, math.ceil(math.sqrt(max(n_vectors, 1))))
    return n_lists, max(4, n_lists // 8)
