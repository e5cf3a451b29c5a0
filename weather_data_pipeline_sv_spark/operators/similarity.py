"""Approximate-nearest-neighbor search over embedding columns.

Scale paths for the brute-force cosine baseline in ``catalog/vector.py``:

- **Random-hyperplane (sign) LSH**: constant plane matrix derived from md5
  (engine-independent, so the DuckDB oracle reproduces the exact same
  buckets) inlined as flat literal multiply-add chains that whole-stage
  codegen compiles (fully map-side, no shuffle, no interpreted
  higher-order-function fold) → banded bucket equi-join for candidates →
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

from ..functions.partitioning import one_partition_df
from ..functions.rounding import rnd

_TWO32 = 4294967296.0

#: Above this many IVF lists the centroid table is shipped as a broadcast
#: relation instead of a plan literal. The literal form (`_cent_literal`)
#: embeds k x dim doubles into the Catalyst plan — unbeatable at k<=16
#: (no join at all), but at sqrt-N lists (31k lists x 64 dims at 10^9
#: vectors ~= 2M literal expressions) plan construction and serialization
#: blow up long before execution. The broadcast form keeps the identical
#: argmin/array_sort expressions; only the centroid *data* moves out of
#: the plan into a 1-row broadcast build side.
#:
#: Crossover measured (round 3, 60k vectors / 240 lists / 64 dims, 30×
#: dir): the literal path cost 22 s train + 14 s assign against 3.8 + 7.8
#: for the broadcast path — whole-stage codegen compiles the k × dim
#: constant into the generated class, and janino compile time grows
#: super-linearly in plan size well before the 500-list serialization
#: cliff. 64 keeps the no-join literal win for the common small-k probes
#: (v4 trains at 16) and hands everything bigger to the broadcast form;
#: both paths are pinned bit-identical in tests/test_scale_guards.py.
IVF_LITERAL_MAX_LISTS = 64

#: SemDeDup cosine threshold — the ONE definition shared by the batch
#: entries (catalog v10/v12, as ``_SEM_TAU``) and the incremental path
#: (``incremental_vectors.TAU``), so a tuning edit can't drift the
#: implementations apart from each other or from the oracles.
SEM_TAU = 0.45

#: The driver-side Lloyd fast path refuses to collect a training set above
#: this many rows — driver-side training is for bounded SAMPLES (the
#: production norm: v16's stride sampling); anything bigger either gets
#: sampled first or runs the distributed loop. Shared by every trainer
#: (``ivf_centroids`` / ``pq_train`` / ``ivfpq_train`` / ``ivf_ann_topk``
#: / ``write_ivf_index`` via ``driver_train_max_rows`` and
#: ``ivfpq_train_np`` via ``max_rows``); 0 disables the fast path.
IVFPQ_DRIVER_TRAIN_MAX_ROWS = 200_000


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def norm(vec: Column) -> Column:
    """sqrt(dot(v, v)) — the per-ROW factor of the pair cosine.

    Every pair join in the family hoists this out of the per-pair
    expression: ``cosine(a, b)`` evaluates THREE interpreted HOF folds
    per pair (dot + both norms — higher-order functions are
    CodegenFallback), while ``dot(a, b) / (norm_a * norm_b)`` with the
    norms computed in a projection BELOW the join evaluates one fold per
    pair and one per row. Same float ops in the same IEEE order —
    sqrt(dot(v, v)) has identical bits wherever it is computed — so
    results are bit-identical to the unhoisted form (the t27 dense leg
    measured 79 s -> 28 s at the 10x dir from exactly this rewrite)."""
    return F.sqrt(dot(vec, vec))


def hyperplane_values(n_planes: int, dim: int) -> list[list[float]]:
    """The md5 hyperplane matrix as exact Python doubles (n_planes × dim).

    Component (j, d) = md5(j ':' d) first 8 hex digits / 2^32 - 0.5 —
    uniform in [-0.5, 0.5), identical in any engine with md5: the value is
    (k - 2^31) / 2^32 for a 32-bit integer k, a dyadic rational that every
    IEEE-754 double implementation represents exactly. Computing it here
    (instead of in a Spark expression) matters for parity: Spark SQL parses
    ``/ 4294967296.0`` as DECIMAL division and truncates the plane to 12
    decimal places, while the DuckDB oracle divides as double — doubles on
    both sides make the bucket structure bit-identical across engines.
    """
    import hashlib

    return [
        [
            int(hashlib.md5(f"{j}:{d}".encode()).hexdigest()[:8], 16) / _TWO32 - 0.5
            for d in range(dim)
        ]
        for j in range(n_planes)
    ]


def md5_hyperplanes(spark: SparkSession, n_planes: int, dim: int) -> DataFrame:
    """1-row DataFrame with ``planes: array<array<double>>`` (n_planes × dim).

    Kept as the DataFrame view of :func:`hyperplane_values` for callers that
    want the matrix as data (tests, notebooks); the operators below inline
    the values as plan literals instead.
    """
    return one_partition_df(
        spark,
        [(hyperplane_values(n_planes, dim),)], "planes: array<array<double>>",
    )


def lsh_buckets(
    df: DataFrame, id_col: str, vec_col: str,
    planes: DataFrame | list[list[float]], band_size: int,
) -> DataFrame:
    """(id, band_id, band_key) — one row per band.

    The signature (sign of each plane dot) is computed by an Arrow-batched
    numpy kernel in ``mapInPandas`` — the one dense-linear-algebra hot spot
    in this repo where Spark's built-ins genuinely can't compete: the
    ``transform``/``aggregate`` fold is interpreted by Catalyst (boxed
    doubles, per-element lambda dispatch; measured ~10 ms/row at 48×64 with
    GC-driven variance), and inlining the constant planes as flat literal
    multiply-add chains makes Janino compilation of the generated stage the
    bottleneck instead (~minutes at ~6k expression nodes). The numpy kernel
    accumulates dim-by-dim (``acc += e[:, d] * w[:, d]``) so every dot is
    the same left-to-right IEEE-754 sum from 0.0 as the old fold and the
    oracle's ``list_dot_product`` — bucket structure stays bit-identical
    across engines. Fully map-side (partition-preserving, no shuffle); the
    only shuffle a consumer pays is its own join on (band_id, band_key).
    Sign decided on the dot rounded to 9 dp.
    """
    import numpy as np
    import pandas as pd

    if isinstance(planes, DataFrame):
        vals = [
            [float(x) for x in row] for row in planes.collect()[0]["planes"]
        ]
    else:
        vals = planes
    w = np.asarray(vals, dtype=np.float64)  # (n_planes, dim)
    n_planes, dim = w.shape
    n_bands = n_planes // band_size

    id_field = df.schema[id_col]
    out_schema = f"`{id_col}` {id_field.dataType.simpleString()}, sig string"

    def signatures(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            e = np.vstack(pdf[vec_col].to_numpy())  # (n, dim)
            acc = np.zeros((len(pdf), n_planes), dtype=np.float64)
            for d in range(dim):
                # exact left-to-right fold order, vectorized across rows
                acc += e[:, d : d + 1] * w[:, d]
            r9 = np.floor(acc * 1e9 + 0.5 + 1e-6) / 1e9
            bits = np.where(r9 >= 0, "1", "0")
            sigs = ["".join(row) for row in bits]
            yield pd.DataFrame({id_col: pdf[id_col], "sig": sigs})

    sig_df = df.select(id_col, vec_col).mapInPandas(signatures, out_schema)
    band_keys = F.array(
        *[
            F.substring("sig", b * band_size + 1, band_size)
            for b in range(n_bands)
        ]
    )
    return sig_df.select(
        id_col, F.posexplode(band_keys).alias("band_id", "band_key")
    )


def lsh_ann_topk(
    corpus: DataFrame, queries: DataFrame, spark: SparkSession,
    k: int = 5, n_planes: int = 32, band_size: int = 4, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "emb",
    query_id_col: str = "query_id", query_vec_col: str = "qemb",
    pair_filter: Column | None = None,
    carry_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Top-k by cosine among LSH-bucket candidates.

    Returns (query_id, neighbor_id, [carry...], cosine, rank); a true
    neighbor sharing no band with the query is missed — that is the ANN
    tradeoff (recall measured in tests; ~0.7 @ 32 planes / 8×4 bands on
    the test corpus).

    ``pair_filter`` is an optional predicate over the joined
    (query × corpus) pair frame applied BEFORE ranking — e.g. a
    label-mismatch condition turns top-k retrieval into hard-negative
    mining (catalog v15) without duplicating the banding/ranking chain.
    ``carry_cols`` maps output name → corpus column to carry through
    (e.g. {"neg_label": "label"}).
    """
    planes = hyperplane_values(n_planes, dim)
    cb = lsh_buckets(
        corpus.select(id_col, vec_col), id_col, vec_col, planes, band_size
    )
    qb = lsh_buckets(
        queries.select(query_id_col, query_vec_col),
        query_id_col, query_vec_col, planes, band_size,
    )
    cand = (
        qb.join(cb, ["band_id", "band_key"])
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(query_id_col, id_col)
        .distinct()
    )
    carry = carry_cols or {}
    # per-row norms hoisted below the candidate join: one fold per pair
    # (the cross dot) instead of three, bit-identical (see norm())
    qn = queries.withColumn("__qnrm", norm(F.col(query_vec_col)))
    cn = corpus.withColumn("__cnrm", norm(F.col(vec_col)))
    pairs = cand.join(qn, query_id_col).join(cn, id_col)
    if pair_filter is not None:
        pairs = pairs.filter(pair_filter)
    pairs = pairs.select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        *[F.col(src).alias(dst) for dst, src in carry.items()],
        (
            dot(F.col(query_vec_col), F.col(vec_col))
            / (F.col("__qnrm") * F.col("__cnrm"))
        ).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc(rnd(F.col("cos"), 6)), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col, "neighbor_id", *carry.keys(),
            rnd("cos", 4).alias("cosine"), "rank",
        )
    )


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "emb",
    query_id_col: str = "query_id", query_vec_col: str = "qemb",
) -> DataFrame:
    """Exact cosine top-k (broadcast queries × corpus) — the recall oracle."""
    pairs = (
        F.broadcast(queries.withColumn("__qnrm", norm(F.col(query_vec_col))))
        .join(
            corpus.withColumn("__cnrm", norm(F.col(vec_col))),
            F.col(id_col) != F.col(query_id_col),
        )
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            (
                dot(F.col(query_vec_col), F.col(vec_col))
                / (F.col("__qnrm") * F.col("__cnrm"))
            ).alias("cos"),
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


def _centroid_rows(centroids) -> list[tuple[int, list[float]]]:
    """Normalize a centroid set to driver-side rows sorted by list_id.

    Accepts either the (list_id, centroid) DataFrame form (public API) or an
    already-collected list of (list_id, vector) tuples (the internal Lloyd
    loop). k×dim doubles — tiny; doubles round-trip the driver exactly."""
    if isinstance(centroids, DataFrame):
        rows = [
            (int(r["list_id"]), [float(x) for x in r["centroid"]])
            for r in centroids.collect()
        ]
    else:
        rows = [(int(i), [float(x) for x in v]) for i, v in centroids]
    return sorted(rows, key=lambda t: t[0])


def _cent_literal(rows: list[tuple[int, list[float]]]) -> Column:
    """array<struct<d_sort_dummy…>> literal of the centroid table, embedded
    straight into the plan — the broadcast-join of a 16-row build side,
    without the join."""
    return F.array(
        *[
            F.struct(
                F.lit(lid).cast("long").alias("list_id"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("centroid"),
            )
            for lid, vec in rows
        ]
    )


def _dist_structs_over(vec: Column, cents: Column) -> Column:
    """array<struct<d:double, list_id:long>> of rounded squared-L2 distances
    from ``vec`` to every centroid in ``cents`` (an array<struct<list_id,
    centroid>> column — literal or broadcast-joined). Struct order
    (d, list_id) makes Spark's lexicographic struct comparison exactly the
    engine-stable tie-break: nearest first, lower list_id on a 9-dp tie."""
    return F.transform(
        cents,
        lambda c: F.struct(
            rnd(_sq_l2(vec, c["centroid"]), 9).alias("d"),
            c["list_id"].alias("list_id"),
        ),
    )


def _dist_structs(vec: Column, rows: list[tuple[int, list[float]]]) -> Column:
    return _dist_structs_over(vec, _cent_literal(rows))


def _cents_broadcast_df(spark: SparkSession, rows) -> DataFrame:
    """1-row DataFrame carrying the centroid table as DATA
    (``__cents: array<struct<list_id, centroid>>``) rather than plan
    literals. ``df.crossJoin(broadcast(...))`` against it is a map-side
    BroadcastNestedLoopJoin with a single build row, after which the same
    argmin/sort expressions as the literal path apply unchanged."""
    return one_partition_df(
        spark,
        [([(lid, vec) for lid, vec in rows],)],
        "__cents array<struct<list_id: long, centroid: array<double>>>",
    )


def _with_cents(
    df: DataFrame, rows: list[tuple[int, list[float]]], literal_max_lists: int
) -> tuple[DataFrame, Column, list[str]]:
    """Attach the centroid table to ``df`` by whichever strategy fits its
    size: as a plan-literal column expression (small k — zero join) or as a
    broadcast 1-row relation (large k — bounded plan). Returns (frame,
    centroid-array column, helper columns to drop afterwards)."""
    if len(rows) <= literal_max_lists:
        return df, _cent_literal(rows), []
    cents = _cents_broadcast_df(df.sparkSession, rows)
    return df.crossJoin(F.broadcast(cents)), F.col("__cents"), ["__cents"]


def _bounded_train_rows(
    corpus: DataFrame, id_col: str, vec_col: str, max_rows: int,
) -> list[tuple] | None:
    """Collect the training frame for the driver-side Lloyd fast path
    (``lloyd_np``) iff it fits ``max_rows``; ``None`` routes the caller to
    the distributed loop (over-bound, EMPTY — lloyd_np cannot seed from
    zero rows and the distributed path is loud about it — or fast path
    disabled via ``max_rows <= 0``). Guarded by a bounded limit-probe (the
    :func:`ivfpq_train_np` pattern) so an unsampled 100 TB corpus can
    never be collected by accident: the probe scans at most
    ``max_rows + 1`` ids, whatever the corpus size."""
    if max_rows <= 0:
        return None
    probed = corpus.select(id_col).limit(max_rows + 1).count()
    if probed == 0 or probed > max_rows:
        return None
    # collect UNORDERED and sort driver-side: same multiset, same final id
    # order (ids are unique), without paying a global range-sort exchange
    # just to establish it
    rows = [
        (r[id_col], r[vec_col])
        for r in corpus.select(id_col, vec_col).collect()
    ]
    rows.sort(key=lambda t: t[0])
    return rows


def _ivf_train(
    corpus: DataFrame, n_lists: int, n_iter: int,
    id_col: str, vec_col: str,
    literal_max_lists: int = IVF_LITERAL_MAX_LISTS,
) -> list[tuple[int, list[float]]]:
    """The Lloyd loop, returning driver-side centroid rows. Assumes the
    caller persisted ``corpus`` (the loop scans it once per iteration plus
    once for the seeds).

    Each iteration's result lives on the driver and is re-embedded as a plan
    literal (k×dim doubles — tiny, the standard Lloyd-loop shape, same as
    MLlib KMeans): without this, every downstream consumer would re-execute
    the whole iteration chain, and iteration i's plan would nest i full
    corpus scans. Per iteration this runs ONE corpus-scan job: assignment is
    a map-side argmin against the literal centroid matrix (no join, no
    shuffle) and the per-list mean partial-aggregates map-side, so the only
    shuffle moves k×dim (list, dim, sum, count) rows."""
    seed_rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(n_lists).collect()
    )
    cent = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(seed_rows)]
    for _ in range(n_iter):
        assigned = ivf_assign(
            corpus, cent, id_col=id_col, vec_col=vec_col,
            literal_max_lists=literal_max_lists,
        )
        mrows = (
            assigned.select("list_id", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("list_id", "pos")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        means: dict[int, dict[int, float]] = {}
        for r in mrows:
            means.setdefault(int(r["list_id"]), {})[int(r["pos"])] = float(r["m"])
        # empty lists keep their previous centroid
        cent = [
            (
                lid,
                [means[lid][d] for d in range(len(old))] if lid in means else old,
            )
            for lid, old in cent
        ]
    return cent


def ivf_centroids(
    corpus: DataFrame, n_lists: int, n_iter: int = 2,
    id_col: str = "vec_id", vec_col: str = "emb",
    literal_max_lists: int = IVF_LITERAL_MAX_LISTS,
    driver_train_max_rows: int = IVFPQ_DRIVER_TRAIN_MAX_ROWS,
) -> DataFrame:
    """Deterministic coarse quantizer: seeds = vectors of the ``n_lists``
    lowest ids, then ``n_iter`` Lloyd steps (empty lists keep their old
    centroid). Returns (list_id, centroid).

    Training frames within ``driver_train_max_rows`` (bounded limit-probe)
    collect once and train driver-side (:func:`lloyd_np` — 2 jobs instead
    of 1 + 2·n_iter collect-barrier jobs; the per-iteration job pair plus
    plan re-codegen is the fixed cost that dominates Lloyd at bench
    scale). Same algorithm, same per-dimension IEEE fold, same 9-dp
    argmin tie-break; row-summation order of the per-list means is the
    only freedom — not contractual in either engine nor in the DuckDB
    oracle, which sums in its own order (pinned in
    tests/test_lloyd_driver_path.py). 0 forces the distributed loop."""
    spark = corpus.sparkSession
    rows = _bounded_train_rows(corpus, id_col, vec_col, driver_train_max_rows)
    if rows is not None:
        dim = len(rows[0][1])
        cent = lloyd_np(rows, [(0, dim, n_lists)], n_iter)[0]
        return one_partition_df(
            spark, cent, "list_id long, centroid array<double>"
        )
    # self-contained persist: materialized on the first loop action,
    # released before returning
    corpus = corpus.persist()
    try:
        cent = _ivf_train(
            corpus, n_lists, n_iter, id_col, vec_col, literal_max_lists
        )
    finally:
        corpus.unpersist()
    return one_partition_df(spark, cent, "list_id long, centroid array<double>")


def ivf_assign(
    corpus: DataFrame, centroids,
    id_col: str = "vec_id", vec_col: str = "emb",
    literal_max_lists: int = IVF_LITERAL_MAX_LISTS,
) -> DataFrame:
    """Nearest-centroid assignment: (id, vec, list_id). Ties break to the
    lower list_id on the distance rounded to 9 dp (engine-stable).

    Map-side either way: up to ``literal_max_lists`` lists the centroid
    table is embedded as a plan literal (no join at all); above it the same
    table ships as a 1-row broadcast relation so the plan stays bounded at
    sqrt-N lists (see ``IVF_LITERAL_MAX_LISTS``). The argmin is
    ``array_min`` over (distance, list_id) structs — Spark's lexicographic
    struct ordering IS the tie-break. No shuffle, no window: at 100 TB this
    assigns in a single narrow pass over the corpus scan. ``centroids`` may
    be the (list_id, centroid) DataFrame or a pre-collected
    [(list_id, vector), …] list."""
    rows = _centroid_rows(centroids)
    base, cents, _drop = _with_cents(corpus, rows, literal_max_lists)
    best = F.array_min(_dist_structs_over(F.col(vec_col), cents))
    return base.select(id_col, vec_col, best["list_id"].alias("list_id"))


def fine_seed_assign(
    assigned: DataFrame, k2: int,
    id_col: str = "vec_id", vec_col: str = "emb",
    coarse_col: str = "list_id",
) -> DataFrame:
    """Second quantizer level for hierarchical blocking: within each coarse
    cell the ``k2`` lowest-id vectors become FINE SEEDS (no Lloyd — purely
    deterministic, so an external oracle can replay it with a window rank),
    and every vector maps to its cell's nearest seed (distance rounded to
    9 dp, lower seed id on ties — the same engine-stable tie-break as
    :func:`ivf_assign`). Returns (id, vec, coarse_col, fine_id); ``fine_id``
    is the seed's own id, globally unique, so downstream blocking can key
    on fine_id alone.

    Scale shape: the seed table is k1·k2 × dim doubles grouped into one
    array row per cell; the assignment is an equi-join on the coarse id
    (AQE broadcasts it while it fits, shuffles on the cell key beyond
    that) followed by a map-side argmin over ≤ k2 seeds. Together with the
    coarse level this replaces the flat n×k distance pass with
    n×(k1 + k2) ≈ n·2√k — the construction the flat v10 sizing note
    defers to past ~10M vectors."""
    wseed = Window.partitionBy(coarse_col).orderBy(id_col)
    seeds = (
        assigned.withColumn("__rn", F.row_number().over(wseed))
        .filter(F.col("__rn") <= k2)
        .groupBy(coarse_col)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(id_col).cast("long").alias("list_id"),
                        F.col(vec_col).alias("centroid"),
                    )
                )
            ).alias("__seeds")
        )
    )
    joined = assigned.join(seeds, coarse_col)
    best = F.array_min(_dist_structs_over(F.col(vec_col), F.col("__seeds")))
    return joined.select(
        id_col, vec_col, coarse_col, best["list_id"].alias("fine_id")
    )


def ivf_ann_topk(
    corpus: DataFrame, queries: DataFrame,
    k: int = 5, n_lists: int = 16, n_probe: int = 4, n_iter: int = 2,
    id_col: str = "vec_id", vec_col: str = "emb",
    query_id_col: str = "query_id", query_vec_col: str = "qemb",
    literal_max_lists: int = IVF_LITERAL_MAX_LISTS,
    driver_train_max_rows: int = IVFPQ_DRIVER_TRAIN_MAX_ROWS,
) -> DataFrame:
    """IVF ANN: probe the n_probe nearest lists, exact cosine inside them.

    At scale the corpus is written partitioned by list_id, so a probe reads
    n_probe/n_lists of the data — the candidate join is an equi-join on
    list_id against a broadcast probe set. Training routes through the
    driver-side Lloyd fast path when the corpus fits
    ``driver_train_max_rows`` (see :func:`ivf_centroids`); the assign +
    probe stages are distributed either way.
    """
    # persist spans training AND the final assign/verify pass — the cache is
    # left registered because the returned plan still reads it lazily (the
    # standard MLlib-style tradeoff; a one-shot caller can unpersist after
    # consuming). At real scale you'd train once and WRITE `assigned`
    # partitioned/bucketed by list_id instead of re-assigning per query.
    corpus = corpus.persist()
    fast = _bounded_train_rows(corpus, id_col, vec_col, driver_train_max_rows)
    if fast is not None:
        dim = len(fast[0][1])
        rows = lloyd_np(fast, [(0, dim, n_lists)], n_iter)[0]
    else:
        rows = _ivf_train(
            corpus, n_lists, n_iter, id_col, vec_col, literal_max_lists
        )
    assigned = ivf_assign(
        corpus, rows, id_col=id_col, vec_col=vec_col,
        literal_max_lists=literal_max_lists,
    )
    # probe selection is map-side too: sort the (distance, list_id) structs
    # (lexicographic struct order = nearest first, lower list_id on a tie)
    # and keep the first n_probe — no crossJoin on the corpus, no window
    # shuffle. Large list counts attach the centroid table by broadcast.
    qbase, qcents, _qdrop = _with_cents(queries, rows, literal_max_lists)
    probe_lists = F.transform(
        F.slice(
            F.array_sort(_dist_structs_over(F.col(query_vec_col), qcents)),
            1, n_probe,
        ),
        lambda s: s["list_id"],
    )
    probes = qbase.select(
        query_id_col, query_vec_col, F.explode(probe_lists).alias("list_id"),
        norm(F.col(query_vec_col)).alias("__qnrm"),
    )
    pairs = (
        # the query set is small by construction; broadcasting it makes the
        # candidate step a map-side hash join against the corpus scan.
        # Norms hoisted out of the per-pair expression (see norm()).
        F.broadcast(probes)
        .join(assigned.withColumn("__cnrm", norm(F.col(vec_col))), "list_id")
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            (
                dot(F.col(query_vec_col), F.col(vec_col))
                / (F.col("__qnrm") * F.col("__cnrm"))
            ).alias("cos"),
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


#: Exact (quadratic) near-dup refuses corpora above this many rows unless
#: the caller explicitly opts out — the guard that keeps the O(n²)
#: correctness baseline from being pointed at a big table by accident.
NEAR_DUP_EXACT_MAX_ROWS = 200_000


def cosine_near_dup_pairs(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "emb",
    threshold: float = 0.9,
    max_rows: int | None = NEAR_DUP_EXACT_MAX_ROWS,
) -> DataFrame:
    """Exact embedding near-dup pairs: cosine >= threshold, id_a < id_b.

    Quadratic verify — ``cosine_near_dup_pairs_lsh`` below (and the IVF
    candidate generator) is the scale path; this exact form is the
    correctness baseline and the oracle twin. Guarded: corpora larger than
    ``max_rows`` raise instead of silently launching an n² join (pass
    ``max_rows=None`` to force). The size probe is a bounded action —
    ``limit(max_rows + 1)`` stops the scan as soon as the ceiling is
    provably exceeded, so the guard costs one cheap job, not a full count.
    """
    if max_rows is not None:
        probed = df.select(id_col).limit(max_rows + 1).count()
        if probed > max_rows:
            raise ValueError(
                f"cosine_near_dup_pairs is O(n²) and the corpus exceeds "
                f"max_rows={max_rows}; use cosine_near_dup_pairs_lsh for "
                f"the bucketed scale path, or pass max_rows=None to force."
            )
    # per-row norms hoisted below the pair join: the quadratic stage pays
    # one interpreted fold per pair instead of three, bit-identical
    # (see norm())
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        norm(F.col(vec_col)).alias("__na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        norm(F.col(vec_col)).alias("__nb"),
    )
    c = dot(F.col("va"), F.col("vb")) / (F.col("__na") * F.col("__nb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", c)
        .filter(rnd(F.col("cos"), 6) >= threshold)
        .select("id_a", "id_b", rnd("cos", 4).alias("cosine"))
    )


def cosine_near_dup_pairs_lsh(
    df: DataFrame, spark: SparkSession,
    id_col: str = "vec_id", vec_col: str = "emb",
    threshold: float = 0.9,
    n_planes: int = 32, band_size: int = 4, dim: int = 64,
) -> DataFrame:
    """Near-dup pairs through LSH candidate generation — the scale path for
    the same predicate as ``cosine_near_dup_pairs``.

    Candidates are id_a < id_b pairs sharing at least one sign-LSH band
    (equi-join on (band_id, band_key) — a shuffle on selective keys, never
    the corpus square); only candidates get the exact cosine verify. The
    md5 hyperplanes are engine-independent, so a SQL oracle can rebuild the
    identical buckets — the approximation itself is oracle-checkable.
    Recall < 1 by construction: a true pair sharing no band is missed
    (tunable via n_planes/band_size; see ``suggest_lsh_params``).

    Plan shape, chosen for scale: the band self-join carries a
    ``shuffle_hash`` hint — the bucket table is n_bands rows per corpus
    vector, growing with the data, so a broadcast would be a runaway at
    scale; pinning the shuffle also makes both sides identical Exchanges
    and Spark's ReusedExchange computes the signature stage ONCE instead
    of once per side. The verify is the same Arrow-batched numpy kernel
    trick as the signatures (exact per-dot left-to-right fold, so
    bit-identical to the oracle's ``list_dot_product``): at realistic
    bucket occupancies the candidate set runs to ~n²·bands/2^band_size
    pairs, and the interpreted higher-order-function cosine was measured
    at ~12 µs/pair (30+ s at sf0.1's 259k candidates) vs ~0.1 µs/pair
    vectorized."""
    import numpy as np
    import pandas as pd

    planes = hyperplane_values(n_planes, dim)
    b = lsh_buckets(df, id_col, vec_col, planes, band_size)
    cand = (
        b.alias("a")
        .hint("shuffle_hash")
        .join(
            b.alias("b").hint("shuffle_hash"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_t}, id_b {id_t}, cosine double"
    thr = float(threshold)

    def verify(batches):
        def seqdot(x, y):
            acc = np.zeros(len(x), dtype=np.float64)
            for d in range(x.shape[1]):
                # exact left-to-right fold order per dot (oracle parity)
                acc += x[:, d] * y[:, d]
            return acc

        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.vstack(pdf["va"].to_numpy())
            bm = np.vstack(pdf["vb"].to_numpy())
            cos = seqdot(a, bm) / (np.sqrt(seqdot(a, a)) * np.sqrt(seqdot(bm, bm)))
            keep = np.floor(cos * 1e6 + 0.5 + 1e-6) / 1e6 >= thr
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy()[keep],
                    "id_b": pdf["id_b"].to_numpy()[keep],
                    "cosine": np.floor(cos[keep] * 1e4 + 0.5 + 1e-6) / 1e4,
                }
            )

    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", "va", "vb")
        .mapInPandas(verify, out_schema)
    )


def semdedup_dropped_ids(
    rows: DataFrame, block_col: str, tau: float = SEM_TAU,
    id_col: str = "vec_id", vec_col: str = "emb",
    new_col: str | None = None,
) -> DataFrame:
    """Dropped-id set of the one-shot SemDeDup greedy rule, computed by a
    grouped Arrow/numpy kernel: within each ``block_col`` block, id j is
    dropped iff some lower-id block-mate i sits at rnd6(cos(i, j)) >= tau.
    When ``new_col`` names a boolean column, only rows where it is true
    are drop CANDIDATES (the incremental append case: stored rows
    eliminate newcomers but are never dropped themselves); every row still
    eliminates.

    Bit-identical to the block self-join + interpreted-fold form it
    replaces (pinned in tests/test_similarity_operators.py): each pairwise
    dot and both norms accumulate per-DIMENSION in the same left-to-right
    IEEE order as ``dot``'s fold (the lsh_buckets /
    cosine_near_dup_pairs_lsh kernel rule), the cosine divides by the same
    sqrt(dot(v,v)) product, and the 6-dp comparison applies the same
    biased rounding. Zero-norm rows: Spark's double 0/0 is NULL, numpy's
    is NaN — both fail ``>= tau``, so neither form drops them.

    Plan shape vs the join form: ONE exchange on block_col feeding the
    kernel, instead of two exchanges of the same rows into a self-join
    that materializes sum(|block|^2) pair rows each paying an interpreted
    higher-order-function fold (~4 us/pair post norm-hoist; the kernel's
    per-dim matrix accumulation measured ~0.1 us/pair). Memory is bounded:
    the candidate axis is chunked so the distance block never exceeds
    ~32M doubles however skewed a block is."""
    import numpy as np
    import pandas as pd

    id_t = rows.schema[id_col].dataType.simpleString()
    cols = [id_col, vec_col] + ([new_col] if new_col else [])
    out_schema = f"`{id_col}` {id_t}"
    tau_f = float(tau)

    def dropped(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame({id_col: pdf[id_col][:0]})
        if n < 2:
            return empty
        order = np.argsort(pdf[id_col].to_numpy(), kind="stable")
        ids = pdf[id_col].to_numpy()[order]
        E = np.vstack(pdf[vec_col].to_numpy())[order].astype(
            np.float64, copy=False
        )
        dim = E.shape[1]
        # per-row norm: the same per-dimension fold as dot(v, v)
        nsq = np.zeros(n, dtype=np.float64)
        for d in range(dim):
            nsq += E[:, d] * E[:, d]
        nrm = np.sqrt(nsq)
        if new_col:
            cand = np.flatnonzero(pdf[new_col].to_numpy()[order])
            cand = cand[cand >= 1]
        else:
            cand = np.arange(1, n)
        if cand.size == 0:
            return empty
        hit_ids = []
        chunk = max(16, 33_554_432 // n)
        with np.errstate(invalid="ignore", divide="ignore"):
            for c0 in range(0, cand.size, chunk):
                js = cand[c0 : c0 + chunk]
                hi = int(js[-1])  # eliminators live at indices < js
                acc = np.zeros((hi, js.size), dtype=np.float64)
                Ej = E[js]
                for d in range(dim):
                    acc += E[:hi, d : d + 1] * Ej[:, d][None, :]
                cos = acc / (nrm[:hi, None] * nrm[js][None, :])
                r6 = np.floor(cos * 1e6 + 0.5 + 1e-6) / 1e6
                mask = np.arange(hi)[:, None] < js[None, :]
                d_j = ((r6 >= tau_f) & mask).any(axis=0)
                hit_ids.append(ids[js[d_j]])
        out = np.concatenate(hit_ids) if hit_ids else ids[:0]
        return pd.DataFrame({id_col: out})

    return (
        rows.select(block_col, *cols)
        .groupBy(block_col)
        .applyInPandas(lambda pdf: dropped(pdf), out_schema)
    )


def quantize_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "emb",
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization.

    scale = max|x| / 127 (floored at 1e-12 so zero vectors stay finite);
    q_i = floor(x_i / scale + 0.5) — written out as floor(+0.5) instead of
    round() because engines disagree on negative-half rounding, and this
    formula is bit-portable.

    At 100 TB this is the storage/bandwidth lever for the ANN operators: the
    corpus shrinks ~4× (int8 vs float32, ~8× vs float64) and candidate
    verification reads quantized vectors, re-ranking only the top candidates
    against full precision. Returns (id, q ints, q_scale, dequantized)."""
    e = F.col(vec_col)
    scale = F.greatest(
        F.array_max(F.transform(e, lambda x: F.abs(x))) / 127.0, F.lit(1e-12)
    )
    q = F.transform(e, lambda x: F.floor(x / F.col("q_scale") + F.lit(0.5)))
    return (
        df.select(id_col, vec_col, scale.alias("q_scale"))
        .withColumn("q", q)
        .withColumn(
            "deq", F.transform(F.col("q"), lambda v: v * F.col("q_scale"))
        )
    )


def quantization_report(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "emb",
) -> DataFrame:
    """Quantization quality per vector: scale, mean absolute reconstruction
    error, and cosine(original, dequantized) — the acceptance metric for
    swapping the ANN verify step onto int8 storage."""
    qd = quantize_int8(df, id_col, vec_col)
    mae = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("deq"), lambda a, b: F.abs(a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.size(vec_col)
    # zero vectors have no direction: cosine is NULL, not a div-by-zero
    # (ANSI mode raises on 0/0). norm2 doubles as cosine's own
    # sqrt(dot(v, v)) factor — one fewer fold per row, bit-identical.
    norm2 = dot(F.col(vec_col), F.col(vec_col))
    cos = F.when(
        norm2 > 0,
        dot(F.col(vec_col), F.col("deq"))
        / (F.sqrt(norm2) * F.sqrt(dot(F.col("deq"), F.col("deq")))),
    )
    return qd.select(
        id_col,
        rnd("q_scale", 6).alias("q_scale"),
        rnd(mae, 6).alias("mae"),
        rnd(cos, 4).alias("cosine_deq"),
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


# ---------------------------------------------------------------------------
# IVF index persistence: the train-once / probe-many shape that
# ivf_ann_topk's docstring promises. write_ivf_index trains the coarse
# quantizer, assigns the corpus, and writes it partitioned by list_id;
# probe_ivf_index reads it back with a list_id IN (...) filter, which
# Spark resolves by PARTITION PRUNING — a probe touches n_probe/n_lists
# of the files on disk, never the whole corpus. Centroids persist next to
# the data so probes never re-train.
# ---------------------------------------------------------------------------

def write_ivf_index(
    corpus: DataFrame, path: str,
    n_lists: int = 16, n_iter: int = 2,
    id_col: str = "vec_id", vec_col: str = "emb",
    literal_max_lists: int = IVF_LITERAL_MAX_LISTS,
    driver_train_max_rows: int = IVFPQ_DRIVER_TRAIN_MAX_ROWS,
) -> DataFrame:
    """Train + assign + write the corpus partitioned by list_id; returns
    the (list_id, centroid) table, which is also written to
    ``{path}/_centroids``. Training routes through the driver-side Lloyd
    fast path within ``driver_train_max_rows`` (see
    :func:`ivf_centroids`)."""
    spark = corpus.sparkSession
    corpus = corpus.persist()
    try:
        fast = _bounded_train_rows(
            corpus, id_col, vec_col, driver_train_max_rows
        )
        if fast is not None:
            dim = len(fast[0][1])
            rows = lloyd_np(fast, [(0, dim, n_lists)], n_iter)[0]
        else:
            rows = _ivf_train(
                corpus, n_lists, n_iter, id_col, vec_col, literal_max_lists
            )
        assigned = ivf_assign(
            corpus, rows, id_col=id_col, vec_col=vec_col,
            literal_max_lists=literal_max_lists,
        )
        assigned.write.mode("overwrite").partitionBy("list_id").parquet(path)
    finally:
        corpus.unpersist()
    cents = one_partition_df(
        spark, rows, "list_id long, centroid array<double>"
    )
    cents.write.mode("overwrite").parquet(f"{path}/_centroids")
    return cents


def _dir_has_parquet(spark: SparkSession, path: str) -> bool:
    """True iff the directory tree holds at least one parquet data file.
    An incremental VectorStore whose only published batches are EMPTY
    (file-less ``batch_id=`` dirs) has readable state semantics (no
    vectors yet) but no inferable parquet schema — probes must treat it
    as an empty index rather than crash. Walks with Spark's visibility
    rule (``_``/``.``-prefixed path components are metadata, e.g. the
    ``_centroids`` side table, and don't count as index data).

    Uses the Hadoop FileSystem API (like ``sources/writers.py``'s
    atomic-rename pattern) so the guard is FS-agnostic: an ``hdfs://`` /
    ``s3a://`` index probes its files the same as a local one — an
    ``os.walk`` here would silently report a valid remote index as
    empty, turning a wrong config into a wrong ANSWER."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return False
    root = fs.makeQualified(jpath).toUri().getPath().rstrip("/")
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        p = it.next().getPath().toUri().getPath()
        rel = p[len(root):].lstrip("/") if p.startswith(root) else p
        parts = rel.split("/")
        if any(seg.startswith(("_", ".")) for seg in parts[:-1]):
            continue
        name = parts[-1]
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            return True
    return False


def probe_ivf_index(
    spark: SparkSession, path: str, queries: DataFrame,
    k: int = 5, n_probe: int = 4,
    id_col: str = "vec_id", vec_col: str = "emb",
    query_id_col: str = "query_id", query_vec_col: str = "qemb",
    literal_max_lists: int = IVF_LITERAL_MAX_LISTS,
) -> DataFrame:
    """Top-k over a persisted IVF index. The probe plan filters the index
    scan with ``list_id isin(probe lists)`` — a partition filter, so only
    the probed directories are read (assert via
    ``tests/test_ivf_index.py``'s pruning check)."""
    if not _dir_has_parquet(spark, path):
        return spark.createDataFrame(
            [],
            f"{query_id_col} long, neighbor_id long, cosine double, rank int",
        )
    rows = _centroid_rows(
        spark.read.parquet(f"{path}/_centroids")
    )
    qbase, qcents, _ = _with_cents(queries, rows, literal_max_lists)
    probe_lists = F.transform(
        F.slice(
            F.array_sort(_dist_structs_over(F.col(query_vec_col), qcents)),
            1, n_probe,
        ),
        lambda s: s["list_id"],
    )
    probes = qbase.select(
        query_id_col, query_vec_col, F.explode(probe_lists).alias("list_id"),
        norm(F.col(query_vec_col)).alias("__qnrm"),
    )
    # collect the (tiny) probed list-id set so the index scan gets a
    # LITERAL partition filter — pruning at planning time, not a join
    probed_ids = sorted(
        {int(r["list_id"]) for r in probes.select("list_id").distinct().collect()}
    )
    index = spark.read.parquet(path).filter(F.col("list_id").isin(probed_ids))
    # per-row norms hoisted out of the per-pair expression (see norm())
    pairs = (
        F.broadcast(probes)
        .join(index.withColumn("__cnrm", norm(F.col(vec_col))), "list_id")
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            (
                dot(F.col(query_vec_col), F.col(vec_col))
                / (F.col("__qnrm") * F.col("__cnrm"))
            ).alias("cos"),
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


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011): split each vector into M
# contiguous subvectors, train an independent K-codeword quantizer per
# subspace (the same deterministic Lloyd as the IVF coarse quantizer), and
# store each vector as M small code ids. At 100 TB this is the memory
# story for ANN: dim-64 float64 vectors (512 B) become M=8 uint8 codes
# (8 B) — a 64× compression — and asymmetric-distance (ADC) search scans
# codes with per-query lookup tables instead of touching raw vectors.
# Codebook size is a CONSTANT (2^bits), so unlike a corpus-scaled list
# count there is no quadratic-in-disguise here: train is M × n_iter
# linear passes, encode is one map-side pass of M·K subvector distances.
# ---------------------------------------------------------------------------

def _joint_lloyd(
    corpus: DataFrame,
    specs: list[tuple[int, int, int]],
    n_iter: int, id_col: str, vec_col: str,
) -> list[list[tuple[int, list[float]]]]:
    """Train one deterministic Lloyd codebook PER SPEC — ``specs`` entries
    are ``(offset, width, k)`` slices of the vector — with every spec
    sharing the same jobs: ONE seed collect (the max-k lowest-id FULL
    vectors, sliced driver-side) and ONE corpus-scan job per Lloyd step
    computing every spec's assignment (the same ``array_min``/9-dp/
    lower-id expression as :func:`ivf_assign`'s literal path) and
    per-(spec, code, dim) means in a single explode + partial-aggregating
    groupBy. Same arithmetic on the same groups as training each spec
    alone, so results are bit-identical to the per-spec loops an external
    oracle replays. Empty codes keep their previous codeword.

    This is the DISTRIBUTED loop; :func:`pq_train` / :func:`ivfpq_train`
    route bounded training frames to :func:`lloyd_np` instead and only
    fall back here past ``driver_train_max_rows``.

    This is how the PQ subspaces train together (24 → 3 corpus scans,
    round 4) AND how :func:`ivfpq_train` gets its coarse quantizer nearly
    free: the full-width coarse spec rides the same scans as the M
    subspace specs instead of paying its own Lloyd passes."""
    corpus = corpus.persist()
    try:
        max_k = max(k for _, _, k in specs)
        seed_rows = (
            corpus.select(id_col, vec_col)
            .orderBy(id_col)
            .limit(max_k)
            .collect()
        )
        books = [
            [
                (i, [float(x) for x in r[vec_col]][off : off + width])
                for i, r in enumerate(seed_rows[:k])
            ]
            for off, width, k in specs
        ]
        for _ in range(n_iter):
            per_spec = [
                F.struct(
                    F.lit(s).alias("s"),
                    _slice_best(vec_col, off, width, books[s])["list_id"]
                    .alias("list_id"),
                    F.slice(F.col(vec_col), off + 1, width).alias("sub"),
                )
                for s, (off, width, _k) in enumerate(specs)
            ]
            mrows = (
                corpus.select(F.explode(F.array(*per_spec)).alias("x"))
                .select(
                    F.col("x.s").alias("s"),
                    F.col("x.list_id").alias("list_id"),
                    F.posexplode("x.sub").alias("pos", "v"),
                )
                .groupBy("s", "list_id", "pos")
                .agg(F.avg("v").alias("m"))
                .collect()
            )
            means: dict[tuple[int, int], dict[int, float]] = {}
            for r in mrows:
                means.setdefault(
                    (int(r["s"]), int(r["list_id"])), {}
                )[int(r["pos"])] = float(r["m"])
            books = [
                [
                    (
                        lid,
                        [means[(s, lid)][d] for d in range(len(old))]
                        if (s, lid) in means
                        else old,
                    )
                    for lid, old in book
                ]
                for s, book in enumerate(books)
            ]
    finally:
        corpus.unpersist()
    return books


def pq_train(
    corpus: DataFrame, n_sub: int, k_codes: int, sub_dim: int,
    n_iter: int = 2, id_col: str = "vec_id", vec_col: str = "emb",
    driver_train_max_rows: int = IVFPQ_DRIVER_TRAIN_MAX_ROWS,
) -> list[list[tuple[int, list[float]]]]:
    """Train ``n_sub`` independent codebooks of ``k_codes`` codewords each
    over contiguous ``sub_dim``-wide slices. Deterministic: per subspace,
    seeds are the subvectors of the ``k_codes`` lowest ids, then
    ``n_iter`` Lloyd steps (empty codes keep their old codeword) — exactly
    :func:`ivf_centroids` on the slice, so an external oracle replays it
    with the same CTE chain per subspace. Returns driver-side codebooks
    (M × K × sub_dim doubles — tiny). All ``n_sub`` codebooks train
    together in :func:`_joint_lloyd`'s shared jobs — measured 24 → 3
    corpus scans vs the per-subspace loop. Bounded training frames
    (``driver_train_max_rows``) train driver-side via :func:`lloyd_np`
    instead (see :func:`ivf_centroids`)."""
    specs = [(s * sub_dim, sub_dim, k_codes) for s in range(n_sub)]
    rows = _bounded_train_rows(corpus, id_col, vec_col, driver_train_max_rows)
    if rows is not None:
        return lloyd_np(rows, specs, n_iter)
    return _joint_lloyd(corpus, specs, n_iter, id_col, vec_col)


def ivfpq_train(
    corpus: DataFrame, n_lists: int, n_sub: int, k_codes: int, sub_dim: int,
    n_iter: int = 2, id_col: str = "vec_id", vec_col: str = "emb",
    driver_train_max_rows: int = IVFPQ_DRIVER_TRAIN_MAX_ROWS,
) -> tuple[list[tuple[int, list[float]]], list[list[tuple[int, list[float]]]]]:
    """Coarse IVF quantizer + all PQ codebooks from ONE joint Lloyd run.

    The coarse quantizer is just one more :func:`_joint_lloyd` spec — the
    full-width slice with ``n_lists`` codes — so it trains in the SAME
    seed collect and per-step jobs as the M subspaces: the marginal cost
    of IVF over plain PQ is extra per-row arithmetic inside jobs that
    already scan the corpus, not extra scans. Bit-identical to training
    the coarse book alone (:func:`_ivf_train` — pinned in tests/test_pq).
    Returns ``(coarse_rows, pq_books)``. Bounded training frames
    (``driver_train_max_rows``) train driver-side via :func:`lloyd_np`
    instead (see :func:`ivf_centroids`)."""
    dim = n_sub * sub_dim
    specs = [(s * sub_dim, sub_dim, k_codes) for s in range(n_sub)]
    specs.append((0, dim, n_lists))
    rows = _bounded_train_rows(corpus, id_col, vec_col, driver_train_max_rows)
    if rows is not None:
        books = lloyd_np(rows, specs, n_iter)
    else:
        books = _joint_lloyd(corpus, specs, n_iter, id_col, vec_col)
    return books[-1], books[:-1]


def _slice_best(vec_col: str, off: int, width: int, book) -> Column:
    """struct<d, list_id> of the nearest codeword for the ``[off, off+width)``
    slice — :func:`ivf_assign`'s argmin expression on a subvector."""
    sub = F.slice(F.col(vec_col), off + 1, width)
    return F.array_min(_dist_structs(sub, book))


def _pq_best(vec_col: str, s: int, sub_dim: int, book) -> Column:
    """struct<d, list_id> of the nearest codeword for subspace ``s``."""
    return _slice_best(vec_col, s * sub_dim, sub_dim, book)


def pq_encode(
    corpus: DataFrame, books, sub_dim: int,
    id_col: str = "vec_id", vec_col: str = "emb",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Encode: (id, [keep_cols], code_0..code_{M-1}, recon_err) where
    ``code_s`` is the nearest codeword id in subspace ``s`` and
    ``recon_err`` the sum of per-subspace squared distances (the PQ
    distortion). One narrow map-side pass — the codebooks are plan
    literals (K ≤ 64 per subspace), so no join and no shuffle at any
    corpus size. ``keep_cols`` defaults to carrying the raw vector
    through (the v13 contract); IVFPQ passes ``["list_id"]`` instead so
    the written index holds CODES only, never raw vectors."""
    code_cols = []
    err = F.lit(0.0)
    for s, book in enumerate(books):
        best = _pq_best(vec_col, s, sub_dim, book)
        code_cols.append(best["list_id"].alias(f"code_{s}"))
        err = err + best["d"]
    keep = [vec_col] if keep_cols is None else keep_cols
    return corpus.select(
        id_col, *keep, *code_cols, err.alias("recon_err")
    )


def pq_adc_topk(
    encoded: DataFrame, queries: DataFrame, books, sub_dim: int, k: int,
    id_col: str = "vec_id",
    query_id_col: str = "query_id", query_vec_col: str = "qemb",
) -> DataFrame:
    """Asymmetric-distance top-k: the query keeps full precision, corpus
    vectors are their codes, and dist(q, x) ≈ Σ_s ||q_s − codeword(x_s)||².
    The ranking distance is each subspace distance rounded at 9 dp then the
    sum at 6 dp (engine-stable, lower neighbor_id on ties).

    Scale shape: queries broadcast; per pair the work is M codeword
    lookups into plan-literal codebooks + M sub_dim-wide squared-L2s —
    strictly cheaper than the full-dim exact pass, and the corpus side
    reads CODES only (the 64×-compressed table), never raw vectors. The
    per-query top-k is a window over the bounded query partition count.
    The scan is still EXHAUSTIVE over the codes (flat PQ) —
    :func:`ivfpq_topk` is the composed form that prunes it."""
    pairs = encoded.crossJoin(
        F.broadcast(_with_adc_luts(queries, books, sub_dim, query_vec_col))
    ).filter(F.col(query_id_col) != F.col(id_col))
    return _adc_rank(pairs, books, sub_dim, k, id_col, query_id_col,
                     query_vec_col)


def _with_adc_luts(
    queries: DataFrame, books, sub_dim: int, query_vec_col: str,
) -> DataFrame:
    """Attach per-query ADC LOOKUP TABLES (the ADC trick from the PQ
    paper — the same device the oracle's ``dt{s}`` CTEs and the numpy
    IVFADC probe already use): ``__dt{s}[j]`` is the 9-dp-rounded
    squared-L2 from the query's subvector ``s`` to codeword ``j``.
    Computed once per QUERY (M·K folds on the broadcast side) instead of
    once per PAIR; the entries are the identical rnd(_sq_l2(...), 9)
    values the old per-pair expression produced, so sums and ranks
    downstream are bit-identical."""
    def lut(sub, book):
        # helper call freezes `sub` per subspace; the transform lambda
        # must stay single-argument (a second arg would be read by
        # PySpark as the array-index parameter)
        return F.transform(
            _cent_literal(book),
            lambda c: rnd(_sq_l2(sub, c["centroid"]), 9),
        )

    q2 = queries
    for s, book in enumerate(books):
        sub = F.slice(F.col(query_vec_col), s * sub_dim + 1, sub_dim)
        q2 = q2.withColumn(f"__dt{s}", lut(sub, book))
    return q2


def _adc_lut_col(n_sub: int) -> Column:
    """Asymmetric distance Σ_s __dt{s}[code_s + 1] over the hoisted
    per-query lookup tables: M array lookups + adds per pair, summed in
    the same subspace order as the old per-pair fold chain. Position =
    code id relies on dense 0..K-1 codebook ids — the same assumption
    the codebook-literal ``element_at`` made."""
    adc = F.lit(0.0)
    for s in range(n_sub):
        adc = adc + F.element_at(
            F.col(f"__dt{s}"), F.col(f"code_{s}").cast("int") + 1
        )
    return adc


def _adc_rank(
    pairs: DataFrame, books, sub_dim: int, k: int,
    id_col: str, query_id_col: str, query_vec_col: str,
) -> DataFrame:
    """Shared ADC scoring + per-query top-k tail of the flat (v14) and
    IVF-pruned (v16) PQ searches: rank ascending on the 6-dp-rounded ADC
    sum, lower neighbor_id on ties. ``pairs`` must carry the
    :func:`_with_adc_luts` columns."""
    scored = pairs.select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        _adc_lut_col(len(books)).alias("adc"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc(rnd(F.col("adc"), 6)), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col, "neighbor_id", rnd("adc", 4).alias("adc_dist"), "rank"
        )
    )


# ---------------------------------------------------------------------------
# IVFADC (IVF + PQ, Jégou et al. 2011 §III): the composition every
# production vector store (e.g. FAISS IVFPQ) serves from. The coarse
# quantizer routes each vector to an inverted list; vectors are stored as
# PQ codes partitioned by list_id; a query probes only its n_probe
# nearest lists and ranks by asymmetric distance WITHIN them. Per query
# the scan cost is n_probe/n_lists of the 64×-compressed code table —
# v14's exhaustive ADC scan is O(corpus) per query batch at any scale,
# this is the shape that stays sublinear. (Classic IVFADC encodes the
# RESIDUAL x − coarse_centroid for tighter distortion; codes here
# quantize x directly so the codebooks stay corpus-global and the oracle
# replays one PQ chain instead of n_lists of them — the pruning
# structure, which is the scale story, is identical.)
#
# Execution shape — three deliberate departures from v13/v14's
# Catalyst-literal plans, each the paper's own device, all bit-compatible
# with the oracle's arithmetic (distances fold per-dim in the same IEEE
# order, rounded at 9 dp before every comparison):
# - the Lloyd run happens DRIVER-SIDE over the bounded training sample
#   (``lloyd_np``) — k·dim codebooks from ≤~2k vectors are not a
#   cluster-scale job, and the interpreted fold expressions cost ~0.5
#   ms/row (measured; same finding as lsh_buckets' kernel);
# - assign + encode over the FULL corpus is one Arrow-batched numpy
#   kernel (``ivfpq_assign_encode``) — one narrow map pass, no shuffle;
# - each query precomputes its M×K ADC LOOKUP TABLE (the ADC trick from
#   the paper) and ships it as a data column on the broadcast probe row,
#   so scoring a candidate is M array lookups + adds — no per-pair
#   vector math at all.
# The query batch is collected driver-side (bounded by contract — an ANN
# serving path scores queries in bounded batches; k·M·K doubles of LUT
# per query).
# ---------------------------------------------------------------------------

def _rnd9_np(a):
    import numpy as np

    return np.floor(a * 1e9 + 0.5 + 1e-6) / 1e9


def _rnd9_py(x: float) -> float:
    import math

    return math.floor(x * 1e9 + 0.5 + 1e-6) / 1e9


def _sq_l2_py(a, b) -> float:
    # same left-to-right per-dimension fold from 0.0 as _sq_l2 / the
    # oracle's list_sum(list_transform(...)) chain
    acc = 0.0
    for x, y in zip(a, b):
        acc += (x - y) * (x - y)
    return acc


def lloyd_np(
    rows: list, specs: list[tuple[int, int, int]], n_iter: int
) -> list[list[tuple[int, list[float]]]]:
    """Driver-side joint Lloyd over a COLLECTED sample (rows must be
    (id, vector) sorted by id — seeds are the first k rows per spec).
    Same algorithm as :func:`_joint_lloyd`: per spec, assignment is the
    9-dp-rounded squared-L2 argmin (lowest code on ties — numpy argmin's
    first-minimum IS that tie-break), empty codes keep their codeword.
    Distances accumulate per-dimension in the fold order both engines
    use; means sum rows sequentially in id order then divide (summation
    order across rows is not contractual anywhere — Spark's partial
    aggregation order isn't either — and every downstream comparison
    rounds at 9 dp first)."""
    import numpy as np

    if not rows:
        raise ValueError(
            "lloyd_np: empty training sample — cannot seed codebooks."
        )
    E = np.asarray([[float(x) for x in v] for _, v in rows], dtype=np.float64)
    books = [E[:k, off : off + width].copy() for off, width, k in specs]
    for _ in range(n_iter):
        for s, (off, width, k) in enumerate(specs):
            sub = E[:, off : off + width]
            acc = np.zeros((len(E), k), dtype=np.float64)
            for d in range(width):
                diff = sub[:, d : d + 1] - books[s][:, d][None, :]
                acc += diff * diff
            codes = np.argmin(_rnd9_np(acc), axis=1)
            for j in range(k):
                mask = codes == j
                if mask.any():
                    tot = np.zeros(width, dtype=np.float64)
                    for row in sub[mask]:
                        tot += row
                    books[s][j] = tot / float(mask.sum())
    return [
        [(j, [float(x) for x in book[j]]) for j in range(len(book))]
        for book in books
    ]


def ivfpq_train_np(
    train: DataFrame, n_lists: int, n_sub: int, k_codes: int, sub_dim: int,
    n_iter: int = 2, id_col: str = "vec_id", vec_col: str = "emb",
    max_rows: int = IVFPQ_DRIVER_TRAIN_MAX_ROWS,
):
    """Driver-side :func:`ivfpq_train`: collect the (bounded) training
    sample once, run the joint coarse+PQ Lloyd in numpy. Guarded by a
    bounded limit-probe so an unsampled 100 TB corpus can't be collected
    by accident. Returns ``(coarse_rows, pq_books)``."""
    probed = train.select(id_col).limit(max_rows + 1).count()
    if probed > max_rows:
        raise ValueError(
            f"ivfpq_train_np collects the training set and it exceeds "
            f"max_rows={max_rows}; pass a sample (the catalog-v16 stride) "
            f"or use the distributed ivfpq_train."
        )
    if probed == 0:
        # without this, lloyd_np's seed slice on a 0-row sample dies with
        # an opaque numpy IndexError (np.asarray([]) is 1-D)
        raise ValueError(
            "ivfpq_train_np: training set is empty — IVFADC needs at "
            "least one training vector to seed the coarse/PQ codebooks."
        )
    # unordered collect + driver-side sort: same rows in the same final id
    # order, without a global range-sort exchange (see _bounded_train_rows)
    rows = [
        (r[id_col], r[vec_col])
        for r in train.select(id_col, vec_col).collect()
    ]
    rows.sort(key=lambda t: t[0])
    dim = n_sub * sub_dim
    specs = [(s * sub_dim, sub_dim, k_codes) for s in range(n_sub)]
    specs.append((0, dim, n_lists))
    books = lloyd_np(rows, specs, n_iter)
    return books[-1], books[:-1]


def ivfpq_assign_encode(
    corpus: DataFrame, coarse, books, sub_dim: int,
    id_col: str = "vec_id", vec_col: str = "emb",
) -> DataFrame:
    """(id, list_id, code_0..code_{M-1}, recon_err) in ONE Arrow-batched
    numpy map pass over the corpus — the IVFADC encode. Bit-identical to
    the ivf_assign + pq_encode expression chain (pinned in
    tests/test_ivfpq.py): distances accumulate per-dimension in the same
    IEEE order, are rounded at 9 dp, and argmin takes the lowest id on
    ties. Partition-preserving: no shuffle, no join, at any corpus
    size — the kernel holds (batch × k) distance accumulators only."""
    import numpy as np

    coarse_rows = _centroid_rows(coarse)
    C = np.asarray([v for _, v in coarse_rows], dtype=np.float64)
    B = [
        np.asarray([cw for _, cw in book], dtype=np.float64) for book in books
    ]
    n_sub = len(B)
    dim = C.shape[1]

    def _argmin_r9(E, M):
        acc = np.zeros((len(E), len(M)), dtype=np.float64)
        for d in range(E.shape[1]):
            diff = E[:, d : d + 1] - M[:, d][None, :]
            acc += diff * diff
        r9 = _rnd9_np(acc)
        return np.argmin(r9, axis=1), np.min(r9, axis=1)

    out_schema = (
        f"`{id_col}` long, list_id long, "
        + ", ".join(f"code_{s} long" for s in range(n_sub))
        + ", recon_err double"
    )

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            assert E.shape[1] == dim
            cols = {id_col: pdf[id_col].to_numpy()}
            lists, _ = _argmin_r9(E, C)
            cols["list_id"] = lists.astype(np.int64)
            err = np.zeros(len(E), dtype=np.float64)
            for s in range(n_sub):
                sub = E[:, s * sub_dim : (s + 1) * sub_dim]
                codes, dmin = _argmin_r9(sub, B[s])
                cols[f"code_{s}"] = codes.astype(np.int64)
                err = err + dmin
            cols["recon_err"] = err
            yield pd.DataFrame(cols)

    return corpus.select(id_col, vec_col).mapInPandas(encode, out_schema)


def _ivfpq_probes(
    spark: SparkSession, queries: DataFrame, coarse, books,
    sub_dim: int, n_probe: int,
    query_id_col: str = "query_id", query_vec_col: str = "qemb",
) -> tuple[DataFrame, list[int], int]:
    """Collect the (bounded) query batch and build the probe table:
    one row per (query, probed list) carrying the query's FLATTENED
    M×K ADC lookup table (`dt[s*K + j]` = 9-dp-rounded squared-L2 from
    the query's subvector s to codeword j). Returns the probe frame and
    the distinct probed list ids (for partition-filter pushdown)."""
    import numpy as np

    coarse_rows = _centroid_rows(coarse)
    k_codes = len(books[0])
    schema = f"{query_id_col} long, list_id long, dt array<double>"
    qrows = queries.select(query_id_col, query_vec_col).collect()
    if not qrows:
        return spark.createDataFrame([], schema), [], k_codes
    # vectorized over the batch: at production sqrt-N sizing (1000+
    # lists) the old per-(query, centroid) pure-Python fold was its own
    # driver bottleneck — ~3M interpreter float ops for a 50-query
    # batch. The numpy form accumulates per-DIMENSION in the same IEEE
    # order as _sq_l2_py (the ivfpq_assign_encode kernel's rule), so
    # the 9-dp-rounded distances — and therefore probe sets and ADC
    # tables — are bit-identical to the scalar fold the oracle replays.
    Q = np.asarray(
        [[float(x) for x in q[query_vec_col]] for q in qrows],
        dtype=np.float64,
    )
    C = np.asarray([c for _, c in coarse_rows], dtype=np.float64)
    lids = np.asarray([lid for lid, _ in coarse_rows], dtype=np.int64)

    def _acc_r9(E, M):
        acc = np.zeros((len(E), len(M)), dtype=np.float64)
        for d in range(E.shape[1]):
            diff = E[:, d : d + 1] - M[:, d][None, :]
            acc += diff * diff
        return _rnd9_np(acc)

    cd = _acc_r9(Q, C)
    # per-query ADC lookup table, flattened s-major in codebook order
    dts = np.concatenate(
        [
            _acc_r9(
                Q[:, s * sub_dim : (s + 1) * sub_dim],
                np.asarray([cw for _, cw in book], dtype=np.float64),
            )
            for s, book in enumerate(books)
        ],
        axis=1,
    )
    rows = []
    probed: set[int] = set()
    for i, q in enumerate(qrows):
        # ascending (rounded distance, list_id) — the scalar sort's rule
        order = np.lexsort((lids, cd[i]))[:n_probe]
        dt = [float(x) for x in dts[i]]
        for j in order:
            lid = int(lids[j])
            probed.add(lid)
            rows.append((q[query_id_col], lid, dt))
    probes = one_partition_df(spark, rows, schema)
    return probes, sorted(probed), k_codes


def _lut_rank(
    pairs: DataFrame, n_sub: int, k_codes: int, k: int,
    id_col: str, query_id_col: str,
) -> DataFrame:
    """ADC scoring + per-query top-k over LUT-carrying pairs: the score is
    M lookups into the probe row's dt column summed left-to-right —
    identical values (and identical 6-dp ranking) to v14's per-pair fold,
    with no vector math in the scan."""
    adc = F.lit(0.0)
    for s in range(n_sub):
        adc = adc + F.element_at(
            F.col("dt"), (F.lit(s * k_codes) + F.col(f"code_{s}")).cast("int") + 1
        )
    scored = pairs.select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        adc.alias("adc"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc(rnd(F.col("adc"), 6)), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col, "neighbor_id", rnd("adc", 4).alias("adc_dist"), "rank"
        )
    )


def ivfpq_topk(
    corpus: DataFrame, queries: DataFrame,
    k: int = 5, n_lists: int = 16, n_probe: int = 4,
    n_sub: int = 8, k_codes: int = 16, sub_dim: int = 8, n_iter: int = 2,
    id_col: str = "vec_id", vec_col: str = "emb",
    query_id_col: str = "query_id", query_vec_col: str = "qemb",
    train: DataFrame | None = None,
) -> DataFrame:
    """IVF-pruned asymmetric-distance top-k over PQ codes.

    Driver-side joint Lloyd over ``train`` (a bounded sample — the
    production norm; catalog v16 passes a corpus-count-derived stride so
    the oracle replays the exact sample; defaults to the full corpus,
    guarded by the collect ceiling), then ONE numpy map pass assigns +
    encodes the full corpus, and the broadcast probe join touches only
    rows whose list_id is probed, scored via per-query ADC lookup
    tables. At scale the encoded table is written partitioned by list_id
    (:func:`write_ivfpq_index`) and the probe becomes a planning-time
    partition filter."""
    coarse, books = ivfpq_train_np(
        train if train is not None else corpus,
        n_lists, n_sub, k_codes, sub_dim, n_iter, id_col, vec_col,
    )
    enc = ivfpq_assign_encode(
        corpus, coarse, books, sub_dim, id_col=id_col, vec_col=vec_col
    )
    probes, _probed_ids, _ = _ivfpq_probes(
        corpus.sparkSession, queries, coarse, books, sub_dim, n_probe,
        query_id_col, query_vec_col,
    )
    # The broadcast hash join on list_id IS the in-memory prune: an
    # unprobed row misses the build table map-side and is dropped in the
    # same stage that computed its codes (which must be computed anyway —
    # v13's unavoidable pass), so only probed-list candidates reach the
    # rank. Against a PERSISTED index the probed-list set additionally
    # prunes the SCAN itself — probe_ivfpq_index applies it as a
    # planning-time partition filter over the code files.
    pairs = (
        F.broadcast(probes).join(enc, "list_id")
        .filter(F.col(query_id_col) != F.col(id_col))
    )
    return _lut_rank(pairs, len(books), k_codes, k, id_col, query_id_col)


def write_ivfpq_index(
    corpus: DataFrame, path: str,
    n_lists: int = 16, n_sub: int = 8, k_codes: int = 16, sub_dim: int = 8,
    n_iter: int = 2, id_col: str = "vec_id", vec_col: str = "emb",
    train: DataFrame | None = None,
):
    """Train + encode + write the IVFADC index: PQ codes partitioned by
    ``list_id`` (64×-compressed — raw vectors are NOT stored), coarse
    centroids at ``{path}/_centroids``, subspace codebooks at
    ``{path}/_codebooks``. ``train`` optionally samples the Lloyd input
    (see :func:`ivfpq_topk`). Returns ``(coarse_rows, books)``."""
    spark = corpus.sparkSession
    coarse, books = ivfpq_train_np(
        train if train is not None else corpus,
        n_lists, n_sub, k_codes, sub_dim, n_iter, id_col, vec_col,
    )
    enc = ivfpq_assign_encode(
        corpus, coarse, books, sub_dim, id_col=id_col, vec_col=vec_col
    )
    # co-locate each list before the partitioned write: without it every
    # write task spans every list directory, so the file count is
    # n_tasks × n_lists (32k files at production sqrt-N sizing, 1000
    # lists) and probes pay the listing; one hash exchange on list_id
    # caps it at ~one file per list — the layout the probe's partition
    # pruning is priced for
    enc.repartition(F.col("list_id")).write.mode("overwrite").partitionBy(
        "list_id"
    ).parquet(path)
    one_partition_df(
        spark, coarse, "list_id long, centroid array<double>"
    ).write.mode("overwrite").parquet(f"{path}/_centroids")
    one_partition_df(
        spark,
        [(s, lid, cw) for s, book in enumerate(books) for lid, cw in book],
        "s int, list_id long, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/_codebooks")
    return coarse, books


def read_ivfpq_codebooks(
    spark: SparkSession, path: str
) -> list[list[tuple[int, list[float]]]]:
    """The ``_codebooks`` side table back as the driver-side books list
    (M × K × sub_dim doubles — tiny)."""
    rows = spark.read.parquet(f"{path}/_codebooks").collect()
    by_s: dict[int, list[tuple[int, list[float]]]] = {}
    for r in rows:
        by_s.setdefault(int(r["s"]), []).append(
            (int(r["list_id"]), [float(x) for x in r["centroid"]])
        )
    return [sorted(by_s[s]) for s in sorted(by_s)]


def probe_ivfpq_index(
    spark: SparkSession, path: str, queries: DataFrame,
    k: int = 5, n_probe: int = 4,
    id_col: str = "vec_id",
    query_id_col: str = "query_id", query_vec_col: str = "qemb",
) -> DataFrame:
    """ADC top-k over a persisted IVFADC index. The probed list ids are
    collected (tiny) and applied as a LITERAL ``isin`` filter, so the
    code-table scan partition-prunes at planning time — a probe reads
    n_probe/n_lists of the compressed files, never the corpus (pinned in
    tests/test_ivfpq.py)."""
    if not _dir_has_parquet(spark, path):
        return spark.createDataFrame(
            [],
            f"{query_id_col} long, neighbor_id long, adc_dist double, "
            "rank int",
        )
    coarse = _centroid_rows(spark.read.parquet(f"{path}/_centroids"))
    books = read_ivfpq_codebooks(spark, path)
    sub_dim = len(books[0][0][1])
    probes, probed_ids, k_codes = _ivfpq_probes(
        spark, queries, coarse, books, sub_dim, n_probe,
        query_id_col, query_vec_col,
    )
    index = spark.read.parquet(path).filter(F.col("list_id").isin(probed_ids))
    pairs = (
        F.broadcast(probes).join(index, "list_id")
        .filter(F.col(query_id_col) != F.col(id_col))
    )
    return _lut_rank(pairs, len(books), k_codes, k, id_col, query_id_col)
