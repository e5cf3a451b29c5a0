"""Deterministic, engine-mirrored cardinality sketches (HyperLogLog).

Why: per-group distinct counts (vocabulary size per source, unique users
per day) are a profiling staple, but exact ``count(distinct x)`` shuffles
every distinct value — at 100 TB the distinct-word table alone is
hundreds of millions of rows per group. Spark's builtin
``approx_count_distinct`` IS an HLL, but its hash (xxhash64-based) and
register layout are engine-private: nothing can oracle-check it, and a
DuckDB/Trino consumer re-estimating the same data gets a different
number. This module builds HLL (Flajolet et al. 2007) from the repo's
standard md5-derived 32-bit hash, so the SAME estimate — bit-for-bit
registers, 6-dp-rounded estimate — is reproducible in any engine with
md5 and bin(), and the DuckDB oracle hash-checks it end to end.

Register math is integer/dyadic on both sides, so no float drift can
touch the registers:
- h       = first 8 md5 hex digits as uint32 (the hash_uniform family);
- reg     = h >> (32 - p)                      (top p bits);
- rho     = (32 - p) - bit_length(tail) + 1    (leading-zero rank in the
            remaining bits; bit_length via length(bin(tail)) — bin()
            strips leading zeros in both engines; empty tail -> 33 - p);
- per (group, reg): MAX(rho) — a partial-aggregating shuffle whose key
  space is groups x m registers, BOUNDED BY DESIGN, never by data;
- estimate: alpha_m * m^2 / (sum 2^-rho + zero registers), with the
  standard small-range linear-counting correction m*ln(m/V). The 2^-rho
  terms are dyadic rationals (exact in double, summation-order-free);
  only the final division/ln are floats, rounded at 6 dp on both
  engines (the t10/t15 ln precedent).

Shuffle inventory: one partial-agg shuffle on (group, reg) carrying one
combined row per key — max(rho) combines map-side — then a tiny
per-group fold. Nothing scales with distinct count. Mergeability is the
HLL property itself: registers from disjoint partitions/stores combine
by element-wise max (tested), the sketch a 1000-executor rollup ships.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import rnd


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_register(item: Column, p: int) -> tuple[Column, Column]:
    """(register index, rho) for one item — integer-only math."""
    h = F.conv(F.substring(F.md5(item.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    tail_bits = 32 - p
    reg = F.shiftright(h, tail_bits)
    tail = h.bitwiseAND(F.lit((1 << tail_bits) - 1))
    bitlen = F.when(tail > 0, F.length(F.bin(tail))).otherwise(F.lit(0))
    rho = F.lit(tail_bits) - bitlen + F.lit(1)
    return reg, rho


def hll_registers(
    df: DataFrame, group_cols: list[str], item_col: str, p: int = 10
) -> DataFrame:
    """(group..., reg, rho) register table — max(rho) per (group, reg).
    This IS the sketch: mergeable across any partitioning by max.

    NULL items are excluded, matching ``count(distinct x)`` (which
    ignores NULLs) — without the filter, md5(NULL) rides through as a
    phantom (reg=NULL, rho=tail_bits+1) register row that inflates the
    estimate of every group containing a NULL. Consequence: a group
    whose items are ALL NULL has no registers and therefore NO ROW in
    the sketch or estimate output (where ``count(distinct)`` over a
    grouped query would emit a 0) — left-join against your group table
    if zero-rows matter."""
    reg, rho = hll_register(F.col(item_col), p)
    return (
        df.filter(F.col(item_col).isNotNull())
        .select(*group_cols, reg.alias("reg"), rho.alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str], p: int = 10
) -> DataFrame:
    """Fold a register table to (group..., est_distinct)."""
    m = 1 << p
    alpha = _alpha(m)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    zeros = F.lit(m) - F.col("n_present")
    raw = F.lit(alpha * m * m) / (F.col("s_present") + zeros.cast("double"))
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(*group_cols, rnd(est, 6).alias("est_distinct"))


def hll_distinct(
    df: DataFrame, group_cols: list[str], item_col: str, p: int = 10
) -> DataFrame:
    """Per-group HLL distinct estimate, one expression chain end to end."""
    return hll_estimate(
        hll_registers(df, group_cols, item_col, p), group_cols, p
    )


def hll_error_bound(p: int = 10) -> float:
    """Standard error of the estimate: 1.04 / sqrt(m)."""
    return 1.04 / math.sqrt(1 << p)


def duck_hll_sql(
    source_sql: str, group_cols: list[str], item_expr: str, p: int = 10
) -> str:
    """The identical estimate as a DuckDB CTE chain (oracle side).
    ``source_sql`` must be a relation exposing group_cols + item_expr."""
    m = 1 << p
    alpha = _alpha(m)
    tail_bits = 32 - p
    mask = (1 << tail_bits) - 1
    gcols = ", ".join(group_cols)
    return f"""
    hll_h AS (
      SELECT {gcols},
             CAST('0x' || substr(md5(CAST({item_expr} AS VARCHAR)), 1, 8)
                  AS BIGINT) AS h
      FROM ({source_sql}) WHERE {item_expr} IS NOT NULL
    ),
    hll_reg AS (
      SELECT {gcols}, h >> {tail_bits} AS reg,
             {tail_bits} - CASE WHEN (h & {mask}) > 0
                                THEN length(bin(h & {mask}))
                                ELSE 0 END + 1 AS rho
      FROM hll_h
    ),
    hll_max AS (
      SELECT {gcols}, reg, max(rho) AS rho FROM hll_reg
      GROUP BY {gcols}, reg
    ),
    hll_agg AS (
      SELECT {gcols}, sum(pow(2.0, -rho)) AS s_present,
             CAST(count(*) AS BIGINT) AS n_present
      FROM hll_max GROUP BY {gcols}
    ),
    hll_est AS (
      SELECT {gcols},
             CASE WHEN ({alpha!r}::DOUBLE * {m} * {m}
                        / (s_present + ({m} - n_present))) <= {2.5 * m}
                       AND ({m} - n_present) > 0
                  THEN {m}.0 * ln({m}.0 / ({m} - n_present))
                  ELSE {alpha!r}::DOUBLE * {m} * {m}
                       / (s_present + ({m} - n_present))
             END AS est
      FROM hll_agg
    )"""


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — frequency estimation
# with state bounded at depth x width counters regardless of distinct
# count, the heavy-hitter companion to the HLL above. Same determinism
# rule: row hashes are md5-derived with per-row salts, so the counter
# table and every estimate are bit-identical in any engine (pure integer
# math — no float anywhere). Overcount-only guarantee: est >= exact
# always; est <= exact + eps*N with prob 1-delta for width = e/eps,
# depth = ln(1/delta).
#
# Shuffle inventory: building the table is one partial-agg shuffle on
# (row, bucket) — key space depth x width BY DESIGN; lookups broadcast
# the (tiny) probe set against the table.
# ---------------------------------------------------------------------------


def _cms_bucket(salt_col: Column, item: Column, width: int) -> Column:
    h = F.conv(
        F.substring(
            F.md5(F.concat(salt_col, F.lit(":"), item.cast("string"))),
            1, 8,
        ), 16, 10,
    ).cast("bigint")
    return h % width


def cms_table(
    df: DataFrame, item_col: str,
    depth: int = 4, width: int = 256, salt: str = "cms",
) -> DataFrame:
    """(s, b, c): counter table — each item increments one bucket per
    hash row. depth x width rows max, mergeable across partitions/
    stores by (s, b) SUM (the linear-sketch property)."""
    salts = F.array(*[F.lit(f"{salt}{i}") for i in range(depth)])
    e = df.select(
        F.col(item_col).alias("__item"), F.explode(salts).alias("s")
    )
    return (
        e.select(
            "s", _cms_bucket(F.col("s"), F.col("__item"), width).alias("b")
        )
        .groupBy("s", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        # stamp the build parameters into the counter column's metadata
        # (survives parquet round-trips — Spark stores field metadata in
        # the file schema): cms_estimate asserts agreement, because a
        # width/salt mismatch silently misses every bucket, coalesces to
        # 0, and violates the documented est >= exact guarantee
        .withColumn(
            "c",
            F.col("c").alias(
                "c",
                metadata={
                    "cms_depth": depth, "cms_width": width,
                    "cms_salt": salt,
                },
            ),
        )
    )


def cms_estimate(
    cms: DataFrame, probes: DataFrame, item_col: str,
    depth: int = 4, width: int = 256, salt: str = "cms",
) -> DataFrame:
    """Point-query the sketch for each probe item: est = min over the
    depth rows of that item's bucket counter. The COUNTER TABLE is the
    broadcast side — bounded at depth x width rows by design; hinting
    the probes instead would be silently ignored, because the preserved
    (left) side of a left-outer join can never be the hash build side.
    Missing buckets count 0 (an item never seen estimates 0, not
    null).

    The (depth, width, salt) triple MUST match the one ``cms_table``
    built with; when the sketch carries its build parameters (column
    metadata on ``c``, stamped by cms_table and preserved by parquet),
    a mismatch raises instead of silently estimating 0 for every probe.
    A hand-built sketch without metadata skips the check."""
    try:
        meta = dict(cms.schema["c"].metadata or {})
    except Exception:  # no 'c' column / exotic schema — let the join fail
        meta = {}
    if "cms_width" in meta:
        built = (
            int(meta.get("cms_depth", depth)),
            int(meta.get("cms_width", width)),
            meta.get("cms_salt", salt),
        )
        if built != (depth, width, salt):
            raise ValueError(
                f"cms_estimate called with (depth={depth}, width={width}, "
                f"salt={salt!r}) but the sketch was built with "
                f"(depth={built[0]}, width={built[1]}, salt={built[2]!r})"
                " — estimates would miss every bucket and read 0"
            )
    salts = F.array(*[F.lit(f"{salt}{i}") for i in range(depth)])
    pe = probes.select(
        F.col(item_col), F.explode(salts).alias("s")
    ).withColumn("b", _cms_bucket(F.col("s"), F.col(item_col), width))
    joined = pe.join(F.broadcast(cms), ["s", "b"], "left")
    return (
        joined.groupBy(item_col)
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0)))
            .cast("bigint")
            .alias("cms_est")
        )
    )


def duck_cms_sql(
    source_sql: str, item_expr: str,
    depth: int = 4, width: int = 256, salt: str = "cms",
) -> str:
    """The identical sketch as DuckDB CTEs (oracle side): exposes
    ``cms_salts(s)``, ``cms(s, b, c)``; estimates are composed by the
    caller via the same md5-mod bucket expression."""
    salt_list = ", ".join(f"'{salt}{i}'" for i in range(depth))
    return f"""
    cms_salts AS (SELECT unnest([{salt_list}]) AS s),
    cms AS (
      SELECT s,
             CAST('0x' || substr(md5(s || ':' ||
                  CAST({item_expr} AS VARCHAR)), 1, 8) AS BIGINT)
               % {width} AS b,
             CAST(count(*) AS BIGINT) AS c
      FROM ({source_sql}) CROSS JOIN cms_salts
      GROUP BY 1, 2
    )"""


# ---------------------------------------------------------------------------
# Bottom-k (KMV-style) quantile sketch — the mergeable RANK summary that
# completes the profiling family (HLL = distinct, CMS = frequency,
# this = quantiles). a18's value-grid histogram needs a bounded value
# domain; this covers continuous domains with state k per group.
#
# Why bottom-k and not KLL/t-digest: their compactions depend on
# insertion order, which Spark's partial aggregation does not fix and a
# SQL oracle cannot replay — the repo's determinism contract (identical
# sketch in any engine, merge-across-slices hash-provable) requires the
# sketch to be a pure MULTISET function. Bottom-k is exactly that member
# of the mergeable-summaries family (Agarwal et al., PODS 2012): keep
# the k rows with the smallest md5 variate per group; the kept set is a
# uniform without-replacement sample, so the sample's empirical quantile
# estimates the population quantile with error O(sqrt(q(1-q)/k)), and
#
#   bottomk(A ∪ B) == bottomk(bottomk(A) ∪ bottomk(B))
#
# EXACTLY (associative, idempotent under duplicate-row dedup) — the
# 1000-executor rollup property, hash-proven like t20's HLL theorem.
#
# Shuffle inventory: build = one per-group top-k window (rows carry
# (u, id, v) — combine happens in the sort spill, state k per group);
# merge = same window over the unioned sketches; estimate = one window
# + a broadcast join against a groups x |qs| target-rank table.
# Everything below the variate is engine-portable integer/choice math:
# the estimate is an actual data value, never an interpolation.
# ---------------------------------------------------------------------------
from pyspark.sql import Window  # noqa: E402


def _qsk_u(id_col: Column, salt: str) -> Column:
    """Exact-integer md5 variate (the hash_uniform family, undivided)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.lit(":"), id_col.cast("string"))),
            1, 8,
        ), 16, 10,
    ).cast("bigint")


def qsketch(
    df: DataFrame, group_cols: list[str], value_col: str, id_col: str,
    k: int = 128, salt: str = "qsk",
) -> DataFrame:
    """(group..., qsk_u, qsk_id, qsk_v): the k rows with the smallest
    (variate, id) per group. Null values are excluded (rank semantics
    over present values, the percentile_cont convention)."""
    w = Window.partitionBy(*group_cols).orderBy("qsk_u", "qsk_id")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            _qsk_u(F.col(id_col), salt).alias("qsk_u"),
            F.col(id_col).cast("string").alias("qsk_id"),
            F.col(value_col).alias("qsk_v"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def qsketch_merge(
    sketches: list[DataFrame], group_cols: list[str], k: int = 128
) -> DataFrame:
    """Combine per-slice sketches: union -> dedup identical rows (so a
    re-merged slice is idempotent) -> re-select bottom-k. Associativity
    makes merged == one-shot on disjoint slices — the rollup theorem
    the t22 oracle hash-proves.

    Contract: ``qsk_id`` must uniquely key ROWS across all slices — it
    is the variate source, so two DIFFERENT values under one id have
    the same rank key and no deterministic order exists (in the merge
    OR in a one-shot sketch over such data). Dedup is by the FULL row,
    so replayed identical rows collapse while a contract violation
    surfaces as duplicate-id rows rather than an arbitrary winner."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    w = Window.partitionBy(*group_cols).orderBy("qsk_u", "qsk_id")
    return (
        u.dropDuplicates([*group_cols, "qsk_u", "qsk_id", "qsk_v"])
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def sample_quantiles(
    df: DataFrame, group_cols: list[str], qs: list[float],
    value_col: str = "qsk_v", id_col: str = "qsk_id",
) -> DataFrame:
    """Empirical lower quantiles of (group, value) rows: for each q,
    the value at 0-based index floor(q * (m - 1)) in (value, id) order —
    an ACTUAL data value (no interpolation, so cross-engine
    bit-parity), computed for a sketch or, identically, for the full
    table (the exact side of t21's error column). The target-rank table
    is groups x |qs| — broadcast; the join key includes the rank, so
    there is no fan-out."""
    wg = Window.partitionBy(*group_cols)
    ranked = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, value_col, id_col)
        .withColumn(
            "__rn", F.row_number().over(wg.orderBy(value_col, id_col))
        )
        .withColumn("__m", F.count(F.lit(1)).over(wg))
    )
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    targets = (
        ranked.select(*group_cols, "__m").distinct()
        .select(*group_cols, "__m", F.explode(qarr).alias("q"))
        .withColumn(
            "__target",
            (F.floor(F.col("q") * (F.col("__m") - 1)) + 1).cast("int"),
        )
        # rename the group keys: targets derives from ranked, and a join
        # between the two is otherwise an ambiguous self-join
        .select(
            *[F.col(c).alias(f"__t_{c}") for c in group_cols],
            "q", "__target",
        )
    )
    cond = [
        ranked[c].eqNullSafe(targets[f"__t_{c}"]) for c in group_cols
    ]
    cond.append(ranked["__rn"] == targets["__target"])
    return (
        ranked.join(F.broadcast(targets), cond)
        .select(
            *[ranked[c] for c in group_cols],
            targets["q"],
            ranked[value_col].alias("est"),
        )
    )


def duck_qsk_sql(
    source_sql: str, group_cols: list[str], value_expr: str,
    id_expr: str, k: int = 128, salt: str = "qsk", rel: str = "qsk",
) -> str:
    """The identical sketch as DuckDB CTEs (oracle side): exposes
    ``{rel}(group..., qsk_u, qsk_id, qsk_v)``."""
    g = ", ".join(group_cols)
    return f"""
    {rel}_all AS (
      SELECT {g},
             CAST('0x' || substr(md5('{salt}' || ':' ||
                  CAST({id_expr} AS VARCHAR)), 1, 8) AS BIGINT) AS qsk_u,
             CAST({id_expr} AS VARCHAR) AS qsk_id,
             {value_expr} AS qsk_v
      FROM ({source_sql}) WHERE {value_expr} IS NOT NULL
    ),
    {rel} AS (
      SELECT {g}, qsk_u, qsk_id, qsk_v FROM (
        SELECT *, row_number() OVER (
          PARTITION BY {g} ORDER BY qsk_u, qsk_id) AS rn
        FROM {rel}_all
      ) WHERE rn <= {k}
    )"""


def duck_quantile_sql(
    rel: str, group_cols: list[str], qs: list[float],
    value_col: str = "qsk_v", id_col: str = "qsk_id", out: str = "qest",
) -> str:
    """Quantile-estimate CTEs over any (group, value, id) relation —
    the exact mirror of :func:`sample_quantiles`."""
    g = ", ".join(group_cols)
    q_list = ", ".join(repr(float(q)) for q in qs)
    join_g = " AND ".join(
        f"r.{c} IS NOT DISTINCT FROM t.{c}" for c in group_cols
    )
    return f"""
    {out}_rank AS (
      SELECT {g}, {value_col}, {id_col},
             row_number() OVER (
               PARTITION BY {g} ORDER BY {value_col}, {id_col}) AS rn,
             count(*) OVER (PARTITION BY {g}) AS m
      FROM {rel} WHERE {value_col} IS NOT NULL
    ),
    {out}_t AS (
      SELECT {g}, q,
             CAST(floor(q * (m - 1)) AS BIGINT) + 1 AS target
      FROM (SELECT DISTINCT {g}, m FROM {out}_rank),
           -- DOUBLE, not DECIMAL: floor(q*(m-1)) in decimal arithmetic
           -- is exact (0.3*10 = 3.0 -> floor 3) where double gives
           -- 2.999... -> floor 2 — the cast keeps both engines on the
           -- SAME IEEE math
           (SELECT unnest([{q_list}]::DOUBLE[]) AS q)
    ),
    {out} AS (
      SELECT {', '.join(f'r.{c}' for c in group_cols)}, t.q,
             r.{value_col} AS est
      FROM {out}_rank r JOIN {out}_t t
        ON {join_g} AND r.rn = t.target
    )"""
