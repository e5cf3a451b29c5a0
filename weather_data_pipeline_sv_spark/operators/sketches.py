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
    null)."""
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
