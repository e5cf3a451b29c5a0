"""Deterministic sampling, stratification, and train/val/test splitting.

Training-data pipelines need sampling that is (a) reproducible across
runs and engines — no ``rand()`` — and (b) stable under repartitioning:
membership must be a pure function of the row key. The uniform variate
here is md5-derived (first 8 hex digits / 2^32), identical in any engine,
so every operator is DuckDB-oracle-checkable and a re-run (or a different
cluster) selects the exact same rows.

Scale shape: all of it is a map-side filter/projection — zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TWO32 = 4294967296.0


def hash_uniform(key: Column, salt: str = "") -> Column:
    """Deterministic U[0,1) from a key column (md5 counter-free variant)."""
    h = F.md5(F.concat(F.lit(salt), F.lit(":"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") / F.lit(_TWO32)


def hash_uniform_sql(key: str, salt: str = "") -> str:
    """The same variate as a DuckDB SQL fragment (oracle side)."""
    return (
        f"CAST('0x' || substr(md5('{salt}' || ':' || CAST({key} AS VARCHAR)), 1, 8) "
        f"AS BIGINT) / {_TWO32}"
    )


def bernoulli_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~fraction of rows, membership a pure function of the key."""
    return df.filter(hash_uniform(F.col(key_col), salt) < fraction)


def stratified_sample(
    df: DataFrame, strata_col: str, key_col: str,
    fractions: dict[str, float], default: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum sampling rates (data mixing): e.g. keep 100% of wiki,
    10% of web crawl. Unlisted strata get ``default``."""
    rate = F.lit(default)
    for stratum, f_ in fractions.items():
        rate = F.when(F.col(strata_col) == stratum, F.lit(f_)).otherwise(rate)
    return df.filter(hash_uniform(F.col(key_col), salt) < rate)


def split_column(
    key: Column, val_frac: float = 0.05, test_frac: float = 0.05,
    salt: str = "split",
) -> Column:
    """'train' / 'val' / 'test' label, disjoint and exhaustive, stable
    under any repartitioning or re-run."""
    u = hash_uniform(key, salt)
    return (
        F.when(u < test_frac, F.lit("test"))
        .when(u < test_frac + val_frac, F.lit("val"))
        .otherwise(F.lit("train"))
    )
