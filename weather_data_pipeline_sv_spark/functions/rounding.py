"""Engine-portable rounding.

``round(x, n)`` differs between engines at representation boundaries:
Spark rounds HALF_UP on the decimal string of the double, DuckDB rounds on
the binary value (36.36625 → 36.3663 vs 36.3662). For oracle parity every
user-facing rounding in this repo uses ``floor(x * 10^n + 0.5) / 10^n``
instead — all ops are IEEE-754 double primitives that evaluate
bitwise-identically in any engine, so Spark and the DuckDB oracle can never
disagree on the same input double.

A second failure mode remains: parallel aggregation makes the *input*
itself differ by a few ULPs between engines, and real data (2-decimal
measures averaged over 2^k rows) lands exactly on .5 boundaries, where a
1-ULP difference flips the floor. The ``+ 1e-6`` bias (in the scaled
domain) fixes the boundary side deterministically: it dwarfs accumulated
FP noise (~1e-9) yet is far below the decimal resolution of any value
being rounded, so non-boundary results are unaffected.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(c: Column | str, n: int = 4) -> Column:
    """Deterministic half-up rounding to ``n`` decimals (Spark side)."""
    if isinstance(c, str):
        c = F.col(c)
    f = float(10**n)
    return F.floor(c * f + 0.5 + 1e-6) / f


def rnd_sql(expr: str, n: int = 4) -> str:
    """The same rounding as ``rnd`` as a SQL fragment (oracle side)."""
    f = 10**n
    return f"floor(({expr}) * {f}.0 + 0.5 + 1e-6) / {f}.0"
