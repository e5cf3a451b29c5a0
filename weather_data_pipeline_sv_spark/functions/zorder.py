"""Z-order (Morton) interleaving as pure Catalyst expressions.

Sorting a table by (lat, lon) lexicographically clusters files on lat
only: every file spans the full lon range, so min/max footer stats prune
nothing for a lon predicate. Interleaving the bits of both dimensions
into one sort key gives every file a narrow range in EVERY participating
column — the layout trick behind Delta/Iceberg OPTIMIZE ZORDER — which
makes parquet row-group/file skipping effective for multi-dimensional
predicates (the reference's spatial workload: bbox filters
`stations.py:26-37`, radius joins `aggregation.py:105-109`).

Everything here is shiftleft/shiftright/bitwiseOR over longs — JVM-side,
codegen-friendly, no UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize(c: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a numeric column into integer cells [0, 2^bits) over [lo, hi],
    clamping out-of-range values. Range endpoints are caller-supplied
    constants (domain knowledge like lat ∈ [-90, 90]) so the expression
    stays deterministic and driver-free."""
    cells = (1 << bits) - 1
    scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo)) * cells
    return F.least(
        F.greatest(scaled.cast("long"), F.lit(0).cast("long")),
        F.lit(cells).cast("long"),
    )


def zorder_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of the given pre-quantized integer
    columns into one Morton key (col i contributes bit positions
    ``b * len(cols) + i``). 2 cols × 16 bits fits comfortably in a long."""
    if len(cols) * bits > 63:
        raise ValueError("zorder_key: len(cols) * bits must be <= 63")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
    return z
