"""Morton (Z-order) keys: multi-dimensional clustering for data skipping.

Sorting a table by ONE column gives perfect min/max pruning on that column
and none on any other; interleaving the bits of two bucketed dimensions
into a Morton key and sorting by it gives useful pruning on BOTH — the
locality property behind Delta/Iceberg Z-ordering (`OPTIMIZE ... ZORDER
BY`), applied here to plain parquet: sort-by-zkey before write, then
row-group min/max stats skip on either dimension
(`pipeline/maintenance.py` does the single-column range form; this is the
multi-column upgrade).

Pure integer bit arithmetic — shift/and/or over non-negative bucket ids —
so the key is engine-exact by construction (same discipline as the bloom
bitmap): bit b of x lands at 2b, bit b of y at 2b+1.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_key(x: Column, y: Column, *, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative ints into a Z-order
    key (a long in [0, 4^bits)). Callers bucket raw values first —
    integer keys via ``% 2^bits`` or ``pmod``, continuous values via a
    fixed affine grid."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    out = None
    for b in range(bits):
        xb = F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
        yb = F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        out = xb.bitwiseOR(yb) if out is None else out.bitwiseOR(xb).bitwiseOR(yb)
    return out.cast("long")


def morton_sql(x: str, y: str, *, bits: int = 16) -> str:
    """The identical key as a DuckDB SQL expression (oracle mirror)."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return "CAST((" + " | ".join(terms) + ") AS BIGINT)"
