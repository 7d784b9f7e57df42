"""Z-order (Morton) multi-dimensional clustering — real ZORDER semantics.

The reference's table maintenance runs Delta ``OPTIMIZE ... ZORDER BY
(a, b)`` (TABLE OPTIMIZATION.py:33-36): rows are laid out along a
space-filling curve so parquet row-group min/max stats prune scans on
EITHER key, not just the leading one. ``pipeline/maintenance.compact``'s
range+sort layout clusters only the sort-key prefix; this module supplies
the genuine article: a Morton code built by bit-interleaving the
(quantized) key columns, used as the single range-partition/sort key.

The interleave is the classic mask-spread (each step doubles the gap
between occupied bits): for 16-bit inputs,

    x = (x | x<<8) & 0x00FF00FF; (x | x<<4) & 0x0F0F0F0F;
    (x | x<<2) & 0x33333333;     (x | x<<1) & 0x55555555

then z = spread(a) | (spread(b) << 1). Everything is 64-bit integer
shifts/masks — identical in Spark SQL and DuckDB, so z-values are
oracle-checkable bit-for-bit, and the operator stays inside whole-stage
codegen (no UDF).

Scale: computing z adds one projection to the rewrite; the layout job is
the same single repartitionByRange shuffle the 1-D path uses. Locality is
the point — a query filtering either dimension touches O(sqrt(files))
instead of all of them (Morton curves bound each file to a small
hyper-rectangle of the key space).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits kept per dimension (2 dims -> 32-bit z-values)

_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_expr(x: str) -> str:
    """SQL for the 16->32 bit spread (valid in Spark SQL and DuckDB)."""
    e = f"(({x}) & {(1 << ZBITS) - 1})"
    for shift, mask in _SPREAD_STEPS:
        e = f"((({e} | ({e} << {shift})) & {mask}))"
    return e


def zvalue_expr(a: str, b: str) -> str:
    """SQL expression string for the Morton code of two integer columns
    (low ZBITS bits of each; callers quantize wider domains first)."""
    return f"({_spread_expr(a)} | ({_spread_expr(b)} << 1))"


def zvalue(a: str, b: str) -> Column:
    return F.expr(zvalue_expr(a, b)).cast("long")


def cluster_by_zorder(
    df: DataFrame,
    cols: Sequence[str],
    *,
    num_partitions: int,
) -> DataFrame:
    """Lay ``df`` out along the Morton curve of two integer key columns:
    one range shuffle on z + an in-partition sort, so each output file
    covers a compact rectangle of (cols[0], cols[1]) space and parquet
    min/max stats prune on either key."""
    if len(cols) != 2:
        raise ValueError("z-order clustering takes exactly two key columns")
    z = zvalue(f"cast({cols[0]} as bigint)", f"cast({cols[1]} as bigint)")
    return (
        df.withColumn("__z", z)
        .repartitionByRange(num_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
