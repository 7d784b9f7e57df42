"""Hilbert-curve multi-dimensional clustering — the locality upgrade
over Z-order.

``operators/zorder.py`` supplies the Morton layout the reference's
``OPTIMIZE ... ZORDER BY`` implies (TABLE OPTIMIZATION.py:33-36). The
Hilbert curve is the strictly-better space-filling order for the same
job (it is what Databricks liquid clustering moved to): consecutive
curve positions are ALWAYS adjacent cells (Manhattan distance 1), so a
file covering a run of curve positions covers one compact blob of key
space — Morton's worst-case "jump across the plane" seams, where a
file's min/max box spans half the domain, cannot happen.

Implementation: the classic per-bit fold (MSB→LSB; quadrant digit
``s²·((3·rx) xor ry)`` then reflect/swap rotation) expressed as ONE
``aggregate()`` higher-order function over ``sequence(order-1, 0, -1)``
with a (x, y, d) struct accumulator. A column-per-step unrolling would
be collapsed by CollapseProject into an exponentially-replicated
expression tree (each step reads the previous x/y 2-3 times — the
bloom-probe lesson, operators/bloom.py); the fold keeps the whole
transform a single fixed-size expression evaluated order times per row,
JVM-side, no UDF. The reflection is masked to the live low bits
(``(s-1-v) & (s-1)``), which leaves the already-consumed high bits
dirty but never re-read — both engines replay the identical arithmetic.

The XOR is spelled as a 4-way CASE on (rx, ry) so the oracle never
depends on engine bitwise-operator spelling (DuckDB's ``^`` is
exponentiation).

Scale: like Z-order, computing the key is one projection; the layout
job is the same single repartitionByRange + in-partition sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HBITS = 10  # bits per dimension -> 20-bit curve positions


def hilbert_expr(x: str, y: str, *, order: int = HBITS) -> str:
    """Spark SQL expression for the Hilbert curve position of two
    integer expressions (low ``order`` bits each; callers quantize
    wider domains first)."""
    rx = "((shiftright(acc.x, i)) & 1)"
    ry = "((shiftright(acc.y, i)) & 1)"
    mask = "(shiftleft(cast(1 as bigint), i) - 1)"
    digit = (
        f"CASE WHEN {rx} = 1 AND {ry} = 1 THEN 2 "
        f"WHEN {rx} = 1 THEN 3 WHEN {ry} = 1 THEN 1 ELSE 0 END"
    )
    new_x = (
        f"CASE WHEN {ry} = 1 THEN acc.x "
        f"WHEN {rx} = 1 THEN ({mask} - acc.y) & {mask} "
        f"ELSE acc.y & {mask} END"
    )
    new_y = (
        f"CASE WHEN {ry} = 1 THEN acc.y "
        f"WHEN {rx} = 1 THEN ({mask} - acc.x) & {mask} "
        f"ELSE acc.x & {mask} END"
    )
    return (
        f"aggregate(sequence({order - 1}, 0, -1), "
        f"named_struct("
        f"'x', cast(({x}) as bigint) & (shiftleft(cast(1 as bigint), {order}) - 1), "
        f"'y', cast(({y}) as bigint) & (shiftleft(cast(1 as bigint), {order}) - 1), "
        f"'d', cast(0 as bigint)), "
        f"(acc, i) -> named_struct("
        f"'x', cast({new_x} as bigint), "
        f"'y', cast({new_y} as bigint), "
        f"'d', acc.d + shiftleft(cast(1 as bigint), 2 * i) * ({digit})), "
        f"acc -> acc.d)"
    )


def hilbert_value(x: str, y: str, *, order: int = HBITS) -> Column:
    return F.expr(hilbert_expr(x, y, order=order)).cast("long")


def hilbert_py(x: int, y: int, *, order: int = HBITS) -> int:
    """Driver-side reference (tests + file-layout planning): identical
    per-bit fold as the SQL expression."""
    x &= (1 << order) - 1
    y &= (1 << order) - 1
    d = 0
    for i in range(order - 1, -1, -1):
        rx = (x >> i) & 1
        ry = (y >> i) & 1
        d += (1 << (2 * i)) * ((3 * rx) ^ ry)
        mask = (1 << i) - 1
        if ry == 0:
            if rx == 1:
                x, y = (mask - y) & mask, (mask - x) & mask
            else:
                x, y = y & mask, x & mask
    return d


def cluster_by_hilbert(
    df: DataFrame,
    cols: Sequence[str],
    *,
    num_partitions: int,
    order: int = HBITS,
) -> DataFrame:
    """Lay ``df`` out along the Hilbert curve of two integer key
    columns: one range shuffle on the curve position + an in-partition
    sort, so each output file covers one compact blob of
    (cols[0], cols[1]) space and parquet min/max stats prune on either
    key — with strictly tighter per-file boxes than the Morton layout."""
    if len(cols) != 2:
        raise ValueError("hilbert clustering takes exactly two key columns")
    h = hilbert_value(cols[0], cols[1], order=order)
    return (
        df.withColumn("__h", h)
        .repartitionByRange(num_partitions, "__h")
        .sortWithinPartitions("__h")
        .drop("__h")
    )
