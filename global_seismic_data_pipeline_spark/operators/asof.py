"""As-of (point-in-time) join — each left row matched to the latest right
row at or before its timestamp, per key.

The reference has no as-of join; this is a §7-step-9 extension operator in
the time-series family its watermark/CDC model implies. Spark lacks a
native ASOF JOIN (DuckDB has one — the oracle uses it), so the operator is
expressed as the classic union + windowed last-value composition:

1. tag right rows (is_right=1) and left rows (is_right=0),
2. union on (key, time), sort within key by (time, is_right DESC) so a
   right row at time T sorts BEFORE a left row at the same T (ties match),
3. running ``last_value(right payload) IGNORE NULLS`` over the union gives
   every left row the most recent right payload at-or-before it.

Scale notes: ONE shuffle on the key (both inputs co-partition), then a
per-key sorted window — the same cost class as a sort-merge join, with no
range-condition explosion. Skewed keys behave like any window: partition
size = rows per key. This beats the naive range-join formulation
(left.time >= right.time, pick max) which Catalyst plans as a quadratic
theta-join per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: all left columns + the latest right ``value_cols``
    (renamed with ``suffix``) at-or-before ``left_time`` per ``on`` key.

    Left rows with no prior right row keep nulls (left-outer semantics).
    """
    on = list(on)
    # the right payload travels as ONE struct: the struct is non-null for
    # every right row even when its FIELDS are null, so last(ignorenulls)
    # tracks "latest right ROW" — a genuine NULL payload value from the
    # latest right row is preserved, not skipped for an older non-null one
    payload = F.struct(*[F.col(c).alias(c) for c in value_cols])
    rt = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__is_right"),
        payload.alias("__r"),
    )
    r_struct_type = rt.schema["__r"].dataType
    lt = left.select(
        "*",
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    # null-fill the left-only columns on the right side for the union
    l_types = {f.name: f.dataType for f in lt.schema.fields}
    rt = rt.select(
        *[
            F.col(c) if c in rt.columns else F.lit(None).cast(l_types[c]).alias(c)
            for c in lt.columns
        ]
    )
    unioned = lt.unionByName(rt)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*", F.last("__r", ignorenulls=True).over(w).alias("__f")
    )
    out = filled.filter(F.col("__is_right") == 0)
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"__f.{c}"))
    return out.drop("__t", "__is_right", "__r", "__f")
