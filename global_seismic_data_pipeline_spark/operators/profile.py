"""Table profiling: per-column statistics in two bounded passes.

The discovery-mode companion to the data-quality expectations suite
(``dq_expectations`` asserts known invariants; the profiler DISCOVERS a
table's shape): for each requested column — row count, null count,
min / max, and approximate distinct count from the portable HLL. This is
the column-statistics payload ``ANALYZE TABLE ... COMPUTE STATISTICS FOR
COLUMNS`` feeds a cost-based optimizer, materialized as inspectable rows
(and the NDVs are exactly what :func:`.sketch.join_size_estimate`
consumes).

Shape at scale — two passes, both bounded:

1. one shuffle-free aggregate row carrying 3 expressions per column
   (nulls, min, max — map-side combine, a single tiny result row);
2. one UNPIVOT (``stack``) into (column, value) rows feeding the HLL
   register aggregate grouped by column name — a single shuffle whose
   key cardinality is the column count and whose payload is register
   rows (≤ 2^p per column), regardless of table size.

Values are profiled through their CANONICAL STRING form so one schema
covers every column type. min/max therefore compare LEXICOGRAPHICALLY —
honest for strings, and order-preserving for the non-negative
fixed-width integers of the driver query; the caller profiles typed
extrema with a plain aggregate when numeric ordering matters. Doubles
are excluded from the oracle-checked surface (engines disagree on
float-to-string rendering).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sketch import hll_distinct


def profile_table(
    df: DataFrame, cols: Sequence[str], *, p: int = 12
) -> DataFrame:
    """(column, n_rows, n_null, min_str, max_str, approx_ndv) — one row
    per profiled column; see module docstring."""
    cols = list(cols)
    if not cols:
        raise ValueError("need at least one column to profile")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}"),
            F.min(s).alias(f"min_{c}"),
            F.max(s).alias(f"max_{c}"),
        ]
    base = df.agg(*aggs)
    per_col = None
    for c in cols:
        row = base.select(
            F.lit(c).alias("column"),
            F.col("n_rows"),
            F.col(f"null_{c}").alias("n_null"),
            F.col(f"min_{c}").alias("min_str"),
            F.col(f"max_{c}").alias("max_str"),
        )
        per_col = row if per_col is None else per_col.unionByName(row)

    stack_expr = "stack({n}, {args}) as (column, val)".format(
        n=len(cols),
        args=", ".join(f"'{c}', cast({c} as string)" for c in cols),
    )
    stacked = df.selectExpr(stack_expr)
    ndv = hll_distinct(stacked, "val", ["column"], p=p, out_col="approx_ndv")
    return per_col.join(ndv, "column")
