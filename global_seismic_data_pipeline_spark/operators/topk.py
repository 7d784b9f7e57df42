"""Top-k per group with map-side pruning.

``ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) <= k`` shuffles EVERY row
to its group's reducer — at 100 TB that is the whole fact table through
the wire to keep k rows per group. But top-k is prunable: a row in the
global per-group top-k is necessarily in its input partition's per-group
top-k, so each partition can locally discard all but groups·k rows before
any exchange. Spark has no bounded top-k aggregate (collect_list's
partial buffers everything), so the local prune runs as an Arrow-batched
``mapInPandas`` that folds batches into a running per-group top-k — state
is O(groups_in_partition · k), shuffle volume drops from N rows to
≤ partitions · groups · k.

The pruned rows then flow through the EXACT window, so the result is
bit-identical to the naive form (equivalence-tested, including ties at
the k boundary); the oracle for any query built on this is plain
ROW_NUMBER SQL. Ordering must be made total by the caller (value +
deterministic id tie-break) — same contract as dedup.keep_latest.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _local_prune(
    group_cols: Sequence[str], sort_cols: Sequence[str], ascending: Sequence[bool], k: int
):
    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        best = None
        for pdf in batches:
            if pdf.empty:
                continue
            pool = pdf if best is None else pd.concat([best, pdf], ignore_index=True)
            pool = pool.sort_values(
                list(sort_cols), ascending=list(ascending), kind="mergesort"
            )
            best = pool.groupby(list(group_cols), sort=False).head(k)
        if best is not None:
            yield best

    return fn


def topk_per_group(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    order_col: str,
    id_col: str,
    k: int,
    descending: bool = True,
    prune: bool = True,
) -> DataFrame:
    """Top-k rows per group by (order_col, id_col tie-break), with ``rn``.

    ``prune=False`` is the naive single-window form (the oracle shape);
    ``prune=True`` inserts the map-side per-partition top-k first. Both
    return identical rows.
    """
    work = df
    if prune:
        sort_cols = [*group_cols, order_col, id_col]
        ascending = [True] * len(group_cols) + [not descending, True]
        work = df.mapInPandas(
            _local_prune(list(group_cols), sort_cols, ascending, k),
            schema=df.schema,
        )
    order = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = Window.partitionBy(*group_cols).orderBy(order, F.col(id_col).asc())
    return (
        work.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )
