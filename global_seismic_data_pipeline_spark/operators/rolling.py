"""Rolling-window metrics over a (usually daily) grain.

Reproduces the reference's rolling 7-/30-day counts and anomaly flag
(ref: 05_gold_aggregation.py:107-119). The reference uses an *unpartitioned*
window (single-task — SURVEY.md §4 anti-pattern). This module provides:

- ``rolling_metrics``: the faithful global-window form. Safe ONLY for
  post-aggregation grains (days × regions ≈ thousands of rows), which is
  where the reference uses it. It documents that constraint.
- ``rolling_metrics_partitioned``: the scale path — the same frame spec
  partitioned by a key (e.g. region), so state is per-key and the window
  parallelizes across keys. Rolling over days-within-region at 100 TB input
  is still cheap because it runs on the *aggregated* daily grain.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.window import WindowSpec


def _with_rolling(
    df: DataFrame,
    w7: WindowSpec,
    w30: WindowSpec,
    value_col: str,
) -> DataFrame:
    return (
        df.withColumn("rolling_7d_count", F.sum(value_col).over(w7))
        .withColumn("rolling_30d_count", F.sum(value_col).over(w30))
        .withColumn(
            "is_anomaly",
            F.when(
                F.col("rolling_7d_count") > 0,
                F.col(value_col) > (F.col("rolling_7d_count") / 7 * 2),
            ).otherwise(F.lit(False)),
        )
    )


def rolling_metrics(df: DataFrame, *, date_col: str, value_col: str) -> DataFrame:
    """Global rolling frames — one row per date ONLY (aggregated grain).

    The entire frame evaluates in a single task; use exclusively on small
    post-aggregation outputs, exactly like the reference does.
    """
    w7 = Window.orderBy(date_col).rowsBetween(-6, 0)
    w30 = Window.orderBy(date_col).rowsBetween(-29, 0)
    return _with_rolling(df, w7, w30, value_col)


def rolling_metrics_partitioned(
    df: DataFrame,
    *,
    partition_cols: Sequence[str],
    date_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key rolling frames: parallel across keys, ordered within key."""
    w7 = Window.partitionBy(*partition_cols).orderBy(date_col).rowsBetween(-6, 0)
    w30 = Window.partitionBy(*partition_cols).orderBy(date_col).rowsBetween(-29, 0)
    return _with_rolling(df, w7, w30, value_col)
