"""Deduplication operators.

``keep_latest``/``keep_first`` generalize the reference's window dedup
(ref: 03_bronze_processing.py:99-109 — row_number over event_id ordered by
ingestion_ts desc, keep 1), with a deterministic tiebreak the reference
lacks (SURVEY.md §7 hard-part c).

Scale notes: a window-function dedup shuffles once on the key set and streams
each group — no state beyond one group in memory, so it holds at 100 TB as
long as no single key explodes (event ids don't). ``exact_dedup`` uses the
same plan shape; for billions of long text rows prefer ``fingerprint``-based
grouping (hash the text first so the shuffle carries 16-byte keys, not
documents).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dedup(df: DataFrame, keys: Sequence[str], order: Sequence[Column]) -> DataFrame:
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def keep_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Keep the row with the greatest ``order_col`` per key (stable ties)."""
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in tiebreakers]
    return _dedup(df, keys, order)


def keep_first(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Keep the row with the least ``order_col`` per key (stable ties)."""
    order = [F.col(order_col).asc()] + [F.col(c).asc() for c in tiebreakers]
    return _dedup(df, keys, order)


def duplicate_audit(df: DataFrame, key: str) -> DataFrame:
    """Total vs distinct-key counts (ref: 03_bronze_processing.py:84-91),
    as a single-pass aggregate instead of two count() jobs."""
    return df.agg(
        F.count(F.lit(1)).alias("total_records"),
        F.countDistinct(key).alias("distinct_keys"),
        (F.count(F.lit(1)) - F.countDistinct(key)).alias("duplicate_records"),
    )


def exact_dedup(
    df: DataFrame,
    content_cols: Sequence[str],
    id_col: str,
) -> DataFrame:
    """Exact-content dedup: one representative (min id) per distinct content.

    Returns the representative id, a content hash, and the duplicate count.
    The shuffle key is ``md5`` of the content, so wide text columns never
    travel as join keys.
    """
    content = F.concat_ws("", *[F.col(c).cast("string") for c in content_cols])
    return (
        df.withColumn("content_hash", F.md5(content))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )
