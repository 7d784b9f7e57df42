"""Bronze layer: append ingest, quality report, dedup rewrite.

Reproduces 02_ingestion.py (append + watermark advance) and
03_bronze_processing.py (quality report + window-dedup rewrite), with the
reference's eager-count anti-pattern (SURVEY.md §4) replaced by single-pass
aggregates.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup
from ..state import WatermarkStore
from ..sources.warehouse import Warehouse

BRONZE_TABLE = "bronze_earthquakes"

# columns whose null-percentage the reference reports
# (ref: 03_bronze_processing.py:36-41)
QUALITY_COLUMNS = ("event_id", "time", "latitude", "longitude", "depth", "mag")


def ingest_batch(
    wh: Warehouse,
    store: WatermarkStore,
    batch: DataFrame,
    *,
    time_col: str = "time",
) -> int:
    """Append one bronze batch and advance the bronze watermark
    (ref: 02_ingestion.py:212-232). Returns rows written.

    One job computes count + max(time) together (the reference runs two).
    """
    store.init(BRONZE_TABLE, time_col)
    stats = batch.agg(
        F.count(F.lit(1)).alias("n"), F.max(time_col).alias("max_t")
    ).collect()[0]
    if stats.n == 0:
        return 0
    wh.append(batch, BRONZE_TABLE)
    store.advance(BRONZE_TABLE, stats.max_t, stats.n)
    return stats.n


def quality_report(df: DataFrame) -> dict:
    """Single-pass data-quality metrics (ref: 03_bronze_processing.py:36-91
    runs ~12 separate count() jobs; this is ONE aggregate job).

    Returns null counts/pcts per column, value ranges, and duplicate stats.
    """
    aggs = [F.count(F.lit(1)).alias("total_rows")]
    for c in QUALITY_COLUMNS:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"))
    aggs += [
        F.min("mag").alias("min_mag"),
        F.max("mag").alias("max_mag"),
        F.avg("mag").alias("avg_mag"),
        F.min("depth").alias("min_depth"),
        F.max("depth").alias("max_depth"),
        F.min("latitude").alias("min_lat"),
        F.max("latitude").alias("max_lat"),
        F.min("time").alias("min_time"),
        F.max("time").alias("max_time"),
        F.countDistinct("event_id").alias("distinct_events"),
    ]
    row = df.agg(*aggs).collect()[0].asDict()
    total = row["total_rows"] or 1
    report = {"total_rows": row["total_rows"]}
    for c in QUALITY_COLUMNS:
        n = row[f"nulls_{c}"] or 0
        report[f"nulls_{c}"] = n
        # WARNING at >5% nulls, as the reference flags (03:44-51)
        report[f"status_{c}"] = "WARNING" if n / total > 0.05 else "OK"
    for k in (
        "min_mag", "max_mag", "avg_mag", "min_depth", "max_depth",
        "min_lat", "max_lat", "min_time", "max_time", "distinct_events",
    ):
        report[k] = row[k]
    report["duplicate_records"] = row["total_rows"] - row["distinct_events"]
    return report


def dedup_rewrite(wh: Warehouse) -> int:
    """Rewrite bronze keeping the latest ingestion per event_id
    (ref: 03_bronze_processing.py:99-117), with a deterministic tiebreak on
    batch_id the reference lacks. Returns the deduped row count.

    The overwrite is atomic (staging + rename), unlike the reference's
    in-place Delta overwrite-on-self which relies on Delta's log.
    """
    bronze = wh.read(BRONZE_TABLE)
    deduped = dedup.keep_latest(
        bronze, ["event_id"], "ingestion_ts", ["batch_id"]
    )
    count = deduped.count()
    wh.overwrite(deduped, BRONZE_TABLE)
    return count


def utc_batch_id(now: datetime | None = None) -> str:
    """Batch id format the reference stamps (ref: 02_ingestion.py:168)."""
    now = now or datetime.now(timezone.utc)
    return now.strftime("%Y%m%d_%H%M%S")
