"""Pipeline orchestration: the reference's 8-task DAG as a Python object.

Reproduces Pipeline.json:23-153 semantics — ordered tasks, each gated on
ALL_SUCCESS of its predecessors, serial execution (max_concurrent_runs: 1),
state passed only through warehouse tables. Where the reference launches a
Databricks notebook per task, each task here is a plain callable sharing one
SparkSession — same isolation (tables are the only interface), none of the
session-restart overhead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import SparkSession

from ..state import WatermarkStore
from ..sources.geojson import read_geojson
from ..sources.warehouse import Warehouse
from . import bronze, gold, maintenance, reports, silver


@dataclass
class TaskResult:
    name: str
    status: str  # SUCCESS | FAILED | SKIPPED
    detail: object = None


@dataclass
class Pipeline:
    """Serial DAG with ALL_SUCCESS gating (ref: Pipeline.json:26,42 run_if)."""

    tasks: list[tuple[str, Callable[[], object]]] = field(default_factory=list)

    def add(self, name: str, fn: Callable[[], object]) -> "Pipeline":
        self.tasks.append((name, fn))
        return self

    def run(self) -> list[TaskResult]:
        results: list[TaskResult] = []
        failed = False
        for name, fn in self.tasks:
            if failed:
                results.append(TaskResult(name, "SKIPPED"))
                continue
            try:
                results.append(TaskResult(name, "SUCCESS", fn()))
            except Exception as exc:  # noqa: BLE001 — task boundary
                results.append(TaskResult(name, "FAILED", repr(exc)))
                failed = True
        return results


def build_pipeline(
    spark: SparkSession,
    warehouse_root: str,
    *,
    geojson_path: str | None = None,
    clock: datetime | None = None,
    silver_partition_col: str | None = None,
) -> Pipeline:
    """Wire the full medallion DAG (ref: Pipeline.json task chain:
    ingestion → bronze_processing → silver_transformation →
    gold_aggregation → optimization → physics → dashboard)."""
    wh = Warehouse(spark, warehouse_root)
    store = WatermarkStore(wh, clock=(lambda: clock) if clock else None)
    p = Pipeline()

    if geojson_path is not None:
        def ingestion():
            batch = read_geojson(
                spark,
                geojson_path,
                ingestion_ts=clock or datetime.utcnow(),
                batch_id=bronze.utc_batch_id(clock),
            )
            return bronze.ingest_batch(wh, store, batch)

        p.add("ingestion", ingestion)

    p.add("bronze_processing", lambda: {
        "quality": bronze.quality_report(wh.read(bronze.BRONZE_TABLE)),
        "deduped_rows": bronze.dedup_rewrite(wh),
    })
    p.add(
        "silver_transformation",
        lambda: silver.run_silver(
            wh, store, clock=clock, partition_col=silver_partition_col
        ),
    )
    p.add("gold_aggregation", lambda: gold.run_gold(wh, clock=clock))
    p.add("optimization", lambda: maintenance.optimize_all(wh))
    p.add("dashboard", lambda: {
        name: df.count() for name, df in reports.run_all(wh).items()
    })
    return p
