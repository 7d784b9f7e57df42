"""Pipeline orchestration: the reference's 8-task DAG as a Python object.

Reproduces Pipeline.json semantics — per-task ``depends_on`` +
``run_if`` gating (ref: Pipeline.json:26,42), retry knobs, failure/skip
notifications (ref: Pipeline.json:3-13 email_notifications +
notification_settings.no_alert_for_skipped_runs), and single-flight runs
with queueing (ref: Pipeline.json:158 ``max_concurrent_runs: 1`` +
``queue.enabled``). Execution stays serial in task-insertion order — with
max_concurrent_runs 1 that IS the schedule; the DAG gating decides what
runs vs skips, not what overlaps. Where the reference launches a
Databricks notebook per task, each task here is a plain callable sharing
one SparkSession — same isolation (tables are the only interface), none
of the session-restart overhead.
"""

from __future__ import annotations

import os
import time as _time

from collections.abc import Callable
from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import SparkSession

from ..state import WatermarkStore
from ..sources.geojson import read_geojson
from ..sources.warehouse import Warehouse
from . import bronze, gold, maintenance, reports, silver

RUN_IF = {"ALL_SUCCESS", "ALL_DONE", "AT_LEAST_ONE_SUCCESS", "NONE_FAILED"}


class ConcurrentRunError(RuntimeError):
    """Another run holds the pipeline lock (max_concurrent_runs: 1)."""


@dataclass
class TaskResult:
    name: str
    status: str  # SUCCESS | FAILED | SKIPPED
    detail: object = None
    attempts: int = 0  # 0 for skipped tasks


@dataclass
class Task:
    name: str
    fn: Callable[[], object]
    depends_on: list[str]
    run_if: str = "ALL_SUCCESS"
    retries: int = 0
    retry_delay_s: float = 0.0


@dataclass
class Pipeline:
    """Reference-parity serial DAG (see module docstring).

    ``notify`` receives one event dict per task failure / skip and a final
    run-completion event — the stand-in for the reference's email +
    webhook notifications (delivery is environment-specific; the contract
    is which events fire)."""

    tasks: list[Task] = field(default_factory=list)
    notify: Callable[[dict], None] | None = None
    no_alert_for_skipped_runs: bool = False
    notifications: list[dict] = field(default_factory=list)

    def add(
        self,
        name: str,
        fn: Callable[[], object],
        *,
        depends_on: list[str] | None = None,
        run_if: str = "ALL_SUCCESS",
        retries: int = 0,
        retry_delay_s: float = 0.0,
    ) -> "Pipeline":
        """Add a task. Default wiring is the reference's chain: each task
        depends on the previously added one (Pipeline.json depends_on)."""
        if run_if not in RUN_IF:
            raise ValueError(f"run_if must be one of {sorted(RUN_IF)}")
        if depends_on is None:
            depends_on = [self.tasks[-1].name] if self.tasks else []
        known = {t.name for t in self.tasks}
        missing = [d for d in depends_on if d not in known]
        if missing:
            raise ValueError(f"task {name!r} depends on unknown tasks {missing}")
        self.tasks.append(Task(name, fn, list(depends_on), run_if, retries, retry_delay_s))
        return self

    # -- notifications -----------------------------------------------------
    def _emit(self, event: dict) -> None:
        self.notifications.append(event)
        if self.notify is not None:
            self.notify(event)

    # -- gating ------------------------------------------------------------
    @staticmethod
    def _gate(run_if: str, dep_statuses: list[str]) -> bool:
        if not dep_statuses:
            return True
        if run_if == "ALL_SUCCESS":
            return all(s == "SUCCESS" for s in dep_statuses)
        if run_if == "ALL_DONE":
            return True  # serial execution: dependencies are always done
        if run_if == "AT_LEAST_ONE_SUCCESS":
            return any(s == "SUCCESS" for s in dep_statuses)
        return all(s != "FAILED" for s in dep_statuses)  # NONE_FAILED

    # -- run ---------------------------------------------------------------
    def run(
        self,
        *,
        lock_path: str | None = None,
        queue_wait_s: float = 0.0,
        poll_s: float = 0.05,
    ) -> list[TaskResult]:
        """Execute the DAG. With ``lock_path``, at most one run is active
        (max_concurrent_runs: 1): the lock is an O_EXCL-created file; a
        second run queues up to ``queue_wait_s`` (queue.enabled) then
        raises ConcurrentRunError. A dead holder is not special-cased —
        the lock file carries the holder pid for operators, exactly the
        trade-off a scheduler lock file makes."""
        if lock_path is None:
            return self._run_tasks()
        deadline = _time.monotonic() + queue_wait_s
        while True:
            try:
                fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                if _time.monotonic() >= deadline:
                    raise ConcurrentRunError(
                        f"pipeline lock {lock_path} is held; queue wait exhausted"
                    ) from None
                _time.sleep(poll_s)
        try:
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            return self._run_tasks()
        finally:
            os.unlink(lock_path)

    def _run_tasks(self) -> list[TaskResult]:
        results: dict[str, TaskResult] = {}
        for t in self.tasks:
            dep_statuses = [results[d].status for d in t.depends_on]
            if not self._gate(t.run_if, dep_statuses):
                results[t.name] = TaskResult(t.name, "SKIPPED")
                if not self.no_alert_for_skipped_runs:
                    self._emit({
                        "event": "task_skipped", "task": t.name,
                        "blocked_by": [
                            d for d, s in zip(t.depends_on, dep_statuses)
                            if s != "SUCCESS"
                        ],
                    })
                continue
            attempt = 0
            while True:
                attempt += 1
                try:
                    detail = t.fn()
                    results[t.name] = TaskResult(t.name, "SUCCESS", detail, attempt)
                    break
                except Exception as exc:  # noqa: BLE001 — task boundary
                    if attempt <= t.retries:
                        if t.retry_delay_s:
                            _time.sleep(t.retry_delay_s)
                        continue
                    results[t.name] = TaskResult(t.name, "FAILED", repr(exc), attempt)
                    self._emit({
                        "event": "task_failed", "task": t.name,
                        "attempts": attempt, "error": repr(exc),
                    })
                    break
        out = [results[t.name] for t in self.tasks]
        self._emit({
            "event": "run_finished",
            "statuses": {r.name: r.status for r in out},
        })
        return out


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
