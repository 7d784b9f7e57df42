"""Incremental consumption of a Delta table with a persisted cursor —
the batch-mode equivalent of Spark's Delta streaming source.

The reference's ingestion lands micro-batches in a bronze Delta table and
a downstream job MERGEs the new slice into silver (ref:
02_ingestion.py:214-217 → 04_silver_transformation.py:194-202). At 100 TB
the only viable consumer is O(Δ): read EXACTLY the files added since the
last run (``sources/deltalog.delta_tail``), never a snapshot diff or a
full rescan. This module adds the operational half: a cursor durably
stored in a warehouse control table, advanced AFTER the processing
function commits.

Delivery contract — at-least-once, exactly like the engine's foreachBatch
sinks (streaming/facade.py): a crash between ``fn(batch)`` and the cursor
advance replays the same slice on the next run, so ``fn`` must be
key-idempotent (a MERGE is; a blind append is not). The cursor table
itself is one tiny control row per source — the same pattern as the
watermark store (state.py).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources import deltalog as dl
from ..sources.warehouse import Warehouse

CURSOR_TABLE = "control_delta_cursor"


class DeltaTailConsumer:
    """Cursor-tracked O(Δ) reader of an append-mostly Delta table.

    ``wh`` holds the cursor control table (any warehouse backend —
    including :class:`~..sources.deltawh.DeltaLogWarehouse`, making the
    cursor itself time-travelable). ``source_path`` is the Delta table
    directory being consumed; ``name`` keys the cursor row (defaults to
    the path's basename)."""

    def __init__(self, wh: Warehouse, source_path: str, name: str | None = None):
        self.wh = wh
        self.source_path = source_path
        self.name = name or os.path.basename(source_path.rstrip("/"))

    def cursor(self) -> int:
        """Last fully-processed source version; -1 = never consumed
        (version 0, the table's creation commit, is data too)."""
        if not self.wh.exists(CURSOR_TABLE):
            return -1
        rows = (
            self.wh.read(CURSOR_TABLE)
            .filter(F.col("source_name") == self.name)
            .collect()
        )
        return int(rows[0].version) if rows else -1

    def _advance(self, version: int) -> None:
        spark = self.wh.spark
        row = spark.createDataFrame(
            [(self.name, version)], "source_name string, version long"
        )
        self.wh.merge(row, CURSOR_TABLE, keys=["source_name"])

    def process_available(
        self,
        fn: Callable[[DataFrame], None],
        *,
        ignore_changes: bool = False,
        max_versions: int | None = None,
    ) -> int:
        """Feed everything new to ``fn`` as ONE batch and advance the
        cursor after it returns (at-least-once: ``fn`` must be
        idempotent). ``max_versions`` bounds the slice per call (bounded
        batches for catch-up after downtime). Returns the number of
        source versions consumed (0 = caught up)."""
        cur = self.cursor()
        to_version = None
        if max_versions is not None:
            to_version = cur + max_versions
            latest = max(
                h["version"] for h in dl.delta_history(self.source_path)
            )
            to_version = min(to_version, latest)
        df, new_cur = dl.delta_tail(
            self.wh.spark, self.source_path, cur,
            to_version=to_version, ignore_changes=ignore_changes,
        )
        if df is None or new_cur == cur:
            return 0
        fn(df)
        self._advance(new_cur)  # AFTER fn: crash before here ⇒ replay
        return new_cur - cur

    def run_to_latest(
        self,
        fn: Callable[[DataFrame], None],
        *,
        ignore_changes: bool = False,
        max_versions_per_batch: int | None = None,
    ) -> int:
        """Drain the backlog in bounded batches until caught up; returns
        total versions consumed."""
        total = 0
        while True:
            n = self.process_available(
                fn, ignore_changes=ignore_changes,
                max_versions=max_versions_per_batch,
            )
            if n == 0:
                return total
            total += n


class DeltaCdfTailConsumer(DeltaTailConsumer):
    """Cursor-tracked CHANGE-FEED consumer of a CDF-enabled Delta table
    — the streaming face of the spec's ``_change_data`` read path
    (``deltalog.table_changes_from_log``), consuming FOREIGN tables'
    change files too. Where :class:`DeltaTailConsumer` serves appended
    ROWS, this serves per-commit CHANGE rows (``_change_type`` insert /
    delete / update_preimage / update_postimage + ``_commit_version``),
    so a downstream MERGE can react to deletes and updates — the
    CDC-consumer story an append tail cannot express.

    Same delivery contract: at-least-once, cursor advanced AFTER ``fn``
    returns; ``fn`` must be idempotent (keyed on
    (_commit_version, keys)). A rewrite commit without change files
    refuses loudly inside the read (never a silently incomplete feed);
    the default cursor name carries a ``#cdf`` suffix so an append
    tail and a change tail on the same source never share a cursor."""

    def __init__(self, wh: Warehouse, source_path: str, name: str | None = None):
        super().__init__(wh, source_path, name)
        if name is None:
            self.name = f"{self.name}#cdf"

    def process_available(
        self,
        fn: Callable[[DataFrame], None],
        *,
        ignore_changes: bool = False,  # unused: deletes are the point
        max_versions: int | None = None,
    ) -> int:
        cur = self.cursor()
        latest = max(
            h["version"] for h in dl.delta_history(self.source_path)
        )
        to_version = latest
        if max_versions is not None:
            to_version = min(latest, cur + max_versions)
        if to_version <= cur:
            return 0
        df = dl.table_changes_from_log(
            self.wh.spark, self.source_path, cur + 1, to_version
        )
        if df.isEmpty():
            # housekeeping-only slice (metadata commits, dataChange=
            # false OPTIMIZE): advance past it WITHOUT invoking fn —
            # same contract as the parent's nothing-to-deliver path
            # (a downstream MERGE must not pay a no-op job per
            # property flip on the source)
            self._advance(to_version)
            return to_version - cur
        fn(df)
        self._advance(to_version)  # AFTER fn: crash ⇒ replay
        return to_version - cur
