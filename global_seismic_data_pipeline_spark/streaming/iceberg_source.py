"""Incremental consumption of an Apache Iceberg table with a persisted
cursor — the Iceberg twin of :mod:`.delta_source` (same delivery
contract, same control-table pattern), completing the "ingest from
whichever lakehouse format the upstream team uses" story.

The cursor is the last fully-processed SNAPSHOT ID (Iceberg snapshots
are the commit unit; per-entry snapshot provenance in the manifests
makes each snapshot's added files O(Δ) to enumerate —
``sources/iceberg.IcebergTable.tail``). The cursor row advances AFTER
the processing function returns: at-least-once, ``fn`` must be
key-idempotent (a MERGE is; a blind append is not).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.iceberg import IcebergTable
from ..sources.warehouse import Warehouse

CURSOR_TABLE = "control_iceberg_cursor"


class IcebergTailConsumer:
    """Cursor-tracked O(Δ) reader of an append-mostly Iceberg table."""

    def __init__(self, wh: Warehouse, source_path: str, name: str | None = None):
        self.wh = wh
        self.source_path = source_path
        self.name = name or os.path.basename(source_path.rstrip("/"))

    def cursor(self) -> int | None:
        """Last fully-processed snapshot id; None = never consumed."""
        if not self.wh.exists(CURSOR_TABLE):
            return None
        rows = (
            self.wh.read(CURSOR_TABLE)
            .filter(F.col("source_name") == self.name)
            .collect()
        )
        return int(rows[0].snapshot_id) if rows else None

    def _advance(self, snapshot_id: int) -> None:
        row = self.wh.spark.createDataFrame(
            [(self.name, snapshot_id)],
            "source_name string, snapshot_id long",
        )
        self.wh.merge(row, CURSOR_TABLE, keys=["source_name"])

    def process_available(
        self,
        fn: Callable[[DataFrame], None],
        *,
        ignore_changes: bool = False,
    ) -> int:
        """Feed every snapshot committed past the cursor to ``fn`` as
        ONE batch (added files only) and advance the cursor after it
        returns. Returns 1 when a batch was processed, 0 when caught
        up. A non-append snapshot in the range refuses unless
        ``ignore_changes`` (the delta_source contract)."""
        t = IcebergTable(self.wh.spark, self.source_path)
        cur = self.cursor()
        df, new_cur = t.tail(cur, ignore_changes=ignore_changes)
        if new_cur == cur or new_cur is None:
            return 0
        fn(df)
        self._advance(new_cur)  # AFTER fn: crash before here ⇒ replay
        return 1
