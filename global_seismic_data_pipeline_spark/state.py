"""Watermark control table — incremental-batch CDC state.

Reproduces the reference's ``control_watermark`` semantics
(ref: 01_config_setup.py:40-49 DDL; 02_ingestion.py:75-94,221-232 and
04_silver_transformation.py:24-44,213-222 read/advance) with two fixes the
reference lacks (SURVEY.md §7 hard-part b):

- **atomic advance**: the reference string-interpolates an ``UPDATE`` that
  can double-count ``records_processed`` if the job dies between data write
  and watermark write. Here the control table is rewritten atomically via the
  warehouse; downstream MERGE makes re-processing after a crash idempotent,
  so the state machine is "at-least-once data, exactly-once effect".
- **driver-side small state**: the table is a handful of rows; it is read
  with plain Spark but manipulated as Python rows — no job is launched to
  update one value.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone

from .schemas import CONTROL_WATERMARK
from .sources.warehouse import Warehouse

CONTROL_TABLE = "control_watermark"
DEFAULT_WATERMARK = datetime(2000, 1, 1, tzinfo=timezone.utc)


@dataclass
class WatermarkEntry:
    table_name: str
    watermark_column: str
    watermark_value: datetime
    last_updated: datetime
    records_processed: int


def _naive_utc(dt: datetime) -> datetime:
    """Spark TimestampType literals are naive-in-session-tz (UTC here)."""
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


class WatermarkStore:
    """get / init / advance over the control table."""

    def __init__(self, warehouse: Warehouse, clock=None):
        self.wh = warehouse
        self._clock = clock  # injectable for deterministic tests

    def _now(self) -> datetime:
        return _naive_utc(self._clock() if self._clock else datetime.now(timezone.utc))

    def _entries(self) -> dict[str, WatermarkEntry]:
        if not self.wh.exists(CONTROL_TABLE):
            return {}
        rows = self.wh.read(CONTROL_TABLE).collect()
        return {
            r.table_name: WatermarkEntry(
                r.table_name,
                r.watermark_column,
                r.watermark_value,
                r.last_updated,
                r.records_processed,
            )
            for r in rows
        }

    def _write(self, entries: dict[str, WatermarkEntry]) -> None:
        rows = [
            (
                e.table_name,
                e.watermark_column,
                e.watermark_value,
                e.last_updated,
                e.records_processed,
            )
            for e in entries.values()
        ]
        from .session import tiny_df

        df = tiny_df(self.wh.spark, rows, CONTROL_WATERMARK)
        self.wh.overwrite(df, CONTROL_TABLE)

    # -- API ---------------------------------------------------------------
    def get(self, table: str) -> WatermarkEntry | None:
        return self._entries().get(table)

    def init(
        self,
        table: str,
        watermark_column: str,
        initial: datetime = DEFAULT_WATERMARK,
    ) -> WatermarkEntry:
        """Idempotent first-run registration
        (ref: 04_silver_transformation.py:36-44)."""
        entries = self._entries()
        if table not in entries:
            entries[table] = WatermarkEntry(
                table, watermark_column, _naive_utc(initial), self._now(), 0
            )
            self._write(entries)
        return entries[table]

    def advance(self, table: str, new_watermark: datetime, processed: int) -> None:
        """Move the watermark forward and accumulate the processed count
        (ref: 02_ingestion.py:221-232, 04_silver_transformation.py:216-222).
        Never moves backwards — a re-run over old data is a no-op."""
        entries = self._entries()
        e = entries[table]
        new_wm = _naive_utc(new_watermark)
        if e.watermark_value is None or new_wm > e.watermark_value:
            e.watermark_value = new_wm
        e.last_updated = self._now()
        e.records_processed += processed
        self._write(entries)
