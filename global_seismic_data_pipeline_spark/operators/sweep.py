"""Sweep-line interval concurrency — "how many things were open at once".

The classic interval-overlap family (max concurrent sessions, peak load,
room occupancy) is a sweep: emit +1 at each interval start and -1 at each
end, sort boundaries, and the running sum at any boundary IS the number of
open intervals. Expressed declaratively this is a union + one partitioned
window running sum — no self-join, no per-row Python.

Scale shape: the sweep is keyed by calendar day, so the window is a
per-day reducer (days × 2·intervals-in-day rows), never a global sort.
Intervals are clipped to day boundaries first — a bounded ≤2-segment
explosion (same covering-replication trick as rangejoin's bins and
chunking's windows) — so each day's count is self-contained and no carry
state crosses partitions. For volumes where even ONE day exceeds a
reducer, the two-pass form used by operators/ranking.py applies
unchanged: sweep per sub-day bucket, then broadcast per-bucket net-delta
prefix offsets; the day grain here mirrors the repo's other day-keyed
windows.

Half-open [start, end) semantics: an interval ending at t does NOT
overlap one starting at t — encoded purely in the boundary sort order
(delta ascending puts -1 before +1 at equal timestamps), with the
interval id as the final deterministic tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def day_segments(
    df: DataFrame,
    *,
    id_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Clip [start, end) intervals to calendar-day segments.

    A segment never crosses midnight; an interval spanning k midnights
    explodes to k+1 segments. Callers here bound duration well under a
    day, so the explosion is ≤ 2 and handled by one union (no iterative
    loop needed); an end exactly at midnight stays a single segment.
    """
    base = df.select(
        F.col(id_col).alias("id_"),
        F.col(start_col).alias("s"),
        F.col(end_col).alias("e"),
        F.to_date(start_col).alias("d1"),
        F.date_add(F.to_date(start_col), 1).cast("timestamp").alias("m"),
    )
    seg1 = base.select(
        "id_", F.col("d1").alias("day"), "s", F.least("e", "m").alias("e")
    )
    seg2 = base.filter(F.col("e") > F.col("m")).select(
        "id_", F.to_date("m").alias("day"), F.col("m").alias("s"), "e"
    )
    return seg1.unionByName(seg2)


def max_concurrent_intervals(
    df: DataFrame,
    *,
    id_col: str = "event_id",
    ts_col: str = "ts",
    duration_minutes: int = 15,
) -> DataFrame:
    """Per-day peak concurrency of [ts, ts + duration) event intervals.

    Output per day: ``n_segments`` (day-clipped interval segments),
    ``max_concurrent`` (peak of the running sweep sum) and
    ``peak_first_ts`` (earliest boundary at which the peak is reached) —
    all integers/timestamps, no float anywhere, so the oracle matches
    exactly.
    """
    end = F.col(ts_col) + F.expr(f"INTERVAL {int(duration_minutes)} MINUTES")
    segs = day_segments(
        df.select(F.col(id_col), F.col(ts_col), end.alias("__end")),
        id_col=id_col,
        start_col=ts_col,
        end_col="__end",
    )
    bounds = segs.select(
        "id_", "day", F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        segs.select("id_", "day", F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    w_run = (
        Window.partitionBy("day")
        .orderBy("t", "delta", "id_")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = bounds.withColumn("run", F.sum("delta").over(w_run))
    w_day = Window.partitionBy("day")
    run = run.withColumn("day_max", F.max("run").over(w_day))
    return run.groupBy("day").agg(
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_segments"),
        F.max("run").cast("long").alias("max_concurrent"),
        F.min(F.when(F.col("run") == F.col("day_max"), F.col("t"))).alias(
            "peak_first_ts"
        ),
    )
