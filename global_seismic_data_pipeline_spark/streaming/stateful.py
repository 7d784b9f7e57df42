"""Custom stateful streaming operator: inactivity-gap sessionization.

The batch engine sessionizes with window algebra
(plans/workloads.py::sessionize_users). This is the continuous form: per-key
arbitrary state via ``applyInPandasWithState`` — open sessions live in the
state store, close on an inactivity gap or event-time timeout, and are
emitted exactly once. This is the SURVEY.md §2.10 "custom stateful
operator" capability expressed the idiomatic Structured Streaming way.

Scale notes: state is per user key, partitioned by the stream's groupBy —
parallel across the cluster, bounded by (open sessions × bytes/session).
The event-time timeout (watermark-driven) guarantees state is dropped for
idle keys, so state size tracks *active* users, not all-time users.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

# NOTE: changing this schema is a breaking change for existing checkpoints
# (Spark's state-store schema check rejects the restart); redeploys must
# start from a fresh checkpoint location, losing open-session state.
STATE_SCHEMA = StructType(
    [
        StructField("starts_us", ArrayType(LongType())),
        StructField("ends_us", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
    ]
)

GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap, as in the batch op


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Merge this micro-batch's events into the per-key open segments and
    emit every segment the watermark has sealed.

    State holds ALL still-sealable segments, not only the newest: a
    segment is closed exactly when the watermark passes ``end + gap`` —
    before that, a late event (still above the watermark) could legally
    bridge two segments into one, so emitting a segment merely because a
    newer one exists would be premature and unmergeable (append mode).
    The lateness bound caps the open-segment span, so state stays small.
    """
    (user_id,) = key
    closed: list[tuple[int, int, int]] = []

    segments: list[list[int]] = []
    if state.exists:
        starts, ends, counts = state.get
        segments = [[s, e, n] for s, e, n in zip(starts, ends, counts)]

    if not state.hasTimedOut:
        times: list[int] = []
        for pdf in pdfs:
            times.extend(int(t) for t in pdf["ts_us"])
        # interval-chain segmentation over batch events + stored segments,
        # in start order: stored segments are contiguous spans, new events
        # are points; adjacent items within GAP merge. Out-of-order events
        # extend/bridge segments in either direction, exactly like the
        # batch sessionizer's segmentation over the full history.
        items = [[t, t, 1] for t in times] + segments
        items.sort()
        segments = []
        for s, e, n in items:
            if segments and s - segments[-1][1] <= GAP_US:
                segments[-1][1] = max(segments[-1][1], e)
                segments[-1][2] += n
            else:
                segments.append([s, e, n])

    # seal every segment whose close deadline the watermark has passed.
    # Strict >: an event at ts == watermark is still admissible, and at
    # gap == deadline exactly the batch sessionizer would merge it — so a
    # segment is only safe to close once wm (in us) exceeds end + gap.
    wm_ms = state.getCurrentWatermarkMs()
    still_open: list[list[int]] = []
    for s, e, n in segments:
        if wm_ms > 0 and wm_ms * 1000 > e + GAP_US:
            closed.append((s, e, n))
        else:
            still_open.append([s, e, n])

    if still_open:
        state.update((
            [s for s, _, _ in still_open],
            [e for _, e, _ in still_open],
            [n for _, _, n in still_open],
        ))
        # wake when the earliest deadline passes. Timeouts fire once
        # wm_ms > T; T = (e + gap) // 1000 guarantees (T+1)*1000 > e + gap,
        # so the seal condition above always holds when the timeout fires
        # (the old e//1000 + gap//1000 could under-round by 1 ms and
        # re-arm a timeout already behind the watermark).
        state.setTimeoutTimestamp(
            min(e + GAP_US for _, e, _ in still_open) // 1000
        )
    elif state.exists:
        state.remove()

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                "n_events": [n for _, _, n in closed],
            }
        )


def sessionize_stream(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    time_col: str = "ts",
    late_threshold: str = "1 hour",
) -> DataFrame:
    """Emit closed sessions from an event stream (append mode).

    Input: a streaming DataFrame with (user_col long, time_col timestamp).
    A session closes exactly when the watermark passes session end + gap
    (EventTimeTimeout — watermark-driven, so results are deterministic
    under replay). Until then it stays in state even if newer out-of-gap
    events exist, because a late event could still bridge the two."""
    from pyspark.sql import functions as F

    prepared = (
        events.withWatermark(time_col, late_threshold)
        .select(
            F.col(user_col).cast("long").alias("user_id"),
            F.unix_micros(F.col(time_col)).alias("ts_us"),
            F.col(time_col).alias("event_time"),
        )
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
