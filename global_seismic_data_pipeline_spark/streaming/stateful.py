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

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap, as in the batch op


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Merge this micro-batch's events into the open session; emit every
    session closed by a gap; keep the still-open tail in state."""
    (user_id,) = key
    closed: list[tuple[int, int, int]] = []

    if state.hasTimedOut:
        if state.exists:
            s, e, n = state.get
            closed.append((s, e, n))
        state.remove()
    else:
        times: list[int] = []
        for pdf in pdfs:
            times.extend(int(t) for t in pdf["ts_us"])
        # interval-chain segmentation over batch events + the open-session
        # interval, in start order: the stored session is one contiguous
        # interval (its events already satisfied gap chaining), new events
        # are points; adjacent items within GAP merge. This handles
        # out-of-order events correctly in BOTH directions — a late event
        # inside/near the open session extends it, while one more than a
        # gap EARLIER than session start forms its own (earlier) session
        # instead of being glued on, matching the batch sessionizer.
        items = [(t, t, 1) for t in times]
        if state.exists:
            items.append(tuple(state.get))
        items.sort()
        merged: list[list[int]] = []
        for s, e, n in items:
            if merged and s - merged[-1][1] <= GAP_US:
                merged[-1][1] = max(merged[-1][1], e)
                merged[-1][2] += n
            else:
                merged.append([s, e, n])
        cur_s = cur_e = cur_n = None
        if merged:
            # every segment except the last is followed by an out-of-gap
            # event, so it is definitively closed
            closed.extend((s, e, n) for s, e, n in merged[:-1])
            cur_s, cur_e, cur_n = merged[-1]
        if cur_s is not None:
            # close the open session once the watermark passes end + gap;
            # if this batch's watermark ALREADY passed it (another key's
            # far-newer events advanced it), the session is expired — emit
            # now, since a timeout in the past is rejected by the state API
            deadline_ms = cur_e // 1000 + GAP_US // 1000
            wm_ms = state.getCurrentWatermarkMs()
            if wm_ms >= deadline_ms > 0:
                closed.append((cur_s, cur_e, cur_n))
                if state.exists:
                    state.remove()
            else:
                state.update((cur_s, cur_e, cur_n))
                state.setTimeoutTimestamp(deadline_ms)

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
    A session closes when a newer event of the same user arrives past the
    30-min gap, or when event time advances past session end + gap
    (EventTimeTimeout — watermark-driven, so results are deterministic
    under replay)."""
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
