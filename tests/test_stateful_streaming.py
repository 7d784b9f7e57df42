"""applyInPandasWithState sessionization: streaming sessions == batch
window-algebra sessions for closed sessions (SURVEY.md §2.10)."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from global_seismic_data_pipeline_spark.streaming import facade
from global_seismic_data_pipeline_spark.streaming.stateful import sessionize_stream

EVENT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
    ]
)


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sess")
    t0 = datetime(2025, 5, 1, 10, 0, 0)
    rows = []
    # user 1: two sessions (3 events, 35-min gap, 2 events)
    for m in (0, 5, 10):
        rows.append((1, t0 + timedelta(minutes=m)))
    for m in (45, 50):
        rows.append((1, t0 + timedelta(minutes=m)))
    # user 2: one long session, events every 10 min
    for m in range(0, 60, 10):
        rows.append((2, t0 + timedelta(minutes=m)))
    # a far-future event advances the watermark so open sessions time out
    rows.append((99, t0 + timedelta(days=2)))
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(d / "events"))
    return d


def test_late_event_does_not_move_session_end_backwards(spark, tmp_path):
    """An out-of-order event older than the open session's end must extend
    the session conservatively, not rewind its end (which would split the
    session and emit a bogus early close)."""
    d = tmp_path / "late"
    t0 = datetime(2025, 5, 1, 10, 0, 0)
    # file 1: events at 10:00 and 10:20 (one open session)
    # coalesce(1): one part file per logical arrival batch — multi-part
    # writes land with near-equal mtimes and maxFilesPerTrigger=1 then
    # picks them up in nondeterministic order (the watermark-push row
    # processed first would drop the 10:40 event as late)
    spark.createDataFrame(
        [(1, t0), (1, t0 + timedelta(minutes=20))], EVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(d / "ev"))
    import time as _t
    _t.sleep(1.1)  # distinct mtimes → deterministic file pickup order
    # file 2: a LATE event at 10:05 plus one at 10:40 (within gap of 10:20),
    # plus a far-future watermark push
    spark.createDataFrame(
        [(1, t0 + timedelta(minutes=5)), (1, t0 + timedelta(minutes=40)),
         (99, t0 + timedelta(days=2))],
        EVENT_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(str(d / "ev"))

    stream = facade.read_stream(
        spark, str(d / "ev"), EVENT_SCHEMA, max_files_per_trigger=1
    )
    out = sessionize_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("late_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [r for r in spark.table("late_sessions").collect() if r.user_id == 1]
    # one single session ending 10:40 — the late 10:05 event must never
    # rewind the session end or split it (the original bug emitted two
    # sessions, one ending 10:05). The late event itself may count (4) or
    # be watermark-dropped (3) depending on nondeterministic file pickup
    # order — both are correct streaming semantics.
    assert len(rows) == 1
    assert rows[0].session_start == t0
    assert rows[0].session_end == t0 + timedelta(minutes=40)
    assert rows[0].n_events in (3, 4)


def test_far_earlier_late_event_forms_own_session(spark, tmp_path):
    """A late event more than a gap BEFORE the open session's start must
    become its own (earlier) session, not be glued onto the open one —
    matching the batch sessionizer's segmentation."""
    d = tmp_path / "early"
    t0 = datetime(2025, 5, 1, 10, 0, 0)
    spark.createDataFrame([(1, t0)], EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(d / "ev"))
    import time as _t
    _t.sleep(1.1)  # distinct mtimes → deterministic file pickup order
    # late event 45 min EARLIER (within the 1h lateness bound), plus a
    # watermark pusher to flush state
    spark.createDataFrame(
        [(1, t0 - timedelta(minutes=45)), (99, t0 + timedelta(days=2))],
        EVENT_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(str(d / "ev"))

    stream = facade.read_stream(
        spark, str(d / "ev"), EVENT_SCHEMA, max_files_per_trigger=1
    )
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("early_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(
        (r.session_start, r.session_end, r.n_events)
        for r in spark.table("early_sessions").collect()
        if r.user_id == 1
    )
    # two singleton sessions 45 minutes apart (gap is 30 min)
    assert rows == [
        (t0 - timedelta(minutes=45), t0 - timedelta(minutes=45), 1),
        (t0, t0, 1),
    ]


def test_late_event_bridges_two_open_segments(spark, tmp_path):
    """Two events more than a gap apart form two open segments; a late
    event between them (still above the watermark) must bridge them into
    ONE session. This requires keeping every unsealed segment in state —
    emitting the earlier segment just because a newer one exists would
    close it prematurely and make the merge impossible (append mode)."""
    d = tmp_path / "bridge"
    t0 = datetime(2025, 5, 1, 10, 0, 0)
    # file 1: events at 10:00 and 10:40 (40 min apart > 30-min gap)
    spark.createDataFrame(
        [(1, t0), (1, t0 + timedelta(minutes=40))], EVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(d / "ev"))
    import time as _t
    _t.sleep(1.1)  # distinct mtimes → deterministic file pickup order
    # file 2: late event at 10:20 (above the 1h-lateness watermark of
    # 09:40) bridging both segments, plus a watermark pusher to flush
    spark.createDataFrame(
        [(1, t0 + timedelta(minutes=20)), (99, t0 + timedelta(days=2))],
        EVENT_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(str(d / "ev"))

    stream = facade.read_stream(
        spark, str(d / "ev"), EVENT_SCHEMA, max_files_per_trigger=1
    )
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("bridge_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [
        (r.session_start, r.session_end, r.n_events)
        for r in spark.table("bridge_sessions").collect()
        if r.user_id == 1
    ]
    assert rows == [(t0, t0 + timedelta(minutes=40), 3)]


def test_stateful_sessionization_matches_batch(spark, event_dir, tmp_path):
    stream = facade.read_stream(spark, str(event_dir / "events"), EVENT_SCHEMA)
    out = sessionize_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in spark.table("sessions").collect()
    }
    t0 = datetime(2025, 5, 1, 10, 0, 0)
    # no session seals in the data batch (watermark still 0 there); all
    # three emit once the advanced watermark passes each end + gap
    assert got[(1, t0, t0 + timedelta(minutes=10))] == 3
    assert got[(1, t0 + timedelta(minutes=45), t0 + timedelta(minutes=50))] == 2
    assert got[(2, t0, t0 + timedelta(minutes=50))] == 6


@pytest.mark.parametrize("seed", [7, 21, 1234])
def test_randomized_sessionization_matches_python_reference(spark, tmp_path, seed):
    """Random event sets (arbitrary within-batch order, duplicate
    timestamps, many users) sessionize identically to an independent
    pure-Python gap-chaining reference. All data arrives in one file
    (watermark 0 during that batch, so nothing is dropped or sealed);
    a far-future pusher then seals every session."""
    import random

    rng = random.Random(seed)
    t0 = datetime(2025, 5, 1, 0, 0, 0)
    rows = []
    by_user: dict[int, list[int]] = {}
    for u in range(1, 6):
        minutes = [rng.randrange(0, 600) for _ in range(rng.randrange(5, 41))]
        by_user[u] = minutes
        rows.extend((u, t0 + timedelta(minutes=m)) for m in minutes)
    rng.shuffle(rows)

    d = tmp_path / "rand"
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(d / "ev"))
    import time as _t
    _t.sleep(1.1)
    spark.createDataFrame(
        [(99, t0 + timedelta(days=2))], EVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(d / "ev"))

    stream = facade.read_stream(
        spark, str(d / "ev"), EVENT_SCHEMA, max_files_per_trigger=1
    )
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName(f"rand_sessions_{seed}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table(f"rand_sessions_{seed}").collect()
        if r.user_id != 99
    )

    want = []
    for u, minutes in by_user.items():
        sessions: list[list] = []
        for m in sorted(minutes):
            t = t0 + timedelta(minutes=m)
            if sessions and (t - sessions[-1][1]) <= timedelta(minutes=30):
                sessions[-1][1] = t
                sessions[-1][2] += 1
            else:
                sessions.append([t, t, 1])
        want.extend((u, s, e, n) for s, e, n in sessions)
    assert got == sorted(want)
