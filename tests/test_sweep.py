"""Sweep-line interval concurrency on hand-built timelines."""

from __future__ import annotations

from datetime import datetime

from global_seismic_data_pipeline_spark.operators import sweep


def _run(spark, rows, minutes=15):
    df = spark.createDataFrame(rows, ["event_id", "ts"])
    out = sweep.max_concurrent_intervals(
        df, id_col="event_id", ts_col="ts", duration_minutes=minutes
    )
    return {str(r["day"]): r.asDict() for r in out.collect()}


def test_basic_overlap_peak(spark):
    t = lambda h, m: datetime(2025, 3, 10, h, m)
    # three intervals: 10:00-10:15, 10:10-10:25, 10:20-10:35
    # peak = 2 (first at 10:10), never 3 (first ends before third starts)
    got = _run(spark, [(1, t(10, 0)), (2, t(10, 10)), (3, t(10, 20))])
    d = got["2025-03-10"]
    assert d["max_concurrent"] == 2
    assert d["n_segments"] == 3
    assert d["peak_first_ts"] == t(10, 10)


def test_half_open_touching_intervals_do_not_overlap(spark):
    t = lambda h, m: datetime(2025, 3, 10, h, m)
    # 9:00-9:15 and 9:15-9:30 touch at 9:15: concurrency stays 1
    got = _run(spark, [(1, t(9, 0)), (2, t(9, 15))])
    assert got["2025-03-10"]["max_concurrent"] == 1


def test_midnight_crossing_counts_in_both_days(spark):
    rows = [
        (1, datetime(2025, 3, 10, 23, 50)),  # 23:50-00:05 crosses midnight
        (2, datetime(2025, 3, 11, 0, 0)),  # 00:00-00:15
    ]
    got = _run(spark, rows)
    assert got["2025-03-10"]["max_concurrent"] == 1
    assert got["2025-03-10"]["n_segments"] == 1
    d11 = got["2025-03-11"]
    # on the 11th: carried segment 00:00-00:05 overlaps 00:00-00:15
    assert d11["n_segments"] == 2
    assert d11["max_concurrent"] == 2
    assert d11["peak_first_ts"] == datetime(2025, 3, 11, 0, 0)


def test_interval_ending_exactly_at_midnight_single_segment(spark):
    got = _run(spark, [(1, datetime(2025, 3, 10, 23, 45))])  # ends 00:00
    assert set(got) == {"2025-03-10"}
    assert got["2025-03-10"]["n_segments"] == 1


def test_identical_timestamps_stack(spark):
    ts = datetime(2025, 3, 10, 12, 0)
    got = _run(spark, [(i, ts) for i in range(5)])
    assert got["2025-03-10"]["max_concurrent"] == 5
    assert got["2025-03-10"]["peak_first_ts"] == ts
