"""Orchestration semantics (Pipeline.json parity): gating, retries,
notifications, single-flight lock. Pure-Python tasks — no Spark needed."""

import threading

import pytest

from global_seismic_data_pipeline_spark.pipeline.runner import (
    ConcurrentRunError,
    Pipeline,
)


def boom():
    raise RuntimeError("boom")


def test_failure_skips_downstream_chain_and_notifies():
    p = Pipeline()
    p.add("a", lambda: 1).add("b", boom).add("c", lambda: 3).add("d", lambda: 4)
    rs = p.run()
    assert [(r.name, r.status) for r in rs] == [
        ("a", "SUCCESS"), ("b", "FAILED"), ("c", "SKIPPED"), ("d", "SKIPPED"),
    ]
    events = [e["event"] for e in p.notifications]
    assert events == ["task_failed", "task_skipped", "task_skipped", "run_finished"]
    assert p.notifications[1]["blocked_by"] == ["b"]


def test_no_alert_for_skipped_runs_suppresses_skip_events():
    p = Pipeline(no_alert_for_skipped_runs=True)
    p.add("a", boom).add("b", lambda: 2)
    p.run()
    assert [e["event"] for e in p.notifications] == ["task_failed", "run_finished"]


def test_retries_until_success_records_attempts():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    p = Pipeline()
    p.add("t", flaky, retries=5)
    r = p.run()[0]
    assert r.status == "SUCCESS" and r.attempts == 3 and r.detail == "ok"
    assert p.notifications[-1]["statuses"] == {"t": "SUCCESS"}


def test_retries_exhausted_fails_with_attempt_count():
    p = Pipeline()
    p.add("t", boom, retries=2)
    r = p.run()[0]
    assert r.status == "FAILED" and r.attempts == 3
    assert p.notifications[0] == {
        "event": "task_failed", "task": "t", "attempts": 3,
        "error": "RuntimeError('boom')",
    }


def test_run_if_variants():
    p = Pipeline()
    p.add("a", lambda: 1)
    p.add("b", boom)
    # ALL_DONE: runs even though a dep failed
    p.add("c", lambda: 3, depends_on=["a", "b"], run_if="ALL_DONE")
    # AT_LEAST_ONE_SUCCESS: a succeeded -> runs
    p.add("d", lambda: 4, depends_on=["a", "b"], run_if="AT_LEAST_ONE_SUCCESS")
    # NONE_FAILED: b failed -> skipped
    p.add("e", lambda: 5, depends_on=["a", "b"], run_if="NONE_FAILED")
    # NONE_FAILED over a SKIPPED dep: skipped is not failed -> runs
    p.add("f", lambda: 6, depends_on=["e"], run_if="NONE_FAILED")
    statuses = {r.name: r.status for r in p.run()}
    assert statuses == {
        "a": "SUCCESS", "b": "FAILED", "c": "SUCCESS",
        "d": "SUCCESS", "e": "SKIPPED", "f": "SUCCESS",
    }


def test_add_validates_run_if_and_dependencies():
    p = Pipeline()
    p.add("a", lambda: 1)
    with pytest.raises(ValueError, match="run_if"):
        p.add("b", lambda: 2, run_if="SOMETIMES")
    with pytest.raises(ValueError, match="unknown tasks"):
        p.add("b", lambda: 2, depends_on=["nope"])


def test_lock_rejects_concurrent_run(tmp_path):
    lock = str(tmp_path / "run.lock")
    p = Pipeline()
    p.add("a", lambda: 1)
    open(lock, "w").close()  # another run holds the lock
    with pytest.raises(ConcurrentRunError):
        p.run(lock_path=lock, queue_wait_s=0)


def test_lock_queues_until_free_and_releases(tmp_path):
    import os

    lock = str(tmp_path / "run.lock")
    open(lock, "w").close()
    t = threading.Timer(0.2, lambda: os.unlink(lock))
    t.start()
    p = Pipeline()
    p.add("a", lambda: 1)
    rs = p.run(lock_path=lock, queue_wait_s=5.0)
    t.join()
    assert rs[0].status == "SUCCESS"
    assert not os.path.exists(lock)  # released after the run


def test_custom_notify_sink_receives_events():
    seen = []
    p = Pipeline(notify=seen.append)
    p.add("a", boom)
    p.run()
    assert [e["event"] for e in seen] == ["task_failed", "run_finished"]
