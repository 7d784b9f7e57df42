"""As-of join semantics: latest-at-or-before per key, ties, no-match."""

from datetime import datetime

from global_seismic_data_pipeline_spark.operators.asof import asof_join


def test_asof_join_semantics(spark):
    t = datetime
    left = spark.createDataFrame(
        [
            (1, "L1", t(2025, 1, 1, 10)),   # after R@9 → 90
            (1, "L2", t(2025, 1, 1, 12)),   # exactly at R@12 → tie matches 120
            (1, "L3", t(2025, 1, 1, 8)),    # before any right → null
            (2, "L4", t(2025, 1, 1, 10)),   # key 2: after R@9 → 290
            (3, "L5", t(2025, 1, 1, 10)),   # key 3 has no right rows → null
        ],
        "k long, lid string, lt timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, t(2025, 1, 1, 9), 90.0),
            (1, t(2025, 1, 1, 12), 120.0),
            (1, t(2025, 1, 1, 13), 130.0),  # after every left row → unused
            (2, t(2025, 1, 1, 9), 290.0),
        ],
        "k long, rt timestamp, v double",
    )
    out = asof_join(
        left, right, on=["k"], left_time="lt", right_time="rt", value_cols=["v"]
    )
    got = {r.lid: r.v_asof for r in out.collect()}
    assert got == {"L1": 90.0, "L2": 120.0, "L3": None, "L4": 290.0, "L5": None}
    # all left rows preserved, left columns intact
    assert out.count() == 5
    assert set(out.columns) == {"k", "lid", "lt", "v_asof"}


def test_asof_null_payload_not_skipped(spark):
    """A genuine NULL value on the latest prior right row must be returned
    as NULL, not replaced by an older non-null value (ASOF picks rows,
    not values)."""
    t = datetime
    left = spark.createDataFrame(
        [(1, "L1", t(2025, 1, 1, 13))], "k long, lid string, lt timestamp"
    )
    right = spark.createDataFrame(
        [(1, t(2025, 1, 1, 9), 90.0), (1, t(2025, 1, 1, 12), None)],
        "k long, rt timestamp, v double",
    )
    out = asof_join(left, right, on=["k"], left_time="lt", right_time="rt",
                    value_cols=["v"])
    assert out.collect()[0].v_asof is None


def test_asof_join_matches_bruteforce(spark):
    import random

    rng = random.Random(5)
    left = [(rng.randrange(4), f"L{i}", datetime(2025, 1, 1, 0, rng.randrange(60)))
            for i in range(80)]
    right = [(rng.randrange(4), datetime(2025, 1, 1, 0, rng.randrange(60)),
              float(i)) for i in range(40)]
    # unique (k, rt) so tie-resolution is well-defined
    seen = set()
    right = [r for r in right if not (r[:2] in seen or seen.add(r[:2]))]

    ldf = spark.createDataFrame(left, "k long, lid string, lt timestamp")
    rdf = spark.createDataFrame(right, "k long, rt timestamp, v double")
    out = asof_join(ldf, rdf, on=["k"], left_time="lt", right_time="rt",
                    value_cols=["v"])
    got = {r.lid: r.v_asof for r in out.collect()}

    for k, lid, lt in left:
        cands = [(rt, v) for (rk, rt, v) in right if rk == k and rt <= lt]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, lid
