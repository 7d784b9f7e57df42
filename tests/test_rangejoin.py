"""Bin-bucketed interval join vs brute-force theta-join equivalence."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from global_seismic_data_pipeline_spark.operators.rangejoin import interval_join

T0 = datetime(2024, 1, 1, 0, 0, 0)
MIN_US = 60 * 1_000_000


def _events(spark, rows):
    return spark.createDataFrame(rows, "id long, ts timestamp, v double")


def _pairs_set(df):
    return {
        (r["id"], r["id_c"]) for r in df.select("id", "id_c").collect()
    }


def _brute(anchors, cands, lower_us, upper_us):
    a = anchors.select(F.col("id"), F.unix_micros("ts").alias("at"))
    c = cands.select(F.col("id").alias("id_c"), F.unix_micros("ts").alias("ct"))
    return a.crossJoin(c).where(
        (F.col("ct") > F.col("at") + lower_us)
        & (F.col("ct") <= F.col("at") + upper_us)
    )


def test_matches_brute_force_including_boundaries(spark):
    # Deltas exactly 0 (self), exactly upper, upper+1us, straddling bins.
    rows = []
    for i in range(40):
        rows.append((i, T0 + timedelta(seconds=137 * i), float(i)))
    rows += [
        (100, T0 + timedelta(minutes=10), 1.0),
        (101, T0 + timedelta(minutes=10), 2.0),  # duplicate timestamp
        (102, T0 + timedelta(minutes=40), 3.0),  # exactly upper for id=100
        (103, T0 + timedelta(minutes=40, microseconds=1), 4.0),  # just past
    ]
    df = _events(spark, rows)
    got = interval_join(df, df, lower_us=0, upper_us=30 * MIN_US)
    exp = _brute(df, df, 0, 30 * MIN_US)
    assert _pairs_set(got) == _pairs_set(exp)
    s = _pairs_set(got)
    assert (100, 102) in s      # delta == upper is included
    assert (100, 103) not in s  # just past upper
    assert (100, 100) not in s  # self excluded (delta 0)
    assert (100, 101) not in s and (101, 100) not in s  # dup-ts both ends


def test_nonzero_lower_bound(spark):
    rows = [(i, T0 + timedelta(minutes=3 * i), float(i)) for i in range(30)]
    df = _events(spark, rows)
    got = interval_join(df, df, lower_us=5 * MIN_US, upper_us=20 * MIN_US)
    exp = _brute(df, df, 5 * MIN_US, 20 * MIN_US)
    assert _pairs_set(got) == _pairs_set(exp)


def test_pair_multiplicity_no_duplicates(spark):
    # Equi-join on the 2 exploded bins must not double-count a pair.
    rows = [(i, T0 + timedelta(seconds=61 * i), float(i)) for i in range(50)]
    df = _events(spark, rows)
    got = interval_join(df, df, lower_us=0, upper_us=10 * MIN_US)
    n_pairs = got.count()
    assert n_pairs == len(_pairs_set(got))


def test_negative_lower_bound_and_pre_epoch(spark):
    # Near-epoch timestamps with a NEGATIVE lower bound push __lo below
    # zero: truncating div would collapse the two anchor bins into one
    # (emitting duplicate pairs) — floor-division must keep them distinct.
    epoch = datetime(1970, 1, 1, 0, 0, 0)
    rows = [(i, epoch + timedelta(minutes=2 * i), float(i)) for i in range(20)]
    df = _events(spark, rows)
    got = interval_join(df, df, lower_us=-10 * MIN_US, upper_us=10 * MIN_US)
    exp = _brute(df, df, -10 * MIN_US, 10 * MIN_US)
    assert _pairs_set(got) == _pairs_set(exp)
    assert got.count() == len(_pairs_set(got))  # no pair duplication


def test_rejects_empty_interval(spark):
    df = _events(spark, [(1, T0, 1.0)])
    with pytest.raises(ValueError):
        interval_join(df, df, lower_us=60, upper_us=60)


from hypothesis import HealthCheck, given, settings, strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    secs=st.lists(
        st.integers(min_value=0, max_value=3600), min_size=2, max_size=25
    ),
    bounds=st.tuples(
        st.integers(min_value=0, max_value=600),
        st.integers(min_value=1, max_value=1200),
    ),
)
def test_property_matches_brute_force(spark, secs, bounds):
    lo_s, span_s = bounds
    lower_us, upper_us = lo_s * 1_000_000, (lo_s + span_s) * 1_000_000
    rows = [
        (i, T0 + timedelta(seconds=s), float(i)) for i, s in enumerate(secs)
    ]
    df = _events(spark, rows)
    got = interval_join(df, df, lower_us=lower_us, upper_us=upper_us)
    exp = _brute(df, df, lower_us, upper_us)
    assert _pairs_set(got) == _pairs_set(exp)
    assert got.count() == len(_pairs_set(got))  # no pair duplication
