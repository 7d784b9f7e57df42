"""SCD Type 2 history build: no-op collapse, gapless half-open intervals,
point-in-time reconstruction (operators/scd.py)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from global_seismic_data_pipeline_spark.operators import scd

T = datetime


@pytest.fixture()
def changes(spark):
    rows = [
        (1, T(2025, 1, 1), "bronze"),
        (1, T(2025, 2, 1), "bronze"),   # no-op: must not fragment
        (1, T(2025, 3, 1), "silver"),
        (1, T(2025, 5, 1), "gold"),
        (2, T(2025, 1, 15), "silver"),
        (3, T(2025, 2, 1), None),       # genuinely-null attribute
        (3, T(2025, 3, 1), "bronze"),
        (3, T(2025, 4, 1), None),       # back to null = a real change
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, tier string")


def test_scd2_versions_and_noop_collapse(spark, changes):
    hist = scd.scd2_build(
        changes, key_cols=["user_id"], ts_col="ts", attr_cols=["tier"]
    ).collect()
    by_user = {}
    for r in hist:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user[1]) == 3  # the 2025-02-01 no-op collapsed
    v = sorted(by_user[1], key=lambda r: r.valid_from)
    assert [r.tier for r in v] == ["bronze", "silver", "gold"]
    # half-open adjacency: each valid_to == next valid_from; last is open
    assert v[0].valid_to == v[1].valid_from
    assert v[1].valid_to == v[2].valid_from
    assert v[2].valid_to is None and v[2].is_current == 1
    assert [r.is_current for r in v] == [0, 0, 1]
    assert len(by_user[2]) == 1 and by_user[2][0].is_current == 1


def test_scd2_null_attribute_transitions(spark, changes):
    """null → value → null are three REAL versions (null-safe change
    detection); a leading null version is kept as the first row."""
    hist = sorted(
        (r for r in scd.scd2_build(
            changes, key_cols=["user_id"], ts_col="ts", attr_cols=["tier"]
        ).collect() if r.user_id == 3),
        key=lambda r: r.valid_from,
    )
    assert [r.tier for r in hist] == [None, "bronze", None]
    assert [r.is_current for r in hist] == [0, 0, 1]


def test_scd2_as_of_reconstruction(spark, changes):
    hist = scd.scd2_build(
        changes, key_cols=["user_id"], ts_col="ts", attr_cols=["tier"]
    )
    at = {
        r.user_id: r.tier
        for r in scd.as_of(hist, T(2025, 3, 15)).collect()
    }
    assert at == {1: "silver", 2: "silver", 3: "bronze"}
    # exactly at a change boundary: the NEW version applies (half-open)
    at2 = {r.user_id: r.tier for r in scd.as_of(hist, T(2025, 3, 1)).collect()}
    assert at2[1] == "silver" and at2[3] == "bronze"
    # before any change: no rows for that user
    assert 1 not in {
        r.user_id for r in scd.as_of(hist, T(2024, 12, 1)).collect()
    }


def test_scd2_validation(spark, changes):
    with pytest.raises(ValueError):
        scd.scd2_build(changes, key_cols=[], ts_col="ts", attr_cols=["tier"])
    with pytest.raises(ValueError):
        scd.scd2_build(changes, key_cols=["user_id"], ts_col="ts", attr_cols=[])
