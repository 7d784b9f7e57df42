"""Dedup determinism + band-join/expression agreement (SURVEY.md §5.4
property tests), hypothesis-driven."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from global_seismic_data_pipeline_spark.operators import dedup
from global_seismic_data_pipeline_spark.operators.bands import band_expr, band_join
from global_seismic_data_pipeline_spark.refdata import RISK_CLASSIFICATION
from global_seismic_data_pipeline_spark.functions.risk import risk_level

_spark = None  # set by fixture-injected tests below


def test_dedup_exactly_one_per_key(spark, bronze_fixture):
    kept = dedup.keep_latest(bronze_fixture, ["event_id"], "ingestion_ts", ["batch_id"])
    per_key = kept.groupBy("event_id").count().filter(F.col("count") > 1).count()
    assert per_key == 0


def test_dedup_latest_wins_and_tiebreak(spark, bronze_fixture):
    kept = dedup.keep_latest(bronze_fixture, ["event_id"], "ingestion_ts", ["batch_id"])
    got = {r.event_id: (r.mag, r.batch_id) for r in kept.collect()}
    assert got["dup1"] == (4.5, "b2")  # later ingestion_ts wins
    assert got["dup2"] == (3.1, "b3")  # ingestion tie → max batch_id wins


def test_dedup_deterministic_across_runs(spark, bronze_fixture):
    a = sorted(
        (r.event_id, r.batch_id)
        for r in dedup.keep_latest(
            bronze_fixture.repartition(7), ["event_id"], "ingestion_ts", ["batch_id"]
        ).collect()
    )
    b = sorted(
        (r.event_id, r.batch_id)
        for r in dedup.keep_latest(
            bronze_fixture.repartition(3), ["event_id"], "ingestion_ts", ["batch_id"]
        ).collect()
    )
    assert a == b


@settings(max_examples=10, deadline=None)
@given(st.lists(st.floats(min_value=0.0, max_value=10.0,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=30))
def test_band_join_equals_band_expr(mags):
    """Property: broadcast band-join classification == when-chain
    classification for any magnitude sample (SURVEY §2.3 J5: 'both must
    agree'). The MINIMAL band's lower bound is 2.0 in refdata, so values
    below 2.0 fall out of the join — they are classified by the expression
    only; restrict the check to the joinable domain and separately assert
    the fallback."""
    spark = _spark
    df = spark.createDataFrame([(i, m) for i, m in enumerate(mags)], "id long, mag double")
    bands = spark.createDataFrame(
        RISK_CLASSIFICATION,
        "risk_level string, risk_rank int, min_magnitude double,"
        " max_magnitude double, color_code string",
    )
    joined = band_join(
        df, bands, value_col="mag", lo_col="min_magnitude",
        hi_col="max_magnitude", carry_cols=("risk_level",),
    )
    expr_df = df.withColumn("expr_level", risk_level(F.col("mag")))
    both = joined.join(expr_df.select("id", "expr_level"), "id")
    mismatches = both.filter(
        (F.col("mag") >= 2.0) & (F.col("risk_level") != F.col("expr_level"))
    ).count()
    assert mismatches == 0
    # below the bottom band the left join carries a null label (the
    # expression form says MINIMAL — refdata's band table starts at 2.0)
    below = joined.filter(F.col("mag") < 2.0)
    assert below.filter(F.col("risk_level").isNotNull()).count() == 0


def test_band_expr_partitions_the_line(spark):
    """Property: thresholds partition the magnitude line — every value maps
    to exactly one label and labels are monotone in value."""
    vals = [x / 10.0 for x in range(0, 101)]
    df = spark.createDataFrame([(v,) for v in vals], "mag double")
    out = df.select("mag", risk_level(F.col("mag")).alias("lvl")).orderBy("mag").collect()
    order = ["MINIMAL", "LOW", "MODERATE", "HIGH", "CRITICAL"]
    seen = [order.index(r.lvl) for r in out]
    assert seen == sorted(seen)  # monotone non-decreasing with magnitude


def pytest_configure(config):
    pass


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _bind_spark(spark):
    global _spark
    _spark = spark
