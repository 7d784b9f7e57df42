"""Cleaning/validation semantics (ref: 04_silver_transformation.py:62-84)."""

from pyspark.sql import functions as F

from global_seismic_data_pipeline_spark.functions import cleaning


def test_validate_drops_bad_coords_and_null_keys(spark, bronze_fixture):
    valid = cleaning.validate_events(bronze_fixture)
    ids = {r.event_id for r in valid.select("event_id").collect()}
    assert "bad1" not in ids and "bad2" not in ids
    assert "jp1" in ids


def test_depth_clamp_boundaries(spark, bronze_fixture):
    cleaned = cleaning.clean_events(cleaning.validate_events(bronze_fixture))
    got = {
        r.event_id: (r.depth, r.mag, r.type)
        for r in cleaned.select("event_id", "depth", "mag", "type").collect()
    }
    assert got["clp1"][0] == 0.0        # negative clamped up
    assert got["clp2"][0] == 700.0      # >700 clamped down
    assert got["nul1"][0] == 33.0       # null depth default
    assert got["nul1"][1] == 2.5        # null mag default
    assert got["jp2"][0] == 70.0        # boundary passes through


def test_type_normalization(spark, bronze_fixture):
    cleaned = cleaning.clean_events(cleaning.validate_events(bronze_fixture))
    got = {r.event_id: r.type for r in cleaned.select("event_id", "type").collect()}
    assert got["typ1"] == "earthquake"  # 'EQ' synonym, case-insensitive
    assert got["typ2"] == "earthquake"  # null → canonical
    assert got["jp1"] == "earthquake"


def test_clamp_is_identity_inside_range(spark):
    df = spark.range(1).select(
        cleaning.clamp(F.lit(42.5), null_default=1.0, lo=0, hi=100).alias("v")
    )
    assert df.collect()[0].v == 42.5
