"""Catalog scan-layer invariants.

The driver regenerates /root/testdata per round and has historically flipped
the parquet timestamp physical type (ns in round 1, tz-naive us in round 2).
``load_table`` must absorb BOTH so every downstream query sees TIMESTAMP_LTZ
under a UTC session — TIMESTAMP_NTZ breaks ``unix_micros``/date arithmetic
and stringifies differently from the DuckDB oracle.
"""

from __future__ import annotations

import os

import pytest

from global_seismic_data_pipeline_spark.sources.catalog import (
    TABLE_NAMES,
    load_table,
    register_views,
)

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


def test_no_ntz_timestamps_after_load(spark):
    for name in TABLE_NAMES:
        df = load_table(spark, SF, name)
        ntz = [
            f.name
            for f in df.schema.fields
            if f.dataType.simpleString() == "timestamp_ntz"
        ]
        assert not ntz, f"{name}: NTZ columns leaked through the catalog: {ntz}"


def test_session_normalized_even_for_foreign_sessions(spark):
    # Simulate a driver-owned session with non-UTC tz and NTZ inference on.
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        df = load_table(spark, SF, "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert df.schema["ts"].dataType.simpleString() == "timestamp"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_unix_micros_works_on_event_ts(spark):
    # The exact operation NTZ breaks: epoch extraction must run and agree
    # with DuckDB's treat-naive-as-UTC reading.
    from pyspark.sql import functions as F

    df = load_table(spark, SF, "events")
    row = (
        df.orderBy("event_id")
        .limit(1)
        .select(F.unix_micros("ts").alias("us"), "ts")
        .collect()[0]
    )
    assert row["us"] is not None

    import duckdb

    (exp,) = duckdb.connect().execute(
        "SELECT epoch_us(ts) FROM read_parquet(?) ORDER BY event_id LIMIT 1",
        [f"{SF}/events.parquet"],
    ).fetchone()
    assert row["us"] == exp


def test_register_views_exposes_all_tables(spark):
    register_views(spark, SF)
    for name in TABLE_NAMES:
        assert spark.sql(f"SELECT * FROM {name} LIMIT 1").count() >= 0
