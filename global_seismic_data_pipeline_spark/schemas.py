"""Canonical schemas of the seismic data model.

Reproduces the reference's explicitly-declared StructTypes
(ref: 02_ingestion.py:44-66 bronze; 01_config_setup.py:40-49 control;
01_config_setup.py:98-107,128-134 reference dims). Silver adds the
enrichment columns listed in SURVEY.md §1.3.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

BRONZE_EARTHQUAKES = StructType(
    [
        StructField("event_id", StringType(), False),
        StructField("time", TimestampType(), False),
        StructField("latitude", DoubleType(), True),
        StructField("longitude", DoubleType(), True),
        StructField("depth", DoubleType(), True),
        StructField("mag", DoubleType(), True),
        StructField("mag_type", StringType(), True),
        StructField("nst", IntegerType(), True),
        StructField("gap", DoubleType(), True),
        StructField("dmin", DoubleType(), True),
        StructField("rms", DoubleType(), True),
        StructField("net", StringType(), True),
        StructField("place", StringType(), True),
        StructField("type", StringType(), True),
        StructField("status", StringType(), True),
        StructField("horizontal_error", DoubleType(), True),
        StructField("depth_error", DoubleType(), True),
        StructField("mag_error", DoubleType(), True),
        StructField("ingestion_ts", TimestampType(), True),
        StructField("ingestion_date", DateType(), True),
        StructField("batch_id", StringType(), True),
    ]
)

CONTROL_WATERMARK = StructType(
    [
        StructField("table_name", StringType(), False),
        StructField("watermark_column", StringType(), False),
        StructField("watermark_value", TimestampType(), True),
        StructField("last_updated", TimestampType(), True),
        StructField("records_processed", LongType(), True),
    ]
)

REF_TECTONIC_REGIONS = StructType(
    [
        StructField("region_code", StringType(), False),
        StructField("region_name", StringType(), False),
        StructField("min_lon", DoubleType(), False),
        StructField("max_lon", DoubleType(), False),
        StructField("min_lat", DoubleType(), False),
        StructField("max_lat", DoubleType(), False),
        StructField("priority", IntegerType(), False),
        StructField("plate_type", StringType(), True),
    ]
)

REF_RISK_CLASSIFICATION = StructType(
    [
        StructField("risk_level", StringType(), False),
        StructField("risk_rank", IntegerType(), False),
        StructField("min_magnitude", DoubleType(), False),
        StructField("max_magnitude", DoubleType(), True),
        StructField("color_code", StringType(), True),
    ]
)

# Columns silver adds on top of bronze (SURVEY.md §1.3); order matters for
# golden tests.
SILVER_ENRICHMENT_COLUMNS = [
    ("tectonic_region", StringType()),
    ("region_name", StringType()),
    ("energy_joules", DoubleType()),
    ("depth_category", StringType()),
    ("risk_level", StringType()),
    ("tsunami_potential", BooleanType()),
    ("event_time", TimestampType()),
    ("depth_km", DoubleType()),
    ("magnitude", DoubleType()),
    ("hour_of_day", IntegerType()),
    ("day_of_week", IntegerType()),
    ("day_of_month", IntegerType()),
    ("month", IntegerType()),
    ("quarter", IntegerType()),
    ("year", IntegerType()),
    ("processed_ts", TimestampType()),
]
