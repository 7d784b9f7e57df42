"""Reference dimension data (broadcast-sized lookup tables).

Row values reproduce the reference's literal seed data
(ref: 01_config_setup.py:83-96 tectonic regions; 01_config_setup.py:120-126
risk bands) so classification results are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import schemas

TECTONIC_REGIONS = [
    ("CALIFORNIA", "California", -125.0, -114.0, 32.0, 42.0, 1, "transform"),
    ("ALASKA", "Alaska", -180.0, -130.0, 50.0, 72.0, 2, "subduction"),
    ("JAPAN", "Japan", 128.0, 148.0, 30.0, 46.0, 3, "subduction"),
    ("INDONESIA", "Indonesia", 95.0, 140.0, -11.0, 6.0, 4, "subduction"),
    ("CHILE", "Chile", -76.0, -66.0, -56.0, -17.0, 5, "subduction"),
    ("PHILIPPINES", "Philippines", 116.0, 128.0, 5.0, 20.0, 6, "subduction"),
    ("MEXICO", "Mexico", -118.0, -86.0, 14.0, 33.0, 7, "subduction"),
    ("MEDITERRANEAN", "Mediterranean", -10.0, 40.0, 30.0, 46.0, 8, "collision"),
    ("HIMALAYA", "Himalaya", 70.0, 100.0, 25.0, 40.0, 9, "collision"),
    ("CARIBBEAN", "Caribbean", -90.0, -60.0, 10.0, 25.0, 10, "complex"),
    ("NEW_ZEALAND", "New Zealand", 165.0, 180.0, -50.0, -34.0, 11, "transform"),
    ("OTHER", "Other Regions", -180.0, 180.0, -90.0, 90.0, 99, "unknown"),
]

RISK_CLASSIFICATION = [
    ("CRITICAL", 1, 7.0, None, "#FF0000"),
    ("HIGH", 2, 6.0, 7.0, "#FF6600"),
    ("MODERATE", 3, 5.0, 6.0, "#FFCC00"),
    ("LOW", 4, 4.0, 5.0, "#99CC00"),
    ("MINIMAL", 5, 2.0, 4.0, "#00CC00"),
]


def tectonic_regions(spark: SparkSession) -> DataFrame:
    """12-row bounding-box dimension, incl. the OTHER catch-all (priority 99)."""
    return spark.createDataFrame(TECTONIC_REGIONS, schemas.REF_TECTONIC_REGIONS)


def risk_classification(spark: SparkSession) -> DataFrame:
    """5-row magnitude band dimension; CRITICAL has an open upper bound."""
    return spark.createDataFrame(RISK_CLASSIFICATION, schemas.REF_RISK_CLASSIFICATION)
