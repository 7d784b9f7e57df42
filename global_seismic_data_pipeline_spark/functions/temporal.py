"""Temporal feature extraction (ref: 04_silver_transformation.py:175-180).

``dayofweek`` follows Spark semantics: 1 = Sunday … 7 = Saturday.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TEMPORAL_FEATURES = {
    "hour_of_day": F.hour,
    "day_of_week": F.dayofweek,
    "day_of_month": F.dayofmonth,
    "month": F.month,
    "quarter": F.quarter,
    "year": F.year,
}


def with_temporal_features(df: DataFrame, time_col: str = "time") -> DataFrame:
    """Add the six integer calendar features the silver layer carries."""
    out = df
    for name, fn in TEMPORAL_FEATURES.items():
        out = out.withColumn(name, fn(F.col(time_col)))
    return out
