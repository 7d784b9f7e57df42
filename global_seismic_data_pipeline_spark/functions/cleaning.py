"""Validation & cleaning expressions.

Semantics reproduce 04_silver_transformation.py:62-84: not-null key filter,
coordinate range filter, depth clamp (null→33, <0→0, >700→700), magnitude
default 2.5, event-type normalization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def clamp(
    value: Column,
    *,
    null_default: float,
    lo: float,
    hi: float,
) -> Column:
    """null → default; < lo → lo; > hi → hi; else unchanged."""
    return (
        F.when(value.isNull(), F.lit(null_default))
        .when(value < lo, F.lit(float(lo)))
        .when(value > hi, F.lit(float(hi)))
        .otherwise(value)
    )


def normalize_type(raw: Column, *, synonyms: tuple[str, ...], canonical: str) -> Column:
    """lower-case; map synonyms to the canonical label; null → canonical."""
    low = F.lower(raw)
    return F.when(low.isin(*synonyms), F.lit(canonical)).otherwise(
        F.coalesce(low, F.lit(canonical))
    )


def validate_events(df: DataFrame) -> DataFrame:
    """The reference's silver validation filter
    (04_silver_transformation.py:62-67)."""
    return df.filter(
        F.col("event_id").isNotNull()
        & F.col("time").isNotNull()
        & F.col("latitude").between(-90, 90)
        & F.col("longitude").between(-180, 180)
    )


def clean_events(df: DataFrame) -> DataFrame:
    """The reference's silver cleaning pass
    (04_silver_transformation.py:69-84)."""
    return (
        df.withColumn("depth", clamp(F.col("depth"), null_default=33.0, lo=0, hi=700))
        .withColumn("mag", F.coalesce(F.col("mag"), F.lit(2.5)))
        .withColumn(
            "type",
            normalize_type(
                F.col("type"), synonyms=("earthquake", "eq"), canonical="earthquake"
            ),
        )
    )
