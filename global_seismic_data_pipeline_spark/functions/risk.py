"""Risk / depth-category classification expressions.

Threshold semantics reproduce the reference's UDFs
(04_silver_transformation.py:134-152) as native when-chains; the band-join
equivalent lives in ``operators.bands`` (both forms must agree — tests
enforce it).
"""

from __future__ import annotations

from pyspark.sql import Column

from ..operators.bands import band_expr

RISK_THRESHOLDS = [(7.0, "CRITICAL"), (6.0, "HIGH"), (5.0, "MODERATE"), (4.0, "LOW")]
DEPTH_THRESHOLDS = [(300.0, "DEEP"), (70.0, "INTERMEDIATE")]

# gold_regional_risk score bands (05_gold_aggregation.py:68-75)
RISK_SCORE_THRESHOLDS = [
    (100.0, "CRITICAL"),
    (50.0, "HIGH"),
    (20.0, "MODERATE"),
    (5.0, "LOW"),
]


def risk_level(mag: Column) -> Column:
    """>=7 CRITICAL, >=6 HIGH, >=5 MODERATE, >=4 LOW, else MINIMAL."""
    return band_expr(mag, RISK_THRESHOLDS, "MINIMAL")


def depth_category(depth_km: Column) -> Column:
    """<70 SHALLOW, <300 INTERMEDIATE, else DEEP."""
    return band_expr(depth_km, DEPTH_THRESHOLDS, "SHALLOW")


def risk_level_from_score(score: Column) -> Column:
    """Aggregate risk-score bands (05_gold_aggregation.py:68-75)."""
    return band_expr(score, RISK_SCORE_THRESHOLDS, "MINIMAL")
