"""Interval (band) classification — join form and expression form.

The reference creates a band dimension (``ref_risk_classification``,
01_config_setup.py:120-137) but classifies with a UDF instead
(04_silver_transformation.py:142-147). SURVEY.md §2.3 J5 requires the new
engine to provide BOTH a broadcast non-equi band join and a native
when-chain expression, provably equivalent.

Scale notes: the band join broadcasts the (tiny) band table; the plan is a
BroadcastNestedLoopJoin over ~5 rows — effectively a map-side operation, no
shuffle. For wide fact tables the expression form is preferred (pure
whole-stage-codegen projection); the join form exists for user-supplied
band tables that are not known at plan-authoring time.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def band_join(
    df: DataFrame,
    bands: DataFrame,
    *,
    value_col: str,
    lo_col: str = "min_magnitude",
    hi_col: str = "max_magnitude",
    carry_cols: Sequence[str] = ("risk_level",),
    how: str = "left",
) -> DataFrame:
    """Left join ``df`` to the band whose [lo, hi) interval contains value.

    A null ``hi_col`` means an open upper bound. Bands are assumed disjoint
    (at most one match per row); rows below every band get nulls.
    """
    dim = bands.select(*carry_cols, lo_col, hi_col)
    cond = (F.col(value_col) >= F.col(lo_col)) & (
        F.col(hi_col).isNull() | (F.col(value_col) < F.col(hi_col))
    )
    return df.join(F.broadcast(dim), on=cond, how=how).drop(lo_col, hi_col)


def band_expr(
    value: Column,
    thresholds: Sequence[tuple[float, str]],
    default: str,
) -> Column:
    """When-chain classification: first (lo, label) with value >= lo wins.

    ``thresholds`` must be sorted descending by lo. Equivalent to the
    reference's risk UDF (04_silver_transformation.py:142-147) for
    thresholds [(7, CRITICAL), (6, HIGH), (5, MODERATE), (4, LOW)].
    """
    expr = F.lit(default)
    for lo, label in reversed(list(thresholds)):
        expr = F.when(value >= F.lit(lo), F.lit(label)).otherwise(expr)
    return expr
