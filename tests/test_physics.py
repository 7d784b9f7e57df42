"""Physics formulas vs closed-form Python (SURVEY.md §5.1), including
parity between the native expressions and the reference's UDF semantics
(ref: 04_silver_transformation.py:134-152 vs calculations.py:66-116)."""

import math
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from global_seismic_data_pipeline_spark.functions import physics
from global_seismic_data_pipeline_spark.functions.risk import (
    depth_category,
    risk_level,
)

MAGS = [0.0, 2.49, 2.5, 3.9, 4.0, 5.0, 5.99, 6.0, 7.0, 8.1, 9.5]
DEPTHS = [0.0, 33.0, 69.9, 70.0, 299.9, 300.0, 700.0]


def _round(x: float, n: int) -> float:
    """Spark's F.round semantics: HALF_UP over BigDecimal.valueOf(double),
    i.e. the double's *shortest decimal string* (= Python repr), not its
    exact binary expansion, and not Python round's banker's rounding."""
    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP))


@pytest.fixture(scope="module")
def grid(spark):
    rows = [(m, d) for m in MAGS for d in DEPTHS]
    return spark.createDataFrame(rows, "mag double, depth double")


def test_energy_matches_closed_form(grid):
    out = grid.select("mag", physics.energy_joules(F.col("mag")).alias("e")).collect()
    for r in out:
        assert r.e == pytest.approx(10 ** (1.5 * r.mag + 4.8), rel=1e-12)


def test_energy_native_equals_udf_form(grid):
    """The reference computes energy via a Python UDF (04:134-135); prove the
    native expression is value-identical."""
    udf = F.udf(lambda m: math.pow(10, 1.5 * m + 4.8) if m is not None else None,
                DoubleType())
    out = grid.select(
        physics.energy_joules(F.col("mag")).alias("native"),
        udf(F.col("mag")).alias("via_udf"),
    ).collect()
    for r in out:
        assert r.native == pytest.approx(r.via_udf, rel=1e-12)


def test_mercalli_and_derived(grid):
    out = grid.select(
        "mag", "depth",
        physics.mercalli_intensity(F.col("mag"), F.col("depth")).alias("mmi"),
        physics.rupture_length_km(F.col("mag")).alias("rl"),
        physics.tsunami_risk_score(F.col("mag"), F.col("depth")).alias("ts"),
    ).collect()
    for r in out:
        want_mmi = _round(1.5 * r.mag - 2.5 * math.log10(r.depth + 1) + 2.0, 1)
        assert r.mmi == pytest.approx(want_mmi, abs=1e-9)
        assert r.rl == pytest.approx(_round(10 ** (0.74 * r.mag - 3.55), 2), abs=1e-9)
        want_ts = _round(
            r.mag * 15 - r.depth * 0.2
            + (25 if r.depth < 70 else 0)
            + (30 if r.mag >= 7 else 0),
            1,
        )
        assert r.ts == pytest.approx(want_ts, abs=1e-9)


def test_risk_level_native_equals_udf_thresholds(grid):
    """Native when-chain vs the reference risk UDF (04:142-147)."""

    def ref_risk(m):
        if m >= 7.0:
            return "CRITICAL"
        if m >= 6.0:
            return "HIGH"
        if m >= 5.0:
            return "MODERATE"
        if m >= 4.0:
            return "LOW"
        return "MINIMAL"

    udf = F.udf(ref_risk, StringType())
    out = grid.select(
        risk_level(F.col("mag")).alias("native"), udf(F.col("mag")).alias("via_udf")
    ).collect()
    assert all(r.native == r.via_udf for r in out)


def test_depth_category_boundaries(grid):
    out = grid.select("depth", depth_category(F.col("depth")).alias("c")).collect()
    for r in out:
        want = "SHALLOW" if r.depth < 70 else ("INTERMEDIATE" if r.depth < 300 else "DEEP")
        assert r.c == want


def test_tsunami_potential_boundary(spark):
    rows = [(7.0, 69.9, True), (7.0, 70.0, False), (6.99, 10.0, False)]
    df = spark.createDataFrame([(m, d) for m, d, _ in rows], "mag double, depth double")
    got = df.select(
        physics.tsunami_potential(F.col("mag"), F.col("depth")).alias("t")
    ).collect()
    assert [r.t for r in got] == [w for _, _, w in rows]
