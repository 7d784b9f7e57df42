"""Seismic physics formulas as native Catalyst expressions.

Formula semantics reproduce the reference exactly:
- Gutenberg-Richter energy: 04_silver_transformation.py:134-135 (UDF form)
  and calculations.py:66-69 (log form) — here native only (SURVEY §2.9: the
  UDF is the anti-pattern; parity is proven in tests).
- Mercalli intensity/scale: calculations.py:70-82
- Seismic moment, rupture length, aftershock, tsunami score, damage
  potential: calculations.py:83-113

All functions take/return Columns so they fuse into whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def energy_joules(mag: Column) -> Column:
    """Gutenberg-Richter: E = 10^(1.5*M + 4.8) joules (null-safe)."""
    return F.pow(F.lit(10.0), F.lit(1.5) * mag + F.lit(4.8))


def energy_joules_log(mag: Column) -> Column:
    """log10(E) = 1.5*M + 4.8, rounded to 2 (display form)."""
    return F.round(F.lit(1.5) * mag + F.lit(4.8), 2)


def mercalli_intensity(mag: Column, depth_km: Column) -> Column:
    """MMI = 1.5*M - 2.5*log10(D+1) + 2.0, rounded to 1."""
    return F.round(
        F.lit(1.5) * mag - F.lit(2.5) * F.log10(depth_km + F.lit(1)) + F.lit(2.0), 1
    )


def mercalli_scale(mmi: Column) -> Column:
    """Roman-numeral approximation bands over MMI."""
    return (
        F.when(mmi >= 10, "X+ (Extreme)")
        .when(mmi >= 8, "VIII-IX (Severe)")
        .when(mmi >= 6, "VI-VII (Strong)")
        .when(mmi >= 4, "IV-V (Moderate)")
        .when(mmi >= 2, "II-III (Weak)")
        .otherwise("I (Not Felt)")
    )


def seismic_moment_log(mag: Column) -> Column:
    """log10(M0) = 1.5*M + 9.1, rounded to 2."""
    return F.round(F.lit(1.5) * mag + F.lit(9.1), 2)


def rupture_length_km(mag: Column) -> Column:
    """Wells-Coppersmith: L = 10^(0.74*M - 3.55) km, rounded to 2."""
    return F.round(F.pow(F.lit(10.0), F.lit(0.74) * mag - F.lit(3.55)), 2)


def expected_aftershock_mag(mag: Column) -> Column:
    """Bath's law: M - 1.2, rounded to 1."""
    return F.round(mag - F.lit(1.2), 1)


def tsunami_risk_score(mag: Column, depth_km: Column) -> Column:
    """Composite: 15*M - 0.2*D + 25·[D<70] + 30·[M>=7], rounded to 1."""
    return F.round(
        (mag * F.lit(15))
        - (depth_km * F.lit(0.2))
        + F.when(depth_km < 70, F.lit(25)).otherwise(F.lit(0))
        + F.when(mag >= 7.0, F.lit(30)).otherwise(F.lit(0)),
        1,
    )


def damage_potential(mmi: Column) -> Column:
    """Damage index bands over MMI."""
    return (
        F.when(mmi >= 8, "EXTREME")
        .when(mmi >= 6, "HIGH")
        .when(mmi >= 4, "MODERATE")
        .when(mmi >= 2, "LOW")
        .otherwise("MINIMAL")
    )


def tsunami_potential(mag: Column, depth_km: Column) -> Column:
    """Boolean flag: M >= 7.0 and depth < 70 km
    (ref: 04_silver_transformation.py:159-162)."""
    return (mag >= 7.0) & (depth_km < 70)
