"""Morton key: Python-reference parity + the 2x2-block contiguity law."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from global_seismic_data_pipeline_spark.operators.zorder import morton_key


def _py_morton(x, y, bits):
    out = 0
    for b in range(bits):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**12 - 1),
            st.integers(min_value=0, max_value=2**12 - 1),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_matches_python_reference(spark, pts):
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", morton_key(F.col("x"), F.col("y"), bits=12).alias("z")
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == _py_morton(x, y, 12)


def test_block_contiguity(spark):
    # the defining locality law: a 2x2 block [2x,2x+1]x[2y,2y+1] maps to
    # 4 CONTIGUOUS keys starting at 4*morton(x, y)
    pts = [
        (2 * x + dx, 2 * y + dy)
        for x in range(4)
        for y in range(4)
        for dx in (0, 1)
        for dy in (0, 1)
    ]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", morton_key(F.col("x"), F.col("y"), bits=8).alias("z")
        ).collect()
    }
    for x in range(4):
        for y in range(4):
            base = 4 * _py_morton(x, y, 8)
            assert got[(2 * x, 2 * y)] == base
            assert got[(2 * x + 1, 2 * y)] == base + 1
            assert got[(2 * x, 2 * y + 1)] == base + 2
            assert got[(2 * x + 1, 2 * y + 1)] == base + 3


def test_validates_bits(spark):
    df = spark.createDataFrame([(1, 1)], "x long, y long")
    with pytest.raises(ValueError):
        df.select(morton_key(F.col("x"), F.col("y"), bits=0))
    with pytest.raises(ValueError):
        df.select(morton_key(F.col("x"), F.col("y"), bits=32))
