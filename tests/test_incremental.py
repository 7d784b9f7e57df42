"""IVM invariant: merging partials over ANY partition == direct aggregate."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from global_seismic_data_pipeline_spark.operators import incremental

KEYS = ["k"]
SPEC = {
    "n": ("count", "v"),
    "s": ("sum", "v"),
    "mn": ("min", "v"),
    "mx": ("max", "v"),
}


def _rows_df(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def _as_dict(df):
    return {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in df.collect()
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=1,
        max_size=30,
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=2), min_size=1, max_size=30),
)
def test_merge_over_any_partition_equals_direct(spark, rows, cuts):
    df = _rows_df(spark, rows)
    direct = incremental.partial_agg(df, KEYS, SPEC)
    # split rows into up to 3 arbitrary batches by the drawn cut labels
    batches = {}
    for i, row in enumerate(rows):
        batches.setdefault(cuts[i % len(cuts)], []).append(row)
    parts = [
        incremental.partial_agg(_rows_df(spark, b), KEYS, SPEC)
        for b in batches.values()
    ]
    merged = incremental.merge_partials(parts, KEYS, SPEC)
    assert _as_dict(merged) == _as_dict(direct)


def test_merge_is_idempotent_shape(spark):
    # a merged rollup merges again with a new delta (chained maintenance)
    d1 = _rows_df(spark, [("a", 1), ("b", 2)])
    d2 = _rows_df(spark, [("a", 10)])
    d3 = _rows_df(spark, [("b", -5), ("c", 7)])
    r12 = incremental.merge_partials(
        [incremental.partial_agg(d1, KEYS, SPEC), incremental.partial_agg(d2, KEYS, SPEC)],
        KEYS,
        SPEC,
    )
    r123 = incremental.merge_partials(
        [r12, incremental.partial_agg(d3, KEYS, SPEC)], KEYS, SPEC
    )
    direct = incremental.partial_agg(
        d1.unionByName(d2).unionByName(d3), KEYS, SPEC
    )
    assert _as_dict(r123) == _as_dict(direct)


def test_rejects_non_mergeable_metric(spark):
    df = _rows_df(spark, [("a", 1)])
    with pytest.raises(ValueError, match="avg"):
        incremental.partial_agg(df, KEYS, {"a": ("avg", "v")})
    with pytest.raises(ValueError):
        incremental.merge_partials([], KEYS, SPEC)
