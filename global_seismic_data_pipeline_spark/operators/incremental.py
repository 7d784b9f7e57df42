"""Incremental aggregate maintenance (materialized-view deltas).

At 100 TB you do not recompute a gold rollup from scratch when a day of
data lands — you aggregate the DELTA and merge it into the stored rollup.
That works exactly when every metric is a commutative monoid: sum and
count merge by sum, min/max by min/max; avg is NOT mergeable and must be
stored as (sum, count) and derived on read. Float sums are associative
only approximately, so metrics that must stay bit-stable across arbitrary
re-partitioning/merge orders should be carried as exact integers (e.g.
cents) — the same exactness discipline as the rest of the engine.

``partial_agg`` produces a mergeable partial from raw rows; ``merge_partials``
folds any number of partials (stored rollup + new deltas) into the same
shape. INVARIANT (pinned by tests + driver oracle): merging partials over
any partition of the input equals aggregating the whole input directly.

Shape: each delta aggregates map-side-partial on its own (small) data; the
merge shuffles only rollup-sized tables (|keys| rows), never the raw facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# metric -> (raw aggregate, merge aggregate)
_MERGE_FN = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _validate(spec: dict[str, tuple[str, str]]) -> None:
    for out, (fn, _col) in spec.items():
        if fn not in _MERGE_FN:
            raise ValueError(
                f"{out}: '{fn}' is not mergeable (supported: "
                f"{sorted(_MERGE_FN)}; store avg as sum+count)"
            )


def partial_agg(
    df: DataFrame, keys: list[str], spec: dict[str, tuple[str, str]]
) -> DataFrame:
    """Aggregate raw rows into a mergeable partial.

    ``spec`` maps output column -> (fn, source col) with fn in
    sum/count/min/max (count ignores its source col).
    """
    _validate(spec)
    aggs = [
        _MERGE_FN[fn][0](col).alias(out) for out, (fn, col) in spec.items()
    ]
    return df.groupBy(*keys).agg(*aggs)


def merge_partials(
    parts: list[DataFrame], keys: list[str], spec: dict[str, tuple[str, str]]
) -> DataFrame:
    """Fold partials (stored rollup + deltas) into one combined rollup of
    the same schema — equal to ``partial_agg`` over the union of the raw
    inputs."""
    _validate(spec)
    if not parts:
        raise ValueError("parts must be non-empty")
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    aggs = [
        _MERGE_FN[fn][1](out).alias(out) for out, (fn, _col) in spec.items()
    ]
    return unioned.groupBy(*keys).agg(*aggs)
