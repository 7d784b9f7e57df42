"""Map-side-pruned top-k per group: equivalence + actual pruning."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from global_seismic_data_pipeline_spark.operators import topk
from global_seismic_data_pipeline_spark.operators.topk import _local_prune


def _random_df(spark, n=500, groups=7, seed=11, nparts=6):
    rng = random.Random(seed)
    rows = [
        (i, f"g{rng.randrange(groups)}", float(rng.randrange(50)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["id", "grp", "val"]).repartition(nparts)


def _key(rows):
    return sorted((r["grp"], r["rn"], r["id"], r["val"]) for r in rows)


def test_pruned_equals_naive_with_ties(spark):
    df = _random_df(spark)  # val in [0,50): heavy ties incl. at boundary
    kw = dict(group_cols=["grp"], order_col="val", id_col="id", k=5)
    fast = topk.topk_per_group(df, **kw, prune=True).collect()
    naive = topk.topk_per_group(df, **kw, prune=False).collect()
    assert _key(fast) == _key(naive)
    assert len(fast) == 7 * 5


def test_pruned_equals_naive_ascending(spark):
    df = _random_df(spark, seed=12)
    kw = dict(
        group_cols=["grp"], order_col="val", id_col="id", k=3, descending=False
    )
    fast = topk.topk_per_group(df, **kw, prune=True).collect()
    naive = topk.topk_per_group(df, **kw, prune=False).collect()
    assert _key(fast) == _key(naive)


def test_local_prune_bounds_shuffle_rows(spark):
    nparts, groups, k = 6, 7, 5
    df = _random_df(spark, n=2000, groups=groups, nparts=nparts)
    pruned = df.mapInPandas(
        _local_prune(["grp"], ["grp", "val", "id"], [True, False, True], k),
        schema=df.schema,
    )
    n = pruned.count()
    assert n <= nparts * groups * k  # the whole point of the operator
    assert n >= groups * k  # and it kept enough to stay exact


def test_group_smaller_than_k_kept_whole(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 3.0), (3, "b", 1.0)], ["id", "grp", "val"]
    )
    out = topk.topk_per_group(
        df, group_cols=["grp"], order_col="val", id_col="id", k=10
    ).collect()
    assert len(out) == 3


def test_tie_at_boundary_resolved_by_id(spark):
    # four rows all val=1.0; k=2 must keep the two smallest ids
    df = spark.createDataFrame(
        [(i, "a", 1.0) for i in (9, 4, 7, 1)], ["id", "grp", "val"]
    ).repartition(3)
    out = topk.topk_per_group(
        df, group_cols=["grp"], order_col="val", id_col="id", k=2
    ).collect()
    assert sorted(r["id"] for r in out) == [1, 4]
