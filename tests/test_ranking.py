"""Scalable global rank: exact equivalence with the single-partition
window forms, across partitions, batch boundaries, and tie runs."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from global_seismic_data_pipeline_spark.operators import ranking


def _data(spark, n=500, n_keys=40, seed=13):
    rng = random.Random(seed)
    rows = [(i, rng.randrange(n_keys), rng.randrange(5)) for i in range(n)]
    return spark.createDataFrame(rows, "row_id long, k long, k2 long")


@pytest.mark.parametrize("method", ["dense_rank", "rank"])
def test_matches_window_form_single_key(spark, method):
    df = _data(spark)
    got = ranking.ranked(df, ["k"], method=method, num_partitions=8)
    fn = F.dense_rank() if method == "dense_rank" else F.rank()
    exp = df.withColumn("rank", fn.over(Window.orderBy("k")).cast("long"))
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in exp.collect()}


@pytest.mark.parametrize("method", ["dense_rank", "rank"])
def test_matches_window_form_multi_key_desc(spark, method):
    df = _data(spark, n=300)
    got = ranking.ranked(
        df, ["k", "k2"], method=method, ascending=False, num_partitions=6
    )
    fn = F.dense_rank() if method == "dense_rank" else F.rank()
    exp = df.withColumn(
        "rank",
        fn.over(Window.orderBy(F.col("k").desc(), F.col("k2").desc())).cast("long"),
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in exp.collect()}


def test_tie_runs_across_arrow_batches(spark):
    """Long runs of equal keys + a tiny Arrow batch size force key runs to
    straddle batch boundaries inside a partition — the carry state must
    keep the rank constant through the run."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        rows = [(i, i // 50) for i in range(300)]  # 6 keys x 50-row runs
        df = spark.createDataFrame(rows, "row_id long, k long")
        for method, exp_fn in (("dense_rank", F.dense_rank), ("rank", F.rank)):
            got = ranking.ranked(df, ["k"], method=method, num_partitions=4)
            exp = df.withColumn(
                "rank", exp_fn().over(Window.orderBy("k")).cast("long")
            )
            assert {tuple(r) for r in got.collect()} == {
                tuple(r) for r in exp.collect()
            }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_no_window_node_and_parallel_partitions(spark):
    df = _data(spark, n=2000, n_keys=500)
    got = ranking.ranked(df, ["k"], num_partitions=8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # the whole point of the operator
    assert "MapInPandas" in plan
    n_parts = got.select(F.spark_partition_id().alias("p")).distinct().count()
    assert n_parts > 1  # genuinely parallel, not one collapsed task


def test_rejects_bad_method(spark):
    df = _data(spark, n=10)
    with pytest.raises(ValueError):
        ranking.ranked(df, ["k"], method="ntile")
