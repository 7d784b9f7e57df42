"""Stats-driven join planning: the decision flips at the documented
thresholds, and the executed plan really carries the chosen shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from global_seismic_data_pipeline_spark.operators import joinplan
from global_seismic_data_pipeline_spark.sources.warehouse import Warehouse


def _dim(spark, n=50):
    return spark.range(n).select(
        F.col("id").alias("k"), F.concat(F.lit("name-"), "id").alias("nm")
    )


def _fact(spark, n=5000, keys=50):
    return spark.range(n).select(
        F.col("id").alias("row_id"), (F.col("id") % keys).alias("k")
    )


def test_decision_flips_at_broadcast_threshold(spark):
    dim, fact = _dim(spark), _fact(spark)
    ds, fs = joinplan.join_stats(dim, "k"), joinplan.join_stats(fact, "k")
    assert ds["est_bytes"] < fs["est_bytes"]

    d = joinplan.choose_join_strategy(fs, ds)  # generous default budget
    assert d.strategy == "broadcast_right"
    # shrink the budget below the dim's footprint → shuffle
    d2 = joinplan.choose_join_strategy(
        fs, ds, broadcast_bytes=ds["est_bytes"] - 1
    )
    assert d2.strategy == "shuffle"
    # same budget but a bucketed layout available → bucketed wins
    d3 = joinplan.choose_join_strategy(
        fs, ds, broadcast_bytes=ds["est_bytes"] - 1,
        both_bucketed_on_keys=True,
    )
    assert d3.strategy == "bucketed"


def test_selinger_estimate_and_skew_flag(spark):
    dim, fact = _dim(spark), _fact(spark, n=5000, keys=50)
    ds, fs = joinplan.join_stats(dim, "k"), joinplan.join_stats(fact, "k")
    d = joinplan.choose_join_strategy(fs, ds)
    # n_l*n_r/max(ndv): 5000*50/~50 ≈ 5000 (HLL error ±2%)
    assert 4500 <= d.est_join_rows <= 5500
    actual = fact.join(dim, "k").count()
    assert actual == 5000
    # 100 rows/key on the fact side → skew warning at the default flag
    assert fs["skew"] > 50 and d.skew_warning
    # a near-unique key carries no warning
    us = joinplan.join_stats(_fact(spark, n=1000, keys=1000), "k")
    assert not joinplan.choose_join_strategy(us, ds).skew_warning


def test_broadcast_decision_reaches_physical_plan(spark):
    dim, fact = _dim(spark), _fact(spark)
    ds, fs = joinplan.join_stats(dim, "k"), joinplan.join_stats(fact, "k")
    d = joinplan.choose_join_strategy(fs, ds)
    out = joinplan.apply_strategy(fact, dim, "k", d)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert out.count() == 5000


def test_bucketed_decision_joins_without_exchange(spark, tmp_path):
    """Both sides written bucketed on the key: the planner picks
    'bucketed' and the physical plan has a join with NO Exchange."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    n_b = 4
    l = wh.save_bucketed(
        _fact(spark, n=2000), "jp_fact", ("k",), num_buckets=n_b,
        sort_cols=("k",),
    )
    r = wh.save_bucketed(
        _dim(spark), "jp_dim", ("k",), num_buckets=n_b, sort_cols=("k",)
    )
    ls, rs = joinplan.join_stats(l, "k"), joinplan.join_stats(r, "k")
    d = joinplan.choose_join_strategy(
        ls, rs, broadcast_bytes=0, both_bucketed_on_keys=True
    )
    assert d.strategy == "bucketed"
    # our planner said don't broadcast (budget 0) — mirror that decision
    # in Spark's conf, else its own autoBroadcast overrides the layout
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = joinplan.apply_strategy(l, r, "k", d)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan and "Exchange" not in plan
        assert out.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.sql("DROP TABLE IF EXISTS jp_fact")
    spark.sql("DROP TABLE IF EXISTS jp_dim")


def test_schema_row_bytes_accounting(spark):
    import pyspark.sql.types as T

    s = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
        T.StructField("c", T.IntegerType()),
    ])
    assert joinplan.schema_row_bytes(s) == 8 + 20 + 4


def test_analyze_store_then_plan_without_data(spark, tmp_path):
    """ANALYZE writes the stats row once; planning later reads ONLY the
    stored row (the data can be gone) and reproduces the decision.
    Re-analyzing upserts in place; unanalyzed pairs refuse loudly."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    dim, fact = _dim(spark), _fact(spark)
    joinplan.analyze_table(wh, dim, "dim", "k")
    joinplan.analyze_table(wh, fact, "fact", "k")

    ds = joinplan.stored_join_stats(wh, "dim", "k")
    fs = joinplan.stored_join_stats(wh, "fact", "k")
    live = joinplan.choose_join_strategy(
        joinplan.join_stats(fact, "k"), joinplan.join_stats(dim, "k")
    )
    stored = joinplan.choose_join_strategy(fs, ds)
    assert stored.strategy == live.strategy == "broadcast_right"
    assert stored.est_join_rows == live.est_join_rows

    # upsert: re-analyze a grown fact, the row is replaced not duplicated
    joinplan.analyze_table(wh, _fact(spark, n=9000), "fact", "k")
    assert wh.read(joinplan.STATS_TABLE).count() == 2
    assert joinplan.stored_join_stats(wh, "fact", "k")["n_rows"] == 9000

    with pytest.raises(KeyError, match="never|no stored"):
        joinplan.stored_join_stats(wh, "fact", "other_key")


def test_plan_join_stored_stats_default_no_data_scan(spark, tmp_path):
    """plan_join's default path reads ONLY stored stats: the data tables
    are never registered in the warehouse and no fallback df is passed,
    so a data scan is impossible by construction — yet the decision
    matches the inline-profile path. A stats miss with a fallback df
    warns loudly; a miss without one refuses."""
    import warnings

    wh = Warehouse(spark, str(tmp_path / "wh"))
    dim, fact = _dim(spark), _fact(spark)
    joinplan.analyze_table(wh, dim, "dim", "k")
    joinplan.analyze_table(wh, fact, "fact", "k")

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any fallback warning → fail
        stored = joinplan.plan_join(wh, "fact", "dim", "k")
    live = joinplan.choose_join_strategy(
        joinplan.join_stats(fact, "k"), joinplan.join_stats(dim, "k")
    )
    assert stored.strategy == live.strategy == "broadcast_right"
    assert stored.est_join_rows == live.est_join_rows

    # miss + fallback df: plans, but with the loud scan warning
    with pytest.warns(RuntimeWarning, match="inline profile SCAN"):
        d = joinplan.plan_join(
            wh, "fact", "other_dim", "k", right_df=_dim(spark, n=20)
        )
    assert d.strategy == "broadcast_right"

    # miss + no fallback: refuse
    with pytest.raises(KeyError, match="no stored join stats"):
        joinplan.plan_join(wh, "fact", "missing", "k")


def test_maintenance_refresh_join_stats(spark, tmp_path):
    """The maintenance ANALYZE step refreshes the planner's stored rows:
    after a table grows, refresh_join_stats updates n_rows in place and
    plan_join sees the new numbers without scanning at plan time."""
    from global_seismic_data_pipeline_spark.pipeline import maintenance

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.overwrite(_dim(spark), "dim")
    wh.overwrite(_fact(spark, n=2000), "fact")
    n = maintenance.refresh_join_stats(
        wh, [("dim", "k"), ("fact", "k"), ("ghost", "k")]
    )
    assert n == 2  # ghost skipped
    assert joinplan.stored_join_stats(wh, "fact", "k")["n_rows"] == 2000

    wh.overwrite(_fact(spark, n=7000), "fact")
    maintenance.refresh_join_stats(wh, [("fact", "k")])
    assert joinplan.stored_join_stats(wh, "fact", "k")["n_rows"] == 7000
    assert wh.read(joinplan.STATS_TABLE).count() == 2  # upsert, no dupes
