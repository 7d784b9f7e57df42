"""Approximate-distinct sketch: HLL++ error bound vs exact."""

from pyspark.sql import functions as F


def test_approx_count_distinct_error_bound(spark):
    n = 20000
    df = spark.range(n).select(
        (F.col("id") % 5).cast("string").alias("g"),
        (F.col("id") % 3517).alias("u"),  # 3517 distinct users per group
    )
    out = df.groupBy("g").agg(
        F.countDistinct("u").alias("exact"),
        F.approx_count_distinct("u", rsd=0.02).alias("approx"),
    )
    for r in out.collect():
        rel_err = abs(r.approx - r.exact) / r.exact
        # rsd=0.02 → ~2% standard error; 6% is a >3-sigma bound
        assert rel_err < 0.06, (r.g, r.exact, r.approx)


def test_approx_distinct_deterministic(spark):
    df = spark.range(5000).select((F.col("id") % 997).alias("u"))
    a = df.agg(F.approx_count_distinct("u")).collect()[0][0]
    b = df.repartition(7).agg(F.approx_count_distinct("u")).collect()[0][0]
    assert a == b  # HLL sketch merge is order/partitioning-insensitive
