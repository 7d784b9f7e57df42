"""Schema-drift report + safe align-and-union (sources/evolution.py)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from global_seismic_data_pipeline_spark.sources import evolution


def test_schema_diff_reports_all_change_kinds(spark):
    old = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("mag", T.FloatType()),
            T.StructField("gone", T.StringType()),
            T.StructField("flips", T.LongType(), nullable=False),
        ]
    )
    new = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("mag", T.DoubleType()),
            T.StructField("fresh", T.StringType()),
            T.StructField("flips", T.LongType(), nullable=True),
        ]
    )
    diff = {d["column"]: d for d in evolution.schema_diff(old, new)}
    assert diff["fresh"]["change"] == "added"
    assert diff["gone"]["change"] == "removed"
    assert diff["mag"]["change"] == "type_changed"
    assert (diff["mag"]["from"], diff["mag"]["to"]) == ("float", "double")
    assert diff["flips"]["change"] == "nullability_changed"
    assert "id" not in diff
    assert evolution.schema_diff(old, old) == []


def test_evolve_union_aligns_and_widens(spark):
    canon = spark.createDataFrame(
        [(1, 2.5, "x")], "id long, mag double, src string"
    )
    batch = spark.createDataFrame([(2, 3)], "id int, mag int").withColumn(
        "extra", F.lit("dropped")
    )
    out = evolution.evolve_union(canon, batch)
    assert out.schema == canon.schema
    rows = {r.id: (r.mag, r.src) for r in out.collect()}
    assert rows == {1: (2.5, "x"), 2: (3.0, None)}


def test_evolve_union_rejects_lossy_cast(spark):
    canon = spark.createDataFrame([(1,)], "id long").withColumn(
        "mag", F.lit(1).cast("long")
    )
    batch = spark.createDataFrame([("7.5", "oops")], "id string, mag string")
    with pytest.raises(ValueError, match="unsafe type change"):
        evolution.evolve_union(canon, batch)
