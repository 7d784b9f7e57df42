"""Partition-count hygiene for compute-heavy operators.

Small parquet inputs arrive as one (or few) scan partitions — a single file
under ``spark.sql.files.maxPartitionBytes`` is one task, so a CPU-heavy
expression chain (MinHash signatures, LSH bucketing, n-gram shingling) runs
on one core no matter how many the cluster has. ``ensure_parallelism``
repartitions ONLY when the input has fewer partitions than the session's
default parallelism: a no-op at 100 TB (thousands of scan partitions), a
32× unlock on local test files. The extra round-robin shuffle moves just
the raw rows once, before the expensive projection."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up to the session default parallelism iff under it."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
