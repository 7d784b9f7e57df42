"""Shared writer-conf discipline for the table-format sources."""

from __future__ import annotations

import contextlib

from pyspark.sql import SparkSession


@contextlib.contextmanager
def conf_pinned(spark: SparkSession, key: str, value: str):
    """Set a session conf for the duration of an EAGER operation and
    restore the caller's prior value after — writer confs like
    ``spark.sql.parquet.fieldId.write.enabled`` or
    ``spark.sql.parquet.outputTimestampType`` must not leak into
    unrelated writes on a shared session. Only safe around actions:
    lazy plans consume SQL confs at execution time, so a READ conf
    needed when a returned scan later executes must intentionally stay
    set (see the iceberg fieldId reader note)."""
    prior = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)
