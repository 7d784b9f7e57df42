"""Parquet-directory catalog.

Loads the driver's deterministic tables (TESTDATA.md) — or any directory of
``<name>.parquet`` files — as DataFrames and registers them as temp views so
the SQL surface (SURVEY.md §3 E3) works verbatim.

Scale notes: reads go through the vectorized parquet reader; explicit
filters/projections in downstream plans push into the scan (verified via
``.explain`` — PushedFilters / ReadSchema). No caching here: callers decide
what to persist.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


@lru_cache(maxsize=256)
def _nanos_timestamp_cols(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects (PARQUET_TYPE_ILLEGAL). Footer-only read — cheap."""
    import pyarrow.parquet as pa_pq

    schema = pa_pq.read_schema(path)
    return tuple(
        f.name for f in schema if str(f.type) == "timestamp[ns]"
    )


def _normalize_session(spark: SparkSession) -> None:
    """Make any SparkSession (including the driver's, which we don't build)
    read the testdata the way the DuckDB oracle does:

    - tz-naive parquet timestamps (``isAdjustedToUTC=false``) load as
      TIMESTAMP_LTZ, not TIMESTAMP_NTZ — NTZ breaks ``unix_micros``/datetime
      arithmetic and stringifies differently from the oracle;
    - session timezone UTC, so the LTZ interpretation of those naive wall
      times is the identity (DuckDB treats naive timestamps as UTC instants).

    Both confs are runtime-settable SQL confs, so this works on sessions we
    did not construct.
    """
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table; nanosecond timestamp columns are read as raw int64
    (``nanosAsLong``) and truncated to microsecond timestamps with exact
    integer division — the same truncation DuckDB applies, so oracle
    comparisons agree. Tz-naive micro/milli timestamps load as LTZ under a
    UTC session (see ``_normalize_session``)."""
    _normalize_session(spark)
    path = table_path(sf_dir, name)
    ns_cols = _nanos_timestamp_cols(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    for f in df.schema.fields:
        if f.dataType.simpleString() == "timestamp_ntz":
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Register each table as a temp view (idempotent) and return the dict."""
    tables = load_tables(spark, sf_dir, names)
    for n, df in tables.items():
        df.createOrReplaceTempView(n)
    return tables
