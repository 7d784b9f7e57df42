"""GeoJSON earthquake source → bronze rows.

The reference ingests USGS FDSN GeoJSON over REST and flattens
``features[].properties`` + ``features[].geometry.coordinates`` into flat
rows driver-side (ref: 02_ingestion.py:170-207). This module provides:

- ``read_geojson`` — the Spark-first file form: ``spark.read.json`` +
  ``explode(features)`` + nested-field projection. Distributed, schema-on,
  no driver loop — the idiomatic path for bulk/backfill loads, and the one
  that scales (a directory of GeoJSON shards fans out across executors).
- ``feature_rows`` — the driver-side row flattener for REST page results
  (small incremental batches), byte-compatible with the file form.
- ``fetch_usgs_pages`` — optional REST pager (retry ×3 linear backoff,
  rate-limit sleep, limit/offset paging; ref: 02_ingestion.py:110-147).
  Network access is opt-in: hermetic runs use files (SURVEY.md §7 step 8).
"""

from __future__ import annotations

import time as _time
from collections.abc import Callable, Iterator
from datetime import date, datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..schemas import BRONZE_EARTHQUAKES

# features[].properties fields we keep, in bronze order, with their bronze
# column name (ref: 02_ingestion.py:190-201 — note camelCase → snake_case).
_PROP_FIELDS = [
    ("mag", "mag"),
    ("magType", "mag_type"),
    ("nst", "nst"),
    ("gap", "gap"),
    ("dmin", "dmin"),
    ("rms", "rms"),
    ("net", "net"),
    ("place", "place"),
    ("type", "type"),
    ("status", "status"),
    ("horizontalError", "horizontal_error"),
    ("depthError", "depth_error"),
    ("magError", "mag_error"),
]


# Explicit FeatureCollection read schema: no inference pass over the data,
# and absent properties resolve to null instead of failing analysis.
GEOJSON_SCHEMA = StructType([
    StructField("features", ArrayType(StructType([
        StructField("id", StringType()),
        StructField("properties", StructType([
            StructField("time", LongType()),
            StructField("mag", DoubleType()),
            StructField("magType", StringType()),
            StructField("nst", LongType()),
            StructField("gap", DoubleType()),
            StructField("dmin", DoubleType()),
            StructField("rms", DoubleType()),
            StructField("net", StringType()),
            StructField("place", StringType()),
            StructField("type", StringType()),
            StructField("status", StringType()),
            StructField("horizontalError", DoubleType()),
            StructField("depthError", DoubleType()),
            StructField("magError", DoubleType()),
        ])),
        StructField("geometry", StructType([
            StructField("coordinates", ArrayType(DoubleType())),
        ])),
    ]))),
])


def read_geojson(
    spark: SparkSession,
    path: str,
    *,
    ingestion_ts: datetime,
    batch_id: str,
) -> DataFrame:
    """Read FDSN GeoJSON file(s) into the bronze schema, distributed.

    ``properties.time`` is epoch **milliseconds** (ref: 02_ingestion.py:181
    divides by 1000); coordinates are [lon, lat, depth].
    """
    raw = spark.read.option("multiLine", "true").schema(GEOJSON_SCHEMA).json(path)
    feats = raw.select(F.explode("features").alias("f"))
    ing = F.lit(_naive(ingestion_ts)).cast("timestamp")
    cols = [
        F.col("f.id").cast("string").alias("event_id"),
        F.timestamp_millis(F.col("f.properties.time").cast("long")).alias("time"),
        # F.get (not getItem): null on missing index — ANSI mode would throw
        # on 2-element coordinate arrays with no depth
        F.get(F.col("f.geometry.coordinates"), 1).cast("double").alias("latitude"),
        F.get(F.col("f.geometry.coordinates"), 0).cast("double").alias("longitude"),
        F.get(F.col("f.geometry.coordinates"), 2).cast("double").alias("depth"),
    ]
    for src, dst in _PROP_FIELDS:
        typ = dict(zip(BRONZE_EARTHQUAKES.fieldNames(), BRONZE_EARTHQUAKES.fields))[
            dst
        ].dataType.simpleString()
        cols.append(F.col(f"f.properties.{src}").cast(typ).alias(dst))
    cols += [
        ing.alias("ingestion_ts"),
        ing.cast("date").alias("ingestion_date"),
        F.lit(batch_id).alias("batch_id"),
    ]
    out = feats.select(*cols)
    # enforce bronze column order + non-null keys
    return out.select(*BRONZE_EARTHQUAKES.fieldNames()).filter(
        F.col("event_id").isNotNull() & F.col("time").isNotNull()
    )


def _naive(dt: datetime) -> datetime:
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def feature_rows(
    features: list[dict],
    *,
    ingestion_ts: datetime,
    batch_id: str,
    min_event_time: datetime | None = None,
) -> list[dict]:
    """Driver-side flattener for REST page results
    (ref: 02_ingestion.py:170-207), incl. the same-day duplicate guard
    (``event_time <= min_event_time`` skipped, ref: 02_ingestion.py:182-183).
    """
    rows: list[dict] = []
    ing = _naive(ingestion_ts)
    min_t = _naive(min_event_time) if min_event_time else None
    for f in features:
        props = f.get("properties") or {}
        coords = (f.get("geometry") or {}).get("coordinates") or []
        t = props.get("time")
        if t is None:
            continue
        event_time = datetime.fromtimestamp(t / 1000, tz=timezone.utc).replace(
            tzinfo=None
        )
        if min_t is not None and event_time <= min_t:
            continue
        row = {
            "event_id": f.get("id"),
            "time": event_time,
            "latitude": coords[1] if len(coords) > 1 else None,
            "longitude": coords[0] if len(coords) > 0 else None,
            "depth": coords[2] if len(coords) > 2 else None,
            "ingestion_ts": ing,
            "ingestion_date": date(ing.year, ing.month, ing.day),
            "batch_id": batch_id,
        }
        for src, dst in _PROP_FIELDS:
            v = props.get(src)
            if dst == "nst" and v is not None:
                v = int(v)
            elif dst in {"mag", "gap", "dmin", "rms", "horizontal_error",
                         "depth_error", "mag_error"} and v is not None:
                v = float(v)
            row[dst] = v
        rows.append(row)
    return rows


def rows_to_bronze(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """Rows → bronze DataFrame with the explicit schema
    (ref: 02_ingestion.py:212)."""
    return spark.createDataFrame(rows, BRONZE_EARTHQUAKES)


def fetch_usgs_pages(
    start: datetime,
    end: datetime,
    *,
    min_magnitude: float = 1.0,
    page_limit: int = 20000,
    max_retries: int = 3,
    rate_limit_sec: float = 1.2,
    api_url: str = "https://earthquake.usgs.gov/fdsnws/event/1/query",
    http_get: Callable | None = None,
    sleep: Callable[[float], None] = _time.sleep,
) -> Iterator[list[dict]]:
    """Paged FDSN fetch with retry/backoff (ref: 02_ingestion.py:110-147).

    ``http_get`` is injectable for tests; default uses ``requests`` and is
    only imported on first use (network is opt-in, never in test paths).
    """
    if http_get is None:
        import requests  # deferred: hermetic runs never import it

        def http_get(url, params):
            r = requests.get(url, params=params, timeout=120)
            r.raise_for_status()
            return r.json()

    offset = 1
    while True:
        params = {
            "format": "geojson",
            "starttime": start.strftime("%Y-%m-%d"),
            "endtime": end.strftime("%Y-%m-%d"),
            "minmagnitude": min_magnitude,
            "orderby": "time",
            "limit": page_limit,
            "offset": offset,
        }
        feats: list[dict] = []
        for attempt in range(max_retries):
            try:
                sleep(rate_limit_sec)
                feats = (http_get(api_url, params) or {}).get("features", [])
                break
            except Exception:
                if attempt == max_retries - 1:
                    return
                sleep(5 * (attempt + 1))
        if not feats:
            return
        yield feats
        if len(feats) < page_limit:
            return
        offset += len(feats)
