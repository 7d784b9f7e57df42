"""GeoJSON source: file form vs driver-side row form byte-compatibility
(ref: 02_ingestion.py:170-212)."""

import json
from datetime import datetime, timezone

import pytest

from global_seismic_data_pipeline_spark.schemas import BRONZE_EARTHQUAKES
from global_seismic_data_pipeline_spark.sources import geojson

ING = datetime(2025, 6, 1, 12, 0, 0)


def _feat(fid, t_ms, coords, **props):
    return {"type": "Feature", "id": fid,
            "properties": {"time": t_ms, **props},
            "geometry": {"type": "Point", "coordinates": coords}}


FEATURES = [
    _feat("q1", 1746057600000, [139.0, 35.0, 30.0], mag=5.0, magType="mb",
          nst=12, gap=45.0, place="Japan", type="earthquake", status="reviewed",
          horizontalError=1.2, depthError=0.4, magError=0.05, net="us",
          dmin=0.3, rms=0.9),
    _feat("q2", 1746144000000, [-120.0, 36.0], mag=4.0),          # no depth
    _feat("q3", None, [0.0, 0.0, 0.0], mag=3.0),                  # no time → dropped
    {"type": "Feature", "id": "q4", "properties": {"time": 1746230400000},
     "geometry": None},                                           # no geometry
]


def test_feature_rows_flattening():
    rows = geojson.feature_rows(FEATURES, ingestion_ts=ING, batch_id="b1")
    by_id = {r["event_id"]: r for r in rows}
    assert set(by_id) == {"q1", "q2", "q4"}  # q3 dropped (no time)
    q1 = by_id["q1"]
    assert q1["latitude"] == 35.0 and q1["longitude"] == 139.0 and q1["depth"] == 30.0
    assert q1["time"] == datetime(2025, 5, 1, tzinfo=timezone.utc).replace(tzinfo=None)
    assert q1["mag_type"] == "mb" and q1["horizontal_error"] == 1.2
    assert by_id["q2"]["depth"] is None
    assert by_id["q4"]["latitude"] is None


def test_same_day_duplicate_guard():
    rows = geojson.feature_rows(
        FEATURES, ingestion_ts=ING, batch_id="b1",
        min_event_time=datetime(2025, 5, 1, tzinfo=timezone.utc),
    )
    # q1 is exactly at the boundary → skipped (<= semantics, ref 02:182-183)
    assert {r["event_id"] for r in rows} == {"q2", "q4"}


def test_file_form_matches_row_form(spark, tmp_path):
    path = tmp_path / "batch.geojson"
    path.write_text(json.dumps({"type": "FeatureCollection", "features": FEATURES}))
    via_file = geojson.read_geojson(
        spark, str(path), ingestion_ts=ING, batch_id="b1"
    )
    # same names+types (nullability flags are advisory in Spark: literals
    # come out non-nullable)
    assert [(f.name, f.dataType) for f in via_file.schema.fields] == [
        (f.name, f.dataType) for f in BRONZE_EARTHQUAKES.fields
    ]

    via_rows = geojson.rows_to_bronze(
        spark, geojson.feature_rows(FEATURES, ingestion_ts=ING, batch_id="b1")
    )
    a = sorted(map(tuple, via_file.collect()))
    b = sorted(map(tuple, via_rows.collect()))
    assert a == b


def test_fetch_usgs_pages_paging_and_retry():
    calls = []
    pages = [[{"id": f"e{i}"} for i in range(3)], [{"id": "last"}]]

    def fake_get(url, params):
        calls.append(params["offset"])
        if len(calls) == 1:
            raise OSError("transient")
        return {"features": pages[0] if params["offset"] == 1 else pages[1]}

    got = list(geojson.fetch_usgs_pages(
        datetime(2025, 5, 1), datetime(2025, 5, 8),
        page_limit=3, http_get=fake_get, sleep=lambda s: None,
    ))
    assert [len(p) for p in got] == [3, 1]
    assert calls == [1, 1, 4]  # retry on same offset, then advance by page len
