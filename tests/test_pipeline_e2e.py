"""End-to-end golden pipeline test (SURVEY.md §5.3): synthetic GeoJSON →
bronze → silver → gold, deterministic via injected clock."""

import json
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from global_seismic_data_pipeline_spark.pipeline import bronze as bz
from global_seismic_data_pipeline_spark.pipeline import gold, silver
from global_seismic_data_pipeline_spark.pipeline.runner import build_pipeline
from global_seismic_data_pipeline_spark.sources.warehouse import Warehouse
from global_seismic_data_pipeline_spark.state import WatermarkStore

CLOCK = datetime(2025, 6, 1, 12, 0, 0)


def _feature(fid, t_ms, lon, lat, depth, mag, **props):
    p = {"time": t_ms, "mag": mag, "magType": "mb", "place": f"near {fid}",
         "type": "earthquake", "status": "reviewed", "net": "us"}
    p.update(props)
    return {"type": "Feature", "id": fid, "properties": p,
            "geometry": {"type": "Point", "coordinates": [lon, lat, depth]}}


def _ms(y, m, d, h=0):
    return int(datetime(y, m, d, h, tzinfo=timezone.utc).timestamp() * 1000)


@pytest.fixture(scope="module")
def geojson_file(tmp_path_factory):
    feats = [
        _feature("e1", _ms(2025, 5, 1, 1), 139.0, 35.0, 30.0, 5.2),   # Japan
        _feature("e2", _ms(2025, 5, 1, 2), -120.0, 36.0, 10.0, 7.3),  # California, tsunami
        _feature("e3", _ms(2025, 5, 2, 3), -30.0, 0.0, 500.0, 6.1),   # OTHER, deep
        _feature("e4", _ms(2025, 5, 2, 4), 139.5, 35.5, None, None),  # null depth+mag
        _feature("e5", _ms(2025, 5, 3, 5), 100.0, -2.0, 80.0, 4.4),   # Indonesia
    ]
    path = tmp_path_factory.mktemp("geo") / "quakes.geojson"
    path.write_text(json.dumps({"type": "FeatureCollection", "features": feats}))
    return str(path)


def test_full_pipeline_golden(spark, tmp_path, geojson_file):
    p = build_pipeline(
        spark, str(tmp_path / "wh"), geojson_path=geojson_file, clock=CLOCK
    )
    results = p.run()
    assert [r.status for r in results] == ["SUCCESS"] * len(results)
    by_name = {r.name: r.detail for r in results}
    assert by_name["ingestion"] == 5
    assert by_name["silver_transformation"] == 5

    wh = Warehouse(spark, str(tmp_path / "wh"))
    silver_rows = {r.event_id: r for r in wh.read("silver_earthquakes").collect()}
    assert silver_rows["e1"].tectonic_region == "JAPAN"
    assert silver_rows["e2"].tectonic_region == "CALIFORNIA"
    assert silver_rows["e2"].tsunami_potential is True
    assert silver_rows["e2"].risk_level == "CRITICAL"
    assert silver_rows["e3"].tectonic_region == "OTHER"
    assert silver_rows["e3"].depth_category == "DEEP"
    assert silver_rows["e4"].magnitude == 2.5 and silver_rows["e4"].depth_km == 33.0
    assert silver_rows["e5"].depth_category == "INTERMEDIATE"
    assert silver_rows["e1"].processed_ts == CLOCK  # injected clock, deterministic

    # golden gold_kpi_summary row (ref: 05_gold_aggregation.py:134-151)
    kpi = wh.read("gold_kpi_summary").collect()[0]
    assert kpi.total_earthquakes == 5
    assert kpi.max_magnitude == 7.3
    assert kpi.min_magnitude == 2.5
    assert kpi.critical_events == 1  # e2
    assert kpi.high_risk_events == 1  # e3
    assert kpi.tsunami_events == 1
    assert kpi.active_regions == 4
    assert kpi.avg_magnitude == round((5.2 + 7.3 + 6.1 + 2.5 + 4.4) / 5, 2)
    assert kpi.data_start == datetime(2025, 5, 1, 1)
    assert kpi.data_end == datetime(2025, 5, 3, 5)
    assert kpi.refresh_ts == CLOCK

    # region summary ranks: California has the only CRITICAL event → rank 1
    rs = {r.tectonic_region: r for r in wh.read("gold_region_summary").collect()}
    assert rs["CALIFORNIA"].risk_rank == 1
    assert set(rs) == {"JAPAN", "CALIFORNIA", "OTHER", "INDONESIA"}

    # temporal metrics: 3 days, rolling counts accumulate
    tm = {str(r.event_date): r for r in wh.read("gold_temporal_metrics").collect()}
    assert tm["2025-05-01"].total_events == 2
    assert tm["2025-05-02"].rolling_7d_count == 4
    assert tm["2025-05-03"].rolling_30d_count == 5

    # physics gold exists with all 19 columns (ref: calculations.py:136-147)
    pa = wh.read("gold_physics_analysis")
    assert pa.count() == 5 and len(pa.columns) == 19


def test_pipeline_rerun_is_incremental_noop(spark, tmp_path, geojson_file):
    root = str(tmp_path / "wh")
    build_pipeline(spark, root, geojson_path=geojson_file, clock=CLOCK).run()
    wh = Warehouse(spark, root)
    store = WatermarkStore(wh)
    first = store.get("silver_earthquakes")
    # second run re-appends the same file's rows to bronze, but dedup keeps
    # one copy and the silver watermark filters everything out
    results = build_pipeline(spark, root, geojson_path=geojson_file, clock=CLOCK).run()
    assert all(r.status == "SUCCESS" for r in results)
    assert {r.name: r.detail for r in results}["silver_transformation"] == 0
    assert wh.read("silver_earthquakes").count() == 5
    second = store.get("silver_earthquakes")
    assert second.watermark_value == first.watermark_value
    assert second.records_processed == first.records_processed


def test_incremental_batch_merges_new_and_updated(spark, tmp_path):
    """Watermark resume + MERGE update-wins across two ingest batches."""
    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    store = WatermarkStore(wh)
    from global_seismic_data_pipeline_spark.sources.geojson import (
        feature_rows,
        rows_to_bronze,
    )

    b1 = rows_to_bronze(spark, feature_rows(
        [_feature("a", _ms(2025, 5, 1), 139.0, 35.0, 30.0, 5.0),
         _feature("b", _ms(2025, 5, 2), 139.0, 35.0, 30.0, 6.0)],
        ingestion_ts=CLOCK, batch_id="b1"))
    bz.ingest_batch(wh, store, b1)
    assert silver.run_silver(wh, store, clock=CLOCK) == 2

    # batch 2: revised magnitude for 'b' (later event_time) + new event 'c'
    b2 = rows_to_bronze(spark, feature_rows(
        [_feature("b", _ms(2025, 5, 2, 6), 139.0, 35.0, 30.0, 6.9),
         _feature("c", _ms(2025, 5, 3), -120.0, 36.0, 10.0, 4.0)],
        ingestion_ts=CLOCK, batch_id="b2"))
    bz.ingest_batch(wh, store, b2)
    assert silver.run_silver(wh, store, clock=CLOCK) == 2

    got = {r.event_id: r.magnitude for r in wh.read("silver_earthquakes").collect()}
    assert got == {"a": 5.0, "b": 6.9, "c": 4.0}  # b updated in place
    assert store.get("silver_earthquakes").records_processed == 4


def test_silver_partitioned_merge_path(spark, tmp_path):
    """run_silver(partition_col='year') stores silver year-partitioned and
    merges increments with partition pruning — same results as the full
    path."""
    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    store = WatermarkStore(wh)
    from global_seismic_data_pipeline_spark.sources.geojson import (
        feature_rows,
        rows_to_bronze,
    )

    b1 = rows_to_bronze(spark, feature_rows(
        [_feature("a", _ms(2024, 12, 30), 139.0, 35.0, 30.0, 5.0),
         _feature("b", _ms(2025, 1, 2), -120.0, 36.0, 10.0, 6.0)],
        ingestion_ts=CLOCK, batch_id="b1"))
    bz.ingest_batch(wh, store, b1)
    assert silver.run_silver(wh, store, clock=CLOCK, partition_col="year") == 2

    import os
    parts = sorted(
        d for d in os.listdir(wh.path("silver_earthquakes")) if d.startswith("year=")
    )
    assert parts == ["year=2024", "year=2025"]

    # second increment touches only 2025
    b2 = rows_to_bronze(spark, feature_rows(
        [_feature("b", _ms(2025, 1, 3), -120.0, 36.0, 10.0, 6.5),
         _feature("c", _ms(2025, 1, 4), 100.0, -2.0, 80.0, 4.0)],
        ingestion_ts=CLOCK, batch_id="b2"))
    bz.ingest_batch(wh, store, b2)
    assert silver.run_silver(wh, store, clock=CLOCK, partition_col="year") == 2
    got = {r.event_id: (r.magnitude, r.year) for r in wh.read("silver_earthquakes").collect()}
    assert got == {"a": (5.0, 2024), "b": (6.5, 2025), "c": (4.0, 2025)}


def test_quality_report_single_pass(spark, bronze_fixture):
    rep = bz.quality_report(bronze_fixture)
    assert rep["total_rows"] == 18
    assert rep["nulls_mag"] == 1 and rep["nulls_depth"] == 1
    assert rep["duplicate_records"] == 2  # dup1, dup2 second copies
    assert rep["status_event_id"] == "OK"
