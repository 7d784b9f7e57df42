"""Spatial box-join semantics: edge inclusion, overlap priority, fallback
(ref: 04_silver_transformation.py:95-125; SURVEY.md §5.1/§7 hard-part d)."""

from pyspark.sql import functions as F

from global_seismic_data_pipeline_spark.functions import cleaning
from global_seismic_data_pipeline_spark.operators import dedup
from global_seismic_data_pipeline_spark.pipeline.silver import spatial_enrich
from global_seismic_data_pipeline_spark.refdata import tectonic_regions


def _enriched(spark, bronze_fixture):
    # pipeline order: bronze dedup (notebook 03) precedes silver (notebook
    # 04) — the priority-pick window assumes event_id-unique input
    deduped = dedup.keep_latest(
        bronze_fixture, ["event_id"], "ingestion_ts", ["batch_id"]
    )
    cleaned = cleaning.clean_events(cleaning.validate_events(deduped))
    return spatial_enrich(cleaned, tectonic_regions(spark))


def test_every_event_gets_exactly_one_region(spark, bronze_fixture):
    out = _enriched(spark, bronze_fixture)
    n_in = cleaning.validate_events(
        dedup.keep_latest(bronze_fixture, ["event_id"], "ingestion_ts", ["batch_id"])
    ).count()
    assert out.count() == n_in
    assert out.filter(F.col("tectonic_region").isNull()).count() == 0


def test_overlap_resolved_by_priority(spark, bronze_fixture):
    got = {r.event_id: r.tectonic_region for r in _enriched(spark, bronze_fixture).collect()}
    # (32.5, -116) is inside both CALIFORNIA (prio 1) and MEXICO (prio 7)
    assert got["ovl1"] == "CALIFORNIA"


def test_box_edges_inclusive(spark, bronze_fixture):
    got = {r.event_id: r.tectonic_region for r in _enriched(spark, bronze_fixture).collect()}
    # exact SW corner of the California box
    assert got["edge1"] == "CALIFORNIA"


def test_no_match_falls_back_to_other(spark, bronze_fixture):
    got = {r.event_id: (r.tectonic_region, r.region_name)
           for r in _enriched(spark, bronze_fixture).collect()}
    assert got["oth1"] == ("OTHER", "Other Regions")


def test_japan_box_assignment(spark, bronze_fixture):
    got = {r.event_id: r.tectonic_region for r in _enriched(spark, bronze_fixture).collect()}
    for eid in ("jp1", "jp2", "jp3", "jp4"):
        assert got[eid] == "JAPAN"
