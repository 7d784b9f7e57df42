"""Spatial box-join semantics: edge inclusion, overlap priority, fallback
(ref: 04_silver_transformation.py:95-125; SURVEY.md §5.1/§7 hard-part d)."""

import random

import pytest
from pyspark.sql import functions as F

from global_seismic_data_pipeline_spark.functions import cleaning
from global_seismic_data_pipeline_spark.operators import dedup, spatial
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


def test_random_boxes_match_bruteforce_model(spark):
    """Property: for random points and random (possibly overlapping,
    possibly non-covering) boxes, the operator agrees with a per-point
    Python brute force: lowest-priority containing box, else fallback."""
    import random

    from global_seismic_data_pipeline_spark.operators.spatial import (
        enrich_point_in_box,
    )

    rng = random.Random(13)
    boxes = []
    for i in range(8):
        x0, y0 = rng.uniform(-10, 8), rng.uniform(-10, 8)
        boxes.append(
            (f"B{i}", f"Box {i}", x0, x0 + rng.uniform(0.5, 6),
             y0, y0 + rng.uniform(0.5, 6), i + 1)
        )
    pts = [(j, rng.uniform(-12, 12), rng.uniform(-12, 12)) for j in range(300)]
    # include exact corners of box 0 (edge inclusivity)
    pts.append((900, boxes[0][2], boxes[0][4]))
    pts.append((901, boxes[0][3], boxes[0][5]))

    pdf = spark.createDataFrame(pts, "pid long, x double, y double")
    bdf = spark.createDataFrame(
        boxes,
        "code string, name string, min_x double, max_x double,"
        " min_y double, max_y double, priority int",
    )
    out = enrich_point_in_box(
        pdf, bdf, point_id="pid", x_col="x", y_col="y",
        box_cols=("min_x", "max_x", "min_y", "max_y"),
        carry_cols=("code", "name"), fallback={"code": "NONE", "name": "None"},
    )
    got = {r.pid: r.code for r in out.collect()}

    def brute(x, y):
        best = None
        for code, _, x0, x1, y0, y1, prio in boxes:
            if x0 <= x <= x1 and y0 <= y <= y1:
                if best is None or prio < best[1]:
                    best = (code, prio)
        return best[0] if best else "NONE"

    assert len(got) == len(pts)
    for pid, x, y in pts:
        assert got[pid] == brute(x, y), (pid, x, y)


def test_japan_box_assignment(spark, bronze_fixture):
    got = {r.event_id: r.tectonic_region for r in _enriched(spark, bronze_fixture).collect()}
    for eid in ("jp1", "jp2", "jp3", "jp4"):
        assert got[eid] == "JAPAN"


def test_fused_form_equals_join_form(spark):
    """The CASE-chain form must reproduce the join+window form exactly,
    including edges, overlaps (priority pick), and unmatched fallback."""
    import random

    from global_seismic_data_pipeline_spark.operators.spatial import (
        enrich_point_in_box,
        enrich_point_in_box_fused,
    )

    boxes = [
        {"code": "A", "min_x": 0.0, "max_x": 10.0, "min_y": 0.0, "max_y": 10.0, "priority": 2},
        {"code": "B", "min_x": 5.0, "max_x": 15.0, "min_y": 5.0, "max_y": 15.0, "priority": 1},
        {"code": "C", "min_x": 20.0, "max_x": 30.0, "min_y": 0.0, "max_y": 30.0, "priority": 3},
    ]
    rng = random.Random(7)
    pts = [(i, rng.uniform(-5, 35), rng.uniform(-5, 35)) for i in range(300)]
    # deterministic edge/overlap probes
    pts += [(1000, 10.0, 10.0), (1001, 5.0, 5.0), (1002, 15.0, 15.0),
            (1003, -1.0, -1.0), (1004, 20.0, 0.0)]
    df = spark.createDataFrame(pts, "pid long, x double, y double")
    kw = dict(
        x_col="x", y_col="y",
        box_cols=("min_x", "max_x", "min_y", "max_y"),
        priority_col="priority", carry_cols=("code",),
        fallback={"code": "NONE"},
    )
    fused = {
        r["pid"]: r["code"]
        for r in enrich_point_in_box_fused(df, boxes, **kw).collect()
    }
    box_df = spark.createDataFrame(
        [tuple(b.values()) for b in boxes],
        "code string, min_x double, max_x double, min_y double, max_y double, priority int",
    )
    joined = {
        r["pid"]: r["code"]
        for r in enrich_point_in_box(df, box_df, point_id="pid", **kw).collect()
    }
    assert fused == joined
    assert fused[1000] == "B"  # overlap edge: priority 1 wins
    assert fused[1003] == "NONE"


def test_fused_no_fallback_with_non_string_carry(spark):
    """fallback=None must build a typed null struct matching the carry
    columns' ACTUAL types (here an int region id) — a hardcoded string
    null struct would fail analysis with a when/otherwise type mismatch."""
    from global_seismic_data_pipeline_spark.operators.spatial import (
        enrich_point_in_box_fused,
    )

    boxes = [
        {"rid": 7, "min_x": 0.0, "max_x": 10.0, "min_y": 0.0, "max_y": 10.0, "priority": 1},
        {"rid": 9, "min_x": 20.0, "max_x": 30.0, "min_y": 0.0, "max_y": 10.0, "priority": 2},
    ]
    df = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 25.0, 5.0), (3, 50.0, 50.0)],
        "pid long, x double, y double",
    )
    out = enrich_point_in_box_fused(
        df, boxes,
        x_col="x", y_col="y",
        box_cols=("min_x", "max_x", "min_y", "max_y"),
        priority_col="priority", carry_cols=("rid",),
        fallback=None,
    )
    got = {r["pid"]: r["rid"] for r in out.collect()}
    assert got == {1: 7, 2: 9}  # unmatched pid=3 dropped (inner semantics)


class TestNearestNeighborGridJoin:
    CS = 10

    def _stations(self, spark):
        # one station per cell over [-30, 30)²: jitter ±3 inside the cell
        rows = []
        sid = 0
        for cx in range(-3, 3):
            for cy in range(-3, 3):
                rows.append(
                    (sid, cx * 10 + 5 + (sid * 7) % 7 - 3, cy * 10 + 5 + (sid * 5) % 7 - 3)
                )
                sid += 1
        return rows

    def _points(self):
        rng = random.Random(13)
        return [(i, rng.randrange(-30, 30), rng.randrange(-30, 30)) for i in range(200)]

    def _brute(self, points, stations):
        out = {}
        for pid, px, py in points:
            best = min(
                ((px - sx) ** 2 + (py - sy) ** 2, sid) for sid, sx, sy in stations
            )
            out[pid] = (best[1], best[0])
        return out

    @pytest.mark.parametrize("broadcast", [True, False])
    def test_matches_brute_force(self, spark, broadcast):
        stations = self._stations(spark)
        points = self._points()
        st = spark.createDataFrame(stations, "station_id long, sx long, sy long")
        pts = spark.createDataFrame(points, "pid long, px long, py long")
        got = {
            r.pid: (r.station_id, r.dist_sq)
            for r in spatial.nearest_neighbor_grid_join(
                pts,
                st,
                point_id="pid",
                px_col="px",
                py_col="py",
                station_id="station_id",
                sx_col="sx",
                sy_col="sy",
                cell_size=self.CS,
                broadcast_stations=broadcast,
            ).collect()
        }
        assert got == self._brute(points, stations)

    def test_every_point_matched_once(self, spark):
        stations = self._stations(spark)
        points = self._points()
        st = spark.createDataFrame(stations, "station_id long, sx long, sy long")
        pts = spark.createDataFrame(points, "pid long, px long, py long")
        rows = spatial.nearest_neighbor_grid_join(
            pts, st, point_id="pid", px_col="px", py_col="py",
            station_id="station_id", sx_col="sx", sy_col="sy", cell_size=self.CS,
        ).collect()
        assert len(rows) == len(points)
        assert len({r.pid for r in rows}) == len(points)
