"""Morton key: Python-reference parity, 2x2-block contiguity, layout job."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from global_seismic_data_pipeline_spark.operators.zorder import (
    ZBITS,
    cluster_by_zorder,
    zvalue,
)


def _py_morton(x, y, bits=ZBITS):
    out = 0
    for b in range(bits):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def _keys(spark, pts):
    df = spark.createDataFrame(pts, "x long, y long")
    return {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zvalue("x", "y").alias("z")).collect()
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**ZBITS - 1),
            st.integers(min_value=0, max_value=2**ZBITS - 1),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_matches_python_reference(spark, pts):
    for (x, y), z in _keys(spark, pts).items():
        assert z == _py_morton(x, y)


def test_block_contiguity(spark):
    # the defining locality law: a 2x2 block [2x,2x+1]x[2y,2y+1] maps to
    # 4 CONTIGUOUS keys starting at 4*morton(x, y)
    pts = [
        (2 * x + dx, 2 * y + dy)
        for x in range(4)
        for y in range(4)
        for dx in (0, 1)
        for dy in (0, 1)
    ]
    got = _keys(spark, pts)
    for x in range(4):
        for y in range(4):
            base = 4 * _py_morton(x, y)
            assert got[(2 * x, 2 * y)] == base
            assert got[(2 * x + 1, 2 * y)] == base + 1
            assert got[(2 * x, 2 * y + 1)] == base + 2
            assert got[(2 * x + 1, 2 * y + 1)] == base + 3


def test_cluster_by_zorder_partitions_are_z_ranges(spark):
    # after the layout job, each partition covers a contiguous z interval
    # (that is what makes every output file a compact key-space rectangle)
    pts = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pts, "a long, b long")
    laid = cluster_by_zorder(df, ["a", "b"], num_partitions=4)
    parts = laid.select(
        F.spark_partition_id().alias("pid"), zvalue("a", "b").alias("z")
    ).collect()
    by_pid = {}
    for r in parts:
        by_pid.setdefault(r["pid"], []).append(r["z"])
    assert len(by_pid) == 4
    ranges = sorted((min(v), max(v)) for v in by_pid.values())
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint, ordered intervals


def test_cluster_validates_dims(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    with pytest.raises(ValueError):
        cluster_by_zorder(df, ["a", "b", "c"], num_partitions=2)


def _file_ranges(path, col):
    import glob
    import pyarrow.parquet as pq

    out = []
    for f in glob.glob(f"{path}/*.parquet"):
        pf = pq.ParquetFile(f)
        lo, hi = None, None
        idx = pf.schema_arrow.names.index(col)
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((lo, hi))
    return out


def test_zorder_layout_prunes_on_both_dimensions(spark, tmp_path):
    """The point of ZORDER: parquet min/max file stats skip on EITHER key,
    where 1-D range clustering skips only on the leading key."""
    grid = [(x, y, x * 100 + y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(grid, "a long, b long, payload long")

    zpath = str(tmp_path / "z")
    cluster_by_zorder(df, ["a", "b"], num_partitions=8).write.parquet(zpath)
    rpath = str(tmp_path / "r")
    df.repartitionByRange(8, "a", "b").sortWithinPartitions("a", "b").write.parquet(rpath)

    def files_matching(path, col, lo, hi):
        return sum(
            1 for mn, mx in _file_ranges(path, col) if not (mx < lo or mn > hi)
        )

    n_z = len(_file_ranges(zpath, "a"))
    n_r = len(_file_ranges(rpath, "a"))
    # leading key: both layouts prune a strip predicate a in [0, 7]
    assert files_matching(zpath, "a", 0, 7) < n_z
    assert files_matching(rpath, "a", 0, 7) < n_r
    # second key: ONLY the z-order layout prunes b in [0, 7]
    assert files_matching(zpath, "b", 0, 7) < n_z
    assert files_matching(rpath, "b", 0, 7) == n_r


def test_compact_zorder_wiring(spark, tmp_path):
    from global_seismic_data_pipeline_spark.pipeline.maintenance import compact
    from global_seismic_data_pipeline_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    grid = [(x, y) for x in range(32) for y in range(32)]
    wh.overwrite(spark.createDataFrame(grid, "a long, b long"), "t")
    stats = compact(wh, "t", zorder_by=("a", "b"))
    assert stats["files_after"] >= 1
    assert wh.read("t").count() == 1024
    with pytest.raises(ValueError):
        compact(wh, "t", sort_cols=("a",), zorder_by=("a", "b"))


def test_hilbert_curve_properties(spark):
    """The SQL fold is a true Hilbert curve: bijective onto
    [0, 4^order) and every consecutive pair of curve positions is an
    ADJACENT cell (the locality property Z-order lacks); Spark output
    matches the driver-side reference bit-for-bit."""
    from global_seismic_data_pipeline_spark.operators.hilbert import (
        hilbert_py,
        hilbert_value,
    )

    order, n = 4, 16
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.d
        for r in df.select(
            "x", "y", hilbert_value("x", "y", order=order).alias("d")
        ).collect()
    }
    assert got == {(x, y): hilbert_py(x, y, order=order) for x, y in rows}
    pos = {d: xy for xy, d in got.items()}
    assert sorted(pos) == list(range(n * n))
    for d in range(1, n * n):
        (x1, y1), (x2, y2) = pos[d - 1], pos[d]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_cluster_by_hilbert_layout(spark):
    """cluster_by_hilbert preserves rows exactly and orders partitions
    by curve position (range shuffle + in-partition sort ==> global
    curve order when walked partition by partition)."""
    from global_seismic_data_pipeline_spark.operators.hilbert import (
        cluster_by_hilbert,
        hilbert_py,
    )

    rows = [(i, (i * 7) % 64, (i * 13) % 64) for i in range(512)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    out = cluster_by_hilbert(df, ["a", "b"], num_partitions=4, order=6)
    assert sorted(r.id for r in out.collect()) == sorted(r[0] for r in rows)
    walked = [
        hilbert_py(r.a, r.b, order=6)
        for part in out.rdd.glom().collect()
        for r in part
    ]
    assert walked == sorted(walked)


def test_hilbert_layout_prunes_files_on_both_dimensions(spark, tmp_path):
    """Structural (timing-free) evidence for the clustering claim: after
    a Hilbert layout, per-file min/max stats prune a 2-D box predicate
    to a handful of files, while the same data hash-scattered across the
    same file count prunes nothing — on BOTH dimensions, which a 1-D
    sort cannot give."""
    from global_seismic_data_pipeline_spark.operators import skipping
    from global_seismic_data_pipeline_spark.operators.hilbert import (
        cluster_by_hilbert,
    )
    from global_seismic_data_pipeline_spark.sources.warehouse import (
        Warehouse,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    rows = [(x, y, x * 64 + y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "a long, b long, v long")

    wh.overwrite(df.repartition(16), "scattered")
    wh.overwrite(
        cluster_by_hilbert(df, ["a", "b"], num_partitions=16, order=6),
        "clustered",
    )
    box = {"a": (0, 7), "b": (0, 7)}
    kept = {}
    for name in ("scattered", "clustered"):
        skipping.refresh_file_stats(wh, name, ["a", "b"])
        stats = wh.read(f"{name}__stats")
        total = stats.count()
        kept[name] = len(skipping.prune_files(stats, box))
        assert total >= 8, f"{name}: expected a multi-file layout"
    # hash scatter: every file spans the whole domain -> nothing prunes
    assert kept["scattered"] >= 8
    # hilbert: the box is one contiguous curve run -> a couple of files
    assert kept["clustered"] <= 3
    # and the pruned read still returns exactly the right rows
    files = skipping.prune_files(
        wh.read("clustered__stats"), box
    )
    got = (
        spark.read.parquet(*[f.removeprefix("file://") for f in files])
        .filter("a between 0 and 7 and b between 0 and 7")
        .count()
    )
    assert got == 64


def test_compact_hilbert_wiring(spark, tmp_path):
    from global_seismic_data_pipeline_spark.pipeline.maintenance import compact
    from global_seismic_data_pipeline_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    grid = [(x, y) for x in range(32) for y in range(32)]
    wh.overwrite(spark.createDataFrame(grid, "a long, b long"), "t")
    stats = compact(wh, "t", zorder_by=("a", "b"), curve="hilbert")
    assert stats["files_after"] >= 1
    assert wh.read("t").count() == 1024
    with pytest.raises(ValueError, match="curve"):
        compact(wh, "t", zorder_by=("a", "b"), curve="peano")


def test_with_hilbert_lut_matches_fold(spark):
    """The automaton/LUT hot path and the aggregate() fold are the SAME
    curve — exhaustive at order 4, sampled at order 10, odd order 7
    exercising the remainder chunk."""
    from global_seismic_data_pipeline_spark.operators.hilbert import (
        hilbert_py,
        with_hilbert,
    )

    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    got4 = with_hilbert(df, "x", "y", order=4).collect()
    assert all(r.hkey == hilbert_py(r.x, r.y, order=4) for r in got4)

    rows10 = [((i * 131) % 1024, (i * 353) % 1024) for i in range(500)]
    df10 = spark.createDataFrame(rows10, "x long, y long")
    got10 = with_hilbert(df10, "x", "y", order=10).collect()
    assert all(r.hkey == hilbert_py(r.x, r.y, order=10) for r in got10)

    df7 = spark.createDataFrame(
        [(x % 128, (x * 7) % 128) for x in range(300)], "x long, y long"
    )
    got7 = with_hilbert(df7, "x", "y", order=7).collect()
    assert all(r.hkey == hilbert_py(r.x, r.y, order=7) for r in got7)
