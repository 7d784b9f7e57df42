"""Delta data skipping (deltalog.read_delta(filters=...)): log-stats +
partition-value file pruning, pinned two ways per case — the SKIP
actually happens (planned file set shrinks) and the RESULT is identical
to an unpruned read + filter (pruning is a superset guarantee; a wrong
skip drops rows and fails the parity assert)."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from pyspark.sql import functions as F

from global_seismic_data_pipeline_spark.session import tiny_df
from global_seismic_data_pipeline_spark.sources import deltalog as dl
from global_seismic_data_pipeline_spark.sources.deltawh import DeltaLogWarehouse


def _write_clustered(spark, path, n=400, files=8):
    df = (
        spark.range(n)
        .select(
            F.col("id").cast("int").alias("k"),
            F.concat(F.lit("s"), F.col("id")).alias("s"),
            (F.col("id") * 2).cast("long").alias("v"),
        )
        .repartitionByRange(files, F.col("k"))
    )
    dl.write_delta(df, path, mode="error")
    return df


def _parity(spark, path, filters, **kw):
    """pruned read == full read + residual, and the plan really pruned
    when the caller asserts it (returns (kept, total))."""
    full = dl.read_delta(spark, path, **kw)
    from global_seismic_data_pipeline_spark.sources import predicates as P

    expected = sorted(
        full.filter(
            P.residual_condition(P.normalize_filters(filters))
        ).collect()
    )
    got = sorted(dl.read_delta(spark, path, filters=filters, **kw).collect())
    assert got == expected
    kept = dl.delta_scan_files(path, filters=filters, **kw)
    total = dl.delta_scan_files(path, **kw)
    return len(kept), len(total)


def test_stats_pruning_range_and_parity(spark, tmp_path):
    p = str(tmp_path / "t")
    _write_clustered(spark, p)
    # narrow range on the clustering key: most files must skip
    kept, total = _parity(spark, p, [("k", ">=", 10), ("k", "<", 40)])
    assert total >= 6 and kept < total
    # every file holding a matching row must survive (ground truth from
    # the files themselves)
    kept_paths = {
        a["path"] for a in dl.delta_scan_files(p, filters=[("k", "=", 250)])
    }
    for a in dl.delta_scan_files(p):
        rows = spark.read.parquet(os.path.join(p, a["path"]))
        if rows.filter(F.col("k") == 250).count() > 0:
            assert a["path"] in kept_paths


def test_each_op_prunes_and_matches(spark, tmp_path):
    p = str(tmp_path / "t")
    _write_clustered(spark, p)
    for filters in (
        [("k", "=", 0)],
        [("k", "<", 5)],
        [("k", "<=", 0)],
        [("k", ">", 394)],
        [("k", ">=", 395)],
        [("k", "in", [1, 399])],
        {"k": 42},
    ):
        kept, total = _parity(spark, p, filters)
        assert kept < total, filters
    # ops that cannot prune here still give exact results
    _parity(spark, p, [("s", "not_null", None)])
    _parity(spark, p, [("k", ">", 100), ("s", "=", "s250")])


def test_empty_result_and_empty_in(spark, tmp_path):
    p = str(tmp_path / "t")
    _write_clustered(spark, p)
    assert dl.read_delta(spark, p, filters=[("k", "=", -7)]).count() == 0
    assert dl.delta_scan_files(p, filters=[("k", "=", -7)]) == []
    assert dl.read_delta(spark, p, filters=[("k", "in", [])]).count() == 0
    # schema survives the zero-file plan
    assert dl.read_delta(spark, p, filters=[("k", "=", -7)]).columns == [
        "k", "s", "v",
    ]


def test_null_semantics_in_stats(spark, tmp_path):
    p = str(tmp_path / "t")
    a = tiny_df(spark, [(1, None), (2, None)], "k int, x string")
    b = tiny_df(spark, [(3, "hit"), (4, "miss")], "k int, x string")
    dl.write_delta(a, p, mode="error")
    dl.write_delta(b, p, mode="append")
    # value predicates prune the all-null file
    kept, total = _parity(spark, p, [("x", "=", "hit")])
    assert (kept, total) == (1, 2)
    kept, total = _parity(spark, p, [("x", "not_null", None)])
    assert (kept, total) == (1, 2)
    # is_null prunes the no-null file
    kept, total = _parity(spark, p, [("x", "is_null")])
    assert (kept, total) == (1, 2)


def test_missing_stats_keep_files(spark, tmp_path, monkeypatch):
    p = str(tmp_path / "t")
    monkeypatch.setattr(dl, "_file_stats_json", lambda *a, **k: None)
    _write_clustered(spark, p, n=100, files=4)
    monkeypatch.undo()
    kept, total = _parity(spark, p, [("k", "=", 3)])
    assert kept == total == 4  # conservative: no stats, no skipping


def test_partition_pruning_exact_and_null_fold(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), (None, 4), ("", 5)],
        "part string, v int",
    )
    dl.write_delta(df, p, mode="error", partition_by=["part"])
    kept, total = _parity(spark, p, [("part", "=", "a")])
    assert kept < total
    # hive staging folds NULL and '' into one default partition: both
    # probes must KEEP that file (ambiguous), and both results stay exact
    for filters in ([("part", "=", "")], [("part", "is_null")],
                    [("part", "not_null", None)]):
        _parity(spark, p, filters)
    default_kept = {
        a["path"] for a in dl.delta_scan_files(p, filters=[("part", "=", "")])
    }
    assert any("__HIVE_DEFAULT_PARTITION__" in q for q in default_kept)
    # a value matching nothing prunes every partition
    assert dl.delta_scan_files(p, filters=[("part", "=", "zz")]) == []
    # int-typed partition columns have no ''-ambiguity: is-null exact
    p2 = str(tmp_path / "t2")
    df2 = spark.createDataFrame([(1, "x"), (None, "y")], "pk int, s string")
    dl.write_delta(df2, p2, mode="error", partition_by=["pk"])
    kept, total = _parity(spark, p2, [("pk", "not_null", None)])
    assert (kept, total) == (1, 2)
    kept, total = _parity(spark, p2, [("pk", "=", 1)])
    assert (kept, total) == (1, 2)


def test_date_and_timestamp_stats_pruning(spark, tmp_path):
    p = str(tmp_path / "t")
    rows = [
        (dt.date(2024, 1, 1) + dt.timedelta(days=i),
         dt.datetime(2024, 1, 1, 12) + dt.timedelta(hours=i),
         i)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "d date, ts timestamp, v int")
    dl.write_delta(
        df.repartitionByRange(6, F.col("d")), p, mode="error"
    )
    kept, total = _parity(
        spark, p, [("d", ">=", dt.date(2024, 2, 20))]
    )
    assert kept < total
    kept, total = _parity(
        spark, p, [("ts", "<", dt.datetime(2024, 1, 1, 18))]
    )
    assert kept < total
    # ISO-string literals coerce toward the column type
    kept, total = _parity(spark, p, [("d", "=", "2024-01-05")])
    assert kept < total


def test_column_mapping_rename_then_filter(spark, tmp_path):
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    df = spark.range(100).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("txt"),
    )
    wh.overwrite(df.repartitionByRange(4, F.col("k")), "t")
    wh.enable_column_mapping("t")
    wh.rename_column("t", "k", "key")
    path = wh.path("t")
    # stats are keyed by the stable PHYSICAL name; the new logical name
    # must still reach them
    kept = dl.delta_scan_files(path, filters=[("key", "<", 10)])
    total = dl.delta_scan_files(path)
    assert len(total) >= 3 and len(kept) < len(total)
    got = sorted(
        wh.read("t", filters=[("key", "<", 10)]).select("key").collect()
    )
    assert [r.key for r in got] == list(range(10))


def test_time_travel_with_filters(spark, tmp_path):
    p = str(tmp_path / "t")
    _write_clustered(spark, p, n=100, files=4)
    extra = spark.createDataFrame([(999, "zz", 0)], "k int, s string, v long")
    dl.write_delta(extra, p, mode="append")
    at_v0 = dl.read_delta(spark, p, version=0, filters=[("k", ">", 90)])
    assert sorted(r.k for r in at_v0.collect()) == list(range(91, 100))
    now = dl.read_delta(spark, p, filters=[("k", ">", 90)])
    assert sorted(r.k for r in now.collect()) == [*range(91, 100), 999]


def test_unknown_filter_column_refuses(spark, tmp_path):
    p = str(tmp_path / "t")
    _write_clustered(spark, p, n=10, files=1)
    with pytest.raises(ValueError, match="not in table schema"):
        dl.read_delta(spark, p, filters=[("nope", "=", 1)])
    with pytest.raises(ValueError, match="is_null"):
        dl.read_delta(spark, p, filters=[("k", "=", None)])


def test_foreign_stats_iso_timestamps_prune(spark, tmp_path):
    """Stats written by real delta-spark carry ISO-8601 'T...Z' strings —
    the parser must read them; a malformed stats blob must keep."""
    p = str(tmp_path / "t")
    df = tiny_df(
        spark,
        [(dt.datetime(2024, 1, 1, 0, 0),), (dt.datetime(2024, 1, 2, 0, 0),)],
        "ts timestamp",
    )
    dl.write_delta(df, p, mode="error")
    log = os.path.join(p, "_delta_log", f"{0:020d}.json")
    actions = [json.loads(x) for x in open(log) if x.strip()]
    for a in actions:
        if "add" in a:
            a["add"]["stats"] = json.dumps({
                "numRecords": 2,
                "minValues": {"ts": "2024-01-01T00:00:00.000Z"},
                "maxValues": {"ts": "2024-01-02T00:00:00.000Z"},
                "nullCount": {"ts": 0},
            })
    with open(log, "w") as fh:
        fh.writelines(json.dumps(a) + "\n" for a in actions)
    assert (
        dl.delta_scan_files(p, filters=[("ts", ">", dt.datetime(2024, 1, 2))])
        == []
    )
    assert len(
        dl.delta_scan_files(p, filters=[("ts", ">=", dt.datetime(2024, 1, 2))])
    ) == 1
    # malformed stats: conservative keep, result still exact
    for a in actions:
        if "add" in a:
            a["add"]["stats"] = "{not json"
    with open(log, "w") as fh:
        fh.writelines(json.dumps(a) + "\n" for a in actions)
    kept, total = _parity(
        spark, p, [("ts", ">", dt.datetime(2024, 1, 2))]
    )
    assert kept == total == 1


def test_stats_coverage_discipline(spark, tmp_path):
    """_file_stats_json must not emit min/max aggregated over a PARTIAL
    row-group cover — a group without stats may hold values outside the
    other groups' bounds."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    f = str(tmp_path / "f.parquet")
    t1 = pa.table({"k": pa.array([5, 6], "int32")})
    t2 = pa.table({"k": pa.array([100, 200], "int32")})
    with pq.ParquetWriter(
        f, t1.schema, write_statistics=["k"]
    ) as w:
        w.write_table(t1)
    s = json.loads(dl._file_stats_json(f, ["k"]))
    assert s["minValues"]["k"] == 5 and s["maxValues"]["k"] == 6
    with pq.ParquetWriter(f, t1.schema, write_statistics=False) as w:
        w.write_table(t1)
        w.write_table(t2)
    s = json.loads(dl._file_stats_json(f, ["k"]))
    assert s["minValues"] == {} and s["maxValues"] == {}
    assert s["nullCount"] == {}
    assert s["numRecords"] == 4


def test_nan_rows_survive_float_pruning(spark, tmp_path):
    """Parquet float stats EXCLUDE NaN while Spark orders NaN greater
    than everything — an upper-bound skip on > / >= would silently drop
    NaN rows."""
    p = str(tmp_path / "t")
    a = tiny_df(spark, [(1, 1.0), (2, float("nan"))], "k int, x double")
    b = tiny_df(spark, [(3, 2.0), (4, 3.0)], "k int, x double")
    dl.write_delta(a, p, mode="error")
    dl.write_delta(b, p, mode="append")
    got = dl.read_delta(spark, p, filters=[("x", ">", 100.0)])
    assert [r.k for r in got.collect()] == [2]  # the NaN row matches
    # lower-bound proofs still prune (NaN rows never satisfy < v)
    kept, total = _parity(spark, p, [("x", "<", 1.5)])
    assert (kept, total) == (1, 2)
    # NaN literal: Spark treats NaN = NaN as true; no pruning may hide it
    got = dl.read_delta(spark, p, filters=[("x", "=", float("nan"))])
    assert [r.k for r in got.collect()] == [2]


def test_float_literal_on_exact_typed_columns(spark, tmp_path):
    """Float literals push the comparison into double space on the
    engine side — the skip decision must follow (a Decimal/long bound
    compared exactly would prune boundary rows Spark matches)."""
    p = str(tmp_path / "t")
    df = spark.sql(
        "SELECT CAST(0.1 AS DECIMAL(3,1)) AS c, 1 AS k "
        "UNION ALL SELECT CAST(0.2 AS DECIMAL(3,1)), 2"
    )
    dl.write_delta(df.repartition(1), p, mode="error")
    got = dl.read_delta(spark, p, filters=[("c", "=", 0.1)])
    assert [r.k for r in got.collect()] == [1]
    kept, total = _parity(spark, p, [("c", "=", 0.1)])
    assert kept == total == 1
    # long column probed with the double-rounded neighbour of 2^53+1
    p2 = str(tmp_path / "t2")
    big = 2**53 + 1
    dl.write_delta(
        tiny_df(spark, [(big,)], "k long"), p2, mode="error"
    )
    got = dl.read_delta(spark, p2, filters=[("k", "=", float(2**53))])
    # Spark casts long->double: 2^53+1 rounds to 2^53 and MATCHES
    assert [r.k for r in got.collect()] == [big]


def _capture_probe(monkeypatch):
    """Record the candidate-file count of every _scan_adds probe."""
    from global_seismic_data_pipeline_spark.sources import deltawh as dwh

    seen = []
    real = dl._scan_adds

    def spy(spark, path, files, state, **kw):
        seen.append(len(files))
        return real(spark, path, files, state, **kw)

    monkeypatch.setattr(dwh.dl, "_scan_adds", spy)
    return seen


def test_delete_with_dv_probe_pruned(spark, tmp_path, monkeypatch):
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    df = spark.range(200).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    )
    wh.overwrite(df.repartitionByRange(4, F.col("k")), "t")
    seen = _capture_probe(monkeypatch)
    out = wh.delete_with_dv("t", "k IN (7, 11)")
    assert out["rows_deleted"] == 2
    # the probe opened ONLY the file holding keys 7 and 11
    assert seen and seen[0] == 1
    assert wh.read("t").count() == 198
    # unextractable condition degrades to the full probe, same result
    seen.clear()
    wh.delete_with_dv("t", "k = 20 OR k = 150")
    assert seen and seen[0] == 4
    assert wh.read("t").count() == 196


def test_overwrite_where_probe_pruned(spark, tmp_path, monkeypatch):
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    df = spark.range(200).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 5).cast("int").alias("grp"),
    )
    wh.overwrite(df.repartitionByRange(4, F.col("k")), "t")
    seen = _capture_probe(monkeypatch)
    batch = spark.createDataFrame([(5, 99), (6, 99)], "k int, grp int")
    wh.overwrite_where(
        batch.withColumn("grp", F.col("grp") - 99 + F.col("k") % 5),
        "t", "k BETWEEN 5 AND 6",
    )
    # probe pruned to the one file covering [5, 6]; survivors re-staged
    assert seen and seen[0] == 1
    got = wh.read("t")
    assert got.count() == 200
    # a no-match replace whose batch is empty touches nothing
    seen.clear()
    empty = spark.createDataFrame([], "k int, grp int")
    out = wh.overwrite_where(empty, "t", "k = -5")
    assert out["files_replaced"] == 0
    assert seen == []  # zero candidates -> typed empty frame, no scan
    assert wh.read("t").count() == 200


def test_timestamp_stats_under_int96_session(spark, tmp_path):
    """The writer owns the timestamp physical type: even when the SESSION
    is configured for INT96 (Spark's stock default, which stores no
    parquet min/max statistics), write_delta pins int64-micros around its
    staging write so add.stats carries timestamp bounds, a date window
    prunes files, and the caller's conf is restored afterwards."""
    p = str(tmp_path / "ts")
    prior = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        df = spark.range(400).select(
            F.col("id").cast("int").alias("k"),
            F.expr(
                "timestamp'1995-01-01 00:00:00' + make_dt_interval(id)"
            ).alias("ts"),
        )
        dl.write_delta(df.repartitionByRange(8, F.col("ts")), p, mode="error")
        # conf restored, not leaked
        assert (
            spark.conf.get("spark.sql.parquet.outputTimestampType") == "INT96"
        )
        # every add carries ts bounds (INT96 files would have none)
        adds = dl.delta_scan_files(p)
        assert len(adds) >= 4
        for a in adds:
            stats = json.loads(a["stats"])
            assert "ts" in stats["minValues"] and "ts" in stats["maxValues"]
        filters = [
            ("ts", ">=", dt.datetime(1995, 2, 1)),
            ("ts", "<", dt.datetime(1995, 4, 1)),
        ]
        kept, total = _parity(spark, p, filters)
        assert kept < total
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.parquet.outputTimestampType")
        else:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prior)
