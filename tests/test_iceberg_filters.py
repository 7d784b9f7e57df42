"""Iceberg range-predicate scan planning (sources/iceberg.py
``filters=``): manifest-summary, partition-record, and column-bounds
pruning for the full op set, each case pinned two ways — the plan
really shrinks, and the read equals an unpruned read + filter (a wrong
skip drops rows and fails parity)."""

from __future__ import annotations

import datetime as dt

import pytest

from global_seismic_data_pipeline_spark.session import tiny_df
from global_seismic_data_pipeline_spark.sources import iceberg
from global_seismic_data_pipeline_spark.sources import predicates as P


def _parity(t, filters):
    """read(filters=...) == read() + residual; returns pruned file count."""
    full = t.read()
    expected = sorted(
        full.filter(
            P.residual_condition(P.normalize_filters(filters))
        ).collect()
    )
    got = sorted(t.read(filters=filters).collect())
    assert got == expected
    return len(t.data_files(filters=filters))


def test_identity_int_range_filters(spark, tmp_path):
    loc = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(b, b * 10 + i, f"r{b}{i}") for b in (1, 2, 3) for i in range(3)],
        "band int, v int, s string",
    )
    t = iceberg.create_table(
        spark, loc, df.repartition(1), partition_by=["band"]
    )
    total = len(t.data_files())
    assert total == 3
    assert _parity(t, [("band", "<", 2)]) == 1
    assert _parity(t, [("band", "<=", 2)]) == 2
    assert _parity(t, [("band", ">", 2)]) == 1
    assert _parity(t, [("band", ">=", 2)]) == 2
    assert _parity(t, [("band", "=", 2)]) == 1
    assert _parity(t, [("band", "in", [1, 3])]) == 2
    assert _parity(t, [("band", "=", 9)]) == 0
    # column bounds on a NON-partition column prune too: v is clustered
    # by band (10-12 / 20-22 / 30-32)
    assert _parity(t, [("v", ">=", 30)]) == 1
    assert _parity(t, [("v", "<", 13)]) == 1
    assert _parity(t, [("v", "in", [11, 21])]) == 2
    # combined predicates intersect
    assert _parity(t, [("band", ">=", 2), ("v", "<", 25)]) == 1
    # legacy eq_filters compose with filters (superset + residual)
    got = t.read(eq_filters={"band": 2}, filters=[("v", ">", 20)])
    assert sorted(r.v for r in got.collect()) == [21, 22]


def test_day_transform_monotone_projection(spark, tmp_path):
    loc = str(tmp_path / "t")
    rows = [
        (dt.datetime(2024, 3, 1 + d, h, 30), d * 10 + h)
        for d in range(4)
        for h in (6, 18)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v int")
    t = iceberg.create_table(
        spark, loc, df.repartition(1), partition_by=["day(ts)"]
    )
    assert len(t.data_files()) == 4
    # strict > at 06:00 must KEEP the boundary day (18:00 row remains)
    n = _parity(t, [("ts", ">", dt.datetime(2024, 3, 3, 6, 30))])
    assert n == 2
    n = _parity(t, [("ts", "<", dt.datetime(2024, 3, 2, 0, 0))])
    assert n == 1
    n = _parity(t, [("ts", ">=", dt.datetime(2024, 3, 4, 0, 0))])
    assert n == 1
    n = _parity(t, [("ts", "=", dt.datetime(2024, 3, 2, 6, 30))])
    assert n == 1
    assert _parity(t, [("ts", "<", dt.datetime(2024, 3, 1, 0, 0))]) == 0


def test_truncate_string_monotone_and_bucket_eq_only(spark, tmp_path):
    loc = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("alpha", 1), ("beta", 2), ("gamma", 3)], "cat string, id int"
    )
    t = iceberg.create_table(
        spark, loc, df.repartition(1),
        partition_by=["truncate[2](cat)", "bucket[4](id)"]
    )
    assert len(t.data_files()) == 3
    assert _parity(t, [("cat", "<", "b")]) == 1
    assert _parity(t, [("cat", ">=", "be")]) == 2
    assert _parity(t, [("cat", ">", "gz")]) == 0
    # bucket: equality prunes via murmur3, range ops stay correct and
    # fall back to column bounds only
    assert _parity(t, [("id", "=", 2)]) == 1
    assert _parity(t, [("id", ">=", 3)]) == 1  # bounds prune
    assert _parity(t, [("id", "in", [1, 3])]) == 2


def test_null_partitions_and_string_fold_ambiguity(spark, tmp_path):
    loc = str(tmp_path / "ti")
    df = spark.createDataFrame(
        [(1, "x"), (None, "y"), (2, "z")], "pk int, s string"
    )
    t = iceberg.create_table(
        spark, loc, df.repartition(1), partition_by=["pk"]
    )
    assert len(t.data_files()) == 3
    # int partition: NULL/'' fold cannot apply — exact null pruning
    assert _parity(t, [("pk", "not_null")]) == 2
    assert _parity(t, [("pk", "is_null")]) == 1
    assert _parity(t, [("pk", "=", 2)]) == 1
    assert _parity(t, [("pk", ">", 1)]) == 1

    loc2 = str(tmp_path / "ts")
    df2 = spark.createDataFrame(
        [("a", 1), (None, 2), ("", 3)], "ps string, v int"
    )
    t2 = iceberg.create_table(
        spark, loc2, df2.repartition(1), partition_by=["ps"]
    )
    # hive staging folds NULL and '' rows into ONE file (2 files total:
    # [a] and the fold): probes on either reading must keep the folded
    # file (conservative), and results stay exact
    assert len(t2.data_files()) == 2
    assert _parity(t2, [("ps", "=", "")]) == 1
    assert _parity(t2, [("ps", "is_null")]) == 1
    assert _parity(t2, [("ps", "not_null")]) == 2
    assert _parity(t2, [("ps", "=", "a")]) == 1
    assert _parity(t2, [("ps", "<=", "")]) == 1
    assert _parity(t2, [("ps", ">", "a")]) == 0


def test_manifest_level_pruning_skips_unopened(spark, tmp_path):
    loc = str(tmp_path / "t")
    d1 = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 8), 1), (dt.datetime(2024, 1, 2, 8), 2)],
        "ts timestamp, v int",
    )
    d2 = spark.createDataFrame(
        [(dt.datetime(2024, 6, 1, 8), 3), (dt.datetime(2024, 6, 2, 8), 4)],
        "ts timestamp, v int",
    )
    t = iceberg.create_table(
        spark, loc, d1.repartition(1), partition_by=["day(ts)"]
    )
    iceberg.append(spark, loc, d2.repartition(1))
    t = iceberg.IcebergTable(spark, loc)
    snap = t.resolve_snapshot()
    mfs = [m for m in t._manifest_files(snap) if m.get("content", 0) == 0]
    assert len(mfs) == 2
    preds = P.normalize_filters([("ts", ">", dt.datetime(2024, 5, 1))])
    pruned = [t._manifest_pruned(m, preds) for m in mfs]
    assert sorted(pruned) == [False, True]  # January manifest skips unopened
    assert _parity(t, [("ts", ">", dt.datetime(2024, 5, 1))]) == 2
    # is_null prunes via contains_null=False summaries
    preds_null = P.normalize_filters([("ts", "is_null")])
    assert all(t._manifest_pruned(m, preds_null) for m in mfs)
    assert _parity(t, [("ts", "is_null")]) == 0


def test_filters_validate_and_empty_schema(spark, tmp_path):
    loc = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    t = iceberg.create_table(spark, loc, df)
    with pytest.raises(ValueError, match="op must be"):
        t.read(filters=[("id", "!=", 1)])
    empty = t.read(filters=[("id", "=", 99)])
    assert empty.columns == ["id", "s"] and empty.count() == 0


def test_unpartitioned_bounds_pruning(spark, tmp_path):
    """v1 unpartitioned tables prune purely through per-file column
    bounds (each append = one file here)."""
    loc = str(tmp_path / "t")
    t = iceberg.create_table(
        spark, loc, tiny_df(spark, [(1,), (10,)], "k int")
    )
    iceberg.append(
        spark, loc, tiny_df(spark, [(100,), (200,)], "k int")
    )
    t = iceberg.IcebergTable(spark, loc)
    assert len(t.data_files()) == 2
    assert _parity(t, [("k", "<", 50)]) == 1
    assert _parity(t, [("k", ">=", 100)]) == 1
    assert _parity(t, [("k", "in", [10, 100])]) == 2
    assert _parity(t, [("k", ">", 200)]) == 0


def test_tz_aware_filter_literals(spark, tmp_path):
    """tz-aware literals must compare on the UTC timeline — an epoch
    placed in the literal's own zone shifts every micros comparison by
    the offset and prunes the matching file."""
    loc = str(tmp_path / "t")
    rows = [(dt.datetime(2024, 3, 1, 12, 0), 1),
            (dt.datetime(2024, 3, 5, 12, 0), 2)]
    t = iceberg.create_table(
        spark, loc,
        tiny_df(spark, rows, "ts timestamp, v int"),
        partition_by=["day(ts)"],
    )
    plus2 = dt.timezone(dt.timedelta(hours=2))
    # 14:00+02:00 == 12:00Z — the equality probe must keep file 1
    aware = dt.datetime(2024, 3, 1, 14, 0, tzinfo=plus2)
    assert _parity(t, [("ts", "=", aware)]) == 1
    assert {r.v for r in t.read(filters=[("ts", "=", aware)]).collect()} == {1}
    # range probe across the zone boundary stays exact
    assert _parity(t, [("ts", ">", aware)]) == 1
    # bucket hashing of aware datetimes lands in the same bucket as the
    # equivalent naive-UTC instant
    from global_seismic_data_pipeline_spark.sources.iceberg import _bucket_hash
    assert _bucket_hash(aware) == _bucket_hash(dt.datetime(2024, 3, 1, 12, 0))


def test_float_nan_and_unknown_column(spark, tmp_path):
    loc = str(tmp_path / "t")
    a = tiny_df(spark, [(1, 1.0), (2, float("nan"))], "k int, x double")
    b = tiny_df(spark, [(3, 2.0), (4, 3.0)], "k int, x double")
    t = iceberg.create_table(spark, loc, a)
    iceberg.append(spark, loc, b)
    t = iceberg.IcebergTable(spark, loc)
    got = t.read(filters=[("x", ">", 100.0)])
    assert [r.k for r in got.collect()] == [2]  # NaN row survives
    assert _parity(t, [("x", "<", 1.5)]) == 1  # lower bound still prunes
    with pytest.raises(ValueError, match="not in table schema"):
        t.data_files(filters=[("nope", "=", 1)])
    with pytest.raises(ValueError, match="not in table schema"):
        t.read(filters=[("nope", "=", 1)])


def test_dml_probe_pruning(spark, tmp_path, monkeypatch):
    """delete_where / overwrite_where probe only candidate files when
    the condition extracts; unextractable conditions probe everything;
    results identical either way."""
    loc = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(b, b * 10 + i) for b in (1, 2, 3) for i in range(3)],
        "band int, v int",
    )
    iceberg.create_table(
        spark, loc, df.repartition(1),
        partition_by=["band"], format_version=2,
    )
    seen = []
    real = iceberg._read_files_with_deletes

    def spy(t, files, deletes, **kw):
        seen.append(len(files))
        return real(t, files, deletes, **kw)

    monkeypatch.setattr(iceberg, "_read_files_with_deletes", spy)
    out = iceberg.delete_where(spark, loc, "band = 2 AND v >= 21")
    assert out == {"rows_deleted": 2, "files_affected": 1}
    assert seen and seen[0] == 1  # probe opened only the band=2 file
    t = iceberg.IcebergTable(spark, loc)
    assert t.read().count() == 7
    seen.clear()
    # unextractable: full probe, same semantics
    out = iceberg.delete_where(spark, loc, "band = 1 OR v = 30")
    assert out["rows_deleted"] == 4
    assert seen and seen[0] == 3
    # overwrite_where probes pruned too
    seen.clear()
    batch = spark.createDataFrame([(3, 99)], "band int, v int")
    out = iceberg.overwrite_where(spark, loc, batch, "band = 3")
    assert out["rows_deleted"] == 2  # 31, 32 remained in band 3
    assert seen and seen[0] == 1
    t = iceberg.IcebergTable(spark, loc)
    assert sorted(r.v for r in t.read().collect()) == [20, 99]
