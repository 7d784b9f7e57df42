"""Iceberg interop: from-scratch Avro container + table-spec reader
(sources/avrofile.py, sources/iceberg.py). Spec fixtures are
hand-assembled bytes (independent of the writer) so the READER is
pinned to the published format, same discipline as test_deltalog."""

from __future__ import annotations

import json
import os
import struct
import zlib

import pytest

from global_seismic_data_pipeline_spark.sources import avrofile, iceberg


# ---------------------------------------------------------------- avro

def _vint(n: int) -> bytes:
    """Independent zigzag varint encoder (NOT avrofile's) for the
    hand-assembled spec fixtures."""
    zz = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = zz & 0x7F
        zz >>= 7
        if zz:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _vstr(s: bytes) -> bytes:
    return _vint(len(s)) + s


def test_avro_handassembled_container():
    """Byte-level container per the Avro 1.11 spec: magic, metadata map
    (one block, terminated), sync, one data block, sync. Exercises
    zigzag varints (incl. negative + multi-byte), strings, union index,
    and block framing with no writer involvement."""
    schema = {
        "type": "record",
        "name": "e",
        "fields": [
            {"name": "x", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "u", "type": ["null", "long"]},
        ],
    }
    sync = bytes(range(16))
    schema_bytes = json.dumps(schema).encode()
    header = (
        b"Obj\x01"
        + _vint(2)  # metadata map: one block of 2 entries
        + _vstr(b"avro.schema") + _vstr(schema_bytes)
        + _vstr(b"avro.codec") + _vstr(b"null")
        + _vint(0)  # map terminator
        + sync
    )
    # two records: (-301, "hé", null), (2**40, "", 7)
    body = (
        _vint(-301) + _vstr("hé".encode()) + _vint(0)
        + _vint(2**40) + _vstr(b"") + _vint(1) + _vint(7)
    )
    data = header + _vint(2) + _vint(len(body)) + body + sync
    meta, recs = avrofile.read_container(data)
    assert recs == [
        {"x": -301, "s": "hé", "u": None},
        {"x": 2**40, "s": "", "u": 7},
    ]
    assert meta["avro.schema"] == schema


def test_avro_deflate_block():
    """deflate codec = RAW rfc-1951 bytes (no zlib header), per spec."""
    schema = {"type": "record", "name": "e",
              "fields": [{"name": "x", "type": "long"}]}
    sync = b"\x11" * 16
    header = (
        b"Obj\x01"
        + _vint(2)
        + _vstr(b"avro.schema") + _vstr(json.dumps(schema).encode())
        + _vstr(b"avro.codec") + _vstr(b"deflate")
        + _vint(0)
        + sync
    )
    raw = b"".join(_vint(i * 1000) for i in range(50))
    comp = zlib.compressobj(wbits=-15)
    blk = comp.compress(raw) + comp.flush()
    data = header + _vint(50) + _vint(len(blk)) + blk + sync
    _, recs = avrofile.read_container(data)
    assert [r["x"] for r in recs] == [i * 1000 for i in range(50)]


def test_avro_refusals():
    with pytest.raises(ValueError, match="magic"):
        avrofile.read_container(b"PAR1not-avro")
    schema = {"type": "record", "name": "e",
              "fields": [{"name": "x", "type": "long"}]}
    sync = b"\x00" * 16
    header = (
        b"Obj\x01" + _vint(2)
        + _vstr(b"avro.schema") + _vstr(json.dumps(schema).encode())
        + _vstr(b"avro.codec") + _vstr(b"snappy") + _vint(0) + sync
    )
    with pytest.raises(ValueError, match="codec"):
        avrofile.read_container(header + _vint(0) + _vint(0) + sync)


def test_avro_writer_roundtrip_nested():
    schema = {
        "type": "record", "name": "r", "fields": [
            {"name": "a", "type": "long"},
            {"name": "m", "type": {"type": "map", "values": "bytes"}},
            {"name": "arr", "type": {"type": "array", "items": {
                "type": "record", "name": "kv", "fields": [
                    {"name": "k", "type": "int"},
                    {"name": "v", "type": ["null", "string"]}]}}},
        ],
    }
    recs = [
        {"a": -5, "m": {"x": b"\x01"}, "arr": [{"k": 2, "v": None},
                                               {"k": 3, "v": "z"}]},
        {"a": 9, "m": {}, "arr": []},
    ]
    meta, got = avrofile.read_container(
        avrofile.write_container(schema, recs)
    )
    assert got == recs


# ------------------------------------------------------------- iceberg

def _mk_df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string, val double")


def test_iceberg_create_read_append_timetravel(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    t = iceberg.create_table(spark, loc, _mk_df(spark, [(1, "a", 1.5), (2, "b", 2.5)]))
    assert sorted((r.id, r.name, r.val) for r in t.read().collect()) == [
        (1, "a", 1.5), (2, "b", 2.5)
    ]
    v1 = t.current_snapshot_id()
    t2 = iceberg.append(spark, loc, _mk_df(spark, [(3, "c", 3.5)]))
    assert {r.id for r in t2.read().collect()} == {1, 2, 3}
    # time travel by snapshot id
    assert {r.id for r in t2.read(snapshot_id=v1).collect()} == {1, 2}
    # time travel by timestamp: at v1's commit ms we see v1
    ts1 = t2.resolve_snapshot(v1)["timestamp-ms"]
    assert {r.id for r in t2.read(as_of_ms=ts1).collect()} == {1, 2}
    # schema surfaced from metadata, not parquet
    assert [f.name for f in t2.spark_schema().fields] == ["id", "name", "val"]


def test_iceberg_append_schema_mismatch_refuses(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    iceberg.create_table(spark, loc, _mk_df(spark, [(1, "a", 1.0)]))
    bad = spark.createDataFrame([(1, "a")], "id long, name string")
    with pytest.raises(iceberg.IcebergError, match="schema mismatch"):
        iceberg.append(spark, loc, bad)


def test_iceberg_tail_incremental(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    t = iceberg.create_table(spark, loc, _mk_df(spark, [(1, "a", 1.0)]))
    s1 = t.current_snapshot_id()
    iceberg.append(spark, loc, _mk_df(spark, [(2, "b", 2.0)]))
    t3 = iceberg.append(spark, loc, _mk_df(spark, [(3, "c", 3.0)]))
    rows, cursor = t3.tail(s1)
    assert {r.id for r in rows.collect()} == {2, 3}
    assert cursor == t3.current_snapshot_id()
    rows2, cursor2 = t3.tail(cursor)
    assert rows2.count() == 0 and cursor2 == cursor
    with pytest.raises(iceberg.IcebergError, match="not in the log"):
        t3.tail(999999)


def _partitioned_fixture(spark, tmp_path):
    """Hand-built PARTITIONED v2-shaped table: two parquet files, one
    per category, manifest carrying partition values, identity +
    truncate + bucket transforms in the spec."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    loc = str(tmp_path / "ptbl")
    md = os.path.join(loc, "metadata")
    os.makedirs(md)
    data = os.path.join(loc, "data")
    os.makedirs(data)
    fa = os.path.join(data, "a.parquet")
    fb = os.path.join(data, "b.parquet")
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64()),
                  "cat": pa.array(["alpha", "alpha"])}), fa)
    pq.write_table(
        pa.table({"id": pa.array([3], pa.int64()),
                  "cat": pa.array(["beta"])}), fb)

    entry_schema = {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"]},
            {"name": "data_file", "type": {
                "type": "record", "name": "r2", "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "partition", "type": {
                        "type": "record", "name": "r102", "fields": [
                            {"name": "cat", "type": ["null", "string"]},
                            {"name": "cat_trunc", "type": ["null", "string"]},
                            {"name": "id_bucket", "type": ["null", "int"]},
                        ]}},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {"name": "lower_bounds", "type": ["null", {
                        "type": "array", "logicalType": "map",
                        "items": {"type": "record", "name": "k126_v127",
                                  "fields": [
                                      {"name": "key", "type": "int"},
                                      {"name": "value", "type": "bytes"}]}}]},
                    {"name": "upper_bounds", "type": ["null", {
                        "type": "array", "logicalType": "map",
                        "items": {"type": "record", "name": "k128_v129",
                                  "fields": [
                                      {"name": "key", "type": "int"},
                                      {"name": "value", "type": "bytes"}]}}]},
                ]}},
        ],
    }

    def _le8(v):
        return v.to_bytes(8, "little", signed=True)
    def _bucket4(v):
        return (iceberg._bucket_hash(v) & 0x7FFFFFFF) % 4

    entries = [
        {"status": 1, "snapshot_id": 10, "data_file": {
            "content": 0, "file_path": f"file:{fa}",
            "file_format": "parquet",
            "partition": {"cat": "alpha", "cat_trunc": "al",
                          "id_bucket": _bucket4(1)},
            "record_count": 2,
            "file_size_in_bytes": os.path.getsize(fa),
            "lower_bounds": [{"key": 1, "value": _le8(1)}],
            "upper_bounds": [{"key": 1, "value": _le8(2)}]}},
        {"status": 1, "snapshot_id": 10, "data_file": {
            "content": 0, "file_path": f"file:{fb}",
            "file_format": "parquet",
            "partition": {"cat": "beta", "cat_trunc": "be",
                          "id_bucket": _bucket4(3)},
            "record_count": 1,
            "file_size_in_bytes": os.path.getsize(fb),
            "lower_bounds": [{"key": 1, "value": _le8(3)}],
            "upper_bounds": [{"key": 1, "value": _le8(3)}]}},
    ]
    manifest = os.path.join(md, "m1.avro")
    avrofile.write_file(manifest, entry_schema, entries)
    mlist = os.path.join(md, "snap-10.avro")
    avrofile.write_file(mlist, {
        "type": "record", "name": "manifest_file", "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "partition_spec_id", "type": "int"},
            {"name": "content", "type": "int"},
            {"name": "added_snapshot_id", "type": ["null", "long"]},
        ]}, [{
            "manifest_path": f"file:{manifest}",
            "manifest_length": os.path.getsize(manifest),
            "partition_spec_id": 0, "content": 0,
            "added_snapshot_id": 10}])
    meta = {
        "format-version": 2,
        "table-uuid": "0000", "location": loc, "last-updated-ms": 1000,
        "last-column-id": 2, "current-schema-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "cat", "required": False, "type": "string"},
        ]}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": [
            {"name": "cat", "transform": "identity",
             "source-id": 2, "field-id": 1000},
            {"name": "cat_trunc", "transform": "truncate[2]",
             "source-id": 2, "field-id": 1001},
            {"name": "id_bucket", "transform": "bucket[4]",
             "source-id": 1, "field-id": 1002},
        ]}],
        "properties": {}, "current-snapshot-id": 10,
        "snapshots": [{"snapshot-id": 10, "timestamp-ms": 1000,
                       "summary": {"operation": "append"},
                       "manifest-list": f"file:{mlist}"}],
        "snapshot-log": [{"timestamp-ms": 1000, "snapshot-id": 10}],
    }
    with open(os.path.join(md, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(md, "version-hint.text"), "w") as fh:
        fh.write("1")
    return loc


def test_iceberg_partition_pruning(spark, tmp_path):
    loc = _partitioned_fixture(spark, tmp_path)
    t = iceberg.IcebergTable(spark, loc)
    # no filter: both files
    assert len(t.data_files()) == 2
    # identity transform prunes to one file
    files = t.data_files(eq_filters={"cat": "alpha"})
    assert len(files) == 1 and files[0]["partition"]["cat"] == "alpha"
    assert {r.id for r in t.read(eq_filters={"cat": "alpha"}).collect()} == {1, 2}
    # truncate[2] prunes consistently with identity
    assert len(t.data_files(eq_filters={"cat": "beta"})) == 1
    # bucket[4] prunes exactly via murmur3 (ids 1 and 3 land in
    # different buckets)
    assert len(t.data_files(eq_filters={"id": 1})) == 1
    assert len(t.data_files(eq_filters={"id": 3})) == 1
    # a float value is un-hashable AND outside decoded long bounds ->
    # bounds still prune (1.5 is within [1,2] for file A only)
    assert len(t.data_files(eq_filters={"id": 1.5})) == 1
    # wrong value prunes everything (identity mismatch on both files)
    assert t.read(eq_filters={"cat": "nope"}).count() == 0
    # column BOUNDS prune where the bucket cannot: id=10 hashes into
    # file A's bucket but lies outside its [1,2] bounds
    assert t.data_files(eq_filters={"id": 10}) == []
    # metadata-only row count: no data files touched
    assert t.row_count() == 3


def test_iceberg_bucket_transform_spec_vectors():
    """The spec's appendix-B published murmur3 hash values — the bucket
    transform is pinned to the real Iceberg hash function, not merely
    self-consistent."""
    import datetime as dt

    from global_seismic_data_pipeline_spark.sources.iceberg import (
        _bucket_hash,
    )

    assert _bucket_hash(34) == 2017239379           # int and long agree
    assert _bucket_hash("iceberg") == 1210000089
    assert _bucket_hash(dt.date(2017, 11, 16)) == -653330422
    assert _bucket_hash(dt.datetime(2017, 11, 16, 22, 31, 8)) == -2047944441


def test_iceberg_overwrite_and_tail_refusal(spark, tmp_path):
    """overwrite replaces the live set in one snapshot, keeps time
    travel working, and poisons the incremental tail (the spec's
    operation summary) unless ignore_changes."""
    loc = str(tmp_path / "tbl")
    t = iceberg.create_table(spark, loc, _mk_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    s1 = t.current_snapshot_id()
    t2 = iceberg.overwrite(spark, loc, _mk_df(spark, [(9, "z", 9.0)]))
    assert {r.id for r in t2.read().collect()} == {9}
    assert {r.id for r in t2.read(snapshot_id=s1).collect()} == {1, 2}
    with pytest.raises(iceberg.IcebergError, match="not append"):
        t2.tail(s1)
    rows, cursor = t2.tail(s1, ignore_changes=True)
    assert {r.id for r in rows.collect()} == {9}
    assert cursor == t2.current_snapshot_id()


def test_iceberg_v2_delete_manifest_refuses(spark, tmp_path):
    loc = _partitioned_fixture(spark, tmp_path)
    md = os.path.join(loc, "metadata")
    # add a delete manifest (content=1) with one live entry
    del_manifest = os.path.join(md, "del1.avro")
    avrofile.write_file(del_manifest, {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"]},
            {"name": "data_file", "type": {
                "type": "record", "name": "r2", "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                ]}},
        ]}, [{"status": 1, "snapshot_id": 11, "data_file": {
            "content": 1, "file_path": "file:/dev/null",
            "file_format": "parquet", "record_count": 1}}])
    mlist2 = os.path.join(md, "snap-11.avro")
    avrofile.write_file(mlist2, {
        "type": "record", "name": "manifest_file", "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "partition_spec_id", "type": "int"},
            {"name": "content", "type": "int"},
        ]}, [{"manifest_path": f"file:{del_manifest}",
              "manifest_length": os.path.getsize(del_manifest),
              "partition_spec_id": 0, "content": 1}])
    with open(os.path.join(md, "v1.metadata.json")) as fh:
        meta = json.load(fh)
    meta["snapshots"].append({
        "snapshot-id": 11, "timestamp-ms": 2000,
        "summary": {"operation": "delete"},
        "manifest-list": f"file:{mlist2}"})
    meta["current-snapshot-id"] = 11
    with open(os.path.join(md, "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(md, "version-hint.text"), "w") as fh:
        fh.write("2")
    t = iceberg.IcebergTable(spark, loc)
    with pytest.raises(iceberg.IcebergError, match="delete files"):
        t.read()
    # and the tail refuses the non-append snapshot
    with pytest.raises(iceberg.IcebergError, match="not append"):
        t.tail(10)


def test_iceberg_nested_type_refuses(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    md = os.path.join(loc, "metadata")
    os.makedirs(md)
    meta = {
        "format-version": 1, "table-uuid": "0", "location": loc,
        "last-updated-ms": 0, "last-column-id": 1,
        "schema": {"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "s", "required": False,
             "type": {"type": "struct", "fields": []}}]},
        "partition-spec": [], "properties": {},
        "current-snapshot-id": -1, "snapshots": [],
    }
    with open(os.path.join(md, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    t = iceberg.IcebergTable(spark, loc)
    with pytest.raises(iceberg.IcebergError, match="nested"):
        t.spark_schema()


def test_iceberg_tail_consumer_medallion(spark, tmp_path):
    """Bronze Iceberg -> silver MERGE through the cursor-tracked
    consumer: O(snapshot-delta) batches, at-least-once replay after a
    crash between fn and the cursor advance stays idempotent."""
    from global_seismic_data_pipeline_spark.sources.warehouse import (
        Warehouse,
    )
    from global_seismic_data_pipeline_spark.streaming.iceberg_source import (
        IcebergTailConsumer,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    loc = str(tmp_path / "bronze")
    iceberg.create_table(spark, loc, _mk_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))

    def to_silver(batch):
        wh.merge(batch, "silver", keys=["id"])

    c = IcebergTailConsumer(wh, loc)
    assert c.process_available(to_silver) == 1
    assert {r.id for r in wh.read("silver").collect()} == {1, 2}
    assert c.process_available(to_silver) == 0  # caught up

    iceberg.append(spark, loc, _mk_df(spark, [(3, "c", 3.0)]))
    iceberg.append(spark, loc, _mk_df(spark, [(2, "B", 20.0)]))
    assert c.process_available(to_silver) == 1
    silver = {r.id: r.val for r in wh.read("silver").collect()}
    assert silver == {1: 1.0, 2: 20.0, 3: 3.0}

    # crash replay: wind the cursor back one snapshot and re-consume;
    # the MERGE re-applies the same slice with no duplicates
    t = iceberg.IcebergTable(spark, loc)
    snaps = sorted(s["snapshot-id"] for s in t.snapshots())
    c._advance(snaps[-2])
    assert c.process_available(to_silver) == 1
    silver2 = {r.id: r.val for r in wh.read("silver").collect()}
    assert silver2 == silver
    assert wh.read("silver").count() == 3


def test_iceberg_publish_occ_race(spark, tmp_path, monkeypatch):
    """Two writers computing the SAME next version: the loser's os.link
    hits the winner's file and raises loudly instead of clobbering; a
    re-plan lands on the next version."""
    import json as _json

    loc = str(tmp_path / "tbl")
    iceberg.create_table(spark, loc, _mk_df(spark, [(1, "a", 1.0)]))
    md = os.path.join(loc, "metadata")
    with open(os.path.join(md, "v1.metadata.json")) as fh:
        meta = _json.load(fh)
    # the interloper's v2 lands AFTER our version scan: hide it from
    # listdir so _publish also computes v2 and collides on the link
    with open(os.path.join(md, "v2.metadata.json"), "w") as fh:
        _json.dump(meta, fh)
    real_listdir = os.listdir
    monkeypatch.setattr(
        os, "listdir",
        lambda p: [f for f in real_listdir(p) if f != "v2.metadata.json"],
    )
    with pytest.raises(iceberg.IcebergError, match="race|concurrent"):
        iceberg._publish(loc, meta)
    monkeypatch.undo()
    # winner's file intact; a re-plan claims v3
    iceberg._publish(loc, meta)
    assert os.path.exists(os.path.join(md, "v3.metadata.json"))
    assert iceberg.IcebergTable(spark, loc).read().count() == 1
