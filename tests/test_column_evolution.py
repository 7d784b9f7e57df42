"""ALTER TABLE column evolution (ADD / RENAME / DROP COLUMN).

Delta: metadata-only commits under column mapping (rename/drop keep the
field's physicalName/id so every written file resolves untouched;
``enable_column_mapping`` upgrades an unmapped table first). Iceberg:
metadata-only by construction — readers resolve by field id, ids are
never reused, so a dropped column can never resurrect through a
same-name re-add. Plain parquet refuses all three (any change would mean
rewriting every file). Reference analog: the silver schema's aliased
``event_time/depth_km/magnitude`` (04_silver_transformation.py:172-174),
which a real deployment evolves in place rather than re-aliasing at
every write.
"""

from __future__ import annotations

import json
import os

import pytest

from global_seismic_data_pipeline_spark.sources import deltalog as dl
from global_seismic_data_pipeline_spark.sources import iceberg as ib
from global_seismic_data_pipeline_spark.sources.deltawh import DeltaLogWarehouse
from global_seismic_data_pipeline_spark.sources.icebergwh import IcebergWarehouse
from global_seismic_data_pipeline_spark.sources.sqldml import SqlDml
from global_seismic_data_pipeline_spark.sources.warehouse import Warehouse


def _df(spark, rows=(("e1", 5.0, "tokyo"), ("e2", 6.5, "osaka"))):
    return spark.createDataFrame(
        list(rows), "event_id string, mag double, place string"
    )


# ---------------------------------------------------------------- Delta


def test_delta_rename_requires_mapping_then_works(spark, tmp_path):
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    wh.overwrite(_df(spark), "t")
    with pytest.raises(ValueError, match="column mapping"):
        wh.rename_column("t", "mag", "magnitude")
    wh.enable_column_mapping("t")
    wh.enable_column_mapping("t")  # idempotent no-op
    wh.rename_column("t", "mag", "magnitude")
    got = {r.event_id: r.magnitude for r in wh.read("t").collect()}
    # old files read correctly through physicalName resolution
    assert got == {"e1": 5.0, "e2": 6.5}
    assert "mag" not in wh.read("t").columns


def test_delta_mapping_upgrade_pins_physical_names_and_protocol(spark, tmp_path):
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    wh.overwrite(_df(spark), "t")
    wh.enable_column_mapping("t")
    st = dl.snapshot_state(wh.path("t"))
    conf = st["metadata"]["configuration"]
    assert conf["delta.columnMapping.mode"] == "name"
    assert conf["delta.columnMapping.maxColumnId"] == "3"
    fields = json.loads(st["metadata"]["schemaString"])["fields"]
    # physicalName = the name at upgrade time, ids sequential
    assert [
        (f["name"], f["metadata"]["delta.columnMapping.physicalName"],
         f["metadata"]["delta.columnMapping.id"])
        for f in fields
    ] == [("event_id", "event_id", 1), ("mag", "mag", 2),
          ("place", "place", 3)]
    assert st["protocol"]["minReaderVersion"] >= 2
    assert st["protocol"]["minWriterVersion"] >= 5


def test_delta_rename_then_append_and_time_travel(spark, tmp_path):
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    wh.overwrite(_df(spark), "t")
    wh.enable_column_mapping("t")
    v_before = dl.snapshot_state(wh.path("t"))["version"]
    wh.rename_column("t", "place", "city")
    wh.append(
        spark.createDataFrame(
            [("e3", 7.0, "kobe")],
            "event_id string, mag double, city string",
        ),
        "t",
    )
    got = {r.event_id: r.city for r in wh.read("t").collect()}
    assert got == {"e1": "tokyo", "e2": "osaka", "e3": "kobe"}
    # time travel to before the rename serves the OLD logical name
    old = wh.read_version("t", v_before)
    assert "place" in old.columns and "city" not in old.columns


def test_delta_add_column_reads_null_then_fills(spark, tmp_path):
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    wh.overwrite(_df(spark), "t")
    wh.add_column("t", "depth_km", "double")  # unmapped add is legal
    rows = {r.event_id: r.depth_km for r in wh.read("t").collect()}
    assert rows == {"e1": None, "e2": None}
    wh.append(
        spark.createDataFrame(
            [("e3", 4.0, "kobe", 30.0)],
            "event_id string, mag double, place string, depth_km double",
        ),
        "t",
    )
    rows = {r.event_id: r.depth_km for r in wh.read("t").collect()}
    assert rows == {"e1": None, "e2": None, "e3": 30.0}
    with pytest.raises(ValueError, match="already exists"):
        wh.add_column("t", "MAG", "double")


def test_delta_drop_never_resurrects_on_readd(spark, tmp_path):
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    wh.overwrite(_df(spark), "t")
    with pytest.raises(ValueError, match="column mapping"):
        wh.drop_column("t", "place")
    wh.enable_column_mapping("t")
    wh.drop_column("t", "place")
    assert "place" not in wh.read("t").columns
    # re-adding the same NAME mints a fresh physicalName/id — the old
    # values (still in the files under the old physical column) must
    # never come back
    wh.add_column("t", "place", "string")
    rows = {r.event_id: r.place for r in wh.read("t").collect()}
    assert rows == {"e1": None, "e2": None}
    conf = dl.snapshot_state(wh.path("t"))["metadata"]["configuration"]
    assert int(conf["delta.columnMapping.maxColumnId"]) == 4


def test_delta_refusals(spark, tmp_path):
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    wh.append(_df(spark), "t", partition_by=["place"])
    wh.enable_column_mapping("t")
    with pytest.raises(ValueError, match="partition column"):
        wh.drop_column("t", "place")
    wh.add_constraint("t", "mag_pos", "mag > 0")
    with pytest.raises(ValueError, match="referenced by"):
        wh.rename_column("t", "mag", "magnitude")
    with pytest.raises(ValueError, match="referenced by"):
        wh.drop_column("t", "mag")
    with pytest.raises(ValueError, match="no such column"):
        wh.rename_column("t", "ghost", "x")
    with pytest.raises(ValueError, match="no such column"):
        wh.drop_column("t", "ghost")


def test_delta_rename_partition_column(spark, tmp_path):
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    wh.append(_df(spark), "t", partition_by=["place"])
    wh.enable_column_mapping("t")
    wh.rename_column("t", "place", "city")
    st = dl.snapshot_state(wh.path("t"))
    assert st["metadata"]["partitionColumns"] == ["city"]
    got = {r.event_id: r.city for r in wh.read("t").collect()}
    assert got == {"e1": "tokyo", "e2": "osaka"}
    # appends keyed by the NEW logical name land in the same layout
    wh.append(
        spark.createDataFrame(
            [("e3", 7.0, "kobe")],
            "event_id string, mag double, city string",
        ),
        "t", partition_by=["city"],
    )
    assert wh.read("t").count() == 3


def test_delta_foreign_mapped_fixture_rename_roundtrip(spark, tmp_path):
    """A hand-authored (foreign-writer-style) column-mapping table whose
    physical names already differ from the logical ones: rename keeps
    the physicalName, so the pre-existing file keeps resolving."""
    p = str(tmp_path / "foreign")
    os.makedirs(os.path.join(p, "_delta_log"))
    spark.createDataFrame([(1, "x")], "col_aaa long, col_bbb string") \
        .coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage"))
    part = next(
        f for f in os.listdir(str(tmp_path / "stage"))
        if f.endswith(".parquet")
    )
    os.rename(
        os.path.join(str(tmp_path / "stage"), part),
        os.path.join(p, "f1.parquet"),
    )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col_aaa"}},
            {"name": "val", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col_bbb"}},
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "fx1", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema), "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "2"},
            "createdTime": 1,
        }},
        {"add": {"path": "f1.parquet", "partitionValues": {},
                 "size": os.path.getsize(os.path.join(p, "f1.parquet")),
                 "modificationTime": 1, "dataChange": True}},
        {"commitInfo": {"timestamp": 1000, "operation": "WRITE"}},
    ]
    with open(os.path.join(p, "_delta_log", "%020d.json" % 0), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    dl.alter_rename_column(p, "val", "label")
    got = dl.read_delta(spark, p).collect()
    assert [(r.id, r.label) for r in got] == [(1, "x")]
    fields = json.loads(
        dl.snapshot_state(p)["metadata"]["schemaString"]
    )["fields"]
    assert fields[1]["name"] == "label"
    assert (
        fields[1]["metadata"]["delta.columnMapping.physicalName"]
        == "col_bbb"
    )


# -------------------------------------------------------------- Iceberg


def test_iceberg_rename_is_metadata_only(spark, tmp_path):
    wh = IcebergWarehouse(spark, str(tmp_path / "iwh"))
    wh.overwrite(_df(spark), "t")
    files_before = sorted(
        f["file_path"] for f in wh.table("t").data_files()
    )
    wh.rename_column("t", "mag", "magnitude")
    got = {r.event_id: r.magnitude for r in wh.read("t").collect()}
    assert got == {"e1": 5.0, "e2": 6.5}
    # not a single data file moved or rewrote
    assert sorted(
        f["file_path"] for f in wh.table("t").data_files()
    ) == files_before
    # field id survived the rename (the spec's rename contract)
    sch = wh.table("t").schema_json()
    assert [(f["name"], f["id"]) for f in sch["fields"]] == [
        ("event_id", 1), ("magnitude", 2), ("place", 3),
    ]


def test_iceberg_rename_then_append(spark, tmp_path):
    wh = IcebergWarehouse(spark, str(tmp_path / "iwh"))
    wh.overwrite(_df(spark), "t")
    wh.rename_column("t", "place", "city")
    wh.append(
        spark.createDataFrame(
            [("e3", 7.0, "kobe")],
            "event_id string, mag double, city string",
        ),
        "t",
    )
    got = {r.event_id: r.city for r in wh.read("t").collect()}
    assert got == {"e1": "tokyo", "e2": "osaka", "e3": "kobe"}


def test_iceberg_add_drop_and_id_never_reused(spark, tmp_path):
    wh = IcebergWarehouse(spark, str(tmp_path / "iwh"))
    wh.overwrite(_df(spark), "t")
    wh.add_column("t", "depth_km", "double")
    assert {r.event_id: r.depth_km for r in wh.read("t").collect()} \
        == {"e1": None, "e2": None}
    assert wh.table("t").metadata["last-column-id"] == 4
    wh.drop_column("t", "place")
    assert "place" not in wh.read("t").columns
    # last-column-id NEVER decreases through the drop...
    assert wh.table("t").metadata["last-column-id"] == 4
    # ...so the re-added name gets a FRESH id and reads NULL, never the
    # old values still sitting in the files under id 3
    wh.add_column("t", "place", "string")
    sch = wh.table("t").schema_json()
    place = next(f for f in sch["fields"] if f["name"] == "place")
    assert place["id"] == 5
    assert {r.event_id: r.place for r in wh.read("t").collect()} \
        == {"e1": None, "e2": None}
    # appends after the alters keep the table ids (regression: the
    # warehouse used to regenerate positional ids from the batch)
    wh.append(
        spark.createDataFrame(
            [("e3", 7.0, 30.0, "kobe")],
            "event_id string, mag double, depth_km double, place string",
        ),
        "t",
    )
    got = {
        r.event_id: (r.depth_km, r.place)
        for r in wh.read("t").collect()
    }
    assert got == {
        "e1": (None, None), "e2": (None, None), "e3": (30.0, "kobe"),
    }
    assert wh.table("t").metadata["last-column-id"] == 5


def test_iceberg_drop_partition_source_refuses(spark, tmp_path):
    wh = IcebergWarehouse(spark, str(tmp_path / "iwh"))
    wh.append(_df(spark), "t", partition_by=["place"])
    with pytest.raises(ib.IcebergError, match="partition"):
        wh.drop_column("t", "place")
    # renaming the partition SOURCE is fine — spec references it by id
    wh.rename_column("t", "place", "city")
    assert {r.event_id: r.city for r in wh.read("t").collect()} \
        == {"e1": "tokyo", "e2": "osaka"}


def test_iceberg_alter_collisions(spark, tmp_path):
    wh = IcebergWarehouse(spark, str(tmp_path / "iwh"))
    wh.overwrite(_df(spark), "t")
    with pytest.raises(ib.IcebergError, match="already exists"):
        wh.add_column("t", "MAG", "double")
    with pytest.raises(ib.IcebergError, match="already exists"):
        wh.rename_column("t", "event_id", "place")
    with pytest.raises(ib.IcebergError, match="no such column"):
        wh.drop_column("t", "ghost")


# ---------------------------------------------------------------- façade


def test_facade_alter_column_verbs_delta(spark, tmp_path):
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    engine = SqlDml(wh)
    wh.overwrite(_df(spark), "t")
    engine.sql(
        "ALTER TABLE t SET TBLPROPERTIES "
        "('delta.columnMapping.mode' = 'name')"
    )
    engine.sql("ALTER TABLE t RENAME COLUMN mag TO magnitude")
    engine.sql("ALTER TABLE t ADD COLUMN depth_km double")
    engine.sql("ALTER TABLE t DROP COLUMN place")
    got = wh.read("t")
    assert set(got.columns) == {"event_id", "magnitude", "depth_km"}
    assert {r.event_id: r.magnitude for r in got.collect()} \
        == {"e1": 5.0, "e2": 6.5}


def test_facade_alter_column_verbs_iceberg(spark, tmp_path):
    wh = IcebergWarehouse(spark, str(tmp_path / "iwh"))
    engine = SqlDml(wh)
    wh.overwrite(_df(spark), "t")
    engine.sql("ALTER TABLE t RENAME COLUMN mag TO magnitude")
    engine.sql("ALTER TABLE t ADD COLUMNS (depth_km decimal(12,2))")
    engine.sql("ALTER TABLE t DROP COLUMN place")
    sch = wh.table("t").schema_json()
    assert [(f["name"]) for f in sch["fields"]] == [
        "event_id", "magnitude", "depth_km",
    ]
    assert next(
        f for f in sch["fields"] if f["name"] == "depth_km"
    )["type"] == "decimal(12,2)"


def test_facade_set_tblproperties_iceberg(spark, tmp_path):
    wh = IcebergWarehouse(spark, str(tmp_path / "iwh"))
    engine = SqlDml(wh)
    wh.overwrite(_df(spark), "t")
    engine.sql(
        "ALTER TABLE t SET TBLPROPERTIES "
        "('write.metadata.previous-versions-max' = '7')"
    )
    assert wh.table("t").metadata["properties"][
        "write.metadata.previous-versions-max"
    ] == "7"


# ------------------------------------------------- MERGE schema evolution


def test_merge_refuses_drifted_source_by_default(spark, tmp_path):
    for cls in (Warehouse, DeltaLogWarehouse, IcebergWarehouse):
        wh = cls(spark, str(tmp_path / cls.__name__))
        wh.overwrite(_df(spark), "t")
        upd = spark.createDataFrame(
            [("e1", 9.0, "tokyo", 30.0)],
            "event_id string, mag double, place string, depth_km double",
        )
        with pytest.raises(ValueError, match="merge_schema=True"):
            wh.merge(upd, "t", ["event_id"])


@pytest.mark.parametrize("cls", [DeltaLogWarehouse, IcebergWarehouse],
                         ids=["delta", "iceberg"])
def test_merge_schema_evolves_and_backfills_null(spark, tmp_path, cls):
    wh = cls(spark, str(tmp_path / "wh"))
    wh.overwrite(_df(spark), "t")
    upd = spark.createDataFrame(
        [("e1", 9.0, "tokyo", 30.0), ("e3", 4.0, "kobe", 12.0)],
        "event_id string, mag double, place string, depth_km double",
    )
    wh.merge(upd, "t", ["event_id"], merge_schema=True)
    got = {
        r.event_id: (r.mag, r.depth_km)
        for r in wh.read("t").collect()
    }
    assert got == {
        "e1": (9.0, 30.0),   # matched: updated with the new column
        "e2": (6.5, None),   # untouched target row: NULL backfill
        "e3": (4.0, 12.0),   # inserted
    }
    # a later plain append with the evolved schema works
    wh.append(
        spark.createDataFrame(
            [("e4", 5.0, "nara", 8.0)],
            "event_id string, mag double, place string, depth_km double",
        ),
        "t",
    )
    assert wh.read("t").count() == 4


def test_merge_schema_evolution_pruned_partitions_delta(spark, tmp_path):
    """The pruned-rewrite path: only touched partitions rewrite, yet the
    table schema evolves in the SAME commit — untouched partitions' old
    files read the new column as NULL."""
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    wh.append(_df(spark), "t", partition_by=["place"])
    upd = spark.createDataFrame(
        [("e1", 9.0, "tokyo", 30.0)],
        "event_id string, mag double, place string, depth_km double",
    )
    wh.merge(upd, "t", ["event_id"], prune_partition_col="place",
             merge_schema=True)
    got = {
        r.event_id: (r.mag, r.depth_km)
        for r in wh.read("t").collect()
    }
    assert got == {"e1": (9.0, 30.0), "e2": (6.5, None)}


def test_merge_schema_evolution_cdf_postimages(spark, tmp_path):
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    wh.overwrite(_df(spark), "t")
    dl.commit_set_properties(
        wh.path("t"), {"delta.enableChangeDataFeed": "true"}, min_writer=4
    )
    upd = spark.createDataFrame(
        [("e1", 9.0, "tokyo", 30.0), ("e3", 4.0, "kobe", 12.0)],
        "event_id string, mag double, place string, depth_km double",
    )
    wh.merge(upd, "t", ["event_id"], merge_schema=True)
    v = dl.snapshot_state(wh.path("t"))["version"]
    ch = wh.table_changes("t", v)
    rows = {
        (r._change_type, r.event_id): r.depth_km for r in ch.collect()
    }
    assert rows[("update_preimage", "e1")] is None
    assert rows[("update_postimage", "e1")] == 30.0
    assert rows[("insert", "e3")] == 12.0


def test_merge_schema_evolution_plain_full_rewrite_ok_pruned_refused(
    spark, tmp_path
):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.overwrite(_df(spark), "t")
    upd = spark.createDataFrame(
        [("e1", 9.0, "tokyo", 30.0)],
        "event_id string, mag double, place string, depth_km double",
    )
    # full rewrite re-serializes everything — evolution is safe
    wh.merge(upd, "t", ["event_id"], merge_schema=True)
    assert {r.event_id: r.depth_km for r in wh.read("t").collect()} \
        == {"e1": 30.0, "e2": None}
    # pruned rewrite would leave mixed-schema files — refuse
    wh2 = Warehouse(spark, str(tmp_path / "wh2"))
    wh2.append(_df(spark), "t", partition_by=["place"])
    with pytest.raises(ValueError, match="mixed-schema"):
        wh2.merge(upd, "t", ["event_id"], prune_partition_col="place",
                  merge_schema=True)


def test_facade_merge_with_schema_evolution(spark, tmp_path):
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    engine = SqlDml(wh)
    wh.overwrite(_df(spark), "t")
    spark.createDataFrame(
        [("e1", 9.0, "tokyo", 30.0)],
        "event_id string, mag double, place string, depth_km double",
    ).createOrReplaceTempView("updates_v")
    with pytest.raises(ValueError, match="merge_schema=True"):
        engine.sql("""
            MERGE INTO t USING updates_v s ON t.event_id = s.event_id
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
        """)
    engine.sql("""
        MERGE WITH SCHEMA EVOLUTION INTO t
        USING updates_v s ON t.event_id = s.event_id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
    """)
    assert {r.event_id: r.depth_km for r in wh.read("t").collect()} \
        == {"e1": 30.0, "e2": None}


# ----------------------------------------------- ALTER COLUMN TYPE


def _narrow_df(spark):
    return spark.createDataFrame(
        [("e1", 5, 1.5), ("e2", 6, 2.5)],
        "event_id string, depth int, ratio float",
    )


def test_delta_widen_column_reads_old_files(spark, tmp_path):
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    wh.overwrite(_narrow_df(spark), "t")
    wh.widen_column("t", "depth", "bigint")
    wh.widen_column("t", "ratio", "double")
    out = wh.read("t")
    assert dict(out.dtypes)["depth"] == "bigint"
    assert dict(out.dtypes)["ratio"] == "double"
    # old int32/float32 files upcast natively
    assert {r.event_id: (r.depth, r.ratio) for r in out.collect()} == {
        "e1": (5, 1.5), "e2": (6, 2.5),
    }
    st = dl.snapshot_state(wh.path("t"))
    proto = st["protocol"]
    assert proto["minReaderVersion"] == 3
    assert "typeWidening" in proto["readerFeatures"]
    assert "typeWidening" in proto["writerFeatures"]
    fields = json.loads(st["metadata"]["schemaString"])["fields"]
    depth = next(f for f in fields if f["name"] == "depth")
    assert depth["metadata"]["delta.typeChanges"][0]["fromType"] == "integer"
    assert depth["metadata"]["delta.typeChanges"][0]["toType"] == "long"
    # appends with the widened type work; narrowing refuses
    wh.append(
        spark.createDataFrame(
            [("e3", 7, 3.5)], "event_id string, depth long, ratio double"
        ),
        "t",
    )
    assert wh.read("t").count() == 3
    with pytest.raises(ValueError, match="not a supported widening"):
        wh.widen_column("t", "depth", "int")
    with pytest.raises(ValueError, match="not a supported widening"):
        wh.widen_column("t", "event_id", "long")


def test_iceberg_widen_column_keeps_id_and_reads(spark, tmp_path):
    wh = IcebergWarehouse(spark, str(tmp_path / "iwh"))
    wh.overwrite(_narrow_df(spark), "t")
    wh.widen_column("t", "depth", "bigint")
    wh.widen_column("t", "ratio", "double")
    sch = wh.table("t").schema_json()
    assert [(f["name"], f["id"], f["type"]) for f in sch["fields"]] == [
        ("event_id", 1, "string"), ("depth", 2, "long"),
        ("ratio", 3, "double"),
    ]
    out = wh.read("t")
    assert {r.event_id: (r.depth, r.ratio) for r in out.collect()} == {
        "e1": (5, 1.5), "e2": (6, 2.5),
    }
    with pytest.raises(ib.IcebergError, match="type promotion"):
        wh.widen_column("t", "depth", "int")
    with pytest.raises(ib.IcebergError, match="type promotion"):
        wh.widen_column("t", "event_id", "long")


def test_every_supported_widening_upcasts_in_scan(spark, tmp_path):
    """The _WIDENINGS tables promise each pair is metadata-only because
    Spark's parquet scan upcasts the narrow files natively — pin that
    for EVERY allowed pair, not just int->long/float->double (a Spark
    regression here would turn an already-committed widen into unread
    old files)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from global_seismic_data_pipeline_spark.sources.deltalog import (
        _WIDENINGS,
    )

    arrow_of = {
        "byte": pa.int8(), "short": pa.int16(), "integer": pa.int32(),
        "float": pa.float32(),
    }
    ddl_of = {
        "byte": "tinyint", "short": "smallint", "integer": "int",
        "long": "bigint", "float": "float", "double": "double",
    }
    pairs = [
        (narrow, wide)
        for narrow, wides in _WIDENINGS.items()
        for wide in sorted(wides)
    ]
    assert len(pairs) == 10  # the full allowed matrix stays pinned
    for i, (narrow, wide) in enumerate(pairs):
        f = str(tmp_path / f"w{i}.parquet")
        pq.write_table(
            pa.table({"v": pa.array([1, 2], arrow_of[narrow])}), f
        )
        got = (
            spark.read.schema(f"v {ddl_of[wide]}").parquet(f).collect()
        )
        assert sorted(r.v for r in got) == [1, 2], (narrow, wide)


def test_facade_alter_column_type(spark, tmp_path):
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    engine = SqlDml(wh)
    wh.overwrite(_narrow_df(spark), "t")
    engine.sql("ALTER TABLE t ALTER COLUMN depth TYPE bigint")
    assert dict(wh.read("t").dtypes)["depth"] == "bigint"
    wh2 = Warehouse(spark, str(tmp_path / "plain"))
    SqlDml(wh2)  # smoke: constructor
    wh2.overwrite(_narrow_df(spark), "t")
    with pytest.raises(ValueError, match="no table schema"):
        SqlDml(wh2).sql("ALTER TABLE t ALTER COLUMN depth TYPE bigint")


def test_delta_compaction_after_rename_and_widen(spark, tmp_path):
    """Maintenance interplay: OPTIMIZE reads victims through the full
    scan path, so a compaction AFTER a rename + widen must carry the
    renamed logical column and the upcast values — not resurrect the
    old name or the narrow type."""
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    wh.overwrite(
        spark.createDataFrame(
            [("e1", 5), ("e2", 6)], "event_id string, depth int"
        ),
        "t",
    )
    wh.enable_column_mapping("t")
    wh.rename_column("t", "depth", "depth_km")
    wh.widen_column("t", "depth_km", "bigint")
    wh.append(
        spark.createDataFrame([("e3", 7)], "event_id string, depth_km long"),
        "t",
    )
    out = wh.optimize_small_files("t", small_file_mb=512.0)
    assert out["files_rewritten"] >= 2
    got = wh.read("t")
    assert dict(got.dtypes)["depth_km"] == "bigint"
    assert {r.event_id: r.depth_km for r in got.collect()} \
        == {"e1": 5, "e2": 6, "e3": 7}


def test_cdf_merge_on_mapped_table_after_rename(spark, tmp_path):
    """CDF change files on a column-mapping table stage under PHYSICAL
    column names (spec) and read back logical — a MERGE on a mapped +
    CDF-enabled table publishes its change set like any other table,
    including after a rename."""
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    wh.overwrite(_df(spark), "t")
    wh.enable_column_mapping("t")
    dl.commit_set_properties(
        wh.path("t"), {"delta.enableChangeDataFeed": "true"}, min_writer=4
    )
    wh.rename_column("t", "mag", "magnitude")
    upd = spark.createDataFrame(
        [("e1", 9.0, "tokyo"), ("e3", 4.0, "kobe")],
        "event_id string, magnitude double, place string",
    )
    wh.merge(upd, "t", ["event_id"])
    v = dl.snapshot_state(wh.path("t"))["version"]
    ch = wh.table_changes("t", v)
    rows = {
        (r._change_type, r.event_id): r.magnitude for r in ch.collect()
    }
    assert rows[("update_preimage", "e1")] == 5.0
    assert rows[("update_postimage", "e1")] == 9.0
    assert rows[("insert", "e3")] == 4.0


def test_merge_schema_evolution_on_mapped_cdf_table(spark, tmp_path):
    """The combination: column-mapping + CDF + schema-evolving MERGE.
    The evolved column's minted physicalName/id must reach the CDC
    staging too, or the merge crashes mid-flight; the feed serves the
    new column logically with NULL preimages."""
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    wh.overwrite(_df(spark), "t")
    wh.enable_column_mapping("t")
    dl.commit_set_properties(
        wh.path("t"), {"delta.enableChangeDataFeed": "true"}, min_writer=4
    )
    upd = spark.createDataFrame(
        [("e1", 9.0, "tokyo", 30.0), ("e3", 4.0, "kobe", 12.0)],
        "event_id string, mag double, place string, depth_km double",
    )
    wh.merge(upd, "t", ["event_id"], merge_schema=True)
    got = {r.event_id: r.depth_km for r in wh.read("t").collect()}
    assert got == {"e1": 30.0, "e2": None, "e3": 12.0}
    v = dl.snapshot_state(wh.path("t"))["version"]
    ch = wh.table_changes("t", v)
    rows = {
        (r._change_type, r.event_id): r.depth_km for r in ch.collect()
    }
    assert rows[("update_preimage", "e1")] is None
    assert rows[("update_postimage", "e1")] == 30.0
    assert rows[("insert", "e3")] == 12.0


# -------------------------------------------- review-pass regressions


def test_facade_add_columns_multi(spark, tmp_path):
    """ADD COLUMNS (a int, b string) adds BOTH — adding only the first
    with a success summary would be silent schema loss. Commas inside
    angle-bracket generics are TYPE syntax, not separators. The whole
    list is ONE log commit, so a crash or concurrent DDL between
    entries cannot half-apply the statement (per-entry commits could,
    no matter how much pre-validation runs)."""
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    engine = SqlDml(wh)
    wh.overwrite(_df(spark), "t")
    v0 = dl.snapshot_state(wh.path("t"))["version"]
    engine.sql("ALTER TABLE t ADD COLUMNS (depth_km double, region string)")
    assert {"depth_km", "region"} <= set(wh.read("t").columns)
    # atomicity: the two-column statement is exactly one log version
    assert dl.snapshot_state(wh.path("t"))["version"] == v0 + 1
    engine.sql("ALTER TABLE t ADD COLUMN tags map<string, int>")
    assert dict(wh.read("t").dtypes)["tags"] == "map<string,int>"
    # a later-entry collision refuses inside the single commit —
    # nothing applies, no log version is consumed
    before = set(wh.read("t").columns)
    v1 = dl.snapshot_state(wh.path("t"))["version"]
    with pytest.raises(ValueError, match="already exists"):
        engine.sql("ALTER TABLE t ADD COLUMNS (brand_new int, mag double)")
    assert set(wh.read("t").columns) == before  # nothing half-applied
    assert dl.snapshot_state(wh.path("t"))["version"] == v1
    # a within-statement duplicate refuses the same way
    with pytest.raises(ValueError, match="already exists"):
        engine.sql("ALTER TABLE t ADD COLUMNS (dup int, dup bigint)")
    assert set(wh.read("t").columns) == before


def test_iceberg_add_columns_multi_atomic(spark, tmp_path):
    """The Iceberg side of the same guarantee: one metadata publish for
    the whole list, consecutive field ids, collision refuses the unit."""
    wh = IcebergWarehouse(spark, str(tmp_path / "wh"))
    engine = SqlDml(wh)
    wh.overwrite(_df(spark), "t")
    engine.sql("ALTER TABLE t ADD COLUMNS (depth_km double, region string)")
    t = wh.table("t")
    fields = {f["name"]: f for f in t.schema_json()["fields"]}
    assert {"depth_km", "region"} <= set(fields)
    assert fields["region"]["id"] == fields["depth_km"]["id"] + 1
    before = set(wh.read("t").columns)
    with pytest.raises(Exception, match="already exists"):
        engine.sql("ALTER TABLE t ADD COLUMNS (brand_new int, mag double)")
    assert set(wh.read("t").columns) == before


def test_ddl_type_refuses_multi_field_spec(spark, tmp_path):
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="ONE column type"):
        wh._ddl_type("int, b string")


def test_facade_refuses_bare_mapping_mode_and_constraint_props(
    spark, tmp_path
):
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    engine = SqlDml(wh)
    wh.overwrite(_df(spark), "t")
    # any mode other than the 'name' upgrade would flip the resolution
    # contract without assigning physicalName/ids
    with pytest.raises(ValueError, match="bare property"):
        engine.sql(
            "ALTER TABLE t SET TBLPROPERTIES "
            "('delta.columnMapping.mode' = 'id')"
        )
    wh.enable_column_mapping("t")
    with pytest.raises(ValueError, match="bare property"):
        engine.sql(
            "ALTER TABLE t SET TBLPROPERTIES "
            "('delta.columnMapping.mode' = 'none')"
        )
    with pytest.raises(ValueError, match="ADD CONSTRAINT"):
        engine.sql(
            "ALTER TABLE t SET TBLPROPERTIES "
            "('delta.constraints.c1' = 'mag > 100')"
        )


def test_facade_cdf_property_bumps_writer_protocol(spark, tmp_path):
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    engine = SqlDml(wh)
    wh.overwrite(_df(spark), "t")
    engine.sql(
        "ALTER TABLE t SET TBLPROPERTIES "
        "('delta.enableChangeDataFeed' = 'true')"
    )
    st = dl.snapshot_state(wh.path("t"))
    assert st["protocol"]["minWriterVersion"] >= 4
    with pytest.raises(ValueError, match="writer feature"):
        engine.sql(
            "ALTER TABLE t SET TBLPROPERTIES "
            "('delta.rowTracking.enabled' = 'true')"
        )


def test_merge_case_variant_source_is_not_drift(spark, tmp_path):
    """Spark resolves columns case-insensitively: 'Mag' IS the table's
    'mag' — it must neither refuse nor mint a case-duplicate field."""
    for cls in (Warehouse, DeltaLogWarehouse, IcebergWarehouse):
        wh = cls(spark, str(tmp_path / ("cv" + cls.__name__)))
        wh.overwrite(_df(spark), "t")
        upd = spark.createDataFrame(
            [("e1", 9.0, "tokyo")],
            "event_id string, Mag double, place string",
        )
        wh.merge(upd, "t", ["event_id"])  # no refusal
        cols = wh.read("t").columns
        assert len([c for c in cols if c.lower() == "mag"]) == 1
        assert {r.event_id: r.mag for r in wh.read("t").collect()} \
            == {"e1": 9.0, "e2": 6.5}


def test_backtick_quoted_constraint_blocks_rename(spark, tmp_path):
    wh = DeltaLogWarehouse(spark, str(tmp_path / "wh"))
    wh.overwrite(_df(spark), "t")
    wh.enable_column_mapping("t")
    wh.add_constraint("t", "mag_pos", "`mag` > 0")
    with pytest.raises(ValueError, match="referenced by"):
        wh.rename_column("t", "mag", "magnitude")
    with pytest.raises(ValueError, match="referenced by"):
        wh.drop_column("t", "mag")


def test_plain_backend_refuses_column_evolution(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    engine = SqlDml(wh)
    wh.overwrite(_df(spark), "t")
    with pytest.raises(ValueError, match="rewriting every file"):
        engine.sql("ALTER TABLE t ADD COLUMN depth_km double")
    with pytest.raises(ValueError, match="rewriting every file"):
        engine.sql("ALTER TABLE t RENAME COLUMN mag TO magnitude")
    with pytest.raises(ValueError, match="rewriting every file"):
        engine.sql("ALTER TABLE t DROP COLUMN place")
    with pytest.raises(ValueError, match="delta-backend"):
        engine.sql(
            "ALTER TABLE t SET TBLPROPERTIES "
            "('delta.columnMapping.mode' = 'name')"
        )
