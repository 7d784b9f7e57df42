"""VersionedWarehouse: commit log, time travel, restore, vacuum, OCC.

(Drop-in parity with the plain Warehouse is covered by parametrizing
test_state_and_merge.py / test_merge_model.py over both backends.)
"""

import os

import pytest

from global_seismic_data_pipeline_spark.sources.versioned import VersionedWarehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return VersionedWarehouse(spark, str(tmp_path / "wh"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v int")


def test_each_mutation_commits_one_version(spark, wh):
    wh.overwrite(_df(spark, [("a", 1)]), "t")
    wh.append(_df(spark, [("b", 2)]), "t")
    wh.merge(_df(spark, [("a", 10)]), "t", ["k"])
    assert wh.versions("t") == [1, 2, 3]
    ops = [h["operation"] for h in wh.history("t")]  # newest first
    assert ops == ["merge", "append", "overwrite"]


def test_time_travel_reads_old_snapshot(spark, wh):
    wh.overwrite(_df(spark, [("a", 1), ("b", 2)]), "t")
    wh.overwrite(_df(spark, [("a", 100)]), "t")
    assert {r.k: r.v for r in wh.read_version("t", 1).collect()} == {"a": 1, "b": 2}
    assert {r.k: r.v for r in wh.read_version("t", 2).collect()} == {"a": 100}
    assert {r.k: r.v for r in wh.read("t").collect()} == {"a": 100}
    with pytest.raises(ValueError):
        wh.read_version("t", 99)


def test_merge_history_and_time_travel(spark, wh):
    wh.merge(_df(spark, [("a", 1), ("b", 2)]), "t", ["k"])
    wh.merge(_df(spark, [("b", 20), ("c", 3)]), "t", ["k"])
    assert len(wh.versions("t")) == 2
    assert {r.k: r.v for r in wh.read_version("t", 1).collect()} == {"a": 1, "b": 2}
    assert {r.k: r.v for r in wh.read("t").collect()} == {"a": 1, "b": 20, "c": 3}


def test_partitioned_merge_commits_and_travels(spark, wh):
    base = spark.createDataFrame(
        [("a", 1, "2025-01"), ("c", 3, "2025-02")], "k string, v int, month string"
    )
    wh.merge(base, "t", ["k"], prune_partition_col="month")
    upd = spark.createDataFrame([("a", 10, "2025-01")], "k string, v int, month string")
    wh.merge(upd, "t", ["k"], prune_partition_col="month")
    assert len(wh.versions("t")) == 2
    v1 = {r.k: r.v for r in wh.read_version("t", 1).collect()}
    assert v1 == {"a": 1, "c": 3}
    assert {r.k: r.v for r in wh.read("t").collect()} == {"a": 10, "c": 3}
    # snapshot preserved the hive layout
    hist = wh.history("t")
    assert hist[0]["partition_columns"] == ["month"]


def test_restore_is_a_new_commit(spark, wh):
    wh.overwrite(_df(spark, [("a", 1)]), "t")
    wh.overwrite(_df(spark, [("a", 2)]), "t")
    v = wh.restore("t", 1)
    assert v == 3  # history is append-only
    assert {r.k: r.v for r in wh.read("t").collect()} == {"a": 1}
    assert wh.versions("t") == [1, 2, 3]
    assert wh.history("t")[0]["operation"] == "restore(v1)"
    # restored table stays fully usable
    wh.merge(_df(spark, [("b", 9)]), "t", ["k"])
    assert {r.k: r.v for r in wh.read("t").collect()} == {"a": 1, "b": 9}


def test_vacuum_drops_old_snapshots_keeps_live(spark, wh):
    for i in range(4):
        wh.overwrite(_df(spark, [("a", i)]), "t")
    dropped = wh.vacuum_snapshots("t", keep_last=2)
    assert dropped == [1, 2]
    assert wh.versions("t") == [3, 4]
    # live table and retained snapshots unaffected (hardlink safety)
    assert wh.read("t").first().v == 3
    assert wh.read_version("t", 3).first().v == 2
    with pytest.raises(ValueError):
        wh.vacuum_snapshots("t", keep_last=0)


def test_describe_detail(spark, wh):
    wh.overwrite(_df(spark, [("a", 1), ("b", 2)]), "t")
    wh.append(_df(spark, [("c", 3)]), "t")
    d = wh.describe_detail("t")
    assert d["version"] == 2 and d["num_snapshots"] == 2
    assert d["num_files"] > 0 and d["size_bytes"] > 0
    assert d["partition_columns"] == []
    assert d["created_at_ms"] <= d["last_modified_ms"]
    assert d["format"] == "parquet+snapshots"


def test_occ_claim_skips_taken_version(spark, wh):
    """A racing writer's claimed dir forces the next writer to v+1, and a
    crashed claim (dir without _commit.json) is invisible to readers."""
    wh.overwrite(_df(spark, [("a", 1)]), "t")
    os.mkdir(wh._version_dir("t", 2))  # racing writer claimed v2, then died
    wh.overwrite(_df(spark, [("a", 2)]), "t")  # must land on v3
    assert wh.versions("t") == [1, 3]
    assert wh.latest_version("t") == 3
    assert {r.v for r in wh.read_version("t", 3).collect()} == {2}


def test_snapshot_dir_hidden_from_views(spark, wh):
    wh.overwrite(_df(spark, [("a", 1)]), "t")
    assert wh.register_views() == ["t"]
