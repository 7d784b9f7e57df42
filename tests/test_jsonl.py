"""JSONL source: explicit-schema parse, corrupt capture, quarantine split."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from global_seismic_data_pipeline_spark.sources import jsonl


def _write_shards(tmp_path, shards):
    d = tmp_path / "jl"
    d.mkdir()
    for i, lines in enumerate(shards):
        (d / f"part-{i}.jsonl").write_text("\n".join(lines) + "\n")
    return str(d)


def test_read_jsonl_parses_and_quarantines(spark, tmp_path):
    good = [json.dumps({"id": i, "text": f"doc {i}"}) for i in range(10)]
    bad = ['{"id": 90, "text": "trunc', "not json at all", "{}"]
    path = _write_shards(tmp_path, [good[:5], good[5:] + bad])
    df = jsonl.read_jsonl(spark, path, "id long, text string")
    ok, quarantine = jsonl.split_valid(df)
    assert ok.count() == 11  # "{}" is valid JSON with null fields
    assert quarantine.count() == 2
    raw = {r["raw_line"] for r in quarantine.collect()}
    assert raw == {'{"id": 90, "text": "trunc', "not json at all"}
    # valid rows carry their fields; "{}" carries nulls but is NOT corrupt
    ids = {r["id"] for r in ok.collect()}
    assert set(range(10)) <= ids and None in ids


def test_corrupt_column_distinguishes_null_fields_from_bad_lines(spark, tmp_path):
    # The PERMISSIVE trap: a struct of nulls is NOT the same as corrupt.
    path = _write_shards(tmp_path, [['{"id": null, "text": null}', "oops"]])
    df = jsonl.read_jsonl(spark, path, "id long, text string")
    rows = df.select("id", "text", jsonl.CORRUPT_COL).collect()
    corrupt = [r for r in rows if r[jsonl.CORRUPT_COL] is not None]
    valid_nulls = [r for r in rows if r[jsonl.CORRUPT_COL] is None]
    assert len(corrupt) == 1 and corrupt[0][jsonl.CORRUPT_COL] == "oops"
    assert len(valid_nulls) == 1 and valid_nulls[0]["id"] is None


def test_scan_is_splittable_across_files(spark, tmp_path):
    shards = [
        [json.dumps({"id": i * 100 + j, "text": "x"}) for j in range(20)]
        for i in range(4)
    ]
    path = _write_shards(tmp_path, shards)
    df = jsonl.read_jsonl(spark, path, "id long, text string")
    assert df.count() == 80
    # text source: one partition per file split minimum — parallel scan
    assert spark.read.text(path).rdd.getNumPartitions() >= 4


def test_extra_and_missing_fields_are_permissive(spark, tmp_path):
    lines = [
        '{"id": 1, "text": "a", "extra": 42}',  # extra field ignored
        '{"id": 2}',                            # missing field -> null
    ]
    path = _write_shards(tmp_path, [lines])
    df = jsonl.read_jsonl(spark, path, "id long, text string")
    ok, bad = jsonl.split_valid(df)
    assert bad.count() == 0
    got = {(r["id"], r["text"]) for r in ok.collect()}
    assert got == {(1, "a"), (2, None)}
