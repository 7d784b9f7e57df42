"""CSV source: PERMISSIVE corrupt capture, file reader, quarantine split."""

from __future__ import annotations

from pyspark.sql import functions as F

from global_seismic_data_pipeline_spark.sources import csvsrc

SCHEMA = "doc_id long, lang string, n_chars long"


def _parse(spark, lines):
    df = spark.createDataFrame([(x,) for x in lines], ["value"])
    return csvsrc.parse_csv_lines(df, SCHEMA).collect()


def test_valid_lines_parse_clean(spark):
    rows = _parse(spark, ["1,en,100", "2,de,50"])
    assert all(r[csvsrc.CORRUPT_COL] is None for r in rows)
    got = {r.doc_id: (r.lang, r.n_chars) for r in rows}
    assert got == {1: ("en", 100), 2: ("de", 50)}


def test_type_error_routes_to_corrupt_but_keeps_parseable_fields(spark):
    (r,) = _parse(spark, ["X7,en,100"])
    assert r[csvsrc.CORRUPT_COL] == "X7,en,100"
    assert r.doc_id is None
    # PERMISSIVE still populates the fields it could parse
    assert r.lang == "en" and r.n_chars == 100


def test_missing_trailing_field_is_corrupt(spark):
    # token-count mismatch quarantines the raw line but keeps the fields
    # that did parse — accounting must key off the corrupt column, not
    # field nullness
    (r,) = _parse(spark, ["3,fr"])
    assert r[csvsrc.CORRUPT_COL] == "3,fr"
    assert r.doc_id == 3 and r.lang == "fr" and r.n_chars is None


def test_file_reader_agrees_on_missing_trailing_field(spark, tmp_path):
    p = tmp_path / "shard.csv"
    p.write_text("1,en,100\n3,fr\n")
    rows = {
        r.doc_id: r
        for r in csvsrc.read_csv(spark, str(p), SCHEMA).collect()
    }
    assert rows[1][csvsrc.CORRUPT_COL] is None
    assert rows[3][csvsrc.CORRUPT_COL] == "3,fr"  # same contract as from_csv
    assert rows[3].n_chars is None


def test_file_reader_corrupt_capture_and_split(spark, tmp_path):
    p = tmp_path / "shard2.csv"
    p.write_text("1,en,100\nXX,de,50\n2,es,70\n")
    df = csvsrc.read_csv(spark, str(p), SCHEMA)
    good, bad = csvsrc.split_valid(df)
    assert sorted(r.doc_id for r in good.collect()) == [1, 2]
    assert csvsrc.CORRUPT_COL not in good.columns
    assert [r.raw_line for r in bad.collect()] == ["XX,de,50"]


def test_custom_separator(spark):
    df = spark.createDataFrame([("5|en|42",)], ["value"])
    (r,) = csvsrc.parse_csv_lines(df, SCHEMA, sep="|").collect()
    assert (r.doc_id, r.lang, r.n_chars) == (5, "en", 42)
    assert r[csvsrc.CORRUPT_COL] is None
