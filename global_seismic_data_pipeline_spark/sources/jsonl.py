"""JSONL (newline-delimited JSON) source with corrupt-record recovery.

Web-scale text corpora arrive as JSONL shards; at 100 TB some fraction of
lines is always malformed (truncated uploads, encoding damage, concatenated
records). Silent drops poison dataset accounting, and a single bad line
must never fail a 1000-executor job — so ingestion has to (a) parse with an
EXPLICIT schema (schema inference is a second full pass over 100 TB),
(b) capture malformed lines for quarantine instead of dropping or raising.

Design: read the file as plain text lines (splittable, parallel by HDFS
block) and parse with ``from_json`` carrying a corrupt-record column —
Spark's PERMISSIVE contract puts the raw line there when parsing fails and
leaves it NULL otherwise. Parsing happens in the JVM's Jackson path under
whole-stage codegen; no Python touches the hot loop.

Note the PERMISSIVE subtlety this module encapsulates: ``from_json``
returns a struct of NULL fields (not a NULL struct) for malformed input,
so "did it parse" CANNOT be read off the struct itself — only the corrupt
column distinguishes a bad line from a valid record with null fields.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def _schema_with_corrupt(schema: str | StructType) -> str | StructType:
    if isinstance(schema, str):
        return f"{schema}, {CORRUPT_COL} string"
    from pyspark.sql.types import StringType, StructField

    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )


def parse_jsonl_lines(
    lines: DataFrame, schema: str | StructType, *, line_col: str = "value"
) -> DataFrame:
    """Parse a text-line DataFrame into ``schema`` columns + ``_corrupt_record``.

    Valid rows: schema fields populated, corrupt column NULL. Malformed
    rows: schema fields NULL, corrupt column holds the raw line.
    """
    parsed = F.from_json(
        F.col(line_col),
        _schema_with_corrupt(schema),
        {"columnNameOfCorruptRecord": CORRUPT_COL},
    )
    return lines.select(parsed.alias("__p")).select("__p.*")


def read_jsonl(
    spark: SparkSession, path: str, schema: str | StructType
) -> DataFrame:
    """Read JSONL shards with an explicit schema and corrupt capture.

    ``spark.read.text`` keeps the scan splittable (one task per file split,
    lines never cross records), unlike multiline JSON which serializes a
    whole file into one task.
    """
    return parse_jsonl_lines(spark.read.text(path), schema)


def split_valid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): good rows without the corrupt column; quarantined
    raw lines for reprocessing/accounting."""
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad
