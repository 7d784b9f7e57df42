"""Schema lint over every declared query: no ArrayType/MapType outputs.

The driver's correctness checker canonicalizes results with a pandas
row-sort that crashes on unhashable cells (``TypeError: unhashable
type: 'list'``) — round 10's only red row, ``vocab_encode_docs``, was
exactly this, not a wrong answer. The repo rule (CLAUDE.md) is that
array-valued outputs must be CSV-joined (``concat_ws`` /
``array_to_string``) on both the Spark and oracle sides. This lint makes
the rule a red build: it builds every ``queries()`` plan at sf0.001
(plan-only — ``df.schema`` resolves without executing the query) and
asserts no top-level output column is ArrayType or MapType.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

import __spark_entry__ as entry

_SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_SF_DIR), reason="driver testdata not present"
)


def test_no_array_or_map_output_columns(spark):
    offenders = []
    for name, fn in entry.queries().items():
        df = fn(spark, _SF_DIR)
        for f in df.schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType)):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, (
        "array/map output columns crash the driver checker's row-sort — "
        "CSV-join them (concat_ws / array_to_string) on BOTH sides: "
        + "; ".join(offenders)
    )
