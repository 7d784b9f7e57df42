"""Blocked fuzzy matching (entity resolution): approximate-equality
joins without the O(n²) cross join.

The standard ER recipe: a cheap BLOCKING key (here: the first
whitespace token, caller-replaceable) partitions candidates so only
same-block pairs are compared; a LOSSLESS length prefilter
(levenshtein(a, b) ≥ |len(a) − len(b)|, so pairs differing by more
than ``max_edit`` characters cannot match) drops most pairs before the
edit-distance kernel runs; the survivors get the exact Levenshtein
distance — Spark's built-in ``levenshtein`` (JVM, codegen), identical
semantics to DuckDB's, so the oracle matches bit-for-bit.

Blocking is recall-lossy BY DESIGN: a typo inside the block key itself
("small ring" → "smell ring") lands in a different block and is never
compared. That is the classic ER trade — the caller chooses the block
function to match their error model (phonetic keys, prefixes, multiple
passes with different keys unioned).

Scale shape: one shuffle on the block key; cost is Σ|block|² — the
whole point is that max|block| is controlled by the key choice. A key
with few distinct values (this corpus has 8 first words) is a skew
hazard at 100 TB: pick a finer key, or salt via a second blocking pass.
No UDF anywhere; the distance kernel is whole-stage-codegen JVM code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    *,
    id_col: str = "id",
    text_col: str = "name",
    block: Column | None = None,
    max_edit: int = 2,
) -> DataFrame:
    """Matched pairs (block, id_a, id_b, dist) with ``id_a < id_b`` and
    ``dist = levenshtein(text_a, text_b) ≤ max_edit``, compared only
    within blocks (default block: first whitespace token of the text,
    lower-cased)."""
    if max_edit < 0:
        raise ValueError("max_edit must be >= 0")
    blk = (
        block
        if block is not None
        else F.split(F.lower(F.trim(F.col(text_col))), r"\s+")[0]
    )
    side = df.select(
        blk.alias("block"),
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__txt"),
        F.length(text_col).alias("__len"),
    )
    # rename EVERY column per side — a self-join condition referencing a
    # shared-lineage column name silently degrades to a trivially-true
    # predicate (Spark warns but proceeds, turning the block join into a
    # cross join)
    a = side.select(
        F.col("block").alias("block_a"),
        F.col("__id").alias("id_a"),
        F.col("__txt").alias("__ta"),
        F.col("__len").alias("__la"),
    )
    b = side.select(
        F.col("block").alias("block_b"),
        F.col("__id").alias("id_b"),
        F.col("__txt").alias("__tb"),
        F.col("__len").alias("__lb"),
    )
    pairs = a.join(
        b,
        on=[
            F.col("block_a") == F.col("block_b"),
            F.col("id_a") < F.col("id_b"),
            # lossless: edit distance >= length difference
            F.abs(F.col("__la") - F.col("__lb")) <= F.lit(max_edit),
        ],
    )
    return (
        pairs.withColumn(
            "dist", F.levenshtein(F.col("__ta"), F.col("__tb"))
        )
        .filter(F.col("dist") <= max_edit)
        .select(F.col("block_a").alias("block"), "id_a", "id_b", "dist")
    )
