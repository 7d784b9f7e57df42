"""Distributed Bloom-filter semi-join pruning.

The classic big-join reduction: before shuffling a 100 TB fact table into
a semi-join, test each fact key against a compact bitmap built from the
dim-side keys. False positives pass (and are removed by the exact join
that follows); true negatives — usually the overwhelming majority — are
dropped MAP-SIDE, so the shuffle carries only rows that might match.
Spark's runtime bloom pushdown covers simple equijoins; this operator
makes the pattern explicit, tunable, and reusable against any key.

Portable construction (oracle-checkable, engine-independent):

- two 60-bit hashes h1, h2 from one md5 of the key (hex slices — the
  neardup portable-hash idiom), double-hashed to k positions
  ``(h1 + i·h2) mod m`` (Kirsch–Mitzenmacher);
- the bitmap is a DataFrame of ``(word, bits)``: position p sets bit
  ``p mod 32`` of word ``p div 32``, folded with the ``bit_or``
  aggregate. Words are 32-bit on purpose: bit 63 of a signed 64-bit word
  is UB territory across engines (DuckDB raises on ``1::BIGINT << 63``,
  Spark silently wraps negative) — 32-bit words keep every mask a small
  positive long on both sides. The build is itself distributed (one
  shuffle of the SMALL key side onto ≤ m/32 rows);
- probing is k BROADCAST joins of the ≤ m/32-row bitmap against per-row
  (word_i, mask_i) columns — map-side only, no explode, no shuffle of
  the fact, and the plan stays fully lazy (no driver-side collect of the
  filter, unlike sketch-to-literal approaches).

Sizing: FP rate ≈ (1 − e^(−k·n/m))^k. With m = 2^16 and k = 4 the filter
holds ~8 KiB and stays useful to n ≈ 20k dim keys; size m to the dim-key
count at the target scale (m is a parameter, the shape is unchanged).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

_PERSISTED: list[DataFrame] = []


def _materialized(df: DataFrame) -> DataFrame:
    """Materialize-once (module docstring of operators/neardup.py): the
    probe joins the bitmap k times, and an unpersisted bitmap would
    re-execute its build (dim scan + distinct + explode + bit_or shuffle)
    once PER PROBE JOIN — measured 4× build cost at sf0.1. Persist is
    lazy: run 1 of the probe computes and caches, probes 2..k reuse."""
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED.append(df)
    return df


def release_cached() -> int:
    """Unpersist every bitmap pinned by this module; returns the count."""
    n = len(_PERSISTED)
    for df in _PERSISTED:
        df.unpersist()
    _PERSISTED.clear()
    return n


def _h12(key: Column, salt: str) -> tuple[Column, Column]:
    hx = F.md5(F.concat(key.cast("string"), F.lit("|" + salt)))
    h1 = F.conv(F.substring(hx, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(hx, 17, 15), 16, 10).cast("long")
    return h1, h2


def _validate(m_log2: int, k: int) -> None:
    if not 6 <= m_log2 <= 30:
        raise ValueError("m_log2 must be in [6, 30]")
    if k < 1:
        raise ValueError("k must be >= 1")


def build_bloom(
    keys: DataFrame,
    key_col: str,
    *,
    m_log2: int = 16,
    k: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """(word, bits) bitmap rows over the distinct keys of ``keys``."""
    _validate(m_log2, k)
    m = 1 << m_log2
    h1, h2 = _h12(F.col(key_col), salt)
    pos = F.explode(
        F.array(*[(h1 + F.lit(i) * h2) % F.lit(m) for i in range(k)])
    ).alias("p")
    return (
        keys.select(key_col)
        .distinct()
        .select(pos)
        .select(
            F.expr("p div 32").alias("word"),
            F.expr("shiftleft(1L, cast(p % 32 as int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_prune(
    fact: DataFrame,
    bloom: DataFrame,
    key_col: str,
    *,
    m_log2: int = 16,
    k: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Rows of ``fact`` whose key passes the bloom bitmap — a SUPERSET of
    the true semi-join (follow with the exact join); ``m_log2``/``k``/
    ``salt`` must match the build.

    k broadcast left-joins on the word index, then one conjunctive bit
    test; every added column is dropped, so the result schema equals the
    input's.
    """
    _validate(m_log2, k)
    m = 1 << m_log2
    bloom = _materialized(bloom)
    h1, h2 = _h12(F.col(key_col), salt)
    # Optimizer barrier: CollapseProject re-inlines deterministic
    # expressions into every downstream join projection — measured 25
    # copies of the md5/conv chain (≈3× runtime) for a k=4 probe. A
    # projection containing a NONDETERMINISTIC column cannot be collapsed,
    # so the k position columns stay materialized attributes, computed
    # once per row; runtime subexpression elimination then shares the one
    # md5 among them. The guard column is kept alive by an always-true
    # filter (rand() ∈ [0,1) ⇒ __nd >= 0) and dropped at the end — result
    # determinism is untouched.
    pre = fact.select(
        "*",
        *[((h1 + F.lit(i) * h2) % F.lit(m)).alias(f"__p{i}") for i in range(k)],
        F.rand().alias("__nd"),
    )
    out = pre.select(
        "*",
        *[F.expr(f"__p{i} div 32").alias(f"__w{i}") for i in range(k)],
        *[
            F.expr(f"shiftleft(1L, cast(__p{i} % 32 as int))").alias(f"__m{i}")
            for i in range(k)
        ],
    )
    temp = ["__nd"]
    for i in range(k):
        side = F.broadcast(
            bloom.select(
                F.col("word").alias(f"__w{i}"), F.col("bits").alias(f"__b{i}")
            )
        )
        out = out.join(side, f"__w{i}", "left")
        temp += [f"__p{i}", f"__w{i}", f"__m{i}", f"__b{i}"]
    hit = F.col("__nd") >= F.lit(0.0)
    for i in range(k):
        hit = hit & (
            F.col(f"__b{i}").isNotNull()
            & (F.col(f"__b{i}").bitwiseAND(F.col(f"__m{i}")) == F.col(f"__m{i}"))
        )
    return out.where(hit).drop(*temp)
