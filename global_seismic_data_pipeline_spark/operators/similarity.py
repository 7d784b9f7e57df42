"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  Queries (small set) are broadcast against the corpus, so the corpus
  never shuffles; per-query top-k runs as a window over query_id.
  Dot products use higher-order functions (zip_with + aggregate) in
  double precision — JVM-side, no Python.
- ``lsh_topk``: the scale path — random-hyperplane LSH buckets the corpus
  once (map-side expression), candidates collide on bucket (optionally
  multi-probe via several tables), then exact re-rank within candidates.
  At 100 TB the bucketed variant turns an O(Q×N) scan into O(Q×N/2^bits)
  with recall tunable by tables×bits (verified against brute force in
  tests).

Cosines are rounded to 6 decimals before ranking (with id tiebreak) so
rankings are reproducible across engines and summation orders.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .partitioning import ensure_parallelism


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def as_double_vec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (query_id != neighbor id).

    Returns (query_id, neighbor_id, cosine_sim, sim_rank)."""
    c = ensure_parallelism(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), as_double_vec(F.col(vec_col)).alias("cv")
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(F.col(vec_col)).alias("qv")
    )
    pairs = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    sim = F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6)
    scored = pairs.select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("sim_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sim_rank") <= k)
    )


def _hyperplanes(dim: int, bits: int, tables: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((tables, bits, dim))


def with_lsh_buckets(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 12,
    tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Add (table, bucket) rows per vector via random-hyperplane signs.

    Planes are seeded literals baked into the plan — identical across
    executors and runs; the bucketing is a pure map-side projection.

    Each table is its own projection branch, stacked with UNION, rather
    than one explode over an array of per-table buckets: Generate consuming
    higher-order-function output re-evaluates the captured dot-product
    lambdas per emitted element (measured 2-3× slowdown), while the union
    form keeps every branch a plain codegen-friendly projection."""
    v = as_double_vec(F.col(vec_col))
    planes = _hyperplanes(dim, bits, tables, seed)
    branches = []
    for t in range(tables):
        bucket = F.lit(0).cast("long")
        for b in range(bits):
            plane = F.array(*[F.lit(float(x)) for x in planes[t, b]])
            bit = F.when(_dot(v, plane) > 0, F.lit(2**b).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            bucket = bucket + bit
        branches.append(
            df.select(
                "*",
                F.lit(t).alias("table"),
                bucket.alias("bucket"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: LSH-bucket candidates, exact re-rank within them.

    Recall < 1 by construction; tests measure it against cosine_topk."""
    cb = with_lsh_buckets(
        ensure_parallelism(
            corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
        ),
        vec_col="cv", dim=dim, bits=bits, tables=tables, seed=seed,
    )
    qb = with_lsh_buckets(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        vec_col="qv", dim=dim, bits=bits, tables=tables, seed=seed,
    )
    cands = (
        cb.join(F.broadcast(qb), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    qv, cv = as_double_vec(F.col("qv")), as_double_vec(F.col("cv"))
    sim = F.round(_dot(qv, cv) / (_norm(qv) * _norm(cv)), 6)
    scored = cands.select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("sim_rank", F.row_number().over(w).cast("long")).filter(
        F.col("sim_rank") <= k
    )
