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
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

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


QUANT = 1 << 20
"""Fixed-point scale for bucket/cell assignment: vectors and planes are
quantized to ``floor(x * 2^20)`` int64 and dotted in EXACT integer
arithmetic. Rationale: float dot products are summation-order-dependent
(numpy's 8-way-unrolled pairwise sum vs a SQL engine's left fold differ in
the last ulps), so a sign/argmax taken on floats can disagree across
engines on knife-edge values — unverifiable by an oracle. Integer dots are
associative: bucket assignment is bit-identical everywhere (and 2^-20
resolution is far below any LSH/IVF accuracy scale). Magnitudes: |x|<~100
→ |q|<2^27, dim-64 dot < 2^62 — no int64 overflow."""


def quantize(mat: np.ndarray) -> np.ndarray:
    return np.floor(mat * QUANT).astype(np.int64)


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

    Buckets for ALL tables are computed in one Arrow-batched Pandas UDF as
    a single integer matmul — quantized (batch × dim) @ (dim × tables·bits)
    (see ``QUANT``: exact int64 arithmetic makes bucket assignment
    engine-portable, so the whole ANN pipeline is oracle-checkable) — then
    posexploded to rows. One vectorized pass beats tables×bits interpreted
    higher-order-function dot products per row by an order of magnitude,
    and the UDF output is a materialized attribute, so the explode is a
    plain codegen Generate (no lambda re-evaluation). Planes are seeded
    and baked into the closure — identical across executors and runs."""
    planes = _hyperplanes(dim, bits, tables, seed)
    # (dim, tables*bits), column-major by table; quantized int64
    proj = quantize(np.concatenate([planes[t].T for t in range(tables)], axis=1))
    weights = np.power(2, np.arange(bits)).astype(np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def buckets_pd(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float64)  # (n, dim)
        signs = (quantize(mat) @ proj) > 0  # exact int64 dots
        per_table = signs.reshape(len(mat), tables, bits)
        bkt = (per_table * weights).sum(axis=2).astype(np.int64)  # (n, tables)
        return pd.Series(list(bkt))

    with_b = df.withColumn("__buckets", buckets_pd(F.col(vec_col)))
    # posexplode_OUTER: the UDF always returns exactly ``tables`` entries,
    # so outer vs inner explode are equivalent — but the inner form makes
    # InferFiltersFromGenerate add a `size(__buckets) > 0` filter that
    # pushes below the repartition and drags a SECOND ArrowEvalPython of
    # the same UDF with it (the whole bucketing matmul, computed twice)
    return with_b.select(
        "*", F.posexplode_outer("__buckets").alias("table", "bucket")
    ).drop("__buckets")


def cosine_all_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    round_decimals: int = 4,
    blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs cosine near-duplicates: (id_a < id_b, cosine ≥ τ).

    Block-pair self-join, fully distributed — the plan is lazy, nothing is
    collected to the driver and no broadcast is leaked. Each vector lands
    in block ``blk = hash(id) % blocks`` and is replicated to the
    ``blocks`` group keys ``(min(blk, t), max(blk, t))``; every group then
    holds exactly the vectors of its two blocks and computes their
    cross-block (or upper-triangular, when i == j) matmul in one Arrow
    batch. Similarities round to ``round_decimals`` BEFORE thresholding so
    the cut is reproducible across engines/summation orders.

    Scale shape: shuffle = N·blocks rows, per-task memory = 2N/blocks
    vectors, total flops ~N²·d/2 spread over blocks·(blocks+1)/2
    independent tasks. Exact all-pairs is inherently O(N²) — size
    ``blocks`` so a block pair fits executor memory; beyond exact-feasible
    corpus sizes use ``lsh_topk``/``ivf_topk`` candidates + exact verify.
    """
    if blocks < 1:
        raise ValueError("blocks must be >= 1")
    src = df.select(
        F.col(id_col).cast("long").alias("_id"),
        as_double_vec(F.col(vec_col)).alias("_v"),
    )
    spread = ensure_parallelism(src).withColumn(
        "_blk", F.pmod(F.xxhash64("_id"), F.lit(blocks)).cast("int")
    )
    replicated = spread.select(
        "_id",
        "_v",
        "_blk",
        F.explode(F.array(*[F.lit(t) for t in range(blocks)])).alias("_partner"),
    ).select(
        "_id",
        "_v",
        "_blk",
        F.least("_blk", "_partner").alias("_lo"),
        F.greatest("_blk", "_partner").alias("_hi"),
    )

    def pairs_for_group(key, pdf):
        lo, hi = key
        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "cosine_sim": pd.Series(dtype="float64"),
            }
        )
        a = pdf[pdf["_blk"] == lo]
        b = pdf[pdf["_blk"] == hi]
        if not len(a) or not len(b):
            return empty
        a_ids = a["_id"].to_numpy(dtype=np.int64)
        b_ids = b["_id"].to_numpy(dtype=np.int64)
        am = np.array(a["_v"].tolist(), dtype=np.float64)
        bm = np.array(b["_v"].tolist(), dtype=np.float64)
        an = np.linalg.norm(am, axis=1, keepdims=True)
        an[an == 0] = 1.0
        bn = np.linalg.norm(bm, axis=1, keepdims=True)
        bn[bn == 0] = 1.0
        sims = np.round((am / an) @ (bm / bn).T, round_decimals)
        ia, ib = np.nonzero(sims >= threshold)
        left, right = a_ids[ia], b_ids[ib]
        # same-block groups see each unordered pair twice ((x,y) and (y,x)
        # land in the same matrix) — the strict < keeps one; cross-block
        # groups see it once with arbitrary id order — normalize to (min,max)
        if lo == hi:
            keep = left < right
            left, right, sim = left[keep], right[keep], sims[ia, ib][keep]
        else:
            sim = sims[ia, ib]
            left, right = np.minimum(left, right), np.maximum(left, right)
        return pd.DataFrame({"id_a": left, "id_b": right, "cosine_sim": sim})

    return replicated.groupBy("_lo", "_hi").applyInPandas(
        pairs_for_group, schema="id_a long, id_b long, cosine_sim double"
    )


def _centroids(dim: int, cells: int, seed: int) -> np.ndarray:
    """Seeded spherical centroids — the k-means INIT (and the fallback
    codebook when no training pass is run)."""
    rng = np.random.RandomState(seed)
    c = rng.standard_normal((cells, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def train_ivf_codebook(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int = 64,
    cells: int = 16,
    iters: int = 4,
    seed: int = 42,
) -> np.ndarray:
    """Distributed Lloyd k-means over the (sampled) corpus, entirely in
    EXACT integer arithmetic — returns the trained quantized codebook
    (int64, cells × dim) for :func:`with_ivf_cells` / :func:`ivf_topk`.

    Why integer Lloyd: float centroid means are summation-order-dependent,
    so a trained codebook would differ run-to-run and engine-to-engine —
    unverifiable. Here every step is order-free and deterministic:

    - assignment: argmax of int64 dots of quantized vectors against the
      quantized codebook (ties → lowest cell, ``np.argmax`` first-hit);
    - update: per-cell per-dim int64 SUMS (associative — any partial
      aggregation order gives the same total) + a count, floor-divided
      on the driver (cells × dim ints — control-plane sized);
    - empty cells keep their previous centroid.

    ``plans/oracles_ext._trained_ivf_codebook`` replicates this loop in
    numpy from the same parquet and lands on the identical codebook, which
    is what keeps the trained ``ivf_ann_topk`` hash-checkable.

    Scale shape per iteration: one Arrow-batched int matmul over the
    sample + one groupBy(cell) with map-side partial sums (shuffle carries
    ≤ cells × (dim+1) longs per task). The quantized-vector column is
    persisted once across iterations. Train on a sample at 100 TB (pass a
    pre-sampled df — k-means quality saturates far below corpus size).
    """
    init = quantize(_centroids(dim, cells, seed))

    @F.pandas_udf(ArrayType(LongType()))
    def quant_pd(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float64)
        return pd.Series(list(quantize(mat)))

    xq = df.select(quant_pd(F.col(vec_col)).alias("xq")).persist()
    try:
        cb = init
        sums = [F.sum(F.element_at("xq", d + 1)).alias(f"s{d}") for d in range(dim)]
        def _cell_udf(cb_now: np.ndarray):
            # factory: bakes THIS iteration's codebook into the closure
            # (a plain loop capture would late-bind to the final cb)
            @F.pandas_udf(LongType())
            def cell_pd(xqs: pd.Series) -> pd.Series:
                m = np.array(xqs.tolist(), dtype=np.int64)
                return pd.Series(np.argmax(m @ cb_now.T, axis=1).astype(np.int64))

            return cell_pd

        for _ in range(iters):
            cell_pd = _cell_udf(cb)
            rows = (
                xq.select(cell_pd("xq").alias("cell"), "xq")
                .groupBy("cell")
                .agg(F.count(F.lit(1)).alias("n"), *sums)
                .collect()
            )
            new_cb = cb.copy()
            for r in rows:
                c, n = int(r["cell"]), int(r["n"])
                # python ints: floor division (matches np.floor_divide)
                new_cb[c] = [int(r[f"s{d}"]) // n for d in range(dim)]
            cb = new_cb
        return cb
    finally:
        xq.unpersist()


def with_ivf_cells(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int = 64,
    cells: int = 16,
    nprobe: int = 1,
    seed: int = 42,
    codebook_q: np.ndarray | None = None,
) -> DataFrame:
    """Assign each vector its ``nprobe`` nearest coarse cells (IVF lists).

    One Arrow-batched integer matmul against the quantized codebook per
    batch (see ``QUANT``); emits one row per (vector, probed cell). Cell
    ranking uses the raw dot against unit-norm centroids — same argmax as
    cosine (normalizing the query is a positive scalar on every dot), so
    skipping the normalization removes the one float step that would make
    ranking engine-dependent. Ties break to the LOWEST cell index (stable
    argsort ↔ the oracle's ROW_NUMBER ... ORDER BY dot DESC, idx ASC).
    Corpus side uses nprobe=1 (each vector lives in exactly one inverted
    list); query side probes several.

    ``codebook_q`` overrides the seeded random codebook with a TRAINED
    quantized one (:func:`train_ivf_codebook`)."""
    cb_q = codebook_q if codebook_q is not None else quantize(_centroids(dim, cells, seed))

    @F.pandas_udf(ArrayType(LongType()))
    def cells_pd(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float64)
        sims = quantize(mat) @ cb_q.T  # (n, cells), exact int64
        top = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe].astype(np.int64)
        return pd.Series(list(top))

    with_c = df.withColumn("__cells", cells_pd(F.col(vec_col)))
    # explode_outer for the same reason as with_lsh_buckets: the inferred
    # size()>0 filter otherwise re-evaluates the UDF below the exchange
    return with_c.select("*", F.explode_outer("__cells").alias("cell")).drop("__cells")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    codebook_q: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into ``cells``
    inverted lists, probe the query's ``nprobe`` nearest lists, exact
    re-rank within them.

    The 100 TB path: the corpus is bucketed ONCE (map-side matmul), the
    per-query scan shrinks by ~cells/nprobe, and the probe join is a
    broadcast of the (small) query side — the corpus never shuffles.
    Recall grows with nprobe (tests measure it against brute force) and
    with codebook quality — pass ``codebook_q`` from
    :func:`train_ivf_codebook` (recall vs the random codebook is measured
    in ``test_neardup_similarity.py``)."""
    cb = with_ivf_cells(
        ensure_parallelism(
            corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
        ),
        vec_col="cv", dim=dim, cells=cells, nprobe=1, seed=seed, codebook_q=codebook_q,
    )
    qb = with_ivf_cells(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        vec_col="qv", dim=dim, cells=cells, nprobe=nprobe, seed=seed, codebook_q=codebook_q,
    )
    cands = (
        cb.join(F.broadcast(qb), ["cell"])
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
