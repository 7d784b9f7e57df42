"""Persisted incremental IVF ANN index — the vector-side counterpart of
:mod:`.neardup_incremental`.

A production embedding store is built once and grows daily; queries probe
it without touching raw corpus text or re-training anything. Three
warehouse tables (an IVF-Flat index):

- ``{name}_lists``    — (id, cell, embedding): the inverted lists,
  bucketed on ``cell`` — a probe joins on exactly that key, so the
  stored side reads co-partitioned from disk and only the (small) query
  side shuffles;
- ``{name}_codebook`` — (cell, dim_idx, q): the TRAINED quantized
  centroids as rows. Freezing the codebook at build time is what makes
  the index incremental — batch N+1 assigns its vectors with the stored
  centroids (control-plane read: cells × dim ints) and bucketed-appends
  its list entries; the stored corpus is never re-read or re-assigned.
  Assignment is exact int64 argmax (``similarity.QUANT``), so
  append-then-probe ≡ rebuild-with-the-same-codebook bit-for-bit
  (pytest-pinned) and the driver oracle can replay the whole index;
- ``{name}_meta``     — (dim, cells, seed) knobs; probes and appends
  validate against it so mismatched parameters fail loudly instead of
  silently probing the wrong geometry.

Recall drifts only as the DATA distribution drifts away from the frozen
centroids — the standard IVF operational trade; retrain + rebuild is the
(rare, full-rebuild) maintenance action, exactly as in FAISS practice.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.warehouse import Warehouse
from . import similarity

_LISTS, _CB, _META = "_lists", "_codebook", "_meta"


def build_ivf_index(
    warehouse: Warehouse,
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    cells: int = 16,
    iters: int = 4,
    seed: int = 42,
    name: str = "ivf_index",
    num_buckets: int = 8,
) -> np.ndarray:
    """Train the codebook on ``df`` (distributed exact-integer Lloyd),
    assign every vector its cell, persist lists + codebook + meta.
    Returns the trained quantized codebook."""
    cb_q = similarity.train_ivf_codebook(
        df, vec_col=vec_col, dim=dim, cells=cells, iters=iters, seed=seed
    )
    assigned = similarity.with_ivf_cells(
        df.select(F.col(id_col), F.col(vec_col)),
        vec_col=vec_col, dim=dim, cells=cells, nprobe=1, seed=seed,
        codebook_q=cb_q,
    )
    warehouse.save_bucketed(
        assigned, f"{name}{_LISTS}", ("cell",), num_buckets=num_buckets
    )
    cb_rows = [
        (c, d, int(cb_q[c][d])) for c in range(cells) for d in range(dim)
    ]
    warehouse.overwrite(
        warehouse.spark.createDataFrame(cb_rows, "cell int, dim_idx int, q long"),
        f"{name}{_CB}",
    )
    warehouse.overwrite(
        warehouse.spark.createDataFrame(
            [(id_col, vec_col, dim, cells, seed, num_buckets)],
            "id_col string, vec_col string, dim int, cells int, seed int, "
            "num_buckets int",
        ),
        f"{name}{_META}",
    )
    return cb_q


def _load(warehouse: Warehouse, name: str) -> tuple[dict, np.ndarray]:
    meta_rows = warehouse.read(f"{name}{_META}").collect()
    if len(meta_rows) != 1:
        raise ValueError(f"index {name!r} has no valid meta table")
    meta = meta_rows[0].asDict()
    cb = np.zeros((meta["cells"], meta["dim"]), dtype=np.int64)
    for r in warehouse.read(f"{name}{_CB}").collect():
        cb[r["cell"]][r["dim_idx"]] = r["q"]
    return meta, cb


def append_to_ivf_index(
    warehouse: Warehouse, new_df: DataFrame, *, name: str = "ivf_index"
) -> None:
    """Assign ``new_df`` with the STORED (frozen) codebook and bucketed-
    append its list entries. Only the new vectors are scanned; ids must
    be disjoint from the stored ones (watermark CDC upstream)."""
    meta, cb_q = _load(warehouse, name)
    assigned = similarity.with_ivf_cells(
        new_df.select(F.col(meta["id_col"]), F.col(meta["vec_col"])),
        vec_col=meta["vec_col"], dim=meta["dim"], cells=meta["cells"],
        nprobe=1, seed=meta["seed"], codebook_q=cb_q,
    )
    warehouse.append_bucketed(
        assigned, f"{name}{_LISTS}", ("cell",), num_buckets=meta["num_buckets"]
    )


def probe_ivf_index(
    warehouse: Warehouse,
    queries: DataFrame,
    *,
    name: str = "ivf_index",
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """Top-k per query against the stored lists: query side computes its
    ``nprobe`` cells with the stored codebook and broadcasts into the
    bucketed list join (stored side read co-partitioned, never
    shuffled), exact cosine re-rank within probed lists. Output matches
    ``similarity.ivf_topk``."""
    meta, cb_q = _load(warehouse, name)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    lists = warehouse.spark.table(f"{name}{_LISTS}").select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        "cell",
    )
    qb = similarity.with_ivf_cells(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        vec_col="qv", dim=meta["dim"], cells=meta["cells"], nprobe=nprobe,
        seed=meta["seed"], codebook_q=cb_q,
    )
    cands = (
        lists.join(F.broadcast(qb), ["cell"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    qv = similarity.as_double_vec(F.col("qv"))
    cv = similarity.as_double_vec(F.col("cv"))
    sim = F.round(
        similarity._dot(qv, cv) / (similarity._norm(qv) * similarity._norm(cv)), 6
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cands.select("query_id", "neighbor_id", sim.alias("cosine_sim"))
        .withColumn("sim_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sim_rank") <= k)
    )
