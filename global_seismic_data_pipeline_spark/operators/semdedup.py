"""SemDeDup-style semantic deduplication: k-means cells, intra-cell prune.

Semantic dedup (Abbas et al. 2023, "SemDeDup") removes documents whose
EMBEDDINGS nearly coincide — paraphrases and templated rewrites that no
lexical near-dup (MinHash/SimHash) catches. The published recipe is
exactly two steps, both of which this repo already knows how to do at
scale and exactly:

1. cluster the corpus embeddings with k-means (here: the exact-integer
   Lloyd codebook of ``similarity.train_ivf_codebook`` — deterministic,
   engine-portable) and assign every vector its nearest cell;
2. within each cell ONLY, compute pairwise cosines and drop every vector
   that has a lower-id neighbor above the threshold (one representative
   per duplicate group survives; greedy-by-id is deterministic).

Scale shape: assignment is one Arrow-batched integer matmul map-side
(``similarity.with_ivf_cells``); the pairwise stage shuffles each vector
ONCE (keyed by cell) and does a per-cell numpy matmul — O(Σ |cell|²)
flops instead of O(N²), bounded per task by the largest cell. Cell count
is the knob: size it so the biggest cell's matrix fits an executor
(SemDeDup used 11k clusters for 5B embeddings). No driver collect, no
broadcast of the corpus.

Exactness: cell assignment is exact int64 argmax (similarity.QUANT);
cosines are rounded to ``round_decimals`` BEFORE thresholding, the same
engine-portability cut as ``cosine_all_pairs`` — the DuckDB oracle
replicates the full pipeline bit-for-bit from the retrained codebook
literals.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .partitioning import ensure_parallelism
from .similarity import with_ivf_cells


def semdedup_flags(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    cells: int = 16,
    threshold: float = 0.45,
    round_decimals: int = 4,
    seed: int = 42,
    codebook_q: np.ndarray | None = None,
) -> DataFrame:
    """Per-vector (id, cell, keep, n_dups_in_cell): keep=0 iff some
    LOWER-id vector in the same cell has cosine ≥ threshold (rounded
    first). ``n_dups_in_cell`` counts the vector's over-threshold
    neighbors within the cell (either id order) — the cluster-density
    signal SemDeDup uses to pick thresholds."""
    assigned = with_ivf_cells(
        ensure_parallelism(
            df.select(F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_v"))
        ),
        vec_col="_v",
        dim=dim,
        cells=cells,
        nprobe=1,
        seed=seed,
        codebook_q=codebook_q,
    )

    def per_cell(key, pdf):
        ids = pdf["_id"].to_numpy(dtype=np.int64)
        mat = np.array(pdf["_v"].tolist(), dtype=np.float64)
        n = np.linalg.norm(mat, axis=1, keepdims=True)
        n[n == 0] = 1.0
        u = mat / n
        sims = np.round(u @ u.T, round_decimals)
        hit = sims >= threshold
        np.fill_diagonal(hit, False)
        lower = ids[None, :] < ids[:, None]  # [i, j]: j has a lower id
        dropped = (hit & lower).any(axis=1)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": np.full(len(ids), key[0], dtype=np.int64),
                "keep": (~dropped).astype(np.int64),
                "n_dups_in_cell": hit.sum(axis=1).astype(np.int64),
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        per_cell, schema="vec_id long, cell long, keep long, n_dups_in_cell long"
    )
