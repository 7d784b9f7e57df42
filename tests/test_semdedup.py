"""SemDeDup semantic dedup: flags vs a brute-force numpy reference, and
the planted-duplicate behavior (a near-identical vector is dropped, its
lower-id representative kept)."""

import numpy as np
import pytest

from global_seismic_data_pipeline_spark.operators import semdedup, similarity

DIM = 16
CELLS = 4
SEED = 7
THRESHOLD = 0.9


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.RandomState(SEED)
    base = rng.standard_normal((40, DIM))
    rows = [(i, base[i]) for i in range(40)]
    # planted near-duplicates: tiny perturbations of vectors 3 and 17
    rows.append((100, base[3] + 1e-4 * rng.standard_normal(DIM)))
    rows.append((101, base[17] + 1e-4 * rng.standard_normal(DIM)))
    return rows


@pytest.fixture(scope="module")
def emb_df(spark, vecs):
    data = [(int(i), [float(x) for x in v]) for i, v in vecs]
    return spark.createDataFrame(data, "vec_id long, embedding array<double>")


def _brute_reference(vecs):
    """Reference: same cell assignment (quantized argmax vs the seeded
    codebook), then greedy lower-id prune on round-4 cosines."""
    ids = np.array([i for i, _ in vecs], dtype=np.int64)
    mat = np.array([v for _, v in vecs], dtype=np.float64)
    cb = similarity.quantize(similarity._centroids(DIM, CELLS, 42))
    cells = np.argmax(similarity.quantize(mat) @ cb.T, axis=1)
    u = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    keep, ndups = {}, {}
    for c in range(CELLS):
        m = cells == c
        cid, cu = ids[m], u[m]
        sims = np.round(cu @ cu.T, 4)
        hit = sims >= THRESHOLD
        np.fill_diagonal(hit, False)
        lower = cid[None, :] < cid[:, None]
        dropped = (hit & lower).any(axis=1)
        for j, i in enumerate(cid):
            keep[int(i)] = 0 if dropped[j] else 1
            ndups[int(i)] = int(hit[j].sum())
    return cells, keep, ndups


def test_flags_match_brute_force(spark, emb_df, vecs):
    out = semdedup.semdedup_flags(
        emb_df, dim=DIM, cells=CELLS, threshold=THRESHOLD
    ).collect()
    cells, keep, ndups = _brute_reference(vecs)
    ids = np.array([i for i, _ in vecs], dtype=np.int64)
    cell_of = {int(i): int(c) for i, c in zip(ids, cells)}
    assert len(out) == len(vecs)
    for r in out:
        assert r.cell == cell_of[r.vec_id]
        assert r.keep == keep[r.vec_id]
        assert r.n_dups_in_cell == ndups[r.vec_id]


def test_planted_duplicates_are_pruned(spark, emb_df):
    out = {
        r.vec_id: r
        for r in semdedup.semdedup_flags(
            emb_df, dim=DIM, cells=CELLS, threshold=THRESHOLD
        ).collect()
    }
    # the perturbed copies share their original's cell and are dropped;
    # the lower-id originals survive
    for dup, orig in ((100, 3), (101, 17)):
        assert out[dup].cell == out[orig].cell
        assert out[dup].keep == 0
        assert out[orig].keep == 1
    # vectors with no over-threshold neighbor are all kept
    loners = [r for r in out.values() if r.n_dups_in_cell == 0]
    assert loners and all(r.keep == 1 for r in loners)
