"""Connected components: collapse near-duplicate PAIRS into clusters.

The near-dup operators (``neardup.py``, ``similarity.py``) emit verified
pairs; a dedup pipeline must then group pairs into connected components and
keep one canonical document per component (the reference pipelines stop at
row-level dedup — this is the extension a training-data pipeline needs,
cf. SURVEY.md §7 step 9).

Algorithm: iterative min-label propagation with pointer jumping, the
DataFrame form of Pregel-style supersteps. Each round every node takes the
minimum of (its label, its neighbors' labels, its label's label); the
pointer-jumping term (label-of-label) halves path lengths so convergence is
O(log(longest path)) rounds rather than O(diameter) — for near-dup
components (tiny, dense) this is 2-3 rounds in practice. The driver loop
only ORCHESTRATES supersteps (one small count per round for the
convergence test, exactly how GraphX/Pregel drivers work); all data stays
distributed, each round is two shuffles on the node id (label join +
min-aggregate), and labels are persisted per round with the previous
round released, so lineage stays bounded at 100 TB.

Scale note: min-label propagation is the right default for near-dup graphs
(bounded component size, tiny diameter). For adversarial graphs with
long chains, the alternating large-star/small-star algorithm (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14) gives
provable O(log^2 n) rounds with the same two-shuffle round shape; the
pointer-jumping term here is the first half of that construction.

Determinism: labels are node ids combined with ``min``, so the final
component id is exactly min(node id in component) regardless of execution
or iteration order — hash-checkable against a recursive-CTE transitive
closure in any SQL engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# Converged label tables stay persisted (downstream joins consume them);
# sessions that run many clusterings release them here — same pattern as
# neardup._PERSISTED.
_PERSISTED: list[DataFrame] = []


def release_cached() -> int:
    """Unpersist every table cached by this module; returns the count."""
    n = len(_PERSISTED)
    for df in _PERSISTED:
        df.unpersist()
    _PERSISTED.clear()
    return n


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``; component =
    min node id in the node's connected component. Nodes with no edge are
    not emitted (a singleton is trivially its own component). Raises if the
    labels have not converged after ``max_iter`` supersteps."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.min("b"), F.col("a")).alias("comp"))
        .select(F.col("a").alias("id"), "comp")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        for _ in range(max_iter):
            nbr = (
                sym.join(
                    labels.select(F.col("id").alias("b"), F.col("comp").alias("nbr_comp")),
                    "b",
                )
                .groupBy("a")
                .agg(F.min("nbr_comp").alias("nbr_min"))
                .select(F.col("a").alias("id"), "nbr_min")
            )
            jump = labels.select(F.col("id").alias("jid"), F.col("comp").alias("jcomp"))
            # localCheckpoint (not just persist): each round references the
            # label table three times, so without lineage truncation the
            # logical plan TRIPLES per superstep and the driver OOMs just
            # stringifying it by round ~15. Checkpointing caps every
            # round's plan at one superstep. (On a multi-node cluster use
            # a reliable checkpoint dir for fault tolerance; the superstep
            # loop itself is unchanged.)
            new_labels = (
                labels.join(nbr, "id", "left")
                .join(jump, labels["comp"] == jump["jid"], "left")
                .select(
                    "id",
                    F.least(
                        F.col("comp"),
                        F.coalesce("nbr_min", F.col("comp")),
                        F.coalesce("jcomp", F.col("comp")),
                    ).alias("comp"),
                )
                .localCheckpoint()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                _PERSISTED.append(labels)
                return labels.select("id", "comp")
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} supersteps"
        )
    finally:
        sym.unpersist()


def cluster_assignments(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    id_out: str = "doc_id",
) -> DataFrame:
    """Per-node cluster rows ready for dedup: (id_out, cluster_id,
    cluster_size, keep) where cluster_id = min id in the component and
    keep = 1 exactly for the canonical (minimum-id) member."""
    comp = connected_components(edges, src=src, dst=dst)
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "comp")
        .select(
            F.col("id").alias(id_out),
            F.col("comp").alias("cluster_id"),
            F.col("cluster_size"),
            (F.col("id") == F.col("comp")).cast("long").alias("keep"),
        )
    )
