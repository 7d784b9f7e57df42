"""Point-in-bounding-box enrichment (broadcast theta join + priority pick).

Reproduces the reference's geospatial enrichment semantics
(ref: 04_silver_transformation.py:95-125): inclusive box containment,
overlaps resolved by least ``priority``, unmatched rows tagged with a
fallback, reattached via unionByName(allowMissingColumns=True).

Spark-first design: the box join is expressed as an *inner join with range
predicates on a broadcast dimension* — Catalyst plans a
BroadcastNestedLoopJoin, so the fact side never shuffles. The priority pick
is a window on the fact's unique key; at 100 TB that is one shuffle on a
high-cardinality key (no skew: each event matches ≤ #regions rows). The
unmatched path is a broadcast left-anti join on the same dimension, NOT on
the matched-ids set — joining fact-vs-fact on matched ids (what the
reference does) would be a second full shuffle of the fact table; testing
"matches no box" directly against the 12-row dimension is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def enrich_point_in_box(
    points: DataFrame,
    boxes: DataFrame,
    *,
    point_id: str,
    x_col: str,
    y_col: str,
    box_cols: tuple[str, str, str, str] = ("min_lon", "max_lon", "min_lat", "max_lat"),
    priority_col: str = "priority",
    carry_cols: tuple[str, ...] = ("region_code", "region_name"),
    fallback: dict[str, str] | None = None,
) -> DataFrame:
    """Assign each point the highest-priority (lowest value) containing box.

    ``boxes`` must be broadcast-sized. Bounds are inclusive on all edges.
    Points contained by no box get the ``fallback`` literal values (columns
    not in ``fallback`` stay null, matching unionByName null-fill).
    """
    min_x, max_x, min_y, max_y = box_cols
    dim = boxes.select(*carry_cols, min_x, max_x, min_y, max_y, priority_col)

    contained = points.join(
        F.broadcast(dim),
        on=(
            (F.col(y_col) >= F.col(min_y))
            & (F.col(y_col) <= F.col(max_y))
            & (F.col(x_col) >= F.col(min_x))
            & (F.col(x_col) <= F.col(max_x))
        ),
        how="inner",
    )

    w = Window.partitionBy(point_id).orderBy(F.col(priority_col).asc())
    best = (
        contained.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", min_x, max_x, min_y, max_y, priority_col)
    )

    if fallback is None:
        return best

    unmatched = points.join(
        F.broadcast(dim),
        on=(
            (F.col(y_col) >= F.col(min_y))
            & (F.col(y_col) <= F.col(max_y))
            & (F.col(x_col) >= F.col(min_x))
            & (F.col(x_col) <= F.col(max_x))
        ),
        how="left_anti",
    )
    for c, v in fallback.items():
        unmatched = unmatched.withColumn(c, F.lit(v))
    return best.unionByName(unmatched, allowMissingColumns=True)
