"""Point-in-bounding-box enrichment (broadcast theta join + priority pick).

Reproduces the reference's geospatial enrichment semantics
(ref: 04_silver_transformation.py:95-125): inclusive box containment,
overlaps resolved by least ``priority``, unmatched rows tagged with a
fallback, reattached via unionByName(allowMissingColumns=True).

Spark-first design: the box join is a *left outer join with range
predicates on a broadcast dimension* — Catalyst plans a
BroadcastNestedLoopJoin, so the fact side never shuffles and is scanned
ONCE (an inner-join + anti-join formulation scans it twice). The priority
pick is a window on the fact's unique key: one shuffle on a
high-cardinality key (no skew: each point matches ≤ #boxes rows, and
Spark's WindowGroupLimit keeps only the per-key top row before the
shuffle). Unmatched points survive the left join as a single null-extended
row, so the fallback is a plain ``coalesce`` — no second pass.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

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
    not in ``fallback`` stay null). With ``fallback=None`` unmatched points
    are dropped (inner-join semantics).
    """
    min_x, max_x, min_y, max_y = box_cols
    dim = boxes.select(*carry_cols, min_x, max_x, min_y, max_y, priority_col)
    cond = (
        (F.col(y_col) >= F.col(min_y))
        & (F.col(y_col) <= F.col(max_y))
        & (F.col(x_col) >= F.col(min_x))
        & (F.col(x_col) <= F.col(max_x))
    )

    joined = points.join(
        F.broadcast(dim), on=cond, how="left" if fallback is not None else "inner"
    )
    # matched points: ≤ #boxes rows, smallest priority wins; unmatched
    # points: exactly one null-extended row (rn=1 trivially keeps it)
    w = Window.partitionBy(point_id).orderBy(F.col(priority_col).asc_nulls_last())
    best = (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", min_x, max_x, min_y, max_y, priority_col)
    )
    if fallback is not None:
        for c, v in fallback.items():
            best = best.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    return best


def enrich_point_in_box_fused(
    points: DataFrame,
    boxes: Sequence[Mapping],
    *,
    x_col: str,
    y_col: str,
    box_cols: tuple[str, str, str, str] = ("min_lon", "max_lon", "min_lat", "max_lat"),
    priority_col: str = "priority",
    carry_cols: tuple[str, ...] = ("region_code", "region_name"),
    fallback: dict[str, str] | None = None,
) -> DataFrame:
    """Map-side form of :func:`enrich_point_in_box` for STATIC literal
    boxes: the broadcast join + priority window collapses into one
    priority-ordered CASE chain evaluated per row — no join, no window, NO
    SHUFFLE (the join form shuffles once on the point key for the window).
    Identical semantics when priorities are unique: first match in
    (priority asc, definition order) == the window's lowest-priority pick;
    the definition-order tiebreak is stricter than the window form, whose
    row_number over equal priorities is nondeterministic — prefer this
    form whenever the dimension is a literal table (reference data), which
    is exactly when the chain can be built at plan time.

    Equivalence with the join form is pinned in ``test_spatial.py``.
    """
    min_x, max_x, min_y, max_y = box_cols
    order = sorted(range(len(boxes)), key=lambda i: (boxes[i][priority_col], i))
    fb = fallback or {}
    if fallback is None:
        # Typed NULL whose field types MATCH the match branches exactly:
        # when(false, <struct built from a real box>) folds to a null
        # literal of that struct type at plan time. Hardcoding string
        # field types here would type-mismatch non-string carry columns
        # (e.g. an int region id) and fail analysis.
        if boxes:
            chain = F.when(
                F.lit(False),
                F.struct(
                    *[F.lit(boxes[order[0]][c]).alias(c) for c in carry_cols]
                ),
            )
        else:
            chain = F.lit(None).cast(
                "struct<" + ", ".join(f"{c}: string" for c in carry_cols) + ">"
            )
    else:
        chain = F.struct(*[F.lit(fb.get(c)).alias(c) for c in carry_cols])
    for i in reversed(order):
        b = boxes[i]
        cond = (
            (F.col(y_col) >= F.lit(b[min_y]))
            & (F.col(y_col) <= F.lit(b[max_y]))
            & (F.col(x_col) >= F.lit(b[min_x]))
            & (F.col(x_col) <= F.lit(b[max_x]))
        )
        chain = F.when(
            cond, F.struct(*[F.lit(b[c]).alias(c) for c in carry_cols])
        ).otherwise(chain)
    out = points.withColumn("__box", chain)
    if fallback is None:
        out = out.filter(F.col("__box").isNotNull())
    return out.select(
        *points.columns,
        *[F.col(f"__box.{c}").alias(c) for c in carry_cols],
    )


def nearest_neighbor_grid_join(
    points: DataFrame,
    stations: DataFrame,
    *,
    point_id: str,
    px_col: str,
    py_col: str,
    station_id: str,
    sx_col: str,
    sy_col: str,
    cell_size: int,
    broadcast_stations: bool = True,
) -> DataFrame:
    """1-NN join on an integer plane via grid-cell candidate pruning.

    The scalable nearest-neighbor shape: stations are replicated to the
    3×3 neighborhood of their grid cell (bounded 9× blowup of the SMALL
    side only), points compute their cell map-side, and the candidate
    pairing is a plain equi-join on the cell key — never an all-pairs
    cross join. The per-point argmin folds into one map-side-combinable
    ``min(struct(d2, id, …))`` aggregate (lexicographic struct ordering
    gives the deterministic lowest-id tiebreak) — with a broadcast
    station side the whole operator is one scan of the points plus one
    partial-aggregated shuffle on the point key.

    CORRECTNESS CONTRACT: the 3×3 ring must contain the true nearest
    station — guaranteed when every grid cell contains ≥1 station (then
    the own-cell station is nearer than anything ≥2 cells away). Callers
    own that invariant; the oracle brute-forces ALL stations, so a
    violation hash-fails rather than passing silently.

    All distances are EXACT int64 squared euclidean — no sqrt, no float:
    comparisons (the argmin) never ride a rounding edge. Coordinates
    |x| < ~1.5e9 keep (Δx)²+(Δy)² inside int64.

    Set ``broadcast_stations=False`` when the station side is too big to
    broadcast: the same plan becomes a shuffle equi-join on the cell key,
    still never all-pairs."""
    cs = F.lit(int(cell_size))
    st = stations.select(
        F.col(station_id).alias("__sid"),
        F.col(sx_col).cast("long").alias("__sx"),
        F.col(sy_col).cast("long").alias("__sy"),
    )
    offsets = F.expr("explode(sequence(-1, 1))")
    st9 = (
        st.select("*", offsets.alias("__dx"))
        .select("*", F.expr("explode(sequence(-1, 1))").alias("__dy"))
        .select(
            "__sid",
            "__sx",
            "__sy",
            (F.floor(F.col("__sx") / cs) + F.col("__dx")).cast("long").alias("__cx"),
            (F.floor(F.col("__sy") / cs) + F.col("__dy")).cast("long").alias("__cy"),
        )
    )
    pts = points.select(
        F.col(point_id).alias("__pid"),
        F.col(px_col).cast("long").alias("__px"),
        F.col(py_col).cast("long").alias("__py"),
    ).select(
        "*",
        F.floor(F.col("__px") / cs).cast("long").alias("__cx"),
        F.floor(F.col("__py") / cs).cast("long").alias("__cy"),
    )
    right = F.broadcast(st9) if broadcast_stations else st9
    d2 = (F.col("__px") - F.col("__sx")) * (F.col("__px") - F.col("__sx")) + (
        F.col("__py") - F.col("__sy")
    ) * (F.col("__py") - F.col("__sy"))
    cands = pts.join(right, ["__cx", "__cy"]).select(
        "__pid", F.struct(d2.alias("d2"), F.col("__sid").alias("sid")).alias("__c")
    )
    best = cands.groupBy("__pid").agg(F.min("__c").alias("__b"))
    return best.select(
        F.col("__pid").alias(point_id),
        F.col("__b.sid").alias(station_id),
        F.col("__b.d2").alias("dist_sq"),
    )
