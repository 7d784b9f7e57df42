"""Bin-bucketed range (interval) join.

The aftershock-association shape from the reference domain: for each anchor
event, find every event whose timestamp falls in a trailing window
``(t_anchor + lower, t_anchor + upper]``. Expressed naively as a theta-join
(``b.ts > a.ts AND b.ts <= a.ts + W``) Spark can only pick
BroadcastNestedLoopJoin — O(|A|·|B|) comparisons and a broadcast of one
whole side, which dies long before 100 TB.

This operator turns the interval predicate into an EQUI-join on time bins:

- bin width  B = upper - lower  (the window span);
- each anchor covers exactly two consecutive bins
  (``floor((t+lower)/B)`` and ``floor((t+upper)/B)``), generated as rows;
- candidates carry their single bin ``floor(t/B)``;
- join on the bin id (hash shuffle both sides, co-partitioned), then apply
  the exact interval predicate to discard the superset slack.

Cost at scale: one shuffle of each side keyed by time bin, with only the
(filtered, small) anchor side duplicated 2×. Bin keys are time-uniform, so
skew only appears if event *time* is skewed — AQE's skew-join splitting
handles hot bins; no driver-side state, no broadcast of a big side.

Correctness notes:
- all arithmetic is on ``unix_micros`` int64 epochs — no float time math;
- bin ids use true FLOOR division (``div`` adjusted for negative
  operands), so the "two consecutive bins per anchor" invariant holds
  even for pre-epoch timestamps or a negative ``lower_us`` — truncating
  ``div`` alone would collapse both bins onto 0 near the epoch and emit
  duplicate pairs;
- the window is half-open ``(lo, hi]``: an event never matches itself
  (delta 0 is excluded) and duplicate-timestamp events resolve identically
  in Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_L, _R = "__rj_l", "__rj_r"


def _floor_div(col: str, span: int) -> str:
    """SQL for floor(col / span) on int64, span > 0.

    Spark's ``div`` truncates toward zero; subtract 1 when the operands
    disagree in sign and the division is inexact to recover floor
    semantics without going through (lossy beyond 2^53) doubles.
    """
    return (
        f"(({col} div {span}) - "
        f"(CASE WHEN {col} % {span} != 0 AND {col} < 0 THEN 1 ELSE 0 END))"
    )


def interval_join(
    anchors: DataFrame,
    candidates: DataFrame,
    *,
    anchor_time: str = "ts",
    candidate_time: str = "ts",
    lower_us: int,
    upper_us: int,
) -> DataFrame:
    """All (anchor, candidate) pairs with
    ``candidate_time in (anchor_time + lower_us, anchor_time + upper_us]``.

    Returns one row per matching pair: every anchor column, plus the
    candidate columns suffixed ``_c``. Anchors with no match produce no
    row — aggregate-and-left-join at the call site to keep empty anchors
    (see ``plans/workloads_ext.range_join_event_bursts``).
    """
    if upper_us <= lower_us:
        raise ValueError("upper_us must be > lower_us")
    span = upper_us - lower_us

    a_t = F.unix_micros(F.col(anchor_time))
    lo = (a_t + F.lit(lower_us)).alias("__lo")
    hi = (a_t + F.lit(upper_us)).alias("__hi")
    a = anchors.select(
        *[F.col(c) for c in anchors.columns], lo, hi
    ).withColumn(
        "__bin",
        F.explode(
            F.array(
                F.expr(_floor_div("__lo", span)),
                F.expr(_floor_div("__hi", span)),
            )
        ),
    )
    # floor(__lo/span) and floor(__hi/span) differ by exactly 1
    # (hi = lo + span), so the explode emits 2 distinct bins per anchor —
    # no dedup needed, including for negative __lo.

    c_t = F.unix_micros(F.col(candidate_time))
    c = candidates.select(
        *[F.col(c0).alias(f"{c0}_c") for c0 in candidates.columns],
        c_t.alias("__ct"),
    ).withColumn("__bin", F.expr(_floor_div("__ct", span)))

    pairs = a.join(c, "__bin").where(
        (F.col("__ct") > F.col("__lo")) & (F.col("__ct") <= F.col("__hi"))
    )
    return pairs.drop("__bin", "__lo", "__hi", "__ct")
