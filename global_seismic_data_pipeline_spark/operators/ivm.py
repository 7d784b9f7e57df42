"""Incremental view maintenance over the change data feed.

The classic ΔQ pattern (self-maintainable aggregate views, as in
materialized-view maintenance literature and Delta Live Tables'
incremental aggregates): a grouped COUNT/SUM view over a versioned table
is kept current by applying each commit's ROW DELTAS — obtained from
:meth:`sources.versioned.VersionedWarehouse.table_changes` — instead of
rescanning the base table. Each change row carries a sign (+1 for
``insert`` / ``update_postimage``, −1 for ``delete`` /
``update_preimage``), so a commit's net effect per group is one small
aggregate over the feed; the view update is then a keyed outer join of
(groups × aggregates) against that delta — O(Δ) work per refresh, not
O(table).

Only COUNT and SUM are self-maintainable under deletes (MIN/MAX would
need per-group value multisets once the extremum is deleted — refuse
rather than silently rescan; AVG is derived as sum/count by the reader).
Sums evaluate in LONG over integer columns (float sums drift under
incremental ± application) and treat NULL addends as 0 — give the view
non-null summand columns for exact recompute parity. Groups whose
maintained count reaches zero are REMOVED — the view equals the
from-scratch aggregate exactly, which the ``ivm_orders_by_status``
driver oracle pins bit-for-bit (incremental ≡ recompute).

Crash discipline: the view lives in the SAME VersionedWarehouse, so a
refresh (a) reads the view AT the version recorded in
``{view}__ivm_meta`` — never the live table, (b) applies the feed delta
and commits the new view state, (c) writes meta LAST. A crash between
(b) and (c) re-runs against the meta-recorded PRE-state snapshot and
deterministically recomputes the same result — idempotent in effect,
the same replay contract as the streaming sinks.

Scale: the refresh shuffles the DELTA (commit-sized) plus the view
(group-cardinality-sized) — never the base table. At 100 TB with daily
commits this is the difference between a minutes-long rollup and a
full-table rescan.
"""

from __future__ import annotations

import json

from collections.abc import Mapping, Sequence
from functools import reduce

from pyspark.sql import functions as F

from ..sources.versioned import VersionedWarehouse

META_SUFFIX = "__ivm_meta"
_META_SCHEMA = (
    "source string, keys string, aggs string, "
    "last_version long, view_version long"
)
def _sign():
    # built lazily: Column construction needs an active SparkContext
    return F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))


def _validate_aggs(aggs: Mapping[str, Sequence]) -> None:
    kinds = [kind for kind, _col in aggs.values()]
    for out, (kind, _col) in aggs.items():
        if kind not in ("count", "sum"):
            raise ValueError(
                f"{out}: {kind!r} is not self-maintainable under deletes "
                "— only count/sum (derive avg as sum/count)"
            )
    if "count" not in kinds:
        raise ValueError(
            "include a count aggregate — group liveness under deletes "
            "is tracked by it"
        )


def _agg_exprs(aggs: Mapping[str, Sequence], signed: bool):
    """Aggregate expressions over base rows (signed=False) or feed rows
    carrying a ``_sign`` column (signed=True)."""
    out = []
    for name, (kind, col) in aggs.items():
        if kind == "count":
            e = F.sum("_sign") if signed else F.count(F.lit(1))
        else:
            e = F.sum(
                F.col("_sign") * F.col(col) if signed else F.col(col)
            )
        out.append(e.cast("long").alias(name))
    return out


def _write_meta(
    wh: VersionedWarehouse, view: str, source: str,
    keys_json: str, aggs_json: str, last_version: int, view_version: int,
) -> None:
    meta = wh.spark.createDataFrame(
        [(source, keys_json, aggs_json, last_version, view_version)],
        _META_SCHEMA,
    ).coalesce(1)
    wh.overwrite(meta, f"{view}{META_SUFFIX}")


def define_agg_view(
    wh: VersionedWarehouse,
    source: str,
    view: str,
    keys: Sequence[str],
    aggs: Mapping[str, Sequence],
) -> int:
    """Materialize ``view`` = ``SELECT keys, aggs FROM source GROUP BY
    keys`` at the source's CURRENT commit and record that version as the
    view's high-water mark. ``aggs`` maps output column →
    ``("count", None)`` or ``("sum", col)`` and must include a count
    (group-liveness tracking). Returns the source version the view
    reflects."""
    _validate_aggs(aggs)
    at = wh.latest_version(source)
    if at is None:
        raise ValueError(f"{source}: no committed versions to snapshot")
    base = wh.read_version(source, at)
    wh.overwrite(
        base.groupBy(*keys).agg(*_agg_exprs(aggs, signed=False)), view
    )
    _write_meta(
        wh, view, source, json.dumps(list(keys)),
        json.dumps({k: list(v) for k, v in aggs.items()}),
        at, wh.latest_version(view),
    )
    return at


def refresh_agg_view(wh: VersionedWarehouse, view: str) -> dict:
    """Apply every source commit AFTER the view's high-water mark via the
    change data feed — O(Δ) work, never a base-table rescan. Returns
    {from_version, to_version, groups_changed}; a no-op refresh (no new
    commits) returns groups_changed=0 without touching the view."""
    meta_row = wh.read(f"{view}{META_SUFFIX}").collect()[0]
    source = meta_row["source"]
    keys = json.loads(meta_row["keys"])
    aggs = {k: tuple(v) for k, v in json.loads(meta_row["aggs"]).items()}
    last = meta_row["last_version"]
    latest = wh.latest_version(source)
    if latest is None or latest <= last:
        return {"from_version": last, "to_version": last, "groups_changed": 0}

    # keyless feed: an updated row arrives as delete+insert, which the
    # signed aggregate nets correctly; rows untouched by a commit never
    # appear, so the delta is commit-sized
    feed = wh.table_changes(source, last + 1, latest, keys=None)
    delta = (
        feed.withColumn("_sign", _sign())
        .groupBy(*keys)
        .agg(*_agg_exprs(aggs, signed=True))
    )
    # pre-state SNAPSHOT per the crash discipline (module docstring):
    # a re-run after a crash mid-refresh re-derives from the same state
    old = wh.read_version(view, meta_row["view_version"])
    for k in keys:
        delta = delta.withColumnRenamed(k, f"__d_{k}")
    cond = reduce(
        lambda a, b: a & b,
        [old[k].eqNullSafe(delta[f"__d_{k}"]) for k in keys],
    )
    agg_names = list(aggs)
    count_col = next(n for n, (kind, _c) in aggs.items() if kind == "count")
    merged = old.join(delta, cond, "full_outer").select(
        *[F.coalesce(old[k], delta[f"__d_{k}"]).alias(k) for k in keys],
        *[
            (
                F.coalesce(old[n], F.lit(0))
                + F.coalesce(delta[n], F.lit(0))
            ).cast("long").alias(n)
            for n in agg_names
        ],
        delta[count_col].isNotNull().alias("__touched"),
    )
    # persist: the changed-count action and the view overwrite both
    # consume `merged` — unpersisted, the feed diff would execute twice
    merged = merged.persist()
    try:
        changed = merged.filter("__touched").count()
        new_view = merged.filter(F.col(count_col) > 0).drop("__touched")
        wh.overwrite(new_view, view)
    finally:
        merged.unpersist()
    _write_meta(  # meta LAST — see crash discipline
        wh, view, source, meta_row["keys"], meta_row["aggs"],
        latest, wh.latest_version(view),
    )
    return {
        "from_version": last + 1,
        "to_version": latest,
        "groups_changed": changed,
    }
