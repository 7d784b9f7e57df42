"""Stats-driven join planning — the engine's own CBO step.

The reference ANALYZEs tables so Delta's optimizer can pick join
strategies (ref: TABLE OPTIMIZATION.py:119-124); vanilla Spark only does
this when the catalog carries statistics. This module makes the engine's
OWN statistics actionable: the :mod:`.profile` table (row counts + HLL
NDVs — the ANALYZE artifact) and the Selinger estimate of
:func:`.sketch.join_size_estimate` feed :func:`choose_join_strategy`,
which picks among the three physical shapes this engine uses everywhere:

- **broadcast** — one side's estimated bytes fit the driver/executor
  budget: ship it, zero shuffle of the big side (every dimension join
  in ``plans/workloads.py``);
- **bucketed** — both sides are stored bucketed on the join keys with
  the same bucket count: Spark reads matching buckets pairwise, no
  exchange at all (the signature-store probe shape);
- **shuffle** — otherwise: hash-partition both sides on the key. The
  decision row carries per-side ``skew = n_rows / ndv`` (average rows
  per key); a skew factor above ``skew_flag`` additionally recommends
  salting / AQE skew-join, because one hot key will otherwise pin a
  single reducer no matter how the shuffle is arranged.

The decision consumes STATS ROWS, never the data — at 100 TB the
planner reads two profile rows and two register tables.
:func:`apply_strategy` then executes the decision with the standard
DataFrame hints, and the tests pin that the chosen hint actually
surfaces in the physical plan (BroadcastHashJoin vs exchange-free SMJ vs
shuffled join) and that the choice FLIPS at the documented thresholds.

Byte sizing uses per-type widths matching Spark's own defaultSize
accounting (numerics by width, strings at 20 bytes) — an estimate for a
threshold decision, not an exact measure, exactly like Spark's
``sizeInBytes`` plan statistic it stands in for.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# matches org.apache.spark.sql.types.*Type.defaultSize
_TYPE_BYTES = {
    T.BooleanType: 1, T.ByteType: 1, T.ShortType: 2, T.IntegerType: 4,
    T.LongType: 8, T.FloatType: 4, T.DoubleType: 8, T.DateType: 4,
    T.TimestampType: 8, T.TimestampNTZType: 8, T.StringType: 20,
    T.BinaryType: 100,
}
DEFAULT_BROADCAST_BYTES = 10 * 1024 * 1024  # Spark's autoBroadcast default
DEFAULT_SKEW_FLAG = 16.0  # avg rows/key above this → recommend salting


def schema_row_bytes(schema: T.StructType) -> int:
    """Estimated serialized row width, Spark defaultSize accounting."""
    total = 0
    for f in schema.fields:
        dt = f.dataType
        if isinstance(dt, T.DecimalType):
            total += 16
        elif isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
            total += 100  # nested: same coarse default Spark uses
        else:
            total += _TYPE_BYTES.get(type(dt), 20)
    return max(total, 1)


def join_stats(df: DataFrame, key: str, *, p: int = 12) -> dict:
    """The per-side statistics row the planner consumes:
    {n_rows, ndv, row_bytes, est_bytes, skew}. One profile pass
    (:func:`.profile.profile_table` on the join key); a real deployment
    stores these rows at ANALYZE time and the planner only reads them."""
    from .profile import profile_table

    row = profile_table(df, [key], p=p).collect()[0]
    n, ndv = int(row["n_rows"]), max(int(row["approx_ndv"]), 1)
    rb = schema_row_bytes(df.schema)
    return {
        "n_rows": n,
        "ndv": ndv,
        "row_bytes": rb,
        "est_bytes": n * rb,
        "skew": n / ndv,
    }


STATS_TABLE = "join_stats"


def analyze_table(
    warehouse, df: DataFrame, table: str, key: str, *, p: int = 12
) -> dict:
    """The ANALYZE step: compute :func:`join_stats` for (table, key) and
    UPSERT the row into the warehouse ``join_stats`` table. Run at write
    time / maintenance time; planning then reads rows, never data."""
    row = {"table_name": table, "key_col": key, **join_stats(df, key, p=p)}
    from ..session import tiny_df

    stats_df = tiny_df(
        warehouse.spark,
        [(
            row["table_name"], row["key_col"], row["n_rows"], row["ndv"],
            row["row_bytes"], row["est_bytes"], float(row["skew"]),
        )],
        "table_name string, key_col string, n_rows long, ndv long, "
        "row_bytes long, est_bytes long, skew double",
    )
    warehouse.merge(stats_df, STATS_TABLE, ["table_name", "key_col"])
    return row


def stored_join_stats(warehouse, table: str, key: str) -> dict:
    """Read one (table, key) stats row from the warehouse ``join_stats``
    table — the control-plane read the planner uses at 100 TB. Raises
    KeyError when the pair was never analyzed (refuse-loudly: planning
    on missing stats would silently default somewhere arbitrary)."""
    rows = (
        warehouse.read(STATS_TABLE)
        .filter(
            (F.col("table_name") == table) & (F.col("key_col") == key)
        )
        .collect()
    )
    if not rows:
        raise KeyError(f"no stored join stats for ({table!r}, {key!r}) — run analyze_table")
    r = rows[0]
    return {
        "n_rows": r["n_rows"], "ndv": r["ndv"], "row_bytes": r["row_bytes"],
        "est_bytes": r["est_bytes"], "skew": r["skew"],
    }


def plan_join(
    warehouse,
    left_table: str,
    right_table: str,
    key: str,
    *,
    left_df: DataFrame | None = None,
    right_df: DataFrame | None = None,
    both_bucketed_on_keys: bool = False,
    broadcast_bytes: int = DEFAULT_BROADCAST_BYTES,
    skew_flag: float = DEFAULT_SKEW_FLAG,
    p: int = 12,
) -> "JoinDecision":
    """Stored-stats-FIRST planning entry point (the default path): read
    the ANALYZE-time rows from ``join_stats`` — two control-plane lookups
    that never touch the data tables (they need not even exist any more).
    Only on a stats MISS fall back to an inline one-pass profile of the
    corresponding fallback DataFrame, with a loud RuntimeWarning — at
    100 TB that pass is exactly what scheduling ANALYZE
    (``pipeline.maintenance.refresh_join_stats``) exists to avoid — and
    refuse when no fallback df was provided."""
    import warnings

    have_store = warehouse.exists(STATS_TABLE)

    def side(table: str, df: DataFrame | None) -> dict:
        if have_store:
            try:
                return stored_join_stats(warehouse, table, key)
            except KeyError:
                pass
        if df is None:
            raise KeyError(
                f"no stored join stats for ({table!r}, {key!r}) and no "
                "fallback DataFrame — run analyze_table / "
                "maintenance.refresh_join_stats first"
            )
        warnings.warn(
            f"join planning fell back to an inline profile SCAN of "
            f"{table!r} on {key!r}: stored stats missing — schedule "
            "maintenance.refresh_join_stats so planning stays "
            "control-plane only",
            RuntimeWarning,
            stacklevel=2,
        )
        return join_stats(df, key, p=p)

    return choose_join_strategy(
        side(left_table, left_df),
        side(right_table, right_df),
        both_bucketed_on_keys=both_bucketed_on_keys,
        broadcast_bytes=broadcast_bytes,
        skew_flag=skew_flag,
    )


@dataclass
class JoinDecision:
    strategy: str            # broadcast_left | broadcast_right | bucketed | shuffle
    est_join_rows: int       # Selinger: n_l * n_r / max(ndv_l, ndv_r)
    skew_warning: bool       # a side's avg rows/key exceeds skew_flag
    reason: str
    skew_side: str | None = None  # "left"/"right": the hotter side (set iff skew_warning)


def choose_join_strategy(
    left_stats: dict,
    right_stats: dict,
    *,
    both_bucketed_on_keys: bool = False,
    broadcast_bytes: int = DEFAULT_BROADCAST_BYTES,
    skew_flag: float = DEFAULT_SKEW_FLAG,
) -> JoinDecision:
    """Pick the physical join shape from two stats rows (no data read).

    Preference order mirrors the engine's cost reality: broadcasting the
    smaller side beats everything when it fits (zero big-side movement);
    a pre-bucketed layout beats a fresh shuffle (the shuffle was paid at
    write time); otherwise shuffle, with a skew recommendation when the
    per-key average says one reducer will eat a hot key."""
    est_rows = (left_stats["n_rows"] * right_stats["n_rows"]) // max(
        left_stats["ndv"], right_stats["ndv"], 1
    )
    skew = max(left_stats["skew"], right_stats["skew"]) > skew_flag
    skew_side = None
    if skew:
        skew_side = (
            "left" if left_stats["skew"] >= right_stats["skew"] else "right"
        )
    sides = sorted(
        (("left", left_stats), ("right", right_stats)),
        key=lambda kv: kv[1]["est_bytes"],
    )
    small_name, small = sides[0]
    if small["est_bytes"] <= broadcast_bytes:
        return JoinDecision(
            f"broadcast_{small_name}", est_rows, skew,
            f"{small_name} side ~{small['est_bytes']} B fits the "
            f"{broadcast_bytes} B broadcast budget",
            skew_side,
        )
    if both_bucketed_on_keys:
        return JoinDecision(
            "bucketed", est_rows, skew,
            "both sides bucketed on the join keys — co-located read, "
            "no exchange",
            skew_side,
        )
    return JoinDecision(
        "shuffle", est_rows, skew,
        "no side fits the broadcast budget and no co-located layout "
        + (
            f"; hot-key skew on the {skew_side} side — apply_strategy"
            "(salt=...) or AQE skew-join"
            if skew
            else ""
        ),
        skew_side,
    )


def apply_strategy(
    left: DataFrame,
    right: DataFrame,
    on,
    decision: JoinDecision,
    how: str = "inner",
    *,
    salt: int | None = None,
) -> DataFrame:
    """Execute ``decision``: broadcast hint on the chosen side, plain
    join otherwise (a bucketed pair needs no hint — Spark sees the
    bucket spec; a shuffle pair is the default).

    ``salt`` EXECUTES the planner's skew advisory instead of just
    reporting it: on a ``shuffle`` decision with ``skew_warning``, the
    hotter side (``decision.skew_side``) is salted and the other side
    replicated ``salt``× via :func:`.skew.salted_shuffle_join`, spreading
    the hot key over ``salt`` reduce tasks. Requires join-key ``on`` as
    column names and a join type preserving only the skewed side
    (inner, or left/semi/anti when the skewed side is the left);
    otherwise (or when ``salt`` is None / no skew) the plain shuffle
    join runs."""
    if decision.strategy == "broadcast_left":
        return F.broadcast(left).join(right, on, how)
    if decision.strategy == "broadcast_right":
        return left.join(F.broadcast(right), on, how)
    if (
        decision.strategy == "shuffle"
        and salt
        and decision.skew_warning
        and decision.skew_side
    ):
        from .skew import salted_shuffle_join

        keys = [on] if isinstance(on, str) else list(on)
        if decision.skew_side == "left":
            return salted_shuffle_join(left, right, keys, salt=salt, how=how)
        if how == "inner":  # only inner is symmetric in the skewed side
            out = salted_shuffle_join(right, left, keys, salt=salt, how=how)
            # restore left.join(right) column order
            return out.select(
                *keys,
                *[c for c in left.columns if c not in keys],
                *[c for c in right.columns if c not in keys],
            )
        # left-preserving join with a right-side hot key: replication
        # would multiply unmatched left rows — fall through to plain
    return left.join(right, on, how)
