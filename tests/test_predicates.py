"""Exhaustive soundness proofs for the shared file-skipping predicate
core (sources/predicates.py) — pure Python, no Spark session.

Every pruning primitive is checked against brute-force evaluation over
small enumerated "files": if the primitive says prune, NO row in the
file may satisfy the predicate (a single counterexample is a row the
lakehouse readers would silently drop). Effectiveness (pruning when it
should) is spot-checked separately so a `return False` stub can't pass.
"""

from __future__ import annotations

import itertools

import pytest

from global_seismic_data_pipeline_spark.sources import predicates as P

DOMAIN = [0, 1, 2, 3, 4, 5]
LITERALS = [-1, 0, 2, 3, 5, 6]


def _matches(op, value, x):
    """Ground truth: does row value x satisfy `x op value` (SQL
    three-valued logic collapsed to "row returned")."""
    if op == "is_null":
        return x is None
    if op == "not_null":
        return x is not None
    if x is None:
        return False
    if op == "=":
        return x == value
    if op == "<":
        return x < value
    if op == "<=":
        return x <= value
    if op == ">":
        return x > value
    if op == ">=":
        return x >= value
    if op == "in":
        return x in value
    raise AssertionError(op)


def _all_preds():
    for op in ("=", "<", "<=", ">", ">="):
        for v in LITERALS:
            yield op, v
    yield "in", []
    yield "in", [0, 5]
    yield "in", [-1, 7]
    yield "is_null", None
    yield "not_null", None


def _files():
    """Small multisets over DOMAIN ∪ {None}: every pair (a, b) plus
    null-padding variants — covers empty-range, all-null, mixed."""
    for a, b in itertools.combinations_with_replacement(DOMAIN, 2):
        yield [a, b]
        yield [a, b, None]
        yield [a, None, None]
    yield [None]
    yield [None, None]


def _stats(rows):
    nn = [r for r in rows if r is not None]
    return {
        "lo": min(nn) if nn else None,
        "hi": max(nn) if nn else None,
        "null_count": sum(1 for r in rows if r is None),
        "num_records": len(rows),
    }


def test_prune_by_bounds_sound_exhaustive():
    for rows in _files():
        s = _stats(rows)
        for op, v in _all_preds():
            if P.prune_by_bounds(
                op, v, s["lo"], s["hi"],
                null_count=s["null_count"],
                num_records=s["num_records"],
            ):
                assert not any(_matches(op, v, r) for r in rows), (
                    f"{op} {v} wrongly pruned file {rows}"
                )


def test_prune_by_bounds_sound_with_unknown_nulls():
    """Stats rows missing null/record counts (older stats, foreign
    writers) must stay sound with bounds alone."""
    for rows in _files():
        s = _stats(rows)
        for op, v in _all_preds():
            if P.prune_by_bounds(op, v, s["lo"], s["hi"]):
                assert not any(_matches(op, v, r) for r in rows)


def test_prune_by_bounds_effective():
    # disjoint range prunes every comparison pointing away from it
    assert P.prune_by_bounds("=", 9, 0, 5)
    assert P.prune_by_bounds("<", 0, 0, 5)  # nothing strictly below lo
    assert P.prune_by_bounds("<=", -1, 0, 5)
    assert P.prune_by_bounds(">", 5, 0, 5)
    assert P.prune_by_bounds(">=", 6, 0, 5)
    assert P.prune_by_bounds("in", [7, 9], 0, 5)
    assert P.prune_by_bounds("in", [], 0, 5)  # SQL: x IN () is false
    # all-null file fails every value comparison
    assert P.prune_by_bounds("=", 3, None, None, null_count=4, num_records=4)
    assert P.prune_by_bounds("not_null", None, None, None, null_count=4, num_records=4)
    assert P.prune_by_bounds("is_null", None, 0, 5, null_count=0, num_records=4)
    # unknown bounds / counts keep
    assert not P.prune_by_bounds("=", 3, None, None)
    assert not P.prune_by_bounds("is_null", None, 0, 5)


def test_prune_by_bounds_type_mismatch_keeps():
    # un-comparable literal/bound pairs must never prune
    for op in ("=", "<", "<=", ">", ">="):
        assert not P.prune_by_bounds(op, "abc", 0, 5)
    assert not P.prune_by_bounds("in", ["abc"], 0, 5)


def test_prune_by_point_sound_exhaustive():
    for point in [*DOMAIN, None]:
        rows = [point, point]
        for op, v in _all_preds():
            if P.prune_by_point(op, v, point):
                assert not any(_matches(op, v, r) for r in rows), (
                    f"{op} {v} wrongly pruned point {point}"
                )


def test_prune_by_point_boundary_exact():
    # exactness: identity partitions prune on boundary equality too,
    # where interval logic must keep
    assert P.prune_by_point("<", 3, 3)
    assert P.prune_by_point(">", 3, 3)
    assert P.prune_by_bounds("<", 3, 3, 5)  # lo == value still prunes <
    assert not P.prune_by_bounds("<=", 3, 3, 5)


def test_prune_by_point_string_ambiguous():
    """A None point on a hive-staged string column may be NULL or '' —
    prune only when both readings prune."""
    # '' could match these: keep
    assert not P.prune_by_point("=", "", None, string_ambiguous=True)
    assert not P.prune_by_point("<", "a", None, string_ambiguous=True)
    assert not P.prune_by_point("<=", "", None, string_ambiguous=True)
    assert not P.prune_by_point("not_null", None, None, string_ambiguous=True)
    # NULL could match this: keep
    assert not P.prune_by_point("is_null", None, None, string_ambiguous=True)
    # neither NULL nor '' matches: prune
    assert P.prune_by_point("=", "x", None, string_ambiguous=True)
    assert P.prune_by_point(">", "a", None, string_ambiguous=True)
    assert P.prune_by_point("in", ["x", "y"], None, string_ambiguous=True)
    # unambiguous None is plain null semantics
    assert P.prune_by_point("=", "", None)
    assert P.prune_by_point("not_null", None, None)
    assert not P.prune_by_point("is_null", None, None)


def test_prune_monotone_sound_exhaustive():
    """Inclusive projection over t(x) = x // 3 (monotone): prune says
    no x in the file can match, judged only from [min t, max t]."""
    t = lambda x: x // 3  # noqa: E731

    def tv(op, v):
        return [t(e) for e in v] if op == "in" else t(v)

    for rows in itertools.combinations_with_replacement(range(-6, 7), 3):
        lo, hi = min(t(x) for x in rows), max(t(x) for x in rows)
        for op, v in _all_preds():
            if op in P.NULL_OPS:
                continue
            if P.prune_monotone(op, tv(op, v), lo, hi):
                assert not any(_matches(op, v, r) for r in rows), (
                    f"{op} {v} wrongly pruned {rows} (t-range [{lo},{hi}])"
                )


def test_prune_monotone_keeps_boundary():
    # day(v) == hi may still hold rows past v inside the same day
    assert not P.prune_monotone("<", 2, 2, 5)
    assert not P.prune_monotone(">", 2, 0, 2)
    assert P.prune_monotone("<", 2, 3, 5)
    assert P.prune_monotone(">", 2, 0, 1)
    assert P.prune_monotone("=", 9, 0, 5)
    assert P.prune_monotone("in", [9, -1], 0, 5)


def test_normalize_filters():
    assert P.normalize_filters(None) == []
    assert P.normalize_filters({"a": 1}) == [("a", "=", 1)]
    out = P.normalize_filters(
        [("a", "==", 1), ("b", "isnull"), ("c", "in", (1, 2))]
    )
    assert out == [("a", "=", 1), ("b", "is_null", None), ("c", "in", [1, 2])]
    with pytest.raises(ValueError, match="op must be"):
        P.normalize_filters([("a", "!=", 1)])
    with pytest.raises(ValueError, match="is_null"):
        P.normalize_filters([("a", "=", None)])
    with pytest.raises(ValueError, match="IN lists"):
        P.normalize_filters([("a", "in", [1, None])])
    with pytest.raises(ValueError, match="takes no value"):
        P.normalize_filters([("a", "is_null", 3)])
    with pytest.raises(ValueError, match="column must be"):
        P.normalize_filters([(3, "=", 1)])


def test_nan_hidden_guard():
    """Float stats exclude NaN while engines order NaN greatest — an
    upper bound must never disprove > / >= on float columns."""
    assert not P.prune_by_bounds(">", 5.0, 1.0, 1.0, nan_hidden=True)
    assert not P.prune_by_bounds(">=", 5.0, 1.0, 1.0, nan_hidden=True)
    # without the flag (exact-typed columns) the proof stands
    assert P.prune_by_bounds(">", 5.0, 1.0, 1.0)
    # lower-bound proofs are unaffected (NaN rows never satisfy < v)
    assert P.prune_by_bounds("<", 1.0, 1.0, 1.0, nan_hidden=True)
    assert P.prune_by_bounds("=", 5.0, 1.0, 1.0, nan_hidden=True)
    # an all-null file still prunes everything
    assert P.prune_by_bounds(
        ">", 5.0, None, None,
        null_count=3, num_records=3, nan_hidden=True,
    )
    # NaN literals never prune anywhere (every comparison is False)
    nan = float("nan")
    for op in ("=", "<", "<=", ">", ">="):
        assert not P.prune_by_bounds(op, nan, 1.0, 2.0)
        assert not P.prune_by_point(op, nan, 1.0)


def test_double_space_mapping():
    import decimal

    assert P.double_space(decimal.Decimal("0.1")) == 0.1
    assert P.double_space(2**53 + 1) == float(2**53)
    assert P.double_space(None) is None
    assert P.double_space("x") == "x"
    assert P.double_space(True) is True  # bools pass through untouched
    # a bound too large for double blocks the proof instead of pruning
    assert P.double_space(10**400) is None
    # the divergence this exists for: exact comparison says 0.1dec < 0.1,
    # double space says equal (what Spark/DuckDB evaluate)
    assert decimal.Decimal("0.1") < 0.1
    assert not P.prune_by_bounds(
        "=", 0.1,
        P.double_space(decimal.Decimal("0.1")),
        P.double_space(decimal.Decimal("0.1")),
    )


def test_filters_from_sql_supported_shapes():
    import datetime as dt

    f = P.filters_from_sql
    assert f("a = 5") == [("a", "=", 5)]
    assert f("a == 5") == [("a", "=", 5)]
    assert f("5 < a") == [("a", ">", 5)]
    assert f("a >= -3.5") == [("a", ">=", -3.5)]
    assert f("a = 1e3") == [("a", "=", 1000.0)]
    assert f("s = 'x''y'") == [("s", "=", "x'y")]
    assert f("`weird col` = 'v'") == [("weird col", "=", "v")]
    assert f("a IN (1, 2, 3)") == [("a", "in", [1, 2, 3])]
    assert f("a IS NULL") == [("a", "is_null", None)]
    assert f("a IS NOT NULL") == [("a", "not_null", None)]
    assert f("a BETWEEN 1 AND 9") == [("a", ">=", 1), ("a", "<=", 9)]
    assert f("d >= DATE '1995-01-01'") == [
        ("d", ">=", dt.date(1995, 1, 1))
    ]
    assert f("ts < TIMESTAMP '1995-01-01 06:30:00'") == [
        ("ts", "<", dt.datetime(1995, 1, 1, 6, 30))
    ]
    assert f("b = TRUE") == [("b", "=", True)]
    assert f("a = 1 AND (b = 'x' AND c <= 2)") == [
        ("a", "=", 1), ("b", "=", "x"), ("c", "<=", 2)
    ]
    assert f("(a = 1) AND b IN ('u', 'v')") == [
        ("a", "=", 1), ("b", "in", ["u", "v"])
    ]


def test_filters_from_sql_refuses_everything_else():
    f = P.filters_from_sql
    # anything not provably a conjunction of simple comparisons -> None
    for cond in (
        "a = 1 OR b = 2",
        "NOT a = 1",
        "a != 1",
        "a <> 1",
        "upper(s) = 'X'",
        "a = b",          # column-to-column
        "a + 1 = 2",
        "a = NULL",
        "a IN (1, NULL)",
        "a IN ()",
        "s LIKE 'x%'",
        "a BETWEEN 1 AND",  # truncated
        "a.b = 1",          # nested field
        "",
        "a = DATE 'not-a-date'",
    ):
        assert f(cond) is None, cond
