"""Conservative predicate primitives shared by the file-skipping planners.

Both lakehouse readers prune their driver-side file listings before any
data file opens — Delta through ``add.stats`` (numRecords / minValues /
maxValues / nullCount) and partitionValues, Iceberg through manifest-list
partition summaries, per-file partition records, and per-file column
bounds. At 100 TB the planner walks metadata for 10⁵-10⁶ files; a
predicate that proves a file irrelevant saves opening it at all, which is
the entire point of log-resident stats (the reference leans on exactly
this via Delta + ZORDER, ref: TABLE OPTIMIZATION.py:33-36). This module
holds the PURE decision logic so both backends share one audited core:

- a filter is a conjunction of ``(column, op, value)`` triples with
  ops ``= < <= > >= in is_null not_null`` (:func:`normalize_filters`);
- :func:`prune_by_bounds` decides from a [lo, hi] interval + null
  counts (Delta stats, Iceberg column bounds, manifest summaries over
  identity transforms);
- :func:`prune_by_point` decides from a single partition value
  (identity-transformed partition columns — every row of the file
  shares the value, so boundary equality prunes too);
- :func:`prune_monotone` decides in TRANSFORMED space for monotone
  non-decreasing transforms (day/month/year/hour/truncate): the
  spec's inclusive projection — ``x < v`` loosens to ``t(x) <= t(v)``,
  so only a strict bound violation prunes;
- :func:`residual_condition` rebuilds the EXACT predicate as a Spark
  Column — pruning is always a superset guarantee and the residual
  re-applies (and pushes into the parquet scans), so a wrong skip is
  impossible to mask: it would drop rows and fail the oracles.

Every decision is phrased as "prune only on a PROVEN violation":
comparisons that raise ``TypeError`` (mismatched literal types,
naive-vs-aware timestamps) never prune, and equality is proven only
through the order (``a < b or b < a``) so a type-mismatched pair keeps
the file instead of wrongly dropping it.

NULL/'' ambiguity: both writers stage through hive-style directories,
which fold NULL and the empty string into one ``__HIVE_DEFAULT_
PARTITION__`` component (CLAUDE.md trap). A ``None`` partition point on
a STRING column therefore means "every row is NULL *or* ''" —
:func:`prune_by_point` takes ``string_ambiguous=True`` there and prunes
only when BOTH readings prune.
"""

from __future__ import annotations

import re

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

RANGE_OPS = frozenset({"=", "<", "<=", ">", ">=", "in"})
NULL_OPS = frozenset({"is_null", "not_null"})
OPS = RANGE_OPS | NULL_OPS

_OP_ALIASES = {
    "==": "=",
    "isnull": "is_null",
    "isnotnull": "not_null",
    "notnull": "not_null",
}


def normalize_filters(filters) -> list[tuple[str, str, object]]:
    """Validated ``(column, op, value)`` triples from a user filter spec:
    a mapping is shorthand for equality on every entry; an iterable may
    mix 3-tuples and 2-tuples (the null ops take no value). ``None``
    literals refuse loudly — SQL ``col = NULL`` matches nothing, which
    silently pruning EVERYTHING would "honor" in the worst possible way;
    the caller wants ``is_null``."""
    if filters is None:
        return []
    if isinstance(filters, Mapping):
        filters = [(c, "=", v) for c, v in filters.items()]
    out: list[tuple[str, str, object]] = []
    for f in filters:
        f = tuple(f)
        if len(f) == 2:
            col, op = f
            value = None
        elif len(f) == 3:
            col, op, value = f
        else:
            raise ValueError(f"filter {f!r}: expected (col, op[, value])")
        op = _OP_ALIASES.get(op, op)
        if op not in OPS:
            raise ValueError(
                f"filter {f!r}: op must be one of {sorted(OPS)}"
            )
        if not isinstance(col, str) or not col:
            raise ValueError(f"filter {f!r}: column must be a string")
        if op == "in":
            value = list(value)
            if any(v is None for v in value):
                raise ValueError(
                    f"filter {f!r}: IN lists may not contain None — a "
                    "NULL never matches; add ('" + col + "', 'is_null') "
                    "as a separate disjunct if you mean it"
                )
        elif op in RANGE_OPS and value is None:
            raise ValueError(
                f"filter {f!r}: {op} with None matches no row — use "
                f"('{col}', 'is_null')"
            )
        elif op in NULL_OPS and len(f) == 3 and value is not None:
            raise ValueError(f"filter {f!r}: {op} takes no value")
        out.append((col, op, value))
    return out


def residual_condition(
    preds: list[tuple[str, str, object]],
) -> Column:
    """The exact predicate as one Spark conjunction — applied to the
    pruned scan so the result is identical to an unpruned
    read-then-filter, whatever the pruning decided."""
    cond = F.lit(True)
    for col, op, value in preds:
        c = F.col(col)
        if op == "=":
            cond = cond & (c == F.lit(value))
        elif op == "<":
            cond = cond & (c < F.lit(value))
        elif op == "<=":
            cond = cond & (c <= F.lit(value))
        elif op == ">":
            cond = cond & (c > F.lit(value))
        elif op == ">=":
            cond = cond & (c >= F.lit(value))
        elif op == "in":
            cond = cond & c.isin(list(value))
        elif op == "is_null":
            cond = cond & c.isNull()
        else:  # not_null
            cond = cond & c.isNotNull()
    return cond


_SQL_TOKEN = re.compile(
    r"""\s*(?:
      (?P<lpar>\()|(?P<rpar>\))|(?P<comma>,)
    | (?P<op><=|>=|==|=|<>|!=|<|>)
    | (?P<str>'(?:[^']|'')*')
    | (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
    | (?P<bq>`[^`]+`)
    | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    )""",
    re.VERBOSE,
)

_SQL_KEYWORDS = {"and", "in", "is", "not", "null", "between",
                 "date", "timestamp", "true", "false"}


def filters_from_sql(condition: str) -> list[tuple[str, str, object]] | None:
    """A ``(col, op, literal)`` conjunction EXTRACTED from a simple SQL
    condition string, or None when the condition uses anything beyond
    ``col op literal`` / ``literal op col`` / ``IN (...)`` /
    ``IS [NOT] NULL`` / ``BETWEEN`` joined by AND (parens allowed).

    This feeds predicate file skipping for the DML probe scans, whose
    conditions arrive as SQL text (replaceWhere, DELETE): a None means
    "not representable — probe everything", never a guess. The returned
    triples are the SAME predicate, so files pruned through them
    provably hold no matching rows under the engine's evaluation
    (numeric literals with a decimal point map to Python floats, i.e.
    the engines' double space — see :func:`double_space`)."""
    import datetime as _dt

    toks: list[tuple[str, str]] = []
    pos = 0
    s = condition or ""
    while pos < len(s):
        m = _SQL_TOKEN.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip():
                return None  # unrecognized lexeme
            break
        pos = m.end()
        kind = m.lastgroup
        toks.append((kind, m.group(kind)))

    i = 0

    def _peek_word(offset=0):
        j = i + offset
        if j < len(toks) and toks[j][0] == "word":
            return toks[j][1].lower()
        return None

    def _literal():
        nonlocal i
        if i >= len(toks):
            return None, False
        kind, text = toks[i]
        if kind == "num":
            i += 1
            if "." in text or "e" in text or "E" in text:
                return float(text), True
            return int(text), True
        if kind == "str":
            i += 1
            return text[1:-1].replace("''", "'"), True
        if kind == "word":
            w = text.lower()
            if w in ("date", "timestamp") and i + 1 < len(toks) and (
                toks[i + 1][0] == "str"
            ):
                raw = toks[i + 1][1][1:-1].replace("''", "'")
                i += 2
                try:
                    if w == "date":
                        return _dt.date.fromisoformat(raw), True
                    return _dt.datetime.fromisoformat(
                        raw.replace("Z", "+00:00")
                    ), True
                except ValueError:
                    return None, False
            if w == "true":
                i += 1
                return True, True
            if w == "false":
                i += 1
                return False, True
        return None, False

    def _ident():
        nonlocal i
        if i < len(toks) and toks[i][0] == "bq":
            name = toks[i][1][1:-1]
            i += 1
            return name
        if (
            i < len(toks)
            and toks[i][0] == "word"
            and toks[i][1].lower() not in _SQL_KEYWORDS
        ):
            name = toks[i][1]
            i += 1
            return name
        return None

    _FLIP = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "=", "==": "="}

    def _term():
        nonlocal i
        out = []
        col = _ident()
        if col is not None:
            if i < len(toks) and toks[i][0] == "op":
                op = toks[i][1]
                if op in ("<>", "!="):
                    return None
                i += 1
                lit, ok = _literal()
                if not ok or lit is None:
                    return None
                out.append((col, "=" if op == "==" else op, lit))
                return out
            w = _peek_word()
            if w == "in":
                i += 1
                if i >= len(toks) or toks[i][0] != "lpar":
                    return None
                i += 1
                vals = []
                while True:
                    lit, ok = _literal()
                    if not ok or lit is None:
                        return None
                    vals.append(lit)
                    if i < len(toks) and toks[i][0] == "comma":
                        i += 1
                        continue
                    break
                if i >= len(toks) or toks[i][0] != "rpar":
                    return None
                i += 1
                out.append((col, "in", vals))
                return out
            if w == "is":
                i += 1
                if _peek_word() == "not":
                    i += 1
                    if _peek_word() != "null":
                        return None
                    i += 1
                    out.append((col, "not_null", None))
                    return out
                if _peek_word() != "null":
                    return None
                i += 1
                out.append((col, "is_null", None))
                return out
            if w == "between":
                i += 1
                lo, ok = _literal()
                if not ok or lo is None or _peek_word() != "and":
                    return None
                i += 1
                hi, ok = _literal()
                if not ok or hi is None:
                    return None
                out.append((col, ">=", lo))
                out.append((col, "<=", hi))
                return out
            return None
        # literal op ident (reversed comparison)
        lit, ok = _literal()
        if ok and lit is not None and i < len(toks) and toks[i][0] == "op":
            op = toks[i][1]
            if op in ("<>", "!="):
                return None
            i += 1
            col = _ident()
            if col is None:
                return None
            out.append((col, _FLIP["=" if op == "==" else op], lit))
            return out
        return None

    def _conj():
        nonlocal i
        out = []
        while True:
            if i < len(toks) and toks[i][0] == "lpar":
                i += 1
                inner = _conj()
                if inner is None or i >= len(toks) or toks[i][0] != "rpar":
                    return None
                i += 1
                out.extend(inner)
            else:
                term = _term()
                if term is None:
                    return None
                out.extend(term)
            if _peek_word() == "and":
                i += 1
                continue
            return out

    try:
        result = _conj()
    except (ValueError, OverflowError):  # pragma: no cover - defensive
        return None
    if result is None or i != len(toks) or not result:
        return None
    try:
        normalize_filters(result)
    except ValueError:
        return None
    return result


def _lt(a, b) -> bool:
    """Proven ``a < b`` — un-comparable pairs return False (never
    prune on a comparison that cannot be made)."""
    try:
        return a < b
    except TypeError:
        return False


def _le(a, b) -> bool:
    """Proven ``a <= b`` — order-proof or equality; mismatched-type
    ``==`` is False (not an exception), so this stays conservative."""
    if _lt(a, b):
        return True
    try:
        return bool(a == b)
    except TypeError:  # pragma: no cover - defensive; == rarely raises
        return False


def prune_by_bounds(
    op: str,
    value,
    lo,
    hi,
    *,
    null_count: int | None = None,
    num_records: int | None = None,
    nan_hidden: bool = False,
) -> bool:
    """True when the interval [lo, hi] of a file's NON-NULL values (plus
    the null counts, when known) PROVES no row satisfies ``col op value``.
    ``None`` bounds mean "unknown" and block the corresponding proof;
    min/max skip nulls, so an all-null file (null_count == numRecords)
    fails every value comparison regardless of the bounds.

    ``nan_hidden=True`` for float/double columns: parquet min/max stats
    EXCLUDE NaN while both engines order NaN greater than every value,
    so an upper bound can never disprove ``>``/``>=`` — a hidden NaN row
    would match. (NaN LITERALS stay safe automatically: every Python
    comparison against NaN is False, so no rule fires.)"""
    if op == "is_null":
        return null_count is not None and null_count == 0
    if op == "not_null":
        return (
            null_count is not None
            and num_records is not None
            and null_count >= num_records
        )
    if (
        null_count is not None
        and num_records is not None
        and null_count >= num_records
    ):
        return True  # no non-null values at all
    if nan_hidden and op in (">", ">="):
        return False
    if op == "in":
        # an empty IN list matches nothing: all() over [] prunes, which
        # is exactly SQL's x IN () = false
        return all(prune_by_bounds("=", v, lo, hi) for v in value)
    if op == "=":
        return (lo is not None and _lt(value, lo)) or (
            hi is not None and _lt(hi, value)
        )
    if op == "<":  # needs some x < value, possible only if lo < value
        return lo is not None and _le(value, lo)
    if op == "<=":
        return lo is not None and _lt(value, lo)
    if op == ">":
        return hi is not None and _le(hi, value)
    if op == ">=":
        return hi is not None and _lt(hi, value)
    raise ValueError(f"unknown op {op!r}")


def prune_by_point(
    op: str,
    value,
    point,
    *,
    string_ambiguous: bool = False,
) -> bool:
    """True when a single shared partition value PROVES no row matches —
    an identity-partitioned file where EVERY row's column equals
    ``point``, so boundary equality prunes too (``x < v`` on a file
    whose point == v matches nothing).

    ``point=None`` normally means every row is NULL. With
    ``string_ambiguous=True`` (hive-staged STRING partition columns) it
    may also mean every row is ``''`` — then both readings must prune."""
    if point is None:
        pruned_as_null = op != "is_null"
        if not string_ambiguous:
            return pruned_as_null
        return pruned_as_null and prune_by_point(op, value, "")
    if op == "is_null":
        return True  # a non-null point proves no row is NULL
    if op == "not_null":
        return False
    if op == "in":
        return all(prune_by_point("=", v, point) for v in value)
    if op == "=":
        # equality is only DISproven through the order — a type-
        # mismatched pair keeps the file instead of wrongly dropping it
        return _lt(point, value) or _lt(value, point)
    if op == "<":
        return _le(value, point)
    if op == "<=":
        return _lt(value, point)
    if op == ">":
        return _le(point, value)
    if op == ">=":
        return _lt(point, value)
    raise ValueError(f"unknown op {op!r}")


def double_space(x):
    """Map an exact bound/point (int, Decimal) into IEEE double space
    for comparison against a FLOAT literal — both engines evaluate such
    predicates after casting the column to double, so the skip decision
    must happen in the same (lossy, monotone non-decreasing) space or a
    boundary value prunes a row the residual would match (e.g.
    Decimal('0.1') < 0.1 exactly, but double(0.1dec) == 0.1). None and
    un-convertible values pass through; conversion failures keep."""
    import decimal as _decimal

    if isinstance(x, (int, _decimal.Decimal)) and not isinstance(x, bool):
        try:
            return float(x)
        except (OverflowError, ValueError):
            return None  # unknown bound — blocks the proof, never prunes
    return x


def prune_monotone(op: str, tvalue, lo, hi) -> bool:
    """True when a monotone non-decreasing transform's partition range
    [lo, hi] PROVES no row matches — the Iceberg inclusive projection:
    ``x < v`` implies ``t(x) <= t(v)``, so only ``hi/lo`` strictly past
    ``t(v)`` prunes; boundary equality never does (a day-partition equal
    to day(v) may still hold rows on either side of v). ``tvalue`` is
    the ALREADY-TRANSFORMED literal; ``op`` ``in`` takes a list of
    transformed elements. Null ops never reach here (the partition
    point/contains_null paths own them)."""
    if op == "in":
        return all(prune_monotone("=", tv, lo, hi) for tv in tvalue)
    if op == "=":
        return (lo is not None and _lt(tvalue, lo)) or (
            hi is not None and _lt(hi, tvalue)
        )
    if op in ("<", "<="):
        return lo is not None and _lt(tvalue, lo)
    if op in (">", ">="):
        return hi is not None and _lt(hi, tvalue)
    return False
