"""PII scrubbing and URL normalization for training-data pipelines.

Both are pure map-side Catalyst expressions (regexp in the JVM, whole-stage
codegen, no Python, no shuffle) — the only shape that survives scrubbing a
100 TB corpus: the scan is the cost, everything else rides along.

Patterns are written in the common subset of Java regex (Spark) and RE2
(DuckDB): no lookarounds, no backreferences — so every operator here is
oracle-checkable verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: applied first to last. SSN before PHONE (both are digit-dash
# shapes; SSN's 3-2-4 grouping must not be half-eaten by the phone rule).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def redact_pii(
    df: DataFrame, *, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """Redact emails/SSNs/phones/IPv4s; count each kind before redaction.

    Adds ``n_<kind>`` count columns (long) and ``out_col`` with every match
    replaced by its placeholder. Counts are measured on the ORIGINAL text
    in one pass each; replacements chain in PII_PATTERNS order so an
    earlier rule's placeholder is never re-matched by a later rule
    (placeholders contain no digits/@)."""
    out = df
    for kind, pat, _ in PII_PATTERNS:
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        )
    clean: Column = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl)
    return out.withColumn(out_col, clean)


URL_PATTERN = r"[a-z][a-z0-9+.-]*://[^\s]+"
_HOST_FROM_URL = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"


def url_host(url: Column) -> Column:
    """Canonical host of a URL: authority, lower-cased, ``www.`` and any
    ``:port`` stripped. Empty string for non-URLs."""
    host = F.lower(F.regexp_extract(url, _HOST_FROM_URL, 1))
    host = F.regexp_replace(host, r":[0-9]+$", "")
    return F.regexp_replace(host, r"^www\.", "")


def url_strip_tracking(url: Column) -> Column:
    """Drop the query string and fragment — the standard canonicalization
    before URL-level dedup (tracking params make one page look like many)."""
    return F.regexp_extract(url, r"^([^?#]*)", 1)
