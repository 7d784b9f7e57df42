"""HTML → text extraction — the WET-style "strip the markup" step every
web-scale training-data pipeline runs before any quality filtering
(CommonCrawl WET files, CCNet, C4 and RefinedWeb all start from it).

All stages are native Catalyst regexp/replace expressions (JVM-side,
whole-stage codegen — no Python boundary), and every pattern is written
for the RE2 ∩ Java regex subset so the DuckDB oracle replays the chain
bit-for-bit: no backreferences (script and style blocks are removed in
separate passes rather than via ``</\\1>``), no lookaround, inline
``(?is)`` flags only.

Stage order matters and is part of the contract:

1. ``<script>…</script>`` then ``<style>…</style>`` blocks (content
   removed — it is code, not prose),
2. ``<!-- comments -->`` (may contain markup that must not survive),
3. ``<title>`` text captured for the side channel, then the whole
   element removed (it is metadata, not prose — leaving it would
   prepend every page title to the body text),
4. every remaining ``<…>`` tag → space,
5. named entities decoded — ``&amp;`` LAST, so ``&amp;lt;`` decodes to
   the literal text ``&lt;`` exactly like ``html.unescape``; ``&nbsp;``
   becomes a plain space (this is a cleaning pipeline, not a renderer),
6. whitespace collapsed + trimmed.

Numeric entities other than ``&#39;`` are left as-is (decoding arbitrary
code points cross-engine is not portable); they survive into the text
and are the caller's signal to route a document to a heavier decoder.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCRIPT = r"(?is)<script\b[^>]*>.*?</script\s*>"
_STYLE = r"(?is)<style\b[^>]*>.*?</style\s*>"
_COMMENT = r"(?s)<!--.*?-->"
_TITLE = r"(?is)<title[^>]*>(.*?)</title\s*>"
_TITLE_BLOCK = r"(?is)<title[^>]*>.*?</title\s*>"
_TAG = r"<[^>]*>"
_ENTITY = r"&(?:amp|lt|gt|quot|apos|nbsp|#39);"

# (pattern, replacement) applied with plain (non-regex) replace, in
# order — ``&amp;`` must be last (see module docstring).
_DECODE = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def _decode_entities(c: Column) -> Column:
    for pat, rep in _DECODE:
        c = F.replace(c, F.lit(pat), F.lit(rep))
    return c


def _squeeze(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def html_to_text(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    html_col: str = "text",
    out_col: str = "clean_text",
) -> DataFrame:
    """Strip markup from an HTML column: one row per input document with
    ``title`` (decoded <title> text, '' when absent), ``out_col`` (the
    extracted prose), and audit counters ``n_blocks`` (script + style +
    comment blocks removed), ``n_tags`` (remaining tags stripped) and
    ``n_entities`` (named entities decoded).

    Plain text passes through unchanged (modulo whitespace collapse), so
    the operator is safe to run over a mixed corpus without routing.

    Shape at 100 TB: a pure map-side projection — no shuffle, no join,
    no UDF; cost is a handful of regexp passes inside one codegen stage
    over the scan."""
    t = F.coalesce(F.col(html_col), F.lit(""))
    no_script = F.regexp_replace(t, _SCRIPT, " ")
    no_style = F.regexp_replace(no_script, _STYLE, " ")
    no_comment = F.regexp_replace(no_style, _COMMENT, " ")
    no_title = F.regexp_replace(no_comment, _TITLE_BLOCK, " ")
    stripped = F.regexp_replace(no_title, _TAG, " ")
    return df.select(
        id_col,
        _squeeze(
            _decode_entities(F.regexp_extract(no_comment, _TITLE, 1))
        ).alias("title"),
        _squeeze(_decode_entities(stripped)).alias(out_col),
        (
            F.regexp_count(t, F.lit(_SCRIPT))
            + F.regexp_count(no_script, F.lit(_STYLE))
            + F.regexp_count(no_style, F.lit(_COMMENT))
        )
        .cast("long")
        .alias("n_blocks"),
        F.regexp_count(no_title, F.lit(_TAG)).cast("long").alias("n_tags"),
        F.regexp_count(stripped, F.lit(_ENTITY))
        .cast("long")
        .alias("n_entities"),
    )
