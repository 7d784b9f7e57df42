"""Context-window chunking: documents → fixed-token-length training chunks.

Every pretraining pipeline slices documents into model-context-sized token
windows, usually with overlap (stride < chunk length) so no boundary
context is lost. This is the chunking sibling of shard packing
(operators/sampling.py): packing groups whole docs into budgets; chunking
splits docs into windows.

Spark-first shape — tokens are generated as ROWS (split → posexplode, the
sanctioned path; never explode an HOF-built array, see the neardup module
docstring), each token row is replicated to the ≤ ceil(L/S) chunks whose
window covers it (same bounded-replication trick as the range join's time
bins), and chunks reassemble with one partial-aggregated shuffle keyed by
(doc, chunk). Work is linear in corpus size × the overlap factor; skew is
bounded by the longest single document.

Chunk c of a doc covers token positions [c·S, c·S + L): token p belongs to
chunks ceil((p−L+1)/S) … floor(p/S) (clamped at 0). All position math is
integer; the ceil-div uses the nonnegative-numerator identity
(p−L+S) div S, valid because the lower bound is clamped to 0 whenever
p < L.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import token_rows


def chunk_tokens(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_len: int,
    stride: int | None = None,
    min_tokens: int = 1,
) -> DataFrame:
    """(id, chunk_id, n_tokens, chunk_text) rows of L-token windows every
    S tokens over the normalized text.

    ``stride=None`` (→ ``chunk_len``) gives non-overlapping chunks; a
    smaller stride overlaps adjacent chunks by ``chunk_len - stride``
    tokens. Trailing chunks shorter than ``min_tokens`` are dropped
    (a model can't use a 2-token window; the tokens are already covered
    by the previous overlapping chunk when stride < chunk_len).
    """
    if chunk_len <= 0:
        raise ValueError("chunk_len must be positive")
    stride = chunk_len if stride is None else stride
    if not 0 < stride <= chunk_len:
        raise ValueError("stride must be in (0, chunk_len]")
    if min_tokens > chunk_len:
        raise ValueError("min_tokens cannot exceed chunk_len")

    toks = token_rows(df, id_col=id_col, text_col=text_col)
    p = F.col("pos")
    c_lo = F.when(p < chunk_len, F.lit(0)).otherwise(
        F.expr(f"(pos - {chunk_len} + {stride}) div {stride}")
    )
    c_hi = F.expr(f"pos div {stride}")
    with_chunk = toks.withColumn(
        "chunk_id", F.explode(F.sequence(c_lo, c_hi))
    )
    return (
        with_chunk.groupBy(id_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("tok")))
            ).alias("__ordered"),
        )
        .where(F.col("n_tokens") >= min_tokens)
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            "n_tokens",
            F.array_join(
                F.transform(F.col("__ordered"), lambda s: s["tok"]), " "
            ).alias("chunk_text"),
        )
    )
