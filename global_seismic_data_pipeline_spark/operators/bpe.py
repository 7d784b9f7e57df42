"""Distributed byte-pair-encoding merge learning (Sennrich et al. 2016).

Learns the first K BPE merges of a corpus entirely as DataFrame algebra —
the core loop of every subword tokenizer trainer, expressed Spark-first:

- the corpus becomes (doc, word, pos, sym) CHARACTER ROWS (split →
  posexplode twice — the sanctioned row-generation path, never an
  HOF-array explode);
- each round counts adjacent symbol pairs with one lead() window + one
  partial-aggregated shuffle keyed by the pair, picks the global argmax
  (count DESC, pair ASC — deterministic), and applies the merge with
  greedy LEFTMOST semantics;
- greedy overlap resolution ("aaa" merges once, not twice) is the
  gaps-and-islands trick: among candidate rows of a word, islands are
  runs of consecutive row-numbers (overlap is only possible when the two
  halves are equal, which makes overlapping candidates rn-adjacent), and
  within an island every SECOND candidate merges, starting at the head;
- a merged row keeps the first half's pos and concatenates the symbols;
  the row consumed by a merge (the following rn) is deleted via lag().

Everything is exact string/integer work — no floats anywhere — so the
DuckDB oracle replicates all K rounds bit-for-bit from generated CTEs.

Scale shape: windows partition on (doc, word) — massively parallel,
skew-bounded by the longest word; the pair count is vocabulary-sized with
map-side combine; the argmax is a TakeOrdered(1). The chosen pair joins
back as a 1-row BROADCAST, never a shuffle. Each round's surviving rows
persist (MEMORY_AND_DISK) so round k+1 and the per-round audit counts
read round k once, not O(K²) recomputations. A production trainer runs
the same plan over a corpus SAMPLE (BPE statistics saturate quickly) and
loops K≈vocab times; the loop itself stays collect-free — the learned
merge table is only materialized at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .partitioning import ensure_parallelism
from .text import normalized

_PERSISTED: list[DataFrame] = []


def release_cached() -> int:
    n = len(_PERSISTED)
    for df in _PERSISTED:
        df.unpersist()
    _PERSISTED.clear()
    return n


def char_rows(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, w, pos, sym): one row per character of each normalized word."""
    words = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(normalized(F.col(text_col)), " ")).alias("w", "word"),
    )
    return words.select(
        "doc", "w", F.posexplode(F.split("word", "")).alias("pos", "sym")
    )


def _one_round(rows: DataFrame):
    """One BPE round: returns (chosen-pair DataFrame, rows after merge)."""
    ww = Window.partitionBy("doc", "w").orderBy("pos")
    r = rows.select(
        "doc",
        "w",
        "pos",
        "sym",
        F.row_number().over(ww).alias("rn"),
        F.lead("sym").over(ww).alias("nxt"),
    )
    top = (
        r.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("sym").alias("a"), F.col("nxt").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(1)
    )
    m = r.crossJoin(F.broadcast(top)).withColumn(
        "is_cand", (F.col("sym") == F.col("a")) & (F.col("nxt") == F.col("b"))
    )
    wc = Window.partitionBy("doc", "w", "is_cand").orderBy("rn")
    g = m.withColumn(
        "isl", F.when(F.col("is_cand"), F.col("rn") - F.row_number().over(wc))
    )
    wi = Window.partitionBy("doc", "w", "isl")
    k = g.withColumn(
        "do_merge",
        F.col("is_cand") & (((F.col("rn") - F.min("rn").over(wi)) % 2) == 0),
    )
    ww2 = Window.partitionBy("doc", "w").orderBy("rn")
    d = k.withColumn("prev_merge", F.lag("do_merge").over(ww2))
    nxt_rows = (
        d.filter(~F.coalesce(F.col("prev_merge"), F.lit(False)))
        .select(
            "doc",
            "w",
            "pos",
            F.when(F.col("do_merge"), F.concat("sym", "nxt"))
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _PERSISTED.append(nxt_rows)
    return top, nxt_rows


def learn_merges(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Learn the first ``k`` merges; returns one audit row per round:
    (step, merged_pair 'a b', pair_count, symbols_after) — pair_count is
    the pre-merge adjacent-pair count (overlaps included, the standard
    BPE statistic); symbols_after pins the APPLY step, not just the
    counting."""
    rows = ensure_parallelism(char_rows(docs, id_col=id_col, text_col=text_col))
    out = None
    for step in range(1, k + 1):
        top, rows = _one_round(rows)
        n_after = rows.select(F.count(F.lit(1)).alias("symbols_after"))
        audit = top.crossJoin(n_after).select(
            F.lit(step).cast("long").alias("step"),
            F.concat_ws(" ", "a", "b").alias("merged_pair"),
            F.col("cnt").cast("long").alias("pair_count"),
            F.col("symbols_after").cast("long").alias("symbols_after"),
        )
        out = audit if out is None else out.unionByName(audit)
    return out
