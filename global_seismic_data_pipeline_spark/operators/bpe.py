"""Distributed byte-pair-encoding merge learning (Sennrich et al. 2016).

Learns the first K BPE merges of a corpus entirely as DataFrame algebra —
the core loop of every subword tokenizer trainer, expressed Spark-first:

- the corpus becomes (doc, word, pos, sym) CHARACTER ROWS (split →
  posexplode twice — the sanctioned row-generation path, never an
  HOF-array explode);
- the engine maintains STATE = char rows with their (rn, nxt) adjacency
  precomputed, plus a persisted vocabulary-sized pair-count table; each
  round picks the global argmax from the count table (count DESC, pair
  ASC — deterministic) and applies the merge with greedy LEFTMOST
  semantics;
- **adaptive delta-recount**: only words CONTAINING the chosen pair can
  change any pair count. When the chosen pair is RARE (occurrences /
  total WORDS — the affected-word fraction, NOT the symbol fraction,
  which under-routes; below ``delta_threshold``) the round (a) splits state
  into affected words (broadcast semi-join on the candidate word keys)
  and untouched words, (b) re-windows ONLY the affected rows, and
  (c) updates the count table by subtracting the affected words'
  pre-merge pair counts and adding their post-merge counts — the
  classic BPE trainer optimization, and the regime every round after
  the early head merges lives in (K≈vocab-size training). When the
  pair is FREQUENT (the first few merges: "e "-class pairs sitting in
  most words) the affected set ≈ the corpus, so the same round runs as
  a plain full re-window + full recount — measured here, forcing delta
  on a head merge is 3.6× SLOWER than full (broadcasting ~all word
  keys twice), which is why the routing is adaptive, not
  always-delta. The routing statistic comes from the argmax row — a
  one-row control-plane collect per round;
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
skew-bounded by the longest word — and after round 1 they run over the
affected-word subset only. The pair-count table is vocabulary-sized with
map-side combine; the argmax is a TakeOrdered(1). The chosen pair and
the affected word-key set join back as BROADCASTs, so untouched state
rows are filtered map-side, never shuffled. Each round's state persists
(MEMORY_AND_DISK) so round k+1 reads round k once, not O(K²)
recomputations. The affected-key broadcast is only taken on rare pairs
(the adaptive routing above), so it fits the broadcast budget by
construction. A production trainer runs the same plan over a corpus
SAMPLE (BPE statistics saturate quickly) and loops K≈vocab times; the
per-round driver work is one argmax row + one count — control-plane,
never per-row data.
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


def _with_adjacency(rows: DataFrame) -> DataFrame:
    """Attach the per-word (rn, nxt) adjacency columns — the ONLY full-
    corpus window of the whole trainer (round 1); later rounds re-window
    affected words only."""
    ww = Window.partitionBy("doc", "w").orderBy("pos")
    return rows.select(
        "doc",
        "w",
        "pos",
        "sym",
        F.row_number().over(ww).alias("rn"),
        F.lead("sym").over(ww).alias("nxt"),
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    """Adjacent-pair counts (overlaps included — the standard BPE
    statistic) from the stored adjacency, no window needed."""
    return (
        state.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("sym").alias("a"), F.col("nxt").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _persist(df: DataFrame) -> DataFrame:
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED.append(df)
    return df


def _checkpoint(df: DataFrame) -> DataFrame:
    """Persist AND truncate lineage. A delta round references the previous
    state several times (candidate keys, semi, anti), so without
    truncation the logical plan grows ~4× per round — exponential in K
    (measured: a 2 GiB plan string by round 4). localCheckpoint cuts the
    plan at the materialized data, the standard move for iterative Spark
    algorithms (Pregel/GraphX do the same); production would point
    ``sparkContext.setCheckpointDir`` at reliable storage and use
    ``checkpoint()`` to survive executor loss."""
    df = df.localCheckpoint(eager=False)
    _PERSISTED.append(df)
    return df


def _apply_merge(rows: DataFrame, a: str, b: str) -> DataFrame:
    """Greedy leftmost merge of pair (a, b) over ``rows`` (must carry rn
    and nxt): gaps-and-islands overlap resolution, consumed rows deleted
    via lag; returns rows with FRESH adjacency for the surviving symbols."""
    r = rows.withColumn(
        "is_cand", (F.col("sym") == F.lit(a)) & (F.col("nxt") == F.lit(b))
    )
    wc = Window.partitionBy("doc", "w", "is_cand").orderBy("rn")
    g = r.withColumn(
        "isl", F.when(F.col("is_cand"), F.col("rn") - F.row_number().over(wc))
    )
    wi = Window.partitionBy("doc", "w", "isl")
    k = g.withColumn(
        "do_merge",
        F.col("is_cand") & (((F.col("rn") - F.min("rn").over(wi)) % 2) == 0),
    )
    ww2 = Window.partitionBy("doc", "w").orderBy("rn")
    d = k.withColumn("prev_merge", F.lag("do_merge").over(ww2))
    return _with_adjacency(
        d.filter(~F.coalesce(F.col("prev_merge"), F.lit(False))).select(
            "doc",
            "w",
            "pos",
            F.when(F.col("do_merge"), F.concat("sym", "nxt"))
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
    )


def _full_round(state: DataFrame, counts: DataFrame, a: str, b: str):
    """Frequent-pair round: merge + recount over the whole corpus (the
    delta bookkeeping would touch ~every word anyway). Plain persist: a
    full round references state ONCE, so lineage grows linearly — only
    the multi-reference delta rounds need the checkpoint truncation."""
    next_state = _persist(_apply_merge(state, a, b))
    next_counts = _persist(_pair_counts(next_state))
    return next_state, next_counts


def _delta_round(state: DataFrame, counts: DataFrame, a: str, b: str):
    """Rare-pair round: only words containing (a, b) are re-windowed and
    re-counted; every other word's rows and pair counts carry over."""
    cand_keys = _persist(
        state.filter(
            (F.col("sym") == F.lit(a)) & (F.col("nxt") == F.lit(b))
        )
        .select("doc", "w")
        .distinct()
    )
    affected = _persist(
        state.join(F.broadcast(cand_keys), ["doc", "w"], "left_semi")
    )
    untouched = state.join(F.broadcast(cand_keys), ["doc", "w"], "left_anti")

    merged = _persist(_apply_merge(affected, a, b))

    # counts' = counts - pairs(affected, pre-merge) + pairs(affected, post)
    sub = _pair_counts(affected).withColumn("cnt", -F.col("cnt"))
    add = _pair_counts(merged)
    next_counts = _checkpoint(
        counts.unionByName(sub)
        .unionByName(add)
        .groupBy("a", "b")
        .agg(F.sum("cnt").alias("cnt"))
        .filter(F.col("cnt") > 0)
    )
    next_state = _checkpoint(untouched.unionByName(merged))
    return next_state, next_counts


def learn_merges(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    delta_threshold: float = 0.02,
) -> DataFrame:
    """Learn the first ``k`` merges; returns one audit row per round:
    (step, merged_pair 'a b', pair_count, symbols_after) — pair_count is
    the pre-merge adjacent-pair count (overlaps included, the standard
    BPE statistic); symbols_after pins the APPLY step, not just the
    counting.

    Routing: ``cnt / n_words`` upper-bounds the affected-WORD fraction
    (each occurrence sits in one word; words are never created or
    destroyed, so n_words is computed once). A round whose chosen pair
    can touch at most ``delta_threshold`` of the words runs the
    delta-recount path; otherwise the full path — the delta machinery
    (key broadcast + split + count maintenance) only wins when the
    untouched majority is large. ``0.0`` forces full every round,
    ``inf``/large forces delta — both used by the equivalence tests."""
    rows = ensure_parallelism(char_rows(docs, id_col=id_col, text_col=text_col))
    state = _persist(_with_adjacency(rows))
    counts = _persist(_pair_counts(state))
    # word population: one count of the rn==1 rows (every word has
    # exactly one), computed once — the denominator of the routing test
    n_words = state.filter(F.col("rn") == 1).count()
    audit = []
    for step in range(1, k + 1):
        # one-row control-plane collect: the argmax pair + its count
        top = counts.orderBy(
            F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc()
        ).limit(1).collect()
        if not top:
            break  # corpus exhausted (every word a single symbol)
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        if n_words and cnt < delta_threshold * n_words:
            state, counts = _delta_round(state, counts, a, b)
        else:
            state, counts = _full_round(state, counts, a, b)
        n_syms = state.count()
        audit.append((step, f"{a} {b}", cnt, n_syms))
    return docs.sparkSession.createDataFrame(
        audit,
        "step long, merged_pair string, pair_count long, symbols_after long",
    )


def encode_with_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> DataFrame:
    """The ENCODE side of BPE: tokenize a corpus with an already-learned
    ordered merge list — what a training pipeline runs daily once the
    tokenizer is frozen (``learn_merges`` is the train-once step).

    Applying the merges SEQUENTIALLY in rank order is exactly
    subword-nmt's iterate-on-the-min-rank-present-pair encoder: a pair
    that only exists because of a merge (e.g. ('x','ab') after 'ab'
    forms) cannot have an earlier rank than the merge that created its
    half — it wasn't countable before — so by the time rank r applies,
    no pair of rank < r can be present. Each round reuses the trainer's
    ``_apply_merge`` (greedy-leftmost gaps-and-islands overlap
    resolution), which also makes encode-vs-train agreement a theorem:
    encoding the training corpus with its own first k merges reproduces
    the trainer's round-k state row-for-row (pinned in pytest).

    Returns (id, n_tokens, tokens) — tokens is the space-joined symbol
    sequence, CSV-flat per the checker's scalar-columns contract.

    Scale shape: one full-corpus window (initial adjacency), then one
    bounded (doc, word)-partitioned window chain per merge; state
    persists per round and lineage truncates every ``checkpoint_every``
    rounds (single-reference rounds grow the plan linearly — the
    module-docstring exponential hazard only bites multi-reference
    delta rounds). No collects anywhere: the merge list is an input,
    not something read back from the cluster."""
    rows = ensure_parallelism(
        char_rows(docs, id_col=id_col, text_col=text_col)
    )
    state = _persist(_with_adjacency(rows))
    for i, (a, b) in enumerate(merges, 1):
        nxt = _apply_merge(state, a, b)
        state = (
            _checkpoint(nxt) if i % checkpoint_every == 0 else _persist(nxt)
        )
    return state.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("w", "pos", "sym"))),
                lambda s: s["sym"],
            ),
        ).alias("tokens"),
    ).select(
        F.col("doc").alias(id_col), "n_tokens", "tokens"
    )
