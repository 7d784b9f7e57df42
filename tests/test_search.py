"""BM25 search (operators/search.py): hand-computed scores on a tiny
corpus, ranking semantics, and input validation. Cross-engine bit-equality
is covered by the DuckDB oracle gate."""

import math

import pytest

from global_seismic_data_pipeline_spark.operators import search


def _mini_corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark spark shuffle join"),
            (2, "join join join filter"),
            (3, "filter scan scan scan scan scan"),
            (4, "spark"),
        ],
        "doc_id long, text string",
    )


def _bm25_ref(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in docs}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s = 0.0
        hit = 0
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            hit += 1
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if hit:
            out[i] = (round(s, 4), hit, len(v))
    return out


def test_scores_match_reference(spark):
    docs = [
        (1, "spark spark shuffle join"),
        (2, "join join join filter"),
        (3, "filter scan scan scan scan scan"),
        (4, "spark"),
    ]
    terms = ["spark", "join"]
    expected = _bm25_ref(docs, terms)
    rows = search.bm25_topk(_mini_corpus(spark), terms, k=10).collect()
    got = {r.doc_id: (r.score, r.n_terms_matched, r.dl) for r in rows}
    assert got == pytest.approx(expected)
    search.release_cached()


def test_topk_order_and_cutoff(spark):
    rows = search.bm25_topk(_mini_corpus(spark), ["spark", "join"], k=2).collect()
    assert len(rows) == 2
    # doc 4 ("spark" alone, shortest doc) outranks everything on idf-weighted
    # length normalization; verify descending order with deterministic ties
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    search.release_cached()


def test_unmatched_docs_excluded(spark):
    rows = search.bm25_topk(_mini_corpus(spark), ["shuffle"], k=10).collect()
    assert [r.doc_id for r in rows] == [1]
    search.release_cached()


def test_validation(spark):
    with pytest.raises(ValueError):
        search.bm25_topk(_mini_corpus(spark), [])
    with pytest.raises(ValueError):
        search.bm25_topk(_mini_corpus(spark), ["a", "a"])
