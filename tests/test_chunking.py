"""Context-window chunking vs a pure-Python sliding-window reference."""

from __future__ import annotations

import pytest

from global_seismic_data_pipeline_spark.operators.chunking import chunk_tokens


def _py_chunks(text, L, S, min_tokens):
    ws = text.lower().split()
    out = {}
    c = 0
    while c * S < len(ws):
        win = ws[c * S : c * S + L]
        if len(win) >= min_tokens:
            out[c] = (len(win), " ".join(win))
        c += 1
    return out


def _got(df):
    return {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
        for r in df.collect()
    }


@pytest.mark.parametrize("L,S,mn", [(8, 8, 1), (8, 4, 1), (8, 3, 4), (5, 5, 5)])
def test_matches_python_reference(spark, L, S, mn):
    docs = [
        (1, " ".join(f"w{i}" for i in range(23))),
        (2, " ".join(f"t{i}" for i in range(8))),   # exactly one window
        (3, "a b c"),                                # shorter than L
        (4, "solo"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = _got(chunk_tokens(df, chunk_len=L, stride=S, min_tokens=mn))
    exp = {
        (d, c): v
        for d, text in docs
        for c, v in _py_chunks(text, L, S, mn).items()
    }
    assert got == exp


def test_overlap_shares_boundary_tokens(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10)))], "doc_id long, text string"
    )
    got = _got(chunk_tokens(df, chunk_len=6, stride=3, min_tokens=3))
    # chunk 0 = w0..w5, chunk 1 = w3..w8, chunk 2 = w6..w9
    assert got[(1, 0)][1].endswith("w3 w4 w5")
    assert got[(1, 1)][1] == "w3 w4 w5 w6 w7 w8"
    assert got[(1, 2)][1] == "w6 w7 w8 w9"


def test_validates_parameters(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_tokens(df, chunk_len=0)
    with pytest.raises(ValueError):
        chunk_tokens(df, chunk_len=4, stride=5)
    with pytest.raises(ValueError):
        chunk_tokens(df, chunk_len=4, stride=2, min_tokens=9)


from hypothesis import HealthCheck, given, settings, strategies as st


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.data(),
    n_words=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=5),
)
def test_property_matches_reference(spark, data, n_words):
    L = data.draw(st.integers(min_value=1, max_value=12))
    S = data.draw(st.integers(min_value=1, max_value=L))
    mn = data.draw(st.integers(min_value=1, max_value=L))
    docs = [
        (i, " ".join(f"w{j}" for j in range(k))) for i, k in enumerate(n_words)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = _got(chunk_tokens(df, chunk_len=L, stride=S, min_tokens=mn))
    exp = {
        (d, c): v
        for d, text in docs
        for c, v in _py_chunks(text, L, S, mn).items()
    }
    assert got == exp
