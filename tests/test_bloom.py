"""Bloom semi-join pruning: no false negatives, exact FP reproduction."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from global_seismic_data_pipeline_spark.operators import bloom

M_LOG2, K, SALT = 12, 4, "t"
M = 1 << M_LOG2


def _py_positions(key):
    hx = hashlib.md5(f"{key}|{SALT}".encode()).hexdigest()
    h1, h2 = int(hx[:15], 16), int(hx[16:31], 16)
    return [(h1 + i * h2) % M for i in range(K)]


def _py_bloom(keys):
    bits = set()
    for k in keys:
        bits.update(_py_positions(k))
    return bits


def _py_pass(key, bits):
    return all(p in bits for p in _py_positions(key))


def test_no_false_negatives_and_fp_match_python(spark):
    members = list(range(0, 200))
    probes = list(range(0, 1000))  # 200 members + 800 non-members
    dim = spark.createDataFrame([(k,) for k in members], "key long")
    fact = spark.createDataFrame([(k,) for k in probes], "key long")
    bm = bloom.build_bloom(dim, "key", m_log2=M_LOG2, k=K, salt=SALT)
    got = {
        r["key"]
        for r in bloom.bloom_prune(
            fact, bm, "key", m_log2=M_LOG2, k=K, salt=SALT
        ).collect()
    }
    assert set(members) <= got  # a bloom filter NEVER drops a member
    bits = _py_bloom(members)
    exp = {k for k in probes if _py_pass(k, bits)}
    assert got == exp  # false positives match the reference bit-for-bit
    # with n=200, m=4096, k=4 the FP rate is ~0.24%: a loose sanity bound
    assert len(got - set(members)) < 40


def test_bitmap_matches_python_reference(spark):
    members = ["a", "b", "c", "zz"]
    dim = spark.createDataFrame([(k,) for k in members], "key string")
    rows = bloom.build_bloom(dim, "key", m_log2=M_LOG2, k=K, salt=SALT).collect()
    got_bits = set()
    for r in rows:
        for b in range(32):
            if r["bits"] & (1 << b):
                got_bits.add(r["word"] * 32 + b)
    assert got_bits == _py_bloom(members)


def test_schema_preserved_and_dupes_kept(spark):
    dim = spark.createDataFrame([(1,)], "key long")
    fact = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z")], "key long, payload string"
    )
    bm = bloom.build_bloom(dim, "key", m_log2=M_LOG2, k=K, salt=SALT)
    out = bloom.bloom_prune(fact, bm, "key", m_log2=M_LOG2, k=K, salt=SALT)
    assert out.columns == ["key", "payload"]
    kept = {(r["key"], r["payload"]) for r in out.collect()}
    assert {(1, "x"), (1, "y")} <= kept  # duplicates of a member all pass


def test_validates_parameters(spark):
    df = spark.createDataFrame([(1,)], "key long")
    with pytest.raises(ValueError):
        bloom.build_bloom(df, "key", m_log2=40)
    with pytest.raises(ValueError):
        bloom.build_bloom(df, "key", k=0)
