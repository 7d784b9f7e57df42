"""PII scrubbing, URL normalization, repetition stats, stratified sampling."""

import pytest
from pyspark.sql import functions as F

from global_seismic_data_pipeline_spark.operators import sampling, scrub, text


def test_redact_pii_all_kinds(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@sub.example.org then 555-123-4567 or 10.0.0.1 ssn 123-45-6789"),
         (2, "no pii here at all"),
         (3, "two mails x@y.io and z@w.co")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in scrub.redact_pii(df).collect()}
    r1 = out[1]
    assert (r1.n_email, r1.n_phone, r1.n_ipv4, r1.n_ssn) == (1, 1, 1, 1)
    assert r1.clean_text == "mail <EMAIL> then <PHONE> or <IP> ssn <SSN>"
    assert out[2].clean_text == "no pii here at all"
    assert out[3].n_email == 2 and out[3].clean_text == "two mails <EMAIL> and <EMAIL>"


def test_redact_pii_ssn_not_eaten_by_phone(spark):
    df = spark.createDataFrame([(1, "987-65-4321 vs 987-654-4321")], "doc_id long, text string")
    r = scrub.redact_pii(df).first()
    assert r.n_ssn == 1 and r.n_phone == 1
    assert r.clean_text == "<SSN> vs <PHONE>"


def test_url_host_and_strip(spark):
    df = spark.createDataFrame(
        [(1, "https://www.example.com:8080/a/b?q=1#f"),
         (2, "http://sub.host.org/x"),
         (3, "not a url")],
        "doc_id long, url string",
    )
    out = {r.doc_id: r for r in df.select(
        "doc_id",
        scrub.url_host(F.col("url")).alias("host"),
        scrub.url_strip_tracking(F.col("url")).alias("clean"),
    ).collect()}
    assert out[1].host == "example.com"
    assert out[1].clean == "https://www.example.com:8080/a/b"
    assert out[2].host == "sub.host.org"
    assert out[3].host == ""


def test_repetition_stats_flags_repetitive_doc(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam ham"),
         (2, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.repetition_stats(df).collect()}
    r1 = out[1]
    assert r1.total_tokens == 7 and r1.distinct_tokens == 2
    assert r1.top_token_cnt == 6
    assert r1.total_bigrams == 6 and r1.top_bigram_cnt == 5  # 'spam spam' x5
    assert r1.dup_token_frac == pytest.approx(1 - 2 / 7)
    assert r1.top_bigram_frac == pytest.approx(5 / 6)
    assert r1.keep == 0
    r2 = out[2]
    assert r2.dup_token_frac == 0.0 and r2.keep == 1


def test_repetition_stats_single_token_doc(spark):
    df = spark.createDataFrame([(1, "lonely")], "doc_id long, text string")
    r = text.repetition_stats(df).first()
    assert r.total_tokens == 1 and r.total_bigrams == 0
    assert r.top_bigram_frac == 0.0 and r.keep == 1


def test_corpus_top_ngrams_counts_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b c x y z")], "doc_id long, text string"
    )
    rows = text.corpus_top_ngrams(df, n=3, k=3).collect()
    assert [(r.ngram, r.n) for r in rows] == [
        ("a b c", 3),  # doc1 twice + doc2 once
        ("b c a", 1),  # count-1 ties resolve lexicographically
        ("b c x", 1),
    ]


def test_stratified_sample_rates_and_determinism(spark):
    rows = [(i, "en" if i % 2 == 0 else "xx") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.stratified_sample(
        df, strata_col="lang", key_col="doc_id",
        rates={"en": 0.5}, default_rate=0.1, salt="t",
    )
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["en"] == pytest.approx(500, abs=80)
    assert counts["xx"] == pytest.approx(100, abs=50)
    # deterministic: identical second evaluation
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(r.doc_id for r in out.collect())
    assert ids1 == ids2


def test_stratified_sample_rate_one_keeps_all(spark):
    df = spark.createDataFrame([(i, "fr") for i in range(100)], "doc_id long, lang string")
    out = sampling.stratified_sample(
        df, strata_col="lang", key_col="doc_id", rates={"fr": 1.0}
    )
    assert out.count() == 100


def test_rate_bound_edges():
    assert sampling.rate_bound(0.0) == "00000000"
    assert sampling.rate_bound(0.5) == "80000000"
    assert sampling.rate_bound(1.0) == "gggggggg"
    with pytest.raises(ValueError):
        sampling.rate_bound(1.5)
