"""ngram_duplication_rate + unigram_lm_surprisal on hand-built corpora."""

from __future__ import annotations

import pytest

from global_seismic_data_pipeline_spark.operators import text


def _rows(out, key="doc_id"):
    return {r[key]: r.asDict() for r in out.collect()}


def test_ngram_dup_rate_cross_doc_and_unique(spark):
    # A and B share every 5-gram; C is fully unique.
    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d e f"),
            (3, "p q r s t u v"),
        ],
        ["doc_id", "text"],
    )
    got = _rows(text.ngram_duplication_rate(df, n=5))
    assert got[1]["total_ngrams"] == 2  # "a b c d e", "b c d e f"
    assert got[1]["dup_ngrams"] == 2
    assert got[1]["cross_dup_ngrams"] == 2
    assert got[1]["dup_frac"] == 1.0
    assert got[1]["keep"] == 0
    assert got[2] == got[1] | {"doc_id": 2}
    assert got[3]["total_ngrams"] == 3
    assert got[3]["dup_ngrams"] == 0
    assert got[3]["cross_dup_ngrams"] == 0
    assert got[3]["keep"] == 1


def test_ngram_dup_rate_within_doc_repeat_not_cross(spark):
    # One doc repeating its own phrase: dup_ngrams counts the repeated
    # occurrences (corpus total >= 2) but cross_dup stays 0.
    df = spark.createDataFrame(
        [(1, "x y z w v x y z w v"), (2, "alpha beta gamma delta eps zeta")],
        ["doc_id", "text"],
    )
    got = _rows(text.ngram_duplication_rate(df, n=5))
    # tokens: x y z w v x y z w v -> 6 overlapping 5-grams; the two
    # "x y z w v" occurrences (positions 1 and 6) are the only gram seen
    # twice.
    assert got[1]["total_ngrams"] == 6
    assert got[1]["dup_ngrams"] == 2
    assert got[1]["cross_dup_ngrams"] == 0
    assert got[2]["dup_ngrams"] == 0


def test_ngram_dup_rate_short_docs_dropped(spark):
    df = spark.createDataFrame(
        [(1, "too short"), (2, "one two three four five")], ["doc_id", "text"]
    )
    got = _rows(text.ngram_duplication_rate(df, n=5))
    assert set(got) == {2}
    assert got[2]["total_ngrams"] == 1


def test_ngram_dup_keep_is_integer_threshold(spark):
    # 10 grams, 3 duplicated -> dup*10 == total*3 exactly: keep (<=).
    base = [f"t{i}" for i in range(14)]  # 10 overlapping 5-grams
    doc1 = " ".join(base)
    # duplicate the first three 5-grams of doc1 inside doc2 without
    # creating extra shared grams: separate them with unique fillers.
    g0, g1, g2 = (
        " ".join(base[0:5]),
        " ".join(base[1:6]),
        " ".join(base[2:7]),
    )
    doc2 = f"{g0} u1 u2 u3 u4 {g1} u5 u6 u7 u8 {g2}"
    df = spark.createDataFrame([(1, doc1), (2, doc2)], ["doc_id", "text"])
    got = _rows(text.ngram_duplication_rate(df, n=5, max_dup_num=3, max_dup_den=10))
    assert got[1]["total_ngrams"] == 10
    assert got[1]["cross_dup_ngrams"] == 3
    assert got[1]["dup_ngrams"] == 3
    assert got[1]["keep"] == 1  # 3*10 <= 10*3 boundary is a keep
    # tighten the threshold one notch below the boundary: now dropped
    got2 = _rows(
        text.ngram_duplication_rate(df, n=5, max_dup_num=29, max_dup_den=100)
    )
    assert got2[1]["keep"] == 0


def _surprisal_reference(docs: dict[int, str], min_bits=2, max_bits=12):
    """Independent Python reference for the integer-log2 unigram score."""
    from collections import Counter

    tfs = {d: Counter(t.split()) for d, t in docs.items()}
    uni: Counter = Counter()
    for c in tfs.values():
        uni.update(c)
    n_total = sum(uni.values())
    q = {tok: len(bin(n_total // cnt)) - 2 for tok, cnt in uni.items()}
    out = {}
    for d, c in tfs.items():
        n = sum(c.values())
        s = sum(tf * q[tok] for tok, tf in c.items())
        out[d] = {
            "n_tokens": n,
            "surprisal_sum": s,
            "bits_per_token": s / n,
            "keep": int(min_bits * n <= s <= max_bits * n),
        }
    return out


def test_unigram_surprisal_matches_python_reference(spark):
    docs = {
        1: "the the the cat sat on the mat",
        2: "quantum chromodynamics flux lattice",
        3: "the cat and the dog",
    }
    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    got = _rows(text.unigram_lm_surprisal(df))
    ref = _surprisal_reference(docs)
    for d in docs:
        for k, v in ref[d].items():
            assert got[d][k] == v, (d, k, got[d], ref[d])


def test_unigram_surprisal_tails_flagged(spark):
    # A doc made only of the corpus's dominant token scores ~1 bit/token
    # (too predictable -> dropped by min_bits=2); normal docs kept.
    common = " ".join(["hello"] * 50)
    df = spark.createDataFrame(
        [(1, common), (2, "some normal mixed words here today"),
         (3, "other plain sentence with several words")],
        ["doc_id", "text"],
    )
    got = _rows(text.unigram_lm_surprisal(df))
    assert got[1]["keep"] == 0
    assert got[1]["bits_per_token"] < 2
    assert got[2]["keep"] == 1 and got[3]["keep"] == 1


def test_trimmed_mean_ignores_tail_outliers(spark):
    # 20 values of 10.00 plus one absurd outlier: 5% trim drops exactly
    # the outlier (and the lowest value), leaving the mean at 10.00
    from pyspark.sql import functions as F

    from global_seismic_data_pipeline_spark.plans.workloads_ext import (
        trimmed_mean_cents,
    )

    rows = [("A", i, 1, 10.00) for i in range(20)] + [("A", 99, 1, 9e6)]
    df = spark.createDataFrame(
        rows, ["l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"]
    ).select(
        "l_returnflag", "l_orderkey", "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    out = trimmed_mean_cents(
        df,
        group_col="l_returnflag",
        cents_col="cents",
        order_cols=["l_orderkey", "l_linenumber"],
    ).collect()[0]
    assert out["trimmed_mean"] == 10.0
    assert out["n_kept"] == 19  # 21 rows, lo = 1: drops 1 low + 1 high
    assert out["n_rows"] == 21


def test_boilerplate_line_dedup(spark):
    """Lines in >= min_docs distinct docs vanish everywhere, order and
    duplicate occurrences of surviving lines are preserved, a fully-
    boilerplate doc stays as an empty row, and same-doc repetition does
    not count toward the document frequency."""
    from global_seismic_data_pipeline_spark.operators.text import (
        boilerplate_line_dedup,
    )

    docs = spark.createDataFrame(
        [
            (1, "keep one\ncookie banner\nkeep one\nunique a"),
            (2, "cookie banner\nunique b"),
            (3, "cookie banner\nunique c"),
            # doc 4 repeats a line 3x in ITSELF — df is per-doc distinct,
            # so "self spam" must NOT be flagged at min_docs=3
            (4, "self spam\nself spam\nself spam"),
            (5, "cookie banner"),
        ],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: (r.text, r.lines_removed)
        for r in boilerplate_line_dedup(docs, min_docs=3).collect()
    }
    assert out[1] == ("keep one\nkeep one\nunique a", 1)  # order + dup kept
    assert out[2] == ("unique b", 1)
    assert out[3] == ("unique c", 1)
    assert out[4] == ("self spam\nself spam\nself spam", 0)
    assert out[5] == ("", 1)  # fully-boilerplate doc survives as a row

    # threshold binds: at min_docs=2 nothing changes for unique docs but
    # the banner still dies; at a high threshold nothing is removed
    none = boilerplate_line_dedup(docs, min_docs=99).collect()
    assert all(r.lines_removed == 0 for r in none)

    # custom delimiter
    pipe = spark.createDataFrame(
        [(1, "x|common"), (2, "common|y")], "doc_id int, text string"
    )
    got = {
        r.doc_id: r.text
        for r in boilerplate_line_dedup(pipe, delim="|", min_docs=2).collect()
    }
    assert got == {1: "x", 2: "y"}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_docs"):
        boilerplate_line_dedup(docs, min_docs=1)


def test_exact_span_dedup(spark):
    """Cross-doc duplicated k-spans vanish everywhere EXCEPT the
    canonical smallest-id doc; within-doc repetition alone never flags;
    coverage extends k tokens from each flagged start; short docs pass
    through; a fully-duplicated doc survives as an empty row."""
    from global_seismic_data_pipeline_spark.operators.text import (
        exact_span_dedup,
    )

    span = "a b c d"  # k=4 spans below
    docs = spark.createDataFrame(
        [
            # canonical holder of "a b c d" (smallest doc_id wins);
            # distinct suffixes so no OTHER gram is shared with doc 2
            (1, f"{span} one fin"),
            # non-canonical: the span is removed, the rest survives
            (2, f"head {span} two end"),
            # fully-duplicated doc: nothing but the span
            (3, span),
            # same-doc repetition only — never flagged cross-doc
            (4, f"x y z w x y z w"),
            # shorter than k: no grams at all
            (5, "tiny doc"),
        ],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: (r.clean_text, r.n_tokens, r.tokens_removed)
        for r in exact_span_dedup(docs, k=4).collect()
    }
    assert out[1] == (f"{span} one fin", 6, 0)  # canonical copy kept
    assert out[2] == ("head two end", 7, 4)     # span excised mid-doc
    assert out[3] == ("", 4, 4)                  # empty row survives
    assert out[4] == ("x y z w x y z w", 8, 0)   # self-repeat unflagged
    assert out[5] == ("tiny doc", 2, 0)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must"):
        exact_span_dedup(docs, k=1)


def test_exact_span_dedup_overlapping_coverage(spark):
    """Two overlapping flagged starts remove their union, not 2k tokens;
    tokens before the first flagged start survive."""
    from global_seismic_data_pipeline_spark.operators.text import (
        exact_span_dedup,
    )

    # doc 2 contains "a b c" and "b c d": both 3-grams of doc 1's
    # "a b c d" — flagged starts overlap, union = 4 tokens
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "pre a b c d post")],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: (r.clean_text, r.tokens_removed)
        for r in exact_span_dedup(docs, k=3).collect()
    }
    assert out[1] == ("a b c d", 0)
    assert out[2] == ("pre post", 4)


def test_nb_classifier_hand_example(spark):
    """Quantized NB against hand-computed integers: smoothed counts,
    bit-length log2 weights, the unseen-token default, and the
    label-ascending tiebreak on an exact score tie."""
    from global_seismic_data_pipeline_spark.operators.classify import (
        nb_predict,
        nb_train,
    )

    train = spark.createDataFrame(
        [(1, "en", "cat cat dog"), (2, "es", "gato gato perro")],
        "doc_id int, lang string, text string",
    )
    classes, model = nb_train(train, label_col="lang")
    cl = {r.lang: r for r in classes.collect()}
    # V=4, n_train=2: prior_q = len(bin(2))=2; default_q = len(bin(3+4))=3
    assert (cl["en"].n_docs, cl["en"].total_tokens) == (1, 3)
    assert (cl["en"].prior_q, cl["en"].default_q) == (2, 3)
    assert (cl["es"].prior_q, cl["es"].default_q) == (2, 3)
    q = {(r.lang, r.tok): r.q for r in model.collect()}
    # cat: (3+4)//(2+1)=2 -> 2 bits; dog: 7//2=3 -> 2 bits
    assert q == {
        ("en", "cat"): 2, ("en", "dog"): 2,
        ("es", "gato"): 2, ("es", "perro"): 2,
    }

    held = spark.createDataFrame(
        [(10, "cat dog"), (11, "nuevo")], "doc_id int, text string"
    )
    out = {
        r.doc_id: (r.pred_lang, r.best_surprisal)
        for r in nb_predict(held, classes, model, label_col="lang").collect()
    }
    # doc10: en = 2 + (2+2) = 6 beats es = 2 + (3+3) = 8
    assert out[10] == ("en", 6)
    # doc11: both classes score 2+3=5 -> tie breaks label-ascending
    assert out[11] == ("en", 5)


def test_ngram_containment_filter(spark):
    """Containment decontamination: full quotes flag, light overlap
    passes, repeated grams count ONCE (distinct), short docs survive
    with zero grams, and the keep boundary is the exact integer
    cross-multiplication."""
    from global_seismic_data_pipeline_spark.operators.text import (
        ngram_containment_filter,
    )

    ev = spark.createDataFrame(
        [(900, "alpha beta gamma delta")], "doc_id int, text string"
    )
    docs = spark.createDataFrame(
        [
            # the eval text verbatim: both 3-grams hit -> containment 1
            (1, "alpha beta gamma delta"),
            # one of its 8 distinct grams hits (1/8 > 1/10): dropped
            (2, "alpha beta gamma x1 x2 x3 x4 x5 x6 x7"),
            # same single hit but 12 distinct grams (1/12 <= 1/10): kept
            (3, "alpha beta gamma y1 y2 y3 y4 y5 y6 y7 y8 y9 ya yb"),
            # no overlap at all
            (4, "p q r s t u"),
            # shorter than n: zero grams, kept
            (5, "tiny doc"),
            # the hitting gram repeated: still ONE distinct overlap
            (6, "alpha beta gamma z1 alpha beta gamma z2 z3 z4 z5 z6 z7 z8"),
        ],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: (r.total_ngrams, r.overlap_ngrams, r.keep)
        for r in ngram_containment_filter(docs, ev, n=3).collect()
    }
    assert out[1] == (2, 2, 0)
    assert out[2] == (8, 1, 0)   # 1*10 > 8*1
    assert out[3] == (12, 1, 1)  # 1*10 <= 12*1 boundary-side keep
    assert out[4] == (4, 0, 1)
    assert out[5] == (0, 0, 1)
    # doc 6: tokens=14 -> 12 gram starts, distinct grams: "alpha beta
    # gamma" once (repeated), so 11 distinct... compute: grams at pos
    # 0..11; duplicates only the repeated phrase
    total6, overlap6, keep6 = out[6]
    assert overlap6 == 1 and keep6 == (1 if overlap6 * 10 <= total6 else 0)


def test_gopher_quality_rules(spark):
    """Each Gopher rule trips on a purpose-built document; line rules
    (bullets/ellipses) exercise the (?m) per-line anchors the synthetic
    corpus (no newlines) cannot reach."""
    from global_seismic_data_pipeline_spark.operators.text import (
        gopher_quality_rules,
    )

    good = "the quick brown fox jumps over lazy dogs " * 7  # 63 words
    docs = spark.createDataFrame(
        [
            (1, good),
            # too short
            (2, "the tiny doc"),
            # mean word length > 10
            (3, " ".join(["absolutely" + "x" * 10] * 60) + " the"),
            # symbol-heavy: 60 words + 12 '#' (12*100 > 60*10)
            (4, "the " + "word " * 59 + "# " * 12),
            # 10 lines, 10 bullets -> 100% bullet lines
            (5, "\n".join("- the item %d here now" % i for i in range(10)) + " " + "pad " * 40),
            # 10 lines, 4 ending in ellipsis -> 40% > 30%
            (
                6,
                "\n".join(
                    ("the line %d trails off..." if i < 4 else "the line %d stops") % i
                    for i in range(10)
                )
                + " "
                + "pad " * 40,
            ),
            # numeric soup: alpha fraction under 80%
            (7, "the " + " ".join(str(i) for i in range(100, 160))),
            # no required word at all
            (8, "quick brown fox " * 20),
        ],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: r.asDict()
        for r in gopher_quality_rules(docs, min_required_words=1).collect()
    }
    assert out[1]["keep"] == 1 and all(
        out[1][k] == 1 for k in out[1] if k.startswith("r_")
    )
    assert out[2]["r_word_count"] == 0 and out[2]["keep"] == 0
    assert out[3]["r_mean_word_len"] == 0
    assert out[4]["r_symbol_ratio"] == 0 and out[4]["symbol_cnt"] == 12
    assert out[5]["r_bullet_lines"] == 0 and out[5]["bullet_lines"] == 10
    assert out[5]["n_lines"] == 10
    assert out[6]["r_ellipsis_lines"] == 0 and out[6]["ellipsis_lines"] == 4
    assert out[7]["r_alpha_words"] == 0
    assert out[8]["r_required_words"] == 0 and out[8]["required_distinct"] == 0


def test_html_to_text(spark):
    """HTML extraction: blocks removed wholesale, comments (with tags
    inside) gone, title captured + decoded, &amp;lt; decodes to the
    LITERAL text &lt; (html.unescape contract), plain text passes
    through, NULL survives as empty."""
    from global_seismic_data_pipeline_spark.operators.extract import (
        html_to_text,
    )

    docs = spark.createDataFrame(
        [
            (
                1,
                '<html><head><title> My &amp; Title </title>'
                '<style>p { color: red; }</style></head><body>'
                '<script>if (a < b) { x(); }</script>'
                '<!-- hidden <b>markup</b> -->'
                '<p>Hello   <b>world</b> 5 &lt; 7 &amp;&amp; ok&nbsp;end</p>'
                "</body></html>",
            ),
            (2, "just plain text, no markup"),
            # double-escaped: &amp;lt; must become the literal "&lt;"
            (3, "<p>a &amp;lt; b</p>"),
            (4, "<div>no title here</div>"),
            (5, None),
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r.asDict() for r in html_to_text(docs).collect()}
    assert out[1]["title"] == "My & Title"
    assert out[1]["clean_text"] == 'Hello world 5 < 7 && ok end'
    assert out[1]["n_blocks"] == 3  # script + style + comment
    assert out[1]["n_entities"] == 4  # lt, amp, amp, nbsp; title amp NOT counted
    assert out[2]["clean_text"] == "just plain text, no markup"
    assert out[2]["n_tags"] == 0 and out[2]["n_blocks"] == 0
    assert out[3]["clean_text"] == "a &lt; b"
    assert out[4]["title"] == "" and out[4]["clean_text"] == "no title here"
    assert out[5]["clean_text"] == "" and out[5]["title"] == ""


def test_bigram_lm_surprisal(spark):
    """Hand-computable bigram model: repeated predictable pairs score
    low, a one-off ordering scores high; sub-2-token docs have zero
    bigrams and survive."""
    from global_seismic_data_pipeline_spark.operators.text import (
        bigram_lm_surprisal,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b a b"),   # 7 bigrams, dominated by a->b, b->a
            (2, "b a"),               # 1 bigram, common
            (3, "a a"),               # 1 bigram, unseen elsewhere
            (4, "solo"),              # no bigrams
        ],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: r.asDict()
        for r in bigram_lm_surprisal(
            docs, min_centibits=0, max_centibits=10_000
        ).collect()
    }
    # Corpus: tokens a(8) b(8) solo(1); V=3.
    # bigrams: a->b c=4, b->a c=4 (3 in doc1 + doc2), a->a c=1.
    # ctx: a opens 4+1=5... recompute: doc1 pairs: ab,ba,ab,ba,ab,ba,ab ->
    # a->b 4, b->a 3; doc2 b->a 1; doc3 a->a 1.
    # c12: ab=4, ba=4, aa=1. ctx(a)=5, ctx(b)=4.
    # sq(ab)=len(bin((5+3)//(4+1)=1))=1; sq(ba)=len(bin((4+3)//5=1))=1
    # sq(aa)=len(bin((5+3)//2=4))=3
    assert out[1]["n_bigrams"] == 7 and out[1]["surprisal_sum"] == 7
    assert out[2]["n_bigrams"] == 1 and out[2]["surprisal_sum"] == 1
    assert out[3]["n_bigrams"] == 1 and out[3]["surprisal_sum"] == 3
    assert out[4]["n_bigrams"] == 0 and out[4]["keep"] == 1
    assert out[4]["bits_per_bigram"] == 0.0


def test_blocked_fuzzy_pairs(spark):
    """Blocking + length prefilter + levenshtein: same-block near
    matches found, cross-block typos missed BY DESIGN, length gap
    beyond max_edit pruned before the kernel, id ordering canonical."""
    from global_seismic_data_pipeline_spark.operators.fuzzy import (
        blocked_fuzzy_pairs,
    )

    df = spark.createDataFrame(
        [
            (1, "small ring"),
            (2, "small ring"),    # exact dup of 1
            (3, "small king"),    # d=1 vs 1/2
            (4, "small kingdoms extra"),  # same block, length gap > 2
            (5, "smell ring"),    # typo IN the block key: never compared
            (6, "red bolt"),
        ],
        "id long, name string",
    )
    out = {
        (r.id_a, r.id_b): r.dist
        for r in blocked_fuzzy_pairs(df, text_col="name", max_edit=2).collect()
    }
    assert out == {(1, 2): 0, (1, 3): 1, (2, 3): 1}
    # widen the budget past the 11-char length gap: the long name now
    # survives the prefilter and matches at its true distance > 2;
    # cross-block pairs STILL never appear (blocking is structural)
    out2 = {
        (r.id_a, r.id_b): r.dist
        for r in blocked_fuzzy_pairs(df, text_col="name", max_edit=15).collect()
    }
    assert (1, 4) in out2 and out2[(1, 4)] > 2
    assert all(not {5, 6} & {x, y} or {x, y} <= {5, 6} for x, y in out2)


def test_mixture_budget_allocate(spark):
    """Budget = the bottleneck source's full supply scaled by W/w; the
    bottleneck source keeps EVERYTHING (its keep inequality is h < 2^20,
    always true); other sources sample at target/avail; unweighted
    sources are excluded."""
    from global_seismic_data_pipeline_spark.operators.sampling import (
        mixture_budget_allocate,
    )

    rows = [(i, "w " * 9 + "w", "A") for i in range(10)]          # 100 toks
    rows += [(100 + i, "w " * 9 + "w", "B") for i in range(2)]    # 20 toks
    rows += [(200, "ignored text", "C")]                          # unweighted
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r.source: r.asDict()
        for r in mixture_budget_allocate(
            df, weights={"A": 1, "B": 1}, salt="t"
        ).collect()
    }
    assert set(out) == {"A", "B"}
    # W=2: budget = min(100*2/1, 20*2/1) = 40; targets 20 and 20
    assert out["A"]["budget"] == out["B"]["budget"] == 40
    assert out["A"]["target_tokens"] == out["B"]["target_tokens"] == 20
    assert out["B"]["kept_docs"] == 2 and out["B"]["kept_tokens"] == 20
    assert out["A"]["kept_docs"] <= 10
    assert out["A"]["kept_tokens"] == 10 * out["A"]["kept_docs"]
