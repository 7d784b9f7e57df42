"""Approximate-distinct sketches: native HLL++ error bound, and the
portable HLL operator's error bound / mergeability / branch coverage
(cross-engine bit-equality is covered by the DuckDB oracle gate)."""

from pyspark.sql import functions as F

from global_seismic_data_pipeline_spark.operators import sketch


def test_approx_count_distinct_error_bound(spark):
    n = 20000
    df = spark.range(n).select(
        (F.col("id") % 5).cast("string").alias("g"),
        (F.col("id") % 3517).alias("u"),  # 3517 distinct users per group
    )
    out = df.groupBy("g").agg(
        F.countDistinct("u").alias("exact"),
        F.approx_count_distinct("u", rsd=0.02).alias("approx"),
    )
    for r in out.collect():
        rel_err = abs(r.approx - r.exact) / r.exact
        # rsd=0.02 → ~2% standard error; 6% is a >3-sigma bound
        assert rel_err < 0.06, (r.g, r.exact, r.approx)


def test_approx_distinct_deterministic(spark):
    df = spark.range(5000).select((F.col("id") % 997).alias("u"))
    a = df.agg(F.approx_count_distinct("u")).collect()[0][0]
    b = df.repartition(7).agg(F.approx_count_distinct("u")).collect()[0][0]
    assert a == b  # HLL sketch merge is order/partitioning-insensitive


def test_portable_hll_error_bound(spark):
    # p=12 -> ~1.04/sqrt(4096) = 1.6% standard error; 5% is a ~3-sigma
    # bound. 3517 distinct per group sits in the linear-counting range.
    n = 20000
    df = spark.range(n).select(
        (F.col("id") % 5).cast("string").alias("g"),
        (F.col("id") % 3517).alias("u"),
    )
    out = sketch.hll_distinct(df, "u", ["g"], p=12).collect()
    assert len(out) == 5
    for r in out:
        assert abs(r.hll_count - 3517) / 3517 < 0.05, (r.g, r.hll_count)


def test_portable_hll_raw_branch(spark):
    # p=4 -> m=16, linear counting only below 2.5m=40 distinct; 5000
    # distinct forces the raw harmonic-mean estimate. Error bound for
    # m=16 is ~26% standard error; accept 3 sigma.
    df = spark.range(5000).select(F.col("id").alias("u"), F.lit(1).alias("g"))
    out = sketch.hll_distinct(df, "u", ["g"], p=4).collect()
    assert len(out) == 1
    assert abs(out[0].hll_count - 5000) / 5000 < 0.80, out[0].hll_count


def test_portable_hll_register_merge(spark):
    # Sketch property that matters at 100 TB: registers from disjoint
    # partitions merged by max == registers of the union.
    df = spark.range(10000).select((F.col("id") * 37 % 4999).alias("u"), F.lit(1).alias("g"))
    left = df.filter(F.col("u") % 2 == 0)
    right = df.filter(F.col("u") % 2 == 1)
    merged = (
        sketch.hll_registers(left, "u", ["g"], p=10)
        .unionByName(sketch.hll_registers(right, "u", ["g"], p=10))
        .groupBy("g", "bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    whole = sketch.hll_registers(df, "u", ["g"], p=10)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0
    # and the merged estimate equals the whole-table estimate exactly
    a = sketch.hll_estimate(merged, ["g"], p=10).collect()[0].hll_count
    b = sketch.hll_estimate(whole, ["g"], p=10).collect()[0].hll_count
    assert a == b


def test_portable_hll_null_keys_ignored(spark):
    df = spark.range(100).select(
        F.when(F.col("id") % 2 == 0, F.col("id")).alias("u"), F.lit(1).alias("g")
    )
    est = sketch.hll_distinct(df, "u", ["g"], p=12).collect()[0].hll_count
    # 50 distinct non-null keys; linear counting is near-exact here
    assert abs(est - 50) <= 3, est


def test_quantile_histogram_accuracy(spark):
    # uniform 1..100000: bucket lower bounds guarantee estimate <= true
    # value with relative error < 2^-5 (3.2%) at any quantile
    df = spark.range(1, 100001).select(F.col("id").alias("v"), F.lit(1).alias("g"))
    out = sketch.approx_quantiles(df, "v", ["g"], [0.5, 0.9, 0.99]).collect()[0]
    for true, got in ((50000, out.p50), (90000, out.p90), (99000, out.p99)):
        assert got <= true
        assert (true - got) / true < 0.04, (true, got)


def test_quantile_histogram_exact_region(spark):
    # values below 2^k bucket to themselves -> exact quantiles
    df = spark.range(1, 21).select(F.col("id").alias("v"), F.lit(1).alias("g"))
    out = sketch.approx_quantiles(df, "v", ["g"], [0.5, 0.9], k=5).collect()[0]
    assert out.p50 == 10  # rank ceil(0.5*20)=10
    assert out.p90 == 18  # rank ceil(0.9*20)=18


def test_quantile_histogram_mergeable(spark):
    # histograms from disjoint halves, summed, give the same quantiles as
    # the whole — the property that lets registers be stored and merged
    df = spark.range(1, 50001).select((F.col("id") * 7919 % 99991).alias("v"), F.lit(1).alias("g"))
    left = df.filter(F.col("v") % 2 == 0)
    right = df.filter(F.col("v") % 2 == 1)
    merged_hist = (
        sketch.quantile_histogram(left, "v", ["g"])
        .unionByName(sketch.quantile_histogram(right, "v", ["g"]))
        .groupBy("g", "qbucket", "rep")
        .agg(F.sum("cnt").alias("cnt"))
    )
    # estimate from the merged histogram via the same cumulative walk
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy("qbucket")
    tot = merged_hist.groupBy("g").agg(F.sum("cnt").alias("n_"))
    cum = merged_hist.withColumn("cum_", F.sum("cnt").over(w)).join(tot, ["g"])
    rank = F.greatest(F.lit(1).cast("long"), F.ceil(F.lit(0.5) * F.col("n_")).cast("long"))
    merged_p50 = (
        cum.groupBy("g").agg(F.min(F.when(F.col("cum_") >= rank, F.col("rep"))).alias("p"))
        .collect()[0].p
    )
    whole_p50 = sketch.approx_quantiles(df, "v", ["g"], [0.5]).collect()[0].p50
    assert merged_p50 == whole_p50


def test_quantile_histogram_drops_nulls_and_negatives(spark):
    df = spark.createDataFrame(
        [(None,), (-5,), (1,), (2,), (3,)], "v long"
    ).select("v", F.lit(1).alias("g"))
    out = sketch.approx_quantiles(df, "v", ["g"], [0.5]).collect()[0]
    assert out.p50 == 2


# --------------------------------------------------------------------------
# Count-Min sketch


def _py_cms_positions(tok, w, d, salt="t"):
    import hashlib

    hx = hashlib.md5(f"{tok}|{salt}".encode()).hexdigest()
    h1, h2 = int(hx[:15], 16), int(hx[16:31], 16)
    return [(h1 + i * h2) % w for i in range(d)]


def test_cms_estimate_upper_bounds_and_matches_reference(spark):
    from collections import Counter

    from global_seismic_data_pipeline_spark.operators import sketch

    words = (["apple"] * 50 + ["pear"] * 20 + [f"rare{i}" for i in range(200)])
    df = spark.createDataFrame([(w,) for w in words], "tok string")
    W_LOG2, D, SALT = 8, 3, "t"
    w = 1 << W_LOG2
    cms = sketch.cms_counters(df, "tok", w_log2=W_LOG2, d=D, salt=SALT)
    probes = spark.createDataFrame(
        [("apple",), ("pear",), ("rare7",), ("absent",)], "tok string"
    )
    got = {
        r["tok"]: r["cms_cnt"]
        for r in sketch.cms_estimate(
            cms, probes, "tok", w_log2=W_LOG2, d=D, salt=SALT
        ).collect()
    }
    truth = Counter(words)
    # upper-bound property, always
    for tok in ("apple", "pear", "rare7", "absent"):
        assert got[tok] >= truth[tok]
    # exact python replica of the counters -> estimates must match exactly
    counters = [Counter() for _ in range(D)]
    for tok, cnt in truth.items():
        for i, p in enumerate(_py_cms_positions(tok, w, D, SALT)):
            counters[i][p] += cnt
    for tok in ("apple", "pear", "rare7", "absent"):
        exp = min(
            counters[i][p]
            for i, p in enumerate(_py_cms_positions(tok, w, D, SALT))
        )
        assert got[tok] == exp


def test_cms_counters_are_sum_mergeable(spark):
    from global_seismic_data_pipeline_spark.operators import sketch
    from pyspark.sql import functions as F

    words = [f"w{i % 17}" for i in range(300)]
    half1 = spark.createDataFrame([(w,) for w in words[:150]], "tok string")
    half2 = spark.createDataFrame([(w,) for w in words[150:]], "tok string")
    full = spark.createDataFrame([(w,) for w in words], "tok string")
    kw = dict(w_log2=7, d=2, salt="m")
    merged = (
        sketch.cms_counters(half1, "tok", **kw)
        .unionByName(sketch.cms_counters(half2, "tok", **kw))
        .groupBy("row", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = sketch.cms_counters(full, "tok", **kw)
    a = {(r["row"], r["pos"]): r["cnt"] for r in merged.collect()}
    b = {(r["row"], r["pos"]): r["cnt"] for r in direct.collect()}
    assert a == b


def test_hll_merge_helper_equals_union_sketch(spark):
    # hll_merge over finer-grained registers == registers of the union
    df = spark.range(8000).select(
        (F.col("id") * 13 % 2999).alias("u"),
        (F.col("id") % 4).alias("day"),
        F.lit("t").alias("g"),
    )
    daily = sketch.hll_registers(df, "u", ["g", "day"], p=10)
    merged = sketch.hll_merge(daily, ["g"])
    whole = sketch.hll_registers(df, "u", ["g"], p=10)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_join_size_estimate_pk_fk(spark):
    """PK–FK equi-join: ndv(right) == n_right, so the System-R estimate
    collapses to ~n_left — within HLL error of the actual join size (every
    fact row matches exactly one dim row)."""
    fact = spark.range(5000).select(
        (F.col("id") % 500).alias("fk")
    )
    dim = spark.range(500).select(F.col("id").alias("pk"))
    row = sketch.join_size_estimate(fact, dim, "fk", "pk").collect()[0]
    assert row.n_left == 5000 and row.n_right == 500
    assert row.actual_join_rows == 5000
    # HLL at p=12 on 500 keys: ~±2% typical; allow generous 10%
    assert abs(row.ndv_right - 500) <= 50
    assert abs(row.est_join_rows - 5000) / 5000 <= 0.15


def test_join_size_estimate_formula_consistent(spark):
    """The returned estimate is exactly the integer formula over the
    returned statistics (no hidden state)."""
    a = spark.range(1000).select((F.col("id") % 77).alias("k"))
    b = spark.range(300).select((F.col("id") % 77).alias("k"))
    row = sketch.join_size_estimate(a, b, "k", "k").collect()[0]
    assert row.est_join_rows == (row.n_left * row.n_right) // max(
        row.ndv_left, row.ndv_right
    )
    # per-key counts: a = 13×76 keys + 12×1; b = 4×69 keys + 3×8
    # Σ cnt_a·cnt_b = 69·52 + 7·39 + 1·36
    assert row.actual_join_rows == 3897


def test_kmv_overlap_exact_when_sketch_not_full(spark):
    """Fewer distinct keys than k: the sketch IS the set — estimates equal
    the exact audited counts."""
    a = spark.range(100).select(F.col("id").alias("u"))
    b = spark.range(50, 150).select(F.col("id").alias("u"))
    row = sketch.kmv_overlap(a, b, "u", "u", k=256).collect()[0]
    assert row.k_used == 150
    assert row.est_union == row.actual_union == 150
    assert row.est_intersection == row.actual_intersection == 50
    assert row.matches == 50


def test_kmv_overlap_estimates_within_error(spark):
    """Full sketches: |union| and |intersection| estimates land within the
    ~1/sqrt(k) band of the true values (50% planted overlap)."""
    a = spark.range(4000).select(F.col("id").alias("u"))
    b = spark.range(2000, 6000).select(F.col("id").alias("u"))
    row = sketch.kmv_overlap(a, b, "u", "u", k=256).collect()[0]
    assert row.k_used == 256
    assert row.actual_union == 6000 and row.actual_intersection == 2000
    assert abs(row.est_union - 6000) / 6000 < 0.25          # ~4σ at k=256
    assert abs(row.est_intersection - 2000) / 2000 < 0.45   # ratio est: wider
    assert row.est_intersection == (row.matches * row.est_union) // row.k_used


def test_kmv_sketch_validation(spark):
    import pytest

    with pytest.raises(ValueError):
        sketch.kmv_sketch(spark.range(5), "id", 1)


def test_profile_table_stats(spark):
    """Per-column profile: exact nulls/min/max, HLL NDV within error, one
    row per column; validation on empty column list."""
    import pytest

    from global_seismic_data_pipeline_spark.operators import profile

    df = spark.range(1000).select(
        (F.col("id") % 10).cast("string").alias("s"),
        F.when(F.col("id") % 4 != 0, F.col("id") % 313).alias("k"),
    )
    rows = {r.column: r for r in profile.profile_table(df, ["s", "k"]).collect()}
    assert set(rows) == {"s", "k"}
    s, k = rows["s"], rows["k"]
    assert (s.n_rows, s.n_null, s.min_str, s.max_str) == (1000, 0, "0", "9")
    assert s.approx_ndv == 10  # tiny cardinality: linear counting is exact
    assert k.n_rows == 1000 and k.n_null == 250
    assert abs(k.approx_ndv - 313) / 313 < 0.1
    with pytest.raises(ValueError):
        profile.profile_table(df, [])
