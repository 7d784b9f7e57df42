"""Rolling-window metrics == brute-force recompute (SURVEY.md §5.4)."""

from datetime import date, timedelta

from global_seismic_data_pipeline_spark.operators import rolling


def test_rolling_equals_bruteforce(spark):
    days = [(date(2025, 1, 1) + timedelta(days=i), (i * 7) % 13 + 1) for i in range(60)]
    df = spark.createDataFrame(days, "event_date date, total_events int")
    out = {
        r.event_date: (r.rolling_7d_count, r.rolling_30d_count, r.is_anomaly)
        for r in rolling.rolling_metrics(
            df, date_col="event_date", value_col="total_events"
        ).collect()
    }
    vals = dict(days)
    for i, (d, v) in enumerate(days):
        want7 = sum(vals[days[j][0]] for j in range(max(0, i - 6), i + 1))
        want30 = sum(vals[days[j][0]] for j in range(max(0, i - 29), i + 1))
        got7, got30, anom = out[d]
        assert got7 == want7 and got30 == want30
        assert anom == (v > want7 / 7 * 2)


def test_partitioned_rolling_matches_global_within_key(spark):
    days = []
    for key in ("A", "B"):
        for i in range(40):
            days.append((key, date(2025, 1, 1) + timedelta(days=i), (i + len(key)) % 9))
    df = spark.createDataFrame(days, "k string, event_date date, total_events int")
    part = rolling.rolling_metrics_partitioned(
        df, partition_cols=["k"], date_col="event_date", value_col="total_events"
    )
    for key in ("A", "B"):
        sub = df.filter(df.k == key)
        glob = rolling.rolling_metrics(sub, date_col="event_date", value_col="total_events")
        a = sorted((str(r.event_date), r.rolling_7d_count, r.rolling_30d_count)
                   for r in part.filter(part.k == key).collect())
        b = sorted((str(r.event_date), r.rolling_7d_count, r.rolling_30d_count)
                   for r in glob.collect())
        assert a == b
