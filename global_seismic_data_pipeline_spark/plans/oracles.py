"""DuckDB oracle SQL for every query in ``workloads.py``.

Each SQL string mirrors its Spark counterpart's expression tree exactly
(operation order matters for IEEE-identical doubles — see workloads.py
docstring). Literal dimensions are generated from the SAME Python constants
so the two sides can never drift.

DuckDB/Spark dialect notes encoded here:
- ``SUM`` over ints is HUGEINT in DuckDB → always ``CAST(... AS BIGINT)``
- ``dayofweek`` is 0=Sunday in DuckDB, 1=Sunday in Spark → ``+ 1``
- ``epoch_us`` ≡ Spark ``unix_micros``
- ``STDDEV_SAMP`` ≡ Spark ``stddev``
"""

from __future__ import annotations

from .workloads import VALUE_BANDS, ZONE_BOXES


def _bands_cte() -> str:
    rows = ",\n        ".join(
        f"('{lvl}', {rank}, {lo}, {'NULL' if hi is None else hi})"
        for lvl, rank, lo, hi in VALUE_BANDS
    )
    return (
        "bands(band_level, band_rank, lo, hi) AS (\n        VALUES "
        + rows
        + "\n    )"
    )


def _boxes_cte() -> str:
    rows = ",\n        ".join(
        f"('{code}', '{name}', {mnx}, {mxx}, {mny}, {mxy}, {pr})"
        for code, name, mnx, mxx, mny, mxy, pr in ZONE_BOXES
    )
    return (
        "boxes(zone_code, zone_name, min_x, max_x, min_y, max_y, priority)"
        " AS (\n        VALUES " + rows + "\n    )"
    )


MAG = "(value / 50.0)"
DEP = "((user_id % 613) + (value / 1000.0))"

FLAGSHIP_SQL = f"""
WITH silver AS (
    SELECT event_type, value, user_id,
        {MAG} AS magnitude,
        {DEP} AS depth_km,
        CASE WHEN {MAG} >= 7.0 THEN 'CRITICAL'
             WHEN {MAG} >= 6.0 THEN 'HIGH'
             WHEN {MAG} >= 5.0 THEN 'MODERATE'
             WHEN {MAG} >= 4.0 THEN 'LOW'
             ELSE 'MINIMAL' END AS risk_level,
        CASE WHEN {DEP} >= 300.0 THEN 'DEEP'
             WHEN {DEP} >= 70.0 THEN 'INTERMEDIATE'
             ELSE 'SHALLOW' END AS depth_category,
        ({MAG} >= 7.0 AND {DEP} < 70) AS tsunami_potential,
        POWER(10.0, 1.5 * {MAG} + 4.8) AS energy_joules
    FROM events
), agg AS (
    SELECT event_type,
        CAST(COUNT(*) AS BIGINT) AS total_events,
        ROUND(SUM(value), 2) AS value_sum,
        CAST(SUM(user_id % 613) AS BIGINT) AS depth_int_sum,
        MAX(magnitude) AS max_magnitude,
        MIN(magnitude) AS min_magnitude,
        ROUND(COALESCE(STDDEV_SAMP(magnitude), 0.0), 3) AS stddev_magnitude,
        CAST(SUM(CASE WHEN depth_category = 'SHALLOW' THEN 1 ELSE 0 END) AS BIGINT) AS shallow_count,
        CAST(SUM(CASE WHEN depth_category = 'INTERMEDIATE' THEN 1 ELSE 0 END) AS BIGINT) AS intermediate_count,
        CAST(SUM(CASE WHEN depth_category = 'DEEP' THEN 1 ELSE 0 END) AS BIGINT) AS deep_count,
        CAST(SUM(CASE WHEN risk_level = 'CRITICAL' THEN 1 ELSE 0 END) AS BIGINT) AS critical_count,
        CAST(SUM(CASE WHEN risk_level = 'HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high_risk_count,
        CAST(SUM(CASE WHEN risk_level = 'MODERATE' THEN 1 ELSE 0 END) AS BIGINT) AS moderate_count,
        CAST(SUM(CASE WHEN tsunami_potential THEN 1 ELSE 0 END) AS BIGINT) AS tsunami_count,
        ROUND(LOG10(SUM(energy_joules)), 6) AS total_energy_log10
    FROM silver GROUP BY event_type
), scored AS (
    SELECT *,
        (value_sum / 50.0) / total_events AS avg_magnitude,
        (depth_int_sum + (value_sum / 1000.0)) / total_events AS avg_depth_km,
        ROUND(critical_count * 50 + high_risk_count * 20 + moderate_count * 5
              + max_magnitude * 10, 2) AS risk_score
    FROM agg
)
SELECT event_type, total_events, max_magnitude, min_magnitude,
    stddev_magnitude, shallow_count, intermediate_count, deep_count,
    critical_count, high_risk_count, moderate_count, tsunami_count,
    total_energy_log10, avg_magnitude, avg_depth_km, risk_score,
    CASE WHEN risk_score >= 100.0 THEN 'CRITICAL'
         WHEN risk_score >= 50.0 THEN 'HIGH'
         WHEN risk_score >= 20.0 THEN 'MODERATE'
         WHEN risk_score >= 5.0 THEN 'LOW'
         ELSE 'MINIMAL' END AS agg_risk_level,
    CAST(DENSE_RANK() OVER (ORDER BY critical_count DESC, total_events DESC,
                            event_type) AS BIGINT) AS risk_rank
FROM scored
"""

DEDUP_KEEP_LATEST_SQL = """
SELECT user_id, event_type, event_id, value
FROM events
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
"""

WINDOW_PRIORITY_PICK_SQL = """
SELECT user_id, event_id, value
FROM events
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY value ASC, event_id ASC) = 1
"""

ROLLING_DAILY_SQL = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS event_date,
        CAST(COUNT(*) AS BIGINT) AS total_events,
        ROUND(SUM(value), 2) AS value_sum,
        MAX(value) AS max_value,
        CAST(COUNT(DISTINCT event_type) AS BIGINT) AS active_types,
        CAST(SUM(CASE WHEN value >= 400.0 THEN 1 ELSE 0 END) AS BIGINT) AS critical_events
    FROM events GROUP BY 1
), roll AS (
    SELECT *,
        value_sum / total_events AS avg_value,
        CAST(SUM(total_events) OVER (ORDER BY event_date
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_7d_count,
        CAST(SUM(total_events) OVER (ORDER BY event_date
             ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_30d_count
    FROM daily
)
SELECT CAST(event_date AS VARCHAR) AS event_date, total_events, avg_value,
    max_value, active_types, critical_events, rolling_7d_count,
    rolling_30d_count,
    CAST(CASE WHEN rolling_7d_count > 0
         THEN total_events > (rolling_7d_count / 7 * 2)
         ELSE FALSE END AS BIGINT) AS is_anomaly
FROM roll
"""

DENSE_RANK_NATIONS_SQL = """
WITH agg AS (
    SELECT n.n_name,
        CAST(COUNT(*) AS BIGINT) AS customers,
        ROUND(SUM(c.c_acctbal), 2) AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
)
SELECT n_name, customers, total_acctbal,
    total_acctbal / customers AS avg_acctbal,
    CAST(DENSE_RANK() OVER (ORDER BY customers DESC, n_name) AS BIGINT) AS nation_rank
FROM agg
"""

SPATIAL_BOX_ENRICH_SQL = f"""
WITH {_boxes_cte()},
matched AS (
    SELECT e.event_id, b.zone_code, b.zone_name,
        ROW_NUMBER() OVER (PARTITION BY e.event_id ORDER BY b.priority ASC) AS rn
    FROM events e JOIN boxes b
        ON e.value >= b.min_y AND e.value <= b.max_y
        AND hour(e.ts) >= b.min_x AND hour(e.ts) <= b.max_x
)
SELECT event_id, zone_code, zone_name FROM matched WHERE rn = 1
UNION ALL
SELECT e.event_id, 'OTHER' AS zone_code, 'Other' AS zone_name
FROM events e
WHERE NOT EXISTS (
    SELECT 1 FROM boxes b
    WHERE e.value >= b.min_y AND e.value <= b.max_y
      AND hour(e.ts) >= b.min_x AND hour(e.ts) <= b.max_x
)
"""

BAND_CLASSIFY_SQL = f"""
WITH {_bands_cte()}
SELECT e.event_id, b.band_level, CAST(b.band_rank AS BIGINT) AS band_rank
FROM events e LEFT JOIN bands b
    ON e.value >= b.lo AND (b.hi IS NULL OR e.value < b.hi)
"""

# The expression form intentionally differs from the join form BELOW the
# bottom band: the when-chain (the reference's risk UDF, 04:142-147)
# defaults to MINIMAL where the join yields NULL — so it gets its own
# oracle with the same CASE default rather than sharing the join SQL.
BAND_CASE_CLASSIFY_SQL = """
SELECT event_id,
    CASE WHEN value >= 400.0 THEN 'CRITICAL'
         WHEN value >= 300.0 THEN 'HIGH'
         WHEN value >= 200.0 THEN 'MODERATE'
         WHEN value >= 100.0 THEN 'LOW'
         ELSE 'MINIMAL' END AS band_level,
    CAST(CASE WHEN value >= 400.0 THEN 1
         WHEN value >= 300.0 THEN 2
         WHEN value >= 200.0 THEN 3
         WHEN value >= 100.0 THEN 4
         ELSE 5 END AS BIGINT) AS band_rank
FROM events
"""

ANTI_JOIN_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""

UNION_BY_NAME_SQL = """
SELECT event_id, user_id, value, CAST(NULL AS DOUBLE) AS severity
FROM events WHERE event_type = 'purchase'
UNION ALL
SELECT event_id, user_id, CAST(NULL AS DOUBLE) AS value, value * 2 AS severity
FROM events WHERE event_type = 'error'
"""

AGG_PRICING_SQL = """
WITH agg AS (
    SELECT l_returnflag, l_linestatus,
        SUM(l_quantity) AS sum_qty,
        ROUND(SUM(l_extendedprice) / 1000000.0, 4) AS sum_base_price_m,
        ROUND(SUM(l_extendedprice * (1 - l_discount)) / 1000000.0, 4) AS sum_disc_price_m,
        ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) / 1000000.0, 4) AS sum_charge_m,
        ROUND(SUM(l_extendedprice), 2) AS price_sum,
        ROUND(SUM(l_discount), 2) AS disc_sum,
        CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-06-30 00:00:00'
    GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price_m,
    sum_disc_price_m, sum_charge_m, count_order,
    sum_qty / count_order AS avg_qty,
    price_sum / count_order AS avg_price,
    disc_sum / count_order AS avg_disc
FROM agg
"""

AGG_GLOBAL_KPI_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS total_events,
    ROUND(SUM(value), 2) / COUNT(*) AS avg_value,
    MAX(value) AS max_value,
    MIN(value) AS min_value,
    CAST(COUNT(DISTINCT event_type) AS BIGINT) AS active_types,
    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users,
    CAST(SUM(CASE WHEN value >= 400.0 THEN 1 ELSE 0 END) AS BIGINT) AS critical_events,
    epoch_us(MIN(ts)) AS data_start_us,
    epoch_us(MAX(ts)) AS data_end_us
FROM events
"""

AGG_HISTOGRAM_SQL = """
SELECT CASE WHEN o_totalprice >= 400000 THEN '400k+ Extreme'
            WHEN o_totalprice >= 300000 THEN '300-400k Major'
            WHEN o_totalprice >= 200000 THEN '200-300k Strong'
            WHEN o_totalprice >= 100000 THEN '100-200k Moderate'
            WHEN o_totalprice >= 50000 THEN '50-100k Light'
            ELSE '< 50k Micro' END AS price_category,
    CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders GROUP BY 1
"""

AGG_MONTHLY_ROLLUP_SQL = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS order_date,
        CAST(COUNT(*) AS BIGINT) AS total_orders,
        ROUND(SUM(o_totalprice), 2) AS price_sum,
        MAX(o_totalprice) AS max_price,
        CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_orders
    FROM orders GROUP BY 1
), monthly AS (
    SELECT CAST(year(order_date) AS BIGINT) AS year,
        CAST(month(order_date) AS BIGINT) AS month,
        CAST(SUM(total_orders) AS BIGINT) AS orders,
        ROUND(SUM(price_sum), 2) AS month_price_sum,
        MAX(max_price) AS max_price,
        CAST(SUM(finished_orders) AS BIGINT) AS finished
    FROM daily GROUP BY 1, 2
)
SELECT year, month, orders, max_price, finished,
    month_price_sum / orders AS avg_order_price
FROM monthly
"""

AGG_CONDITIONAL_PIVOT_SQL = """
SELECT o_orderpriority,
    CAST(COUNT(*) AS BIGINT) AS total_orders,
    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
    CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
    CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p,
    ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END) / 1000000.0, 4) AS finished_value_m
FROM orders GROUP BY o_orderpriority
"""

AGG_FREQUENCY_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY event_type
"""

AGG_DUPLICATE_AUDIT_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS total_records,
    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_keys,
    CAST(COUNT(*) - COUNT(DISTINCT user_id) AS BIGINT) AS duplicate_records
FROM events
"""

QUALITY_NULL_AUDIT_SQL = """
SELECT
    CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_id_nulls,
    CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ts_nulls,
    CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS user_id_nulls,
    CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_type_nulls,
    CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_nulls,
    CAST(COUNT(*) AS BIGINT) AS total_rows
FROM events
"""

WATERMARK_FILTER_SQL = """
SELECT event_id, epoch_us(ts) AS ts_us, value
FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
"""

VALIDATE_CLEAN_SQL = """
SELECT event_id,
    CASE WHEN value IS NULL THEN 33.0
         WHEN value < 10.0 THEN 10.0
         WHEN value > 400.0 THEN 400.0
         ELSE value END AS value_clamped,
    CASE WHEN lower(event_type) IN ('click', 'view') THEN 'interaction'
         ELSE COALESCE(lower(event_type), 'interaction') END AS type_norm
FROM events
WHERE event_id IS NOT NULL AND ts IS NOT NULL
  AND value BETWEEN 0 AND 500 AND user_id BETWEEN 0 AND 1000000000
"""

MEMBERSHIP_TOPK_SQL = """
SELECT event_id, event_type, value
FROM events
WHERE event_type IN ('purchase', 'signup')
ORDER BY value DESC, event_id ASC
LIMIT 100
"""

CASE_CUSTOM_SORT_SQL = """
WITH agg AS (
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count,
        CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN 1
                  WHEN o_orderpriority = '2-HIGH' THEN 2
                  WHEN o_orderpriority = '3-MEDIUM' THEN 3
                  WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 4
                  ELSE 5 END AS BIGINT) AS sort_key
    FROM orders GROUP BY o_orderpriority
)
SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY sort_key) AS BIGINT) AS display_order
FROM agg
"""

TEMPORAL_FEATURES_SQL = """
SELECT event_id,
    CAST(hour(ts) AS BIGINT) AS hour_of_day,
    CAST(dayofweek(ts) + 1 AS BIGINT) AS day_of_week,
    CAST(day(ts) AS BIGINT) AS day_of_month,
    CAST(month(ts) AS BIGINT) AS month,
    CAST(quarter(ts) AS BIGINT) AS quarter,
    CAST(year(ts) AS BIGINT) AS year
FROM events
"""

PIVOT_STATUS_SQL = """
SELECT o_orderpriority,
    -- CAST AS BIGINT: DuckDB SUM over ints yields HUGEINT, which pandas
    -- renders float64 ('976.0') while Spark's bigint hashes '976'.
    CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS status_f,
    CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS status_o,
    CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS status_p
FROM orders GROUP BY o_orderpriority
"""

LAG_LEAD_SQL = """
SELECT event_id, user_id,
    epoch_us(ts) - epoch_us(lag(ts) OVER w) AS us_since_prev,
    epoch_us(lead(ts) OVER w) - epoch_us(ts) AS us_until_next,
    CAST(ntile(4) OVER (ORDER BY value, event_id) AS BIGINT) AS value_quartile
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

SETOPS_SQL = """
SELECT 'EXCEPT' AS op, user_id FROM (
    SELECT user_id FROM events WHERE event_type = 'purchase'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error'
)
UNION ALL
SELECT 'INTERSECT' AS op, user_id FROM (
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
)
"""

ABOVE_AVG_ORDERS_SQL = """
WITH w AS (
    SELECT o_orderkey, o_custkey, o_totalprice,
        ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey), 2)
            / COUNT(*) OVER (PARTITION BY o_custkey) AS cust_avg
    FROM orders
)
SELECT o_orderkey, o_custkey, o_totalprice, cust_avg
FROM w WHERE o_totalprice > cust_avg
"""

PERCENTILE_SQL = """
SELECT event_type,
    ROUND(quantile_cont(value, 0.5), 4) AS p50,
    ROUND(quantile_cont(value, 0.9), 4) AS p90,
    ROUND(quantile_cont(value, 0.99), 4) AS p99,
    COUNT(*) AS n
FROM events GROUP BY event_type
"""

ROLLUP_ORDERS_SQL = """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
    COALESCE(o_orderstatus, 'ALL') AS status,
    COUNT(*) AS n_orders,
    ROUND(SUM(o_totalprice) / 1000000.0, 4) AS value_m
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""

PHYSICS_SUITE_SQL = f"""
WITH base AS (
    SELECT event_id, {MAG} AS magnitude, {DEP} AS depth_km,
        ROUND(1.5 * {MAG} - 2.5 * LOG10({DEP} + 1.0) + 2.0, 1) AS mercalli_intensity
    FROM events
)
SELECT event_id, magnitude, depth_km,
    1.5 * magnitude + 4.8 AS energy_joules_log,
    -- + 0.0 folds -0.0 (DuckDB ROUND signs its zero; Spark does not)
    mercalli_intensity + 0.0 AS mercalli_intensity,
    CASE WHEN mercalli_intensity >= 10 THEN 'X+ (Extreme)'
         WHEN mercalli_intensity >= 8 THEN 'VIII-IX (Severe)'
         WHEN mercalli_intensity >= 6 THEN 'VI-VII (Strong)'
         WHEN mercalli_intensity >= 4 THEN 'IV-V (Moderate)'
         WHEN mercalli_intensity >= 2 THEN 'II-III (Weak)'
         ELSE 'I (Not Felt)' END AS mercalli_scale,
    1.5 * magnitude + 9.1 AS seismic_moment_log,
    ROUND(POWER(10.0, 0.74 * magnitude - 3.55), 2) AS rupture_length_km,
    magnitude - 1.2 AS expected_aftershock_mag,
    (magnitude * 15.0) - (depth_km * 0.2)
        + (CASE WHEN depth_km < 70 THEN 25.0 ELSE 0.0 END)
        + (CASE WHEN magnitude >= 7.0 THEN 30.0 ELSE 0.0 END) AS tsunami_risk_score,
    CASE WHEN mercalli_intensity >= 8 THEN 'EXTREME'
         WHEN mercalli_intensity >= 6 THEN 'HIGH'
         WHEN mercalli_intensity >= 4 THEN 'MODERATE'
         WHEN mercalli_intensity >= 2 THEN 'LOW'
         ELSE 'MINIMAL' END AS damage_potential,
    CAST(magnitude >= 7.0 AND depth_km < 70 AS BIGINT) AS tsunami_potential
FROM base
"""

PHYSICS_DAMAGE_SUMMARY_SQL = f"""
WITH base AS (
    SELECT value,
        ROUND(1.5 * {MAG} - 2.5 * LOG10({DEP} + 1.0) + 2.0, 1) AS mmi
    FROM events
), labeled AS (
    SELECT value, mmi,
        CASE WHEN mmi >= 8 THEN 'EXTREME'
             WHEN mmi >= 6 THEN 'HIGH'
             WHEN mmi >= 4 THEN 'MODERATE'
             WHEN mmi >= 2 THEN 'LOW'
             ELSE 'MINIMAL' END AS damage_potential
    FROM base
), agg AS (
    SELECT damage_potential,
        COUNT(*) AS event_count,
        ROUND(SUM(value), 2) AS value_sum,
        ROUND(SUM(mmi), 1) AS mmi_sum
    FROM labeled GROUP BY damage_potential
)
SELECT damage_potential, event_count,
    (value_sum / 50.0) / event_count AS avg_magnitude,
    mmi_sum / event_count AS avg_mmi,
    CAST(ROW_NUMBER() OVER (ORDER BY CASE damage_potential
        WHEN 'EXTREME' THEN 1 WHEN 'HIGH' THEN 2 WHEN 'MODERATE' THEN 3
        WHEN 'LOW' THEN 4 ELSE 5 END) AS BIGINT) AS display_order
FROM agg
"""

SESSIONIZE_SQL = """
WITH flagged AS (
    SELECT user_id, event_id, ts, value,
        CASE WHEN lag(ts) OVER w IS NULL
             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), tagged AS (
    SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
    FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    epoch_us(MIN(ts)) AS session_start_us,
    epoch_us(MAX(ts)) AS session_end_us,
    ROUND(SUM(value), 2) AS session_value
FROM tagged GROUP BY user_id, session_seq
"""

# The HLL register/estimate SQL is generated by the operator module from
# the same constants (p, hash width, alpha literal) as the Spark side, so
# the two can never drift.
from ..operators.sketch import oracle_sql as _hll_oracle_sql  # noqa: E402

APPROX_DISTINCT_SQL = f"""
WITH base AS (
    SELECT event_type,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type
),
hll AS ({_hll_oracle_sql("events", "user_id", ["event_type"], p=12, out_col="hll_users")})
SELECT base.event_type, base.exact_users, hll.hll_users, base.n_events
FROM base JOIN hll USING (event_type)
"""

ORACLES: dict[str, str] = {
    "flagship_regional_rollup": FLAGSHIP_SQL,
    "approx_distinct_users": APPROX_DISTINCT_SQL,
    "dedup_keep_latest": DEDUP_KEEP_LATEST_SQL,
    "window_priority_pick": WINDOW_PRIORITY_PICK_SQL,
    "rolling_daily_metrics": ROLLING_DAILY_SQL,
    "dense_rank_nations": DENSE_RANK_NATIONS_SQL,
    "spatial_box_enrich": SPATIAL_BOX_ENRICH_SQL,
    "band_join_classify": BAND_CLASSIFY_SQL,
    "band_case_classify": BAND_CASE_CLASSIFY_SQL,
    "anti_join_inactive_customers": ANTI_JOIN_SQL,
    "union_by_name_mixed": UNION_BY_NAME_SQL,
    "agg_pricing_summary": AGG_PRICING_SQL,
    "agg_global_kpi": AGG_GLOBAL_KPI_SQL,
    "agg_histogram_case": AGG_HISTOGRAM_SQL,
    "agg_monthly_rollup": AGG_MONTHLY_ROLLUP_SQL,
    "agg_conditional_pivot": AGG_CONDITIONAL_PIVOT_SQL,
    "agg_frequency_table": AGG_FREQUENCY_SQL,
    "agg_duplicate_audit": AGG_DUPLICATE_AUDIT_SQL,
    "quality_null_audit": QUALITY_NULL_AUDIT_SQL,
    "watermark_incremental_filter": WATERMARK_FILTER_SQL,
    "validate_and_clean": VALIDATE_CLEAN_SQL,
    "membership_topk": MEMBERSHIP_TOPK_SQL,
    "case_custom_sort": CASE_CUSTOM_SORT_SQL,
    "temporal_features": TEMPORAL_FEATURES_SQL,
    "percentile_by_type": PERCENTILE_SQL,
    "rollup_orders": ROLLUP_ORDERS_SQL,
    "pivot_status_by_priority": PIVOT_STATUS_SQL,
    "above_avg_orders": ABOVE_AVG_ORDERS_SQL,
    "lag_lead_deltas": LAG_LEAD_SQL,
    "setops_purchasers": SETOPS_SQL,
    "physics_suite": PHYSICS_SUITE_SQL,
    "physics_damage_summary": PHYSICS_DAMAGE_SUMMARY_SQL,
    "sessionize_users": SESSIONIZE_SQL,
}
