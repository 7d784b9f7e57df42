"""Report layer: the nine dashboard queries as DataFrame-returning functions.

SQL text mirrors 06_display_reporting.py:107-301 (data only — the HTML/KPI
rendering is presentation, SURVEY.md §7 step 6). All queries run through
``spark.sql`` against the warehouse's registered views, exercising the E3
SQL entry surface end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.warehouse import Warehouse


def events_by_region(spark: SparkSession) -> DataFrame:
    """Bar chart: events per region (ref: 06:107-121)."""
    return spark.sql("""
        SELECT tectonic_region AS region,
               total_events AS events,
               critical_events AS critical,
               high_risk_events AS high_risk,
               max_magnitude AS max_mag
        FROM gold_region_summary
        ORDER BY total_events DESC
    """)


def significant_event_map(spark: SparkSession) -> DataFrame:
    """Map: M5+ events, most recent 3000 (ref: 06:127-141)."""
    return spark.sql("""
        SELECT latitude, longitude, magnitude, depth_km, place,
               risk_level, tectonic_region, event_time
        FROM silver_earthquakes
        WHERE magnitude >= 5.0
        ORDER BY event_time DESC
        LIMIT 3000
    """)


def daily_trend(spark: SparkSession) -> DataFrame:
    """Line chart: daily totals + 7-day rolling average (ref: 06:147-160)."""
    return spark.sql("""
        SELECT event_date, total_events, max_magnitude, critical_events,
               ROUND(rolling_7d_count / 7.0, 0) AS rolling_7d_avg
        FROM gold_temporal_metrics
        ORDER BY event_date
    """)


def magnitude_distribution(spark: SparkSession) -> DataFrame:
    """Histogram over CASE magnitude buckets (ref: 06:166-187)."""
    return spark.sql("""
        SELECT CASE
                 WHEN magnitude >= 8 THEN '8+ Great'
                 WHEN magnitude >= 7 THEN '7-7.9 Major'
                 WHEN magnitude >= 6 THEN '6-6.9 Strong'
                 WHEN magnitude >= 5 THEN '5-5.9 Moderate'
                 WHEN magnitude >= 4 THEN '4-4.9 Light'
                 WHEN magnitude >= 3 THEN '3-3.9 Minor'
                 ELSE '< 3 Micro'
               END AS magnitude_category,
               COUNT(*) AS count
        FROM silver_earthquakes
        GROUP BY 1
        ORDER BY count DESC
    """)


def damage_potential_summary(spark: SparkSession) -> DataFrame:
    """Physics damage distribution w/ custom CASE collation (ref: 06:193-215)."""
    return spark.sql("""
        SELECT damage_potential,
               COUNT(*) AS event_count,
               ROUND(AVG(magnitude), 2) AS avg_magnitude,
               ROUND(AVG(mercalli_intensity), 1) AS avg_mmi,
               ROUND(AVG(rupture_length_km), 2) AS avg_rupture_km
        FROM gold_physics_analysis
        GROUP BY damage_potential
        ORDER BY CASE damage_potential
                   WHEN 'EXTREME' THEN 1
                   WHEN 'HIGH' THEN 2
                   WHEN 'MODERATE' THEN 3
                   WHEN 'LOW' THEN 4
                   ELSE 5
                 END
    """)


def regional_tsunami_risk(spark: SparkSession) -> DataFrame:
    """Regional physics: tsunami score ranking (ref: 06:221-235)."""
    return spark.sql("""
        SELECT tectonic_region, total_events, avg_magnitude,
               avg_mmi AS avg_mercalli,
               avg_tsunami_score AS tsunami_score,
               extreme_count + high_count AS high_impact_events
        FROM gold_regional_physics
        ORDER BY avg_tsunami_score DESC
    """)


def recent_major_events(spark: SparkSession) -> DataFrame:
    """Recent 50 M6+ events (ref: 06:241-259)."""
    return spark.sql("""
        SELECT event_time, magnitude, depth_km, place,
               tectonic_region, risk_level, tsunami_potential
        FROM silver_earthquakes
        WHERE magnitude >= 6.0
        ORDER BY event_time DESC
        LIMIT 50
    """)


def monthly_trends(spark: SparkSession) -> DataFrame:
    """Month-grain re-aggregation of daily gold (ref: 06:265-282)."""
    return spark.sql("""
        SELECT year, month,
               SUM(total_events) AS events,
               ROUND(AVG(avg_magnitude), 2) AS avg_mag,
               MAX(max_magnitude) AS max_mag,
               SUM(critical_events) AS critical,
               SUM(tsunami_events) AS tsunami
        FROM gold_temporal_metrics
        GROUP BY year, month
        ORDER BY year, month
    """)


def watermark_status(spark: SparkSession) -> DataFrame:
    """Pipeline state display (ref: 06:288-301)."""
    return spark.sql("""
        SELECT table_name, watermark_value, last_updated, records_processed
        FROM control_watermark
    """)


ALL_REPORTS = {
    "events_by_region": events_by_region,
    "significant_event_map": significant_event_map,
    "daily_trend": daily_trend,
    "magnitude_distribution": magnitude_distribution,
    "damage_potential_summary": damage_potential_summary,
    "regional_tsunami_risk": regional_tsunami_risk,
    "recent_major_events": recent_major_events,
    "monthly_trends": monthly_trends,
    "watermark_status": watermark_status,
}


def run_all(wh: Warehouse) -> dict[str, DataFrame]:
    """Register views and build every report DataFrame (lazy)."""
    wh.register_views()
    return {name: fn(wh.spark) for name, fn in ALL_REPORTS.items()}
