"""Event-stream analytics over the ``events`` fixture — funnel conversion
and retention cohorts, the two canonical product-analytics queries.

Both are one-shuffle shapes (partition by user) that scale to arbitrary
event volume: the per-user state is a window, never a collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load


@register(
    "funnel_view_to_purchase",
    oracle="""
    WITH vp AS (
      SELECT user_id, ts, event_type,
             LAG(event_type) OVER w AS prev_type,
             LAG(ts) OVER w AS prev_ts
      FROM events
      WHERE event_type IN ('view', 'purchase')
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'purchase' AND prev_type = 'view'
                          AND ts - prev_ts <= INTERVAL 1 HOUR
                    THEN 1 ELSE 0 END) AS BIGINT) AS conversions,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views
    FROM vp GROUP BY user_id
    HAVING SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) > 0
    """,
)
def funnel_view_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion: purchases directly preceded by a view within 1h,
    per user. LAG over (user, time) — sessionization's little sibling; one
    shuffle on user_id, deterministic tie-break on event_id."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type").isin("view", "purchase"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("ts").over(w).alias("prev_ts"),
    )
    converted = (
        (F.col("event_type") == "purchase")
        & (F.col("prev_type") == "view")
        & (F.col("ts").cast("long") - F.col("prev_ts").cast("long") <= 3600)
    )
    return (
        flagged.groupBy("user_id")
        .agg(
            F.sum(converted.cast("int")).alias("conversions"),
            F.sum((F.col("event_type") == "view").cast("int")).alias("views"),
        )
        .filter(F.col("views") > 0)
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, ts,
             CAST(MIN(ts) OVER (PARTITION BY user_id) AS DATE) AS cohort_day
      FROM events
    )
    SELECT cohort_day,
           CAST(DATEDIFF('day', cohort_day, CAST(ts AS DATE)) AS INT) AS day_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
    FROM firsts
    WHERE DATEDIFF('day', cohort_day, CAST(ts AS DATE)) <= 7
    GROUP BY cohort_day, DATEDIFF('day', cohort_day, CAST(ts AS DATE))
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D0-D7 retention: users grouped by first-seen day, distinct actives
    per (cohort, day offset). The window MIN replaces a first-events
    self-join — one shuffle on user_id, then the count-distinct agg."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    firsts = ev.select(
        "user_id",
        "ts",
        F.min("ts").over(w).cast("date").alias("cohort_day"),
    )
    offset = F.datediff(F.col("ts").cast("date"), F.col("cohort_day"))
    return (
        firsts.withColumn("day_offset", offset)
        .filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("active_users"))
    )
