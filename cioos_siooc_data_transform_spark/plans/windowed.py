"""Time-window [Q] operators (SURVEY.md §2.9 beyond-reference extensions):
tumbling-window aggregates and session windows over the events table.

The streaming twins (withWatermark + writeStream) live in
cioos_siooc_data_transform_spark/streaming/; these batch versions share the
same window semantics and are what the driver hash-checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.plans.registry import register


from cioos_siooc_data_transform_spark.session import read_table as _t


# ---------------------------------------------------------------------------
# Tumbling 1-hour window aggregate (Spark window() ↔ date_trunc oracle).
# ---------------------------------------------------------------------------
@register(
    "tumbling_window_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_window_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value"
        )
    )


# ---------------------------------------------------------------------------
# Session windows (30-min gap) — Spark session_window ↔ gaps-and-islands SQL.
# ---------------------------------------------------------------------------
@register(
    "session_windows",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), numbered AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, max(ts) AS session_last,
           count(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    sw = events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_last"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return sw.select("user_id", "session_start", "session_last", "n_events")


# ---------------------------------------------------------------------------
# Sliding-window ranking: top event per user per day (window + row_number).
# ---------------------------------------------------------------------------
@register(
    "daily_top_event",
    oracle="""
    SELECT user_id, day, event_id, value FROM (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_id, value,
             row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                ORDER BY value DESC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def daily_top_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    w = Window.partitionBy("user_id", "day").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        events.select("user_id", day, "event_id", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Cumulative window frame: running per-user value totals in time order
# (ROWS UNBOUNDED PRECEDING — the frame-spec coverage).
# ---------------------------------------------------------------------------
@register(
    "running_user_totals_batch",
    oracle="""
    SELECT event_id, user_id,
           CAST(row_number() OVER w AS BIGINT) AS n_so_far,
           round(sum(value) OVER w, 4) AS total_so_far
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING)
    """,
)
def running_user_totals_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .cast("long")
        .alias("n_so_far"),
        F.round(F.sum("value").over(w), 4).alias("total_so_far"),
    )
