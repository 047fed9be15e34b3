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
           CAST(sum(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 10000.0 AS sum_value
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
            # per-row 1e-4-unit quantization BEFORE the sum: integer
            # addition is order-independent, so the hash cannot drift
            # with partial-agg summation order (round-after-float-sum
            # left only 5e-5 of slack)
            (
                F.sum(F.floor(F.col("value") * 10000.0 + 0.5).cast("long"))
                .cast("double")
                / 10000.0
            ).alias("sum_value"),
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


# ---------------------------------------------------------------------------
# Ordered event funnel: view -> click -> purchase, each stage's first
# occurrence strictly after the previous stage's. The cascade of
# min-after-predecessor aggregations is the scale-correct funnel shape:
# each stage is a filtered groupBy(user) (map-side combinable) joined
# back on user_id — high-cardinality uniform key, no window over the
# whole event history, no sessionization state.
# ---------------------------------------------------------------------------
@register(
    "funnel_stages",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
           1 + CASE WHEN c.t_click IS NULL THEN 0 ELSE 1 END
             + CASE WHEN p.t_purchase IS NULL THEN 0 ELSE 1 END AS stage
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user conversion funnel over the events stream: the first view,
    the first click strictly after it, and the first purchase strictly
    after that, with the stage number reached (1-3). Each stage is a
    filtered min-aggregation joined to its predecessor on user_id."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            (
                F.lit(1)
                + F.when(F.col("t_click").isNull(), 0).otherwise(1)
                + F.when(F.col("t_purchase").isNull(), 0).otherwise(1)
            ).alias("stage"),
        )
    )


# ---------------------------------------------------------------------------
# Hourly grid + LOCF gap fill: regularize an irregular observation stream
# onto a dense hourly grid, carrying the last observation forward through
# gaps — the standard sensor/mooring regularization (and the window twin
# of the reference's regular-timeseries generation). The grid is built
# from a scalar (min, max) hour pair cross-joined to the distinct series
# keys, so grid size is |series| x |hours| regardless of event volume;
# the fill itself is one last(ignorenulls) running window per series.
# ---------------------------------------------------------------------------
@register(
    "gap_fill_locf",
    oracle="""
    WITH obs AS (
      SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id,
             round(sum(value), 2) AS v
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT min(hour_id) AS h0, max(hour_id) AS h1 FROM obs
    ), grid AS (
      SELECT t.event_type, unnest(generate_series(b.h0, b.h1)) AS hour_id
      FROM (SELECT DISTINCT event_type FROM events) t, bounds b
    )
    SELECT grid.event_type, grid.hour_id,
           last_value(obs.v IGNORE NULLS) OVER (
             PARTITION BY grid.event_type ORDER BY grid.hour_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS v_filled,
           (obs.v IS NOT NULL) AS was_observed
    FROM grid LEFT JOIN obs
      ON grid.event_type = obs.event_type AND grid.hour_id = obs.hour_id
    """,
)
def gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event type with gaps filled by the last
    observed hourly aggregate (LOCF). Leading hours before a series'
    first observation stay NULL — LOCF has nothing to carry. Plan: tiny
    grid build (scalar bounds broadcast x distinct keys), left join
    keyed by (series, hour), one running last(ignorenulls) window."""
    ev = _t(spark, sf_dir, "events")
    obs = (
        ev.select(
            "event_type",
            F.floor(F.col("ts").cast("double") / 3600).cast("long").alias("hour_id"),
            "value",
        )
        .groupBy("event_type", "hour_id")
        .agg(F.round(F.sum("value"), 2).alias("v"))
    )
    bounds = obs.agg(
        F.min("hour_id").alias("h0"), F.max("hour_id").alias("h1")
    )
    # the distinct key list comes from the tiny AGGREGATE (which by
    # construction contains every event_type), not a second full scan of
    # the fact table
    keys = obs.select("event_type").distinct()
    grid = keys.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hour_id"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, ["event_type", "hour_id"], "left")
        .select(
            "event_type",
            "hour_id",
            F.last("v", ignorenulls=True).over(w).alias("v_filled"),
            F.col("v").isNotNull().alias("was_observed"),
        )
    )


@register(
    "sessionize_gap",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, epoch(ts) AS es FROM events
    ), flagged AS (
      SELECT user_id, event_id, es,
             CASE WHEN es - lag(es) OVER w > 1800.0 OR lag(es) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
    )
    SELECT user_id, event_id,
           CAST(sum(is_new) OVER (
             PARTITION BY user_id ORDER BY es, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS session_id
    FROM flagged
    """,
)
def sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by inactivity gap (> 30 min starts a new
    session): flag session starts with one lag window, then number
    sessions with a running sum — the standard two-window assignment,
    both windows on the same (user, time) ordering so Spark plans ONE
    shuffle and sorts once. The batch twin of the streaming
    session_windows aggregation. Ties broken by event_id for full
    determinism."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").cast("double").alias("es")
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    flagged = ev.withColumn(
        "is_new",
        F.when(
            (F.col("es") - F.lag("es").over(w) > 1800.0)
            | F.lag("es").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return flagged.select(
        "user_id", "event_id", F.sum("is_new").over(cum).alias("session_id")
    )
