"""As-of join and salted-join [Q] operators with DuckDB oracles
(DuckDB has native ASOF JOIN — the perfect oracle for the union+window
Spark implementation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.operators.asof import asof_join, salted_join
from cioos_siooc_data_transform_spark.plans.registry import register
from cioos_siooc_data_transform_spark.session import read_table as _t


@register(
    "asof_join_events",
    oracle="""
    SELECT l.event_id, l.ts, l.user_id, l.event_type, l.value, l.props,
           r.value AS right_value, r.event_id AS right_event_id
    FROM (SELECT * FROM events WHERE event_type != 'signup') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each event gets the most recent prior 'signup'
    row of the same user (union + one window pass — no pair explosion)."""
    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") != "signup")
    right = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", "value", "event_id"
    )
    return asof_join(left, right, key="user_id", right_cols=["value", "event_id"])


@register(
    "salted_skew_join",
    oracle="""
    SELECT s.s_nationkey,
           count(*) AS n_items,
           round(sum(l.l_extendedprice), 2) AS sum_price
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (the skew treatment); the salt is dropped before
    aggregation so the result equals the plain join — which is exactly
    what the oracle checks."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    joined = salted_join(li, supp, key="l_suppkey", salt_buckets=8)
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# Binned interval (range) join: events x maintenance windows. A naive
# range join (ts BETWEEN start AND end) plans as a nested-loop/cartesian;
# the scale-correct pattern is to quantize the time axis into bins no
# smaller than the longest interval, explode each interval to the bins it
# covers (<= 2 here), equi-join on the bin key, then apply the exact
# bound filter. The join is then a plain shuffled hash join on a
# high-cardinality integer key — linear, AQE-skew-splittable, no
# BroadcastNestedLoop anywhere.
# ---------------------------------------------------------------------------
_IVAL_EPOCH0 = 1704067200  # 2024-01-01 00:00:00 UTC
_IVAL_STEP = 25200  # window starts every 7 h
_IVAL_LEN = 10800  # each window lasts 3 h == bin width


@register(
    "interval_bin_join",
    oracle=f"""
    WITH win AS (
      SELECT w_id,
             CAST({_IVAL_EPOCH0} + w_id * {_IVAL_STEP} AS DOUBLE) AS se,
             CAST({_IVAL_EPOCH0} + w_id * {_IVAL_STEP} + {_IVAL_LEN} AS DOUBLE) AS ee
      FROM generate_series(0, 99) AS g(w_id)
    ), ev AS (
      SELECT event_id, value, epoch(ts) AS es,
             CAST(floor(epoch(ts) / {_IVAL_LEN}) AS BIGINT) AS bin
      FROM events
    ), wb AS (
      SELECT w_id, se, ee, unnest(generate_series(
               CAST(floor(se / {_IVAL_LEN}) AS BIGINT),
               CAST(floor((ee - 1) / {_IVAL_LEN}) AS BIGINT))) AS bin
      FROM win
    )
    SELECT w_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM ev JOIN wb USING (bin)
    WHERE es >= se AND es < ee
    GROUP BY w_id
    """,
)
def interval_bin_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events falling inside each 3-hour maintenance window (windows open
    every 7 hours through January 2024), joined via time-axis binning:
    bin width == max interval length, intervals explode to <= 2 covered
    bins, events map to exactly 1, and the range predicate runs as a
    residual filter AFTER the bin equi-join. Timestamp comparison happens
    on epoch seconds as DOUBLE (identical µs-derived values in both
    engines)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "value",
        F.col("ts").cast("double").alias("es"),
        F.floor(F.col("ts").cast("double") / _IVAL_LEN).cast("long").alias("bin"),
    )
    win = spark.range(100).select(
        F.col("id").alias("w_id"),
        (F.lit(_IVAL_EPOCH0) + F.col("id") * _IVAL_STEP).cast("double").alias("se"),
        (F.lit(_IVAL_EPOCH0) + F.col("id") * _IVAL_STEP + _IVAL_LEN)
        .cast("double")
        .alias("ee"),
    )
    wb = win.select(
        "w_id",
        "se",
        "ee",
        F.explode(
            F.sequence(
                F.floor(F.col("se") / _IVAL_LEN).cast("long"),
                F.floor((F.col("ee") - 1) / _IVAL_LEN).cast("long"),
            )
        ).alias("bin"),
    )
    return (
        ev.join(wb, "bin")
        .filter((F.col("es") >= F.col("se")) & (F.col("es") < F.col("ee")))
        .groupBy("w_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
