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
