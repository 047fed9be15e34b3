"""Sampling + sketch operators for training-data pipelines.

Deterministic sampling is hash-based (md5 prefix → integer bucket), so the
same row set is selected on every engine and every run — the property a
reproducible data pipeline needs (rand()-based sampling can't be
oracle-checked and isn't replayable). Sketches (HLL distinct, approximate
quantiles) are engine-specific by nature → rows-only driver check, with a
tolerance-vs-exact assertion in the test suite instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.plans.registry import register
from cioos_siooc_data_transform_spark.session import read_table as _t


def deterministic_sample_pred(key, pct: int):
    """Keep rows whose md5-derived bucket (0..99) < pct. Stable across
    engines, runs, and partitionings."""
    bucket = (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("long") % 100
    )
    return bucket < pct


@register(
    "deterministic_sample",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE (CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4)) AS INTEGER) % 100) < 10
    """,
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% reproducible sample keyed on the row id."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(deterministic_sample_pred(F.col("o_orderkey"), 10)).select(
        "o_orderkey", "o_totalprice"
    )


@register(
    "stratified_sample",
    oracle="""
    SELECT o_orderpriority, o_orderkey FROM (
      SELECT o_orderpriority, o_orderkey,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 100
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 100 rows per stratum, chosen by hash order (deterministic,
    uniform-ish, engine-independent)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .select("o_orderpriority", "o_orderkey")
    )


@register("sketch_distinct_users")  # HLL sketch — engine-specific, rows-only check
def sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event type — the sketch
    path for cardinalities too large to count exactly; accuracy asserted
    against the exact count in tests/test_sampling.py."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register("sketch_quantiles")  # t-digest-style sketch — rows-only check
def sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile over order totals — the sketch quantile path;
    accuracy asserted against exact percentiles in tests."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("approx_percentile(o_totalprice, array(0.5, 0.9, 0.99))").alias("pcts"),
        F.count(F.lit(1)).alias("n_orders"),
    )
