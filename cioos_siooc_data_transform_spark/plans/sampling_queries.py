"""Sampling + sketch operators for training-data pipelines.

Deterministic sampling is hash-based (md5 prefix → integer bucket), so the
same row set is selected on every engine and every run — the property a
reproducible data pipeline needs (rand()-based sampling can't be
oracle-checked and isn't replayable). Sketch estimates (HLL distinct,
approximate quantiles) are engine-specific by nature, so their queries
emit the exact aggregate plus within-tolerance booleans computed in the
same plan; the oracle computes the exact side and pins the booleans TRUE
(a sketch regression flips a boolean and fails the hash-match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.operators.text import token_counts
from cioos_siooc_data_transform_spark.plans.registry import register
from cioos_siooc_data_transform_spark.session import read_table as _t


def deterministic_bucket(key):
    """md5-prefix bucket in 0..99 — THE shared deterministic-keying
    expression for sampling and split assignment (one definition so the
    two can never silently diverge)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("long") % 100
    )


def deterministic_sample_pred(key, pct: int):
    """Keep rows whose md5-derived bucket (0..99) < pct. Stable across
    engines, runs, and partitionings."""
    return deterministic_bucket(key) < pct


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


@register(
    "sketch_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           count(*) AS n_events,
           TRUE AS sketch_within_5pct
    FROM events GROUP BY event_type
    """,
)
def sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event type — the sketch
    path for cardinalities too large to count exactly.

    The sketch estimate itself is engine-specific, so the driver-checked
    contract is the TOLERANCE: the query emits the exact distinct count
    plus a boolean asserting the HLL estimate (rsd=2%) landed within 5%
    of it; the oracle computes the exact side and pins the boolean TRUE.
    A sketch regression (wrong rsd wiring, hash change) flips the boolean
    and fails the hash-match.
    """
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
        F.count_distinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        "n_events",
        (
            F.abs(F.col("_approx") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("sketch_within_5pct"),
    )


@register(
    "sketch_quantiles",
    oracle="""
    SELECT o_orderstatus, count(*) AS n_orders,
           TRUE AS p50_within_2pct, TRUE AS p90_within_2pct, TRUE AS p99_within_2pct
    FROM orders GROUP BY o_orderstatus
    """,
)
def sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) over order totals.

    Same tolerance contract as sketch_distinct_users: the sketch quantile
    is compared against Spark's exact interpolated percentile in the same
    plan, and the driver-checked output is the per-quantile
    within-2%-relative boolean (plus the exact group count). The oracle
    pins the booleans TRUE.
    """
    o = _t(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.expr("approx_percentile(o_totalprice, array(0.5, 0.9, 0.99))").alias("_ap"),
        F.expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))").alias("_ex"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    within = [
        (
            F.abs(F.col("_ap")[i] - F.col("_ex")[i]) <= 0.02 * F.abs(F.col("_ex")[i])
        ).alias(f"p{p}_within_2pct")
        for i, p in enumerate((50, 90, 99))
    ]
    return agg.select("o_orderstatus", "n_orders", *within)


@register(
    "train_val_test_split",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
               % 100 AS bucket
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split keyed on a stable doc-id hash — the
    reproducible-split primitive a training pipeline needs (the same doc
    lands in the same split on every engine, run, and partitioning;
    rand()-based splits can't be replayed or oracle-checked)."""
    docs = _t(spark, sf_dir, "documents")
    bucket = deterministic_bucket(F.col("doc_id"))
    return docs.select(
        "doc_id",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "pack_training_shards",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS salt,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ), packed AS (
      SELECT doc_id, n_tok, salt,
             sum(n_tok) OVER (PARTITION BY salt ORDER BY h, doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_tok
      FROM tok
    )
    SELECT doc_id, n_tok,
           salt || '-' || CAST((cum_tok - n_tok) // 20000 AS VARCHAR) AS shard_id
    FROM packed
    """,
)
def pack_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget shard packing (20k tokens per shard): docs are
    pseudo-shuffled by id hash, then assigned to the shard their running
    token count starts in.

    Scale design: a single global running sum is inherently sequential,
    so packing runs inside 16 independent hash-salt streams (one window
    shuffle, 16 parallel partitions that stay balanced because the salt
    is a hash prefix) — shard ids are salt-local. At 1000 executors,
    widen the salt to 2-3 hex chars; no global ordering bottleneck."""
    docs = _t(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    tok = docs.select(
        "doc_id",
        token_counts(F.col("text"))[0].cast("long").alias("n_tok"),
        F.substring(h, 1, 1).alias("salt"),
        h.alias("h"),
    )
    w = (
        Window.partitionBy("salt")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = tok.withColumn("cum_tok", F.sum("n_tok").over(w))
    return packed.select(
        "doc_id",
        "n_tok",
        F.concat(
            F.col("salt"),
            F.lit("-"),
            F.floor((F.col("cum_tok") - F.col("n_tok")) / 20000).cast("string"),
        ).alias("shard_id"),
    )
