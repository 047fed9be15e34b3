"""Extended analytics coverage: multi-join aggregations (TPC-H Q3/Q5
shapes), rollup/cube/grouping sets, distinct aggregation, pivot,
correlated-aggregate comparison, full outer join, exact percentiles.

The reference never needs these (it has no query engine), but a user
replacing it with this engine gets the full relational surface Spark
provides — each shape is oracle-checked like everything else.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.session import checkpoint_df
from cioos_siooc_data_transform_spark.operators.graphs import copurchase_pair_support
from cioos_siooc_data_transform_spark.plans.registry import register
from cioos_siooc_data_transform_spark.session import read_table as _t


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@register(
    "q5_supplier_volume",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .join(
            F.broadcast(s),
            (l["l_suppkey"] == s["s_suppkey"]) & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "rollup_returns",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "cube_events",
    oracle="""
    SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) AS n_events
    FROM events
    GROUP BY CUBE (event_type, CAST(date_trunc('day', ts) AS TIMESTAMP))
    """,
)
def cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    return ev.select("event_type", day).cube("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_events")
    )


@register(
    "grouping_sets_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_total
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "distinct_aggregation",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def distinct_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("long").alias("n_parts"),
        F.countDistinct("l_suppkey").cast("long").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "pivot_status_revenue",
    oracle="""
    SELECT o_orderpriority,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS O,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS F,
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    return pivoted


@register(
    "correlated_above_avg",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    JOIN (
      SELECT o_custkey, avg(o_totalprice) AS avg_total
      FROM orders GROUP BY o_custkey
    ) a ON o.o_custkey = a.o_custkey
    WHERE o.o_totalprice > a.avg_total * 1.5
    """,
)
def correlated_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-aggregate comparison (decorrelated to a join — the plan
    Catalyst produces for the subquery form anyway)."""
    o = _t(spark, sf_dir, "orders")
    avgs = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.avg("o_totalprice").alias("avg_total")
    )
    return (
        o.join(avgs, o["o_custkey"] == avgs["ck"])
        .filter(F.col("o_totalprice") > F.col("avg_total") * 1.5)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "full_outer_reconcile",
    oracle="""
    WITH big_cust AS (
      SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    ), busy_cust AS (
      SELECT o_custkey AS c_custkey, count(*) AS n_orders
      FROM orders GROUP BY o_custkey HAVING count(*) >= 15
    )
    SELECT coalesce(b.c_custkey, u.c_custkey) AS custkey,
           (b.c_custkey IS NOT NULL) AS is_big,
           (u.c_custkey IS NOT NULL) AS is_busy
    FROM big_cust b FULL OUTER JOIN busy_cust u ON b.c_custkey = u.c_custkey
    """,
)
def full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    big = c.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    busy = (
        o.groupBy(F.col("o_custkey").alias("bk"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
    )
    j = big.join(busy, big["c_custkey"] == busy["bk"], "full_outer")
    return j.select(
        F.coalesce(F.col("c_custkey"), F.col("bk")).alias("custkey"),
        F.col("c_custkey").isNotNull().alias("is_big"),
        F.col("bk").isNotNull().alias("is_busy"),
    )


@register(
    "exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
           round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("median_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90_price"),
    )


@register(
    "robust_zscore_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ), mad AS (
      SELECT e.event_type, med, quantile_cont(abs(e.value - med), 0.5) AS mad
      FROM events e JOIN med USING (event_type)
      GROUP BY e.event_type, med
    )
    SELECT event_id, event_type, robust_z FROM (
      SELECT event_id, e.event_type,
             floor((e.value - med) / (1.4826 * mad) * 1000000.0 + 0.5)
               / 1000000.0 AS robust_z
      FROM events e JOIN mad USING (event_type)
      WHERE mad > 0.0
    ) WHERE abs(robust_z) > 3.5
    """,
)
def robust_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust z-score outlier screen (Iglewicz & Hoaglin's
    |z| > 3.5 rule with the 1.4826 normal-consistency constant) — unlike
    mean/stddev z-scores, the estimate itself is not dragged by the
    outliers it hunts. Two exact-percentile aggregations per group plus a
    join back; at 100 TB swap percentile → approx_percentile (documented
    trade: exact medians need a per-group sort). Groups whose MAD is 0
    (over half the values identical) are excluded — the score is
    undefined there. The |z| > 3.5 cut is applied to the 6-dp-rounded z
    on BOTH engines (not the raw float): med/mad come from different
    interpolation code paths (Spark percentile vs DuckDB quantile_cont),
    and a last-ulp difference at the boundary would otherwise flip row
    membership — rounding first makes the boundary decision use the same
    canonicalized value that is hashed."""
    ev = _t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        ev.join(med, "event_type")
        .groupBy("event_type", "med")
        .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
    )
    z = (F.col("value") - F.col("med")) / (1.4826 * F.col("mad"))
    rounded_z = F.floor(z * 1000000.0 + 0.5) / 1000000.0
    return (
        ev.join(mad, "event_type")
        .filter(F.col("mad") > 0.0)
        .select("event_id", "event_type", rounded_z.alias("robust_z"))
        .filter(F.abs(F.col("robust_z")) > 3.5)
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
      FROM part
    ) WHERE rn <= 2
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("p_brand", "p_partkey", "p_retailprice")
    )


@register(
    "union_distinct_sources",
    oracle="""
    SELECT custkey, count(*) AS n FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
    ) GROUP BY custkey
    """,
)
def union_distinct_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    u = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
        .unionByName(
            c.filter(F.col("c_acctbal") < 0).select(F.col("c_custkey").alias("custkey"))
        )
    )
    return u.groupBy("custkey").agg(F.count(F.lit(1)).alias("n"))


@register(
    "anomaly_zscore",
    oracle="""
    SELECT event_id, user_id, round(z, 4) AS zscore FROM (
      SELECT event_id, user_id,
             (value - avg(value) OVER (PARTITION BY user_id))
               / stddev_samp(value) OVER (PARTITION BY user_id) AS z
      FROM events
    ) WHERE abs(z) > 2.5
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score outliers — the simplest streaming-compatible
    anomaly screen (window aggregates over the user partition)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    z = (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w)
    return (
        ev.withColumn("z", z)
        .filter(F.abs(F.col("z")) > 2.5)
        .select("event_id", "user_id", F.round("z", 4).alias("zscore"))
    )


@register(
    "cohort_retention",
    oracle="""
    WITH cohorts AS (
      SELECT o_custkey,
             CAST(date_trunc('month', min(o_orderdate)) AS TIMESTAMP) AS cohort_month
      FROM orders GROUP BY o_custkey
    )
    SELECT c.cohort_month,
           CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS order_month,
           count(*) AS n_orders,
           CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
    FROM orders o JOIN cohorts c ON o.o_custkey = c.o_custkey
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort analysis: customers bucketed by first-order month,
    activity counted per (cohort, month)."""
    o = _t(spark, sf_dir, "orders")
    cohorts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    joined = o.join(cohorts, "o_custkey")
    return joined.groupBy(
        "cohort_month",
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").cast("long").alias("n_customers"),
    )


@register(
    "rolling_avg_events",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6)
             AS rolling_avg
    FROM events
    """,
)
def rolling_avg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-frame rolling average (ROWS BETWEEN 3 PRECEDING AND
    CURRENT ROW) in deterministic time order."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.round(F.avg("value").over(w), 6).alias("rolling_avg")
    )


@register(
    "null_safe_join",
    oracle="""
    WITH a AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey % 100 END AS k
      FROM orders
    ), b AS (
      SELECT DISTINCT CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_custkey % 100 END AS k
      FROM customer
    )
    SELECT a.o_orderkey, a.k
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match NULL keys — the semantics plain '=' silently drops."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    a = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("o_custkey") % 100)
        .alias("k"),
    )
    b = c.select(
        F.when(F.col("c_custkey") % 11 == 0, F.lit(None))
        .otherwise(F.col("c_custkey") % 100)
        .alias("kb")
    ).distinct()
    return a.join(b, a["k"].eqNullSafe(b["kb"])).select("o_orderkey", "k")


@register(
    "bool_bitwise_aggregates",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_quantity > 0) AS all_positive,
           bool_or(l_discount > 0.09) AS any_high_discount,
           CAST(bit_and(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS and_lines,
           CAST(bit_or(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS or_lines,
           CAST(bit_xor(CAST(l_orderkey AS BIGINT)) AS BIGINT) AS xor_keys
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def bool_bitwise_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean and bitwise aggregate functions (every/any, bit_and/or/xor
    — xor is order-insensitive, so it doubles as a cheap content digest)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.every(F.col("l_quantity") > 0).alias("all_positive"),
        F.some(F.col("l_discount") > 0.09).alias("any_high_discount"),
        F.bit_and(F.col("l_linenumber").cast("long")).alias("and_lines"),
        F.bit_or(F.col("l_linenumber").cast("long")).alias("or_lines"),
        F.bit_xor(F.col("l_orderkey").cast("long")).alias("xor_keys"),
    )


@register(
    "window_rank_family",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           first_value(o_orderkey) OVER w AS cheapest_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The relative-rank window family (ntile / percent_rank / cume_dist /
    first_value) in one pass — one shuffle on the partition key; the
    orderkey tiebreaker makes ntile deterministic."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(w).alias("cheapest_key"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(count(*) OVER (
             PARTITION BY o_orderstatus ORDER BY o_totalprice
             RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_within_10k,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_orderstatus ORDER BY o_totalprice
             RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW
           ), 2) AS sum_within_10k
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) window frame: aggregates over all orders within
    a 10k price band below each row — frame membership is value-defined,
    so peers are included and the result is tie-order independent."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.count(F.lit(1)).over(w).cast("long").alias("n_within_10k"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("sum_within_10k"),
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(sum(l.l_quantity) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 300
    )
    GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers) shape: the HAVING-subquery
    membership test becomes a left-semi join against the aggregated
    order-quantity table — semi joins don't duplicate probe rows and
    Spark can broadcast the (small, post-HAVING) build side. One agg to
    build the filter, one semi join, one final agg."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 300)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"], "left_semi")
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("sum_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "sum_qty",
        )
    )


@register(
    "percent_rank_cume_dist",
    oracle="""
    SELECT p_partkey, p_brand,
           floor(percent_rank() OVER w * 1000000.0 + 0.5) / 1000000.0
             AS pct_rank,
           floor(cume_dist() OVER w * 1000000.0 + 0.5) / 1000000.0
             AS cume
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice ASC)
    """,
)
def percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank windows: percent_rank = (rank−1)/(n−1) and
    cume_dist = rank_with_ties/n per brand over retail price — both are
    value-based (tie rows share a value), so the result is deterministic
    without a tiebreak column."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").asc())
    return p.select(
        "p_partkey",
        "p_brand",
        (F.floor(F.percent_rank().over(w) * 1000000.0 + 0.5) / 1000000.0).alias(
            "pct_rank"
        ),
        (F.floor(F.cume_dist().over(w) * 1000000.0 + 0.5) / 1000000.0).alias(
            "cume"
        ),
    )


@register(
    "ntile_quartile_buckets",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(ntile(4) OVER (
             PARTITION BY c_nationkey
             ORDER BY c_acctbal ASC, c_custkey ASC
           ) AS INT) AS quartile
    FROM customer
    """,
)
def ntile_quartile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth stratification: ntile(4) per nation over account
    balance — the standard quantile-bucket assignment for stratified
    sampling/monitoring (deterministic tie-break on the key)."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey", "c_nationkey", F.ntile(4).over(w).alias("quartile")
    )


@register(
    "linear_trend_per_type",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           floor(regr_slope(value, epoch(ts) / 86400.0) * 1000000.0 + 0.5)
             / 1000000.0 AS slope_per_day,
           floor(corr(value, epoch(ts) / 86400.0) * 1000000.0 + 0.5)
             / 1000000.0 AS corr_vt
    FROM events
    GROUP BY event_type
    """,
)
def linear_trend_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares trend: regr_slope + Pearson correlation of
    value against time (days) — drift detection for a metrics stream.
    Single map-side-combinable agg (the regression moments are
    associative sums); floor-rounded at 6 dp on both engines."""
    ev = _t(spark, sf_dir, "events")
    x = F.col("ts").cast("double") / 86400.0
    slope = F.expr("regr_slope(value, ts_days)")
    return (
        ev.withColumn("ts_days", x)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.floor(slope * 1000000.0 + 0.5) / 1000000.0).alias("slope_per_day"),
            (
                F.floor(F.corr("value", "ts_days") * 1000000.0 + 0.5) / 1000000.0
            ).alias("corr_vt"),
        )
    )


@register(
    "value_histogram",
    oracle="""
    SELECT event_type,
           CAST(CASE WHEN value < 0.0 THEN 0
                     WHEN value >= 100.0 THEN 21
                     ELSE floor(value / 5.0) + 1 END AS INT) AS bucket,
           count(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram per event type: 20 bins of width 5 over
    [0, 100) with underflow bin 0 and overflow bin 21 (width_bucket
    semantics, written as explicit arithmetic so both engines bin
    identically) — the profiling aggregation a data-quality dashboard
    runs per column. One combinable agg keyed by (type, bucket)."""
    ev = _t(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 0.0, F.lit(0))
        .when(F.col("value") >= 100.0, F.lit(21))
        .otherwise(F.floor(F.col("value") / 5.0) + 1)
        .cast("int")
    )
    return (
        ev.select("event_type", bucket.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01'
      AND l_shipdate < TIMESTAMP '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): the pure scan-side query —
    every predicate pushes into the parquet scan and the single global
    agg is map-side combined, so the exchange moves one partial row per
    task. The canonical pushdown/pruning showcase."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "merge_upsert_latest",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total, o_orderstatus AS status,
             0 AS version
      FROM orders
    ), updates AS (
      SELECT o_orderkey, CAST(o_totalprice + 100.0 AS DOUBLE) AS total,
             'U' AS status, 1 AS version
      FROM orders WHERE o_orderkey % 10 < 3
    ), unioned AS (
      SELECT * FROM base UNION ALL SELECT * FROM updates
    ), ranked AS (
      SELECT o_orderkey, total, status, version,
             row_number() OVER (
               PARTITION BY o_orderkey ORDER BY version DESC
             ) AS rk
      FROM unioned
    )
    SELECT o_orderkey, total, status, version FROM ranked WHERE rk = 1
    """,
)
def merge_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE / upsert with latest-record-wins semantics, expressed
    Spark-first without a table format: union the base snapshot with the
    change batch (each row versioned), then one row_number window per key
    keeps the newest. This is the standard CDC-compaction shape — at
    scale the window shuffle is on the (uniform) primary key; a table
    format's MERGE does the same dance with file-level pruning on top.
    The change batch is derived deterministically from orders
    (o_orderkey % 10 < 3) so the oracle mirrors it exactly."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("total"),
        F.col("o_orderstatus").alias("status"),
        F.lit(0).alias("version"),
    )
    updates = orders.filter(F.col("o_orderkey") % 10 < 3).select(
        "o_orderkey",
        (F.col("o_totalprice") + 100.0).cast("double").alias("total"),
        F.lit("U").alias("status"),
        F.lit(1).alias("version"),
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.col("version").desc())
    return (
        base.unionByName(updates)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


@register(
    "stats_moments",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(value), 6) AS avg_v,
           round(stddev_samp(value), 6) AS sd_v,
           round(var_samp(value), 6) AS var_v,
           round(covar_samp(value, CAST(json_extract(props, '$.k') AS BIGINT)), 6)
             AS cov_vk,
           round(corr(value, CAST(json_extract(props, '$.k') AS BIGINT)), 6)
             AS corr_vk
    FROM events
    GROUP BY event_type
    """,
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics per event type: sample stddev/variance of
    the value column plus its covariance and Pearson correlation with the
    JSON-extracted k property — the standard profiling pass over a fact
    table. All are one-pass co-moment aggregates with exact partial
    merging (Chan et al. update), so the groupBy shuffles one co-moment
    tuple per (group, partition). Skewness/kurtosis are excluded on
    purpose: their sample-vs-population conventions differ between
    engines, so they cannot be oracle-mirrored."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", "value", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("value"), 6).alias("avg_v"),
            F.round(F.stddev_samp("value"), 6).alias("sd_v"),
            F.round(F.var_samp("value"), 6).alias("var_v"),
            F.round(F.covar_samp("value", "k"), 6).alias("cov_vk"),
            F.round(F.corr("value", "k"), 6).alias("corr_vk"),
        )
    )


@register(
    "map_roundtrip",
    oracle="""
    WITH hourly AS (
      SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ), sized AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_keys FROM hourly GROUP BY 1
    )
    SELECT h.event_type, h.hour_id, h.cnt, s.n_keys
    FROM hourly h JOIN sized s ON h.event_type = s.event_type
    """,
)
def map_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface coverage: hourly counts per event type are packed
    into a map<hour, cnt> column (map_from_entries over collected
    structs), measured with size(), then exploded back to rows. The
    packed map is a set — collect_list's nondeterministic order cannot
    leak into the result — and the oracle checks the round-trip restores
    exactly the pre-map rows plus the key count. Maps-as-columns is how
    per-entity feature bags ship to training without a fixed schema."""
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.floor(F.col("ts").cast("double") / 3600).cast("long").alias("hour_id"),
        )
        .groupBy("event_type", "hour_id")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    packed = hourly.groupBy("event_type").agg(
        F.map_from_entries(F.collect_list(F.struct("hour_id", "cnt"))).alias("m")
    )
    return packed.select(
        "event_type",
        F.size("m").cast("long").alias("n_keys"),
        F.explode("m").alias("hour_id", "cnt"),
    ).select("event_type", "hour_id", "cnt", "n_keys")


@register(
    "trimmed_mean_grouped_udf",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           round(avg(value), 6) AS trimmed_mean,
           CAST(count(*) AS BIGINT) AS n_used
    FROM ranked
    WHERE rn > CAST(floor(n / 10) AS BIGINT)
      AND rn <= n - CAST(floor(n / 10) AS BIGINT)
    GROUP BY event_type
    """,
)
def trimmed_mean_grouped_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean of value per event type, computed by a GROUPED_AGG
    pandas UDF — the one Arrow UDF shape (series -> scalar aggregate) the
    engine's UDF surface didn't yet exercise; the rest (scalar pandas_udf,
    mapInPandas, applyInPandas, applyInPandasWithState, UDTF) are covered
    elsewhere. Tie order inside the trim window can't affect the result
    (tied values are equal), so the oracle's row_number slicing is an
    exact mirror. GROUPED_AGG ships each group's column as one Arrow
    batch — fine for bounded groups like per-type slices; for unbounded
    groups prefer an algebraic rewrite, since a series->scalar UDF cannot
    partially aggregate."""
    @F.pandas_udf("double")
    def trimmed_mean(v: pd.Series) -> float:
        k = len(v) // 10
        s = v.sort_values()
        return float(s.iloc[k : len(s) - k].mean())

    @F.pandas_udf("long")
    def trimmed_n(v: pd.Series) -> int:
        k = len(v) // 10
        return int(len(v) - 2 * k)

    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(trimmed_mean("value"), 6).alias("trimmed_mean"),
            trimmed_n("value").alias("n_used"),
        )
    )


@register(
    "sql_api_surface",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(avg(o_totalprice), 6) AS avg_price
    FROM orders
    WHERE o_orderdate >= DATE '1994-01-01'
    GROUP BY o_orderpriority
    """,
)
def sql_api_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same engine through the SQL front end: the table registers as
    a temp view and the query is textual ANSI SQL via spark.sql — proving
    the full SQL surface (not just the DataFrame DSL) works against the
    engine's table readers. Catalyst compiles both to the same plan."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               round(avg(o_totalprice), 6) AS avg_price
        FROM orders_v
        WHERE o_orderdate >= DATE '1994-01-01'
        GROUP BY o_orderpriority
        """
    )


@register(
    "incremental_agg_merge",
    oracle="""
    WITH old AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS s
      FROM events WHERE ts < TIMESTAMP '2024-01-20' GROUP BY user_id
    ), delta AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS s
      FROM events WHERE ts >= TIMESTAMP '2024-01-20' GROUP BY user_id
    )
    SELECT coalesce(old.user_id, delta.user_id) AS user_id,
           coalesce(old.n, 0) + coalesce(delta.n, 0) AS n_events,
           round(coalesce(old.s, 0.0) + coalesce(delta.s, 0.0), 4) AS total_value
    FROM old FULL OUTER JOIN delta ON old.user_id = delta.user_id
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: yesterday's materialized
    per-user partials (count, sum — both algebraic, so partials merge
    exactly) full-outer-joined with the new data's partials. This is the
    pattern that updates a 100 TB rollup from a 100 GB daily delta
    without rescanning history — only merge-able aggregates qualify
    (count/sum/min/max; avg via sum+count; never median). Rounding at
    4 dp on both the partials and the merge keeps the oracle exact."""
    ev = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-20").cast("timestamp")

    def partial(df):
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("s"),
        )

    old = partial(ev.filter(F.col("ts") < cut)).alias("old")
    delta = partial(ev.filter(F.col("ts") >= cut)).alias("delta")
    return old.join(
        delta, F.col("old.user_id") == F.col("delta.user_id"), "full_outer"
    ).select(
        F.coalesce(F.col("old.user_id"), F.col("delta.user_id")).alias("user_id"),
        (
            F.coalesce(F.col("old.n"), F.lit(0)) + F.coalesce(F.col("delta.n"), F.lit(0))
        ).alias("n_events"),
        F.round(
            F.coalesce(F.col("old.s"), F.lit(0.0))
            + F.coalesce(F.col("delta.s"), F.lit(0.0)),
            4,
        ).alias("total_value"),
    )


@register(
    "key_skew_profile",
    oracle="""
    WITH c AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY user_id
    ), t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM c)
    SELECT user_id, cnt,
           floor(cnt / total * 1e6 + 0.5) / 1e6 AS share
    FROM c, t
    ORDER BY cnt DESC, user_id ASC LIMIT 20
    """,
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 hottest join/shuffle keys with their share of total rows —
    the diagnostic you run BEFORE choosing a skew mitigation (salting,
    AQE skew split, broadcast). Partial-agg + TakeOrdered: the full key
    histogram never leaves the executors."""
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    t = c.agg(F.sum("cnt").cast("double").alias("total"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "user_id",
            "cnt",
            (F.floor(F.col("cnt") / F.col("total") * 1e6 + 0.5) / 1e6).alias("share"),
        )
        .orderBy(F.col("cnt").desc(), F.col("user_id").asc())
        .limit(20)
    )


@register(
    "referential_audit",
    oracle="""
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        AS orphan_lineitems,
      (SELECT CAST(count(*) AS BIGINT) FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        AS orphan_orders,
      (SELECT CAST(count(*) AS BIGINT) FROM lineitem
       WHERE l_extendedprice <= 0 OR l_quantity <= 0) AS nonpositive_amounts,
      (SELECT CAST(count(*) AS BIGINT) FROM lineitem l JOIN orders o
       ON l.l_orderkey = o.o_orderkey
       WHERE l.l_shipdate < o.o_orderdate) AS ship_before_order,
      (SELECT CAST(count(*) AS BIGINT) FROM lineitem
       WHERE l_discount < 0 OR l_discount > 1) AS discount_out_of_range
    """,
)
def referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row data-quality audit across the warehouse: referential
    orphans (anti joins), non-positive amounts, ship-before-order date
    inversions, and out-of-range discounts. Each check is an independent
    single-row aggregate (anti-join count or conditional sum) and the
    audit cross-joins the five one-row results into a single summary row
    — one LAZY plan, so Spark schedules the subtrees together and plan
    builders pay nothing; the shape a pipeline gate asserts on before
    promoting a snapshot."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    orphan_li = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("orphan_lineitems"))
    )
    orphan_o = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("orphan_orders"))
    )
    nonpos = li.agg(
        F.sum(
            F.when(
                (F.col("l_extendedprice") <= 0) | (F.col("l_quantity") <= 0), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("nonpositive_amounts")
    )
    inv_dates = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .agg(
            F.sum(
                F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)
            )
            .cast("long")
            .alias("ship_before_order")
        )
    )
    bad_disc = li.agg(
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("discount_out_of_range")
    )
    return (
        orphan_li.crossJoin(orphan_o)
        .crossJoin(nonpos)
        .crossJoin(inv_dates)
        .crossJoin(bad_disc)
    )


@register(
    "null_profile",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(user_id) AS BIGINT) AS null_user,
           CAST(count(*) - count(value) AS BIGINT) AS null_value,
           CAST(count(*) - count(props) AS BIGINT) AS null_props,
           CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users,
           CAST(count(DISTINCT event_type) AS BIGINT) AS distinct_types
    FROM events
    """,
)
def null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profile of the fact table: row count, per-column
    null counts (count(*) − count(col)), and exact distinct cardinalities
    — the first query any profiler runs. count(col) skips NULLs by SQL
    semantics, so the nulls fall out of one aggregation with no
    conditionals; the distincts expand to Spark's standard expand-node
    plan."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.count(F.lit(1)) - F.count("user_id")).cast("long").alias("null_user"),
        (F.count(F.lit(1)) - F.count("value")).cast("long").alias("null_value"),
        (F.count(F.lit(1)) - F.count("props")).cast("long").alias("null_props"),
        F.countDistinct("user_id").cast("long").alias("distinct_users"),
        F.countDistinct("event_type").cast("long").alias("distinct_types"),
    )


@register(
    "union_schema_evolution",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM (
      SELECT doc_id, lang, NULL AS source, n_chars FROM documents
      WHERE doc_id % 2 = 0
      UNION ALL BY NAME
      SELECT doc_id, lang, source, NULL AS n_chars FROM documents
      WHERE doc_id % 2 = 1
    )
    """,
)
def union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift union: an old snapshot (no source column) and a new
    snapshot (no n_chars column) combine with unionByName(
    allowMissingColumns=True), which aligns by NAME and null-fills the
    gaps — positional unionAll would silently misalign columns, the
    classic schema-evolution footgun in long-lived pipelines. Pure
    narrow op, no shuffle."""
    docs = _t(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang", "n_chars")
    new = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "lang", "source")
    return old.unionByName(new, allowMissingColumns=True).select(
        "doc_id", "lang", "source", "n_chars"
    )


@register(
    "market_basket_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS support
    FROM pairs GROUP BY part_a, part_b
    HAVING count(*) >= 2
    """,
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence counting (market-basket support): pairs of parts
    appearing in the same order, kept at support >= 2. The within-order
    self-join is keyed on l_orderkey, so the explosion per key is bounded
    by basket size squared (TPC-H orders hold <= 7 items — at 100 TB the
    guard is the same max-basket-size cap every co-occurrence job
    applies, exactly the LSH mega-bucket pattern). The pair count is a
    combiner-friendly hash agg on the (uniform) pair key."""
    li = _t(spark, sf_dir, "lineitem")
    # Round-14: shared collect_set pair-generation derivation (one
    # exchange + in-array pair explode, no self-join) — see
    # operators/graphs.py::copurchase_pair_support.
    return (
        copurchase_pair_support(li.select("l_orderkey", "l_partkey"))
        .filter(F.col("support") >= 2)
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            F.col("support").cast("long").alias("support"),
        )
    )


@register(
    "window_lag_lead_delta",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(ts) - lag(epoch_us(ts))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS us_since_prev,
           floor((value - lag(value)
             OVER (PARTITION BY user_id ORDER BY ts, event_id)) * 1000000.0
             + 0.5) / 1000000.0 AS value_delta,
           lead(event_type)
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
    """,
)
def window_lag_lead_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead family over the per-user event stream: inter-arrival
    time (exact integer microseconds), value delta vs the previous
    event, and a peek at the next event type. The window order is
    (ts, event_id) so ties are deterministic on both engines. One
    shuffle keyed by user_id — high-cardinality, uniform; lag and lead
    share the same window spec so Spark evaluates all three in a single
    window pass (one sort per partition)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("us_since_prev"),
        (
            F.floor((F.col("value") - F.lag("value").over(w)) * 1000000.0 + 0.5)
            / 1000000.0
        ).alias("value_delta"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "mode_per_group",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS cnt
      FROM events GROUP BY user_id, event_type
    ), r AS (
      SELECT user_id, event_type, cnt,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY cnt DESC, event_type ASC) AS rn
      FROM c
    )
    SELECT user_id, event_type AS modal_type, CAST(cnt AS BIGINT) AS modal_count
    FROM r WHERE rn = 1
    """,
)
def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group with a deterministic tie-break
    (highest count, then lexicographically smallest value) — the
    portable formulation of mode(): count-agg then row_number, never an
    engine-specific mode() whose tie policy differs. Two shuffles, both
    map-side combinable / keyed by user_id; the per-user window
    partitions are bounded by the event-type cardinality."""
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("event_type").asc()
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("modal_type"),
            F.col("cnt").cast("long").alias("modal_count"),
        )
    )


@register(
    "two_phase_salted_agg",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_value_cents
    FROM events GROUP BY event_type
    """,
)
def two_phase_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase (salted) aggregation on a LOW-cardinality hot key: the
    explicit skew-proof shape for keys too few to spread the shuffle
    (a handful of event types over billions of rows). Phase 1 groups by
    (event_type, salt) — 32 spreads per type — so every task combines
    locally; phase 2 re-aggregates the 32·|types| partials. The value
    sum is canonicalized to integer cents BEFORE the partial agg, so the
    two-phase re-association is integer-exact and hash-identical to the
    oracle's single-phase plan at any partitioning. (Spark's map-side
    combine does phase 1 implicitly for built-in aggs; the explicit salt
    is the pattern for when the combiner alone can't help — e.g.
    collect-style or sketch states concentrated on one reducer.)"""
    ev = _t(spark, sf_dir, "events")
    salt = F.pmod(F.hash("event_id"), F.lit(32))
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    partial = (
        ev.select("event_type", salt.alias("salt"), cents.alias("cents"))
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum("cents").alias("pc"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").cast("long").alias("n_events"),
        F.sum("pc").cast("long").alias("total_value_cents"),
    )


@register(
    "scd2_history",
    oracle="""
    SELECT o_custkey, o_orderkey,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS valid_to,
           lead(o_orderkey) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) IS NULL
             AS is_current
    FROM orders
    """,
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history assembly: each change
    record (here: a customer's orders as state versions) gets a
    [valid_from, valid_to) interval from one lead() window, with the
    open-ended current row flagged — the standard CDC-log →
    point-in-time-queryable dimension build (the companion to
    merge_upsert_latest, which keeps ONLY the current row). One shuffle
    keyed by the natural key; the window order carries the id tiebreak
    so same-timestamp versions chain deterministically."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.lead("o_orderkey").over(w).isNull().alias("is_current"),
    )


@register(
    "rfm_segmentation",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             CAST(floor((epoch_us((SELECT max(o_orderdate) FROM orders))
                         - epoch_us(max(o_orderdate))) / 86400000000.0)
                  AS BIGINT) AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS monetary_cents
      FROM orders GROUP BY o_custkey
    ), cuts AS (
      SELECT quantile_disc(recency_days, 0.25) AS r1,
             quantile_disc(recency_days, 0.50) AS r2,
             quantile_disc(recency_days, 0.75) AS r3,
             quantile_disc(frequency, 0.25) AS f1,
             quantile_disc(frequency, 0.50) AS f2,
             quantile_disc(frequency, 0.75) AS f3,
             quantile_disc(monetary_cents, 0.25) AS m1,
             quantile_disc(monetary_cents, 0.50) AS m2,
             quantile_disc(monetary_cents, 0.75) AS m3
      FROM rfm
    )
    SELECT o_custkey, recency_days, frequency, monetary_cents,
           CAST(1 + (recency_days > r1)::int + (recency_days > r2)::int
                  + (recency_days > r3)::int AS BIGINT) AS r_quartile,
           CAST(1 + (frequency > f1)::int + (frequency > f2)::int
                  + (frequency > f3)::int AS BIGINT) AS f_quartile,
           CAST(1 + (monetary_cents > m1)::int + (monetary_cents > m2)::int
                  + (monetary_cents > m3)::int AS BIGINT) AS m_quartile
    FROM rfm, cuts
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation, the
    scale-honest way: quartile CUTPOINTS (discrete percentiles of the
    integer-exact metrics) are computed once and broadcast, and each
    customer is scored by comparison — NOT a global ntile(), whose
    unpartitioned window would serialize the whole table through one
    task at 100 TB. Cutpoint quartiles differ from ntile only in tie
    handling (equal metric values always land in the same quartile here,
    which is the analytically correct behavior anyway). Metrics are
    integer-exact (day floor, cents floor) so quantile_disc picks
    identical cutpoints on both engines. Two shuffles: the per-customer
    agg (map-side combinable) and the 1-row cutpoint agg."""
    o = _t(spark, sf_dir, "orders")
    max_d = o.agg(F.unix_micros(F.max("o_orderdate")).alias("mx"))
    rfm = (
        o.groupBy("o_custkey")
        .agg(
            F.unix_micros(F.max("o_orderdate")).alias("last_us"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long"))
            .cast("long")
            .alias("monetary_cents"),
        )
        .join(F.broadcast(max_d))
        .select(
            "o_custkey",
            F.floor((F.col("mx") - F.col("last_us")) / 86400000000.0)
            .cast("long")
            .alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    cuts = rfm.agg(
        *[
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY {m})"
            ).alias(f"{m[0]}{i}")
            for m in ("recency_days", "frequency", "monetary_cents")
            for i, p in ((1, 0.25), (2, 0.50), (3, 0.75))
        ]
    )
    scored = rfm.join(F.broadcast(cuts))

    def q(m: str) -> F.Column:
        return (
            1
            + (F.col(m) > F.col(f"{m[0]}1")).cast("int")
            + (F.col(m) > F.col(f"{m[0]}2")).cast("int")
            + (F.col(m) > F.col(f"{m[0]}3")).cast("int")
        ).cast("long")

    return scored.select(
        "o_custkey", "recency_days", "frequency", "monetary_cents",
        q("recency_days").alias("r_quartile"),
        q("frequency").alias("f_quartile"),
        q("monetary_cents").alias("m_quartile"),
    )


from cioos_siooc_data_transform_spark.operators.zorder import (
    binned_sql as _zbin_sql,
    interleave_sql as _zint_sql,
)


@register(
    "cluster_zorder_key",
    oracle=f"""
    WITH b AS (
      SELECT l_orderkey, l_linenumber,
             {_zbin_sql("l_quantity", 0.0, 60.0, 16)} AS xb,
             {_zbin_sql("l_extendedprice", 0.0, 120000.0, 16)} AS yb
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, xb, yb,
           {_zint_sql("xb", "yb", 16)} AS zval
    FROM b
    """,
)
def cluster_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (z-order) clustering key over (quantity, price) — the key
    that `operators/zorder.write_zordered` lays files out by. Registered
    so the 32-term bit-interleave is oracle-checked bit-for-bit (both
    engines bin with identical IEEE ops and interleave with identical
    integer shifts). Zero shuffles — a narrow codegen projection; the
    layout write itself is exercised in tests/test_zorder.py where the
    per-file min/max boxes and the two-axis file pruning are asserted."""
    from cioos_siooc_data_transform_spark.operators.zorder import (
        binned_expr,
        interleave_expr,
    )

    li = _t(spark, sf_dir, "lineitem")
    xb = binned_expr(F.col("l_quantity"), 0.0, 60.0, 16)
    yb = binned_expr(F.col("l_extendedprice"), 0.0, 120000.0, 16)
    b = li.select(
        "l_orderkey", "l_linenumber", xb.alias("xb"), yb.alias("yb")
    )
    return b.select(
        "l_orderkey", "l_linenumber", "xb", "yb",
        interleave_expr(F.col("xb"), F.col("yb"), 16).alias("zval"),
    )


@register(
    "lateral_top_orders",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    """,
)
def lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (each customer's top-2 orders by
    price) — the per-row-subquery SQL surface. Catalyst decorrelates the
    LATERAL + LIMIT into a window-and-filter over one orders⋈customer
    equi-join (there is no per-row re-execution at runtime), so the plan
    is the same single-shuffle shape as topk_per_group — the point of
    registering both: identical semantics reachable from either front
    end. Inner customers (no orders) drop, as LATERAL without OUTER
    specifies."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat_v")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat_v")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer_lat_v c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lat_v o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        """
    )


@register(
    "unpivot_metrics",
    oracle="""
    WITH wide AS (
      SELECT o_orderpriority,
             CAST(sum(CASE WHEN o_orderstatus = 'O'
                  THEN CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS O,
             CAST(sum(CASE WHEN o_orderstatus = 'F'
                  THEN CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS F,
             CAST(sum(CASE WHEN o_orderstatus = 'P'
                  THEN CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS P
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, o_orderstatus, total_cents FROM (
      SELECT o_orderpriority, 'O' AS o_orderstatus, O AS total_cents FROM wide
      UNION ALL
      SELECT o_orderpriority, 'F' AS o_orderstatus, F AS total_cents FROM wide
      UNION ALL
      SELECT o_orderpriority, 'P' AS o_orderstatus, P AS total_cents FROM wide
    )
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long relayout via the native unpivot (melt) operator — the
    inverse of pivot_status_revenue. The wide frame is a tiny pivoted
    aggregate (priorities × statuses of integer cents); unpivot is a
    row-local generator (each wide row emits one row per value column,
    no shuffle) so the only shuffle is the upstream agg. The oracle
    spells the same relayout as UNION ALL — the portable formulation —
    while the Spark side exercises DataFrame.unpivot."""
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    wide = o.groupBy("o_orderpriority").agg(
        *[
            F.sum(F.when(F.col("o_orderstatus") == s, cents).otherwise(0))
            .cast("long")
            .alias(s)
            for s in ("O", "F", "P")
        ]
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["O", "F", "P"],
        variableColumnName="o_orderstatus",
        valueColumnName="total_cents",
    )


@register(
    "graph_triangle_count",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), e AS (
      SELECT part_a AS a, part_b AS b
      FROM pairs GROUP BY part_a, part_b HAVING count(*) >= 2
    ), tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT a AS part_key, CAST(count(*) AS BIGINT) AS n_triangles
    FROM tri GROUP BY a
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration on the co-purchase graph (edges = part pairs
    with support ≥ 2, the market_basket edge set): per-lowest-vertex
    triangle counts via the ordered two-hop join — e(a,b) ⋈ e(b,c) ⋈
    e(a,c) with a<b<c, so every triangle is produced exactly once and
    the join is equi-keyed (never a cartesian). The a<b<c orientation IS
    the skew control: a hub vertex only fans out through edges where it
    is the SMALLER endpoint, which bounds the wedge explosion to
    forward-degree² (the compact-forward algorithm). This query keeps
    raw-id orientation because the DuckDB oracle mirrors it literally;
    the OPERATOR default (operators/graphs.py::triangle_count) orients
    by (degree, id), which provably caps forward-degree at O(sqrt(|E|))
    — both enumerate identical triangles (property-pinned in
    tests/test_graphs.py). Three shuffles: the edge agg and the two
    hash joins (edge set reused — one scan)."""
    li = _t(spark, sf_dir, "lineitem")
    # Round-14: the decomposition showed the edge DERIVATION is ~100%
    # of this query's wall (edges-only 1.57 s vs full 1.54 s min,
    # interleaved A/B at sf0.1) — the wedge joins downstream handle
    # only the ~3.6k support>=2 edges. The derivation now comes from
    # the shared collect_set pair-generation operator (one exchange
    # assembles per-order part sets, pairs explode in-array, no
    # self-join — operators/graphs.py::copurchase_pair_support).
    e = (
        copurchase_pair_support(li.select("l_orderkey", "l_partkey"))
        .filter(F.col("support") >= 2)
        .select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    )
    # The edge set feeds all three join legs and Spark does not reuse
    # the basket-join Exchange across them (three full rebuilds in the
    # plan), so materialize it once — the dedup_components lineage
    # idiom. Measured gain here is modest (~5%: the wedge joins
    # dominate at this SF) but the rebuild it removes scales with the
    # CORPUS while the checkpoint scales with the support-filtered edge
    # set — exactly the asymmetry that matters at 100 TB.
    # eager=False: truncate lineage WITHOUT running the edge job at
    # plan-build time (an eager checkpoint would execute the full
    # distinct+join+agg as a side effect of merely constructing /
    # EXPLAINing the query); the checkpoint materializes on the first
    # real action and the other join legs reuse it.
    e = checkpoint_df(e, eager=False)
    e1 = e
    e2 = e.select(F.col("a").alias("b2a"), F.col("b").alias("c"))
    e3 = e.select(F.col("a").alias("a3"), F.col("b").alias("b3"))
    tri = (
        e1.join(e2, e1["b"] == e2["b2a"])
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("b3")))
        .select("a", "b", "c")
    )
    return tri.groupBy(F.col("a").alias("part_key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


@register(
    "drift_ks_statistic",
    oracle="""
    WITH halves AS (
      SELECT event_type, value,
             CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS h1
      FROM events
    ), counts AS (
      SELECT event_type, value,
             sum(h1) AS c1, sum(1 - h1) AS c2
      FROM halves GROUP BY event_type, value
    ), cum AS (
      SELECT event_type, value,
             sum(c1) OVER (PARTITION BY event_type ORDER BY value) AS s1,
             sum(c2) OVER (PARTITION BY event_type ORDER BY value) AS s2,
             sum(c1) OVER (PARTITION BY event_type) AS n1,
             sum(c2) OVER (PARTITION BY event_type) AS n2
      FROM counts
    )
    SELECT event_type,
           CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
           round(max(abs(s1 / n1 - s2 / n2)), 6) AS ks_d
    FROM cum GROUP BY event_type
    """,
)
def drift_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: the two-sample Kolmogorov–Smirnov
    statistic per event type between the first and second half of the
    month — sup |F̂₁(v) − F̂₂(v)| over the pooled empirical CDFs. The
    standard pre-training data-quality gate ("did this feed's value
    distribution move?"). Shape: one count agg on (type, value) —
    map-side combinable, collapses duplicates BEFORE the sort — then one
    window pass per type for the running CDFs, then a max agg. The CDF
    fractions are exact integer rationals, so the sup is engine-stable.
    At 100 TB, value cardinality per type bounds the window partition —
    pre-bin values (value_histogram's grid) to cap it."""
    ev = _t(spark, sf_dir, "events")
    h1 = F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 1).otherwise(0)
    counts = (
        ev.select("event_type", "value", h1.alias("h1"))
        .groupBy("event_type", "value")
        .agg(F.sum("h1").alias("c1"), F.sum(1 - F.col("h1")).alias("c2"))
    )
    wcum = Window.partitionBy("event_type").orderBy("value")
    wall = Window.partitionBy("event_type")
    cum = counts.select(
        "event_type",
        F.sum("c1").over(wcum).alias("s1"),
        F.sum("c2").over(wcum).alias("s2"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c2").over(wall).alias("n2"),
    )
    return cum.groupBy("event_type").agg(
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
        F.round(F.max(F.abs(F.col("s1") / F.col("n1") - F.col("s2") / F.col("n2"))), 6).alias(
            "ks_d"
        ),
    )


@register(
    "pareto_revenue_share",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT o_custkey, rev_cents,
             CAST(row_number() OVER (ORDER BY rev_cents DESC, o_custkey)
                  AS BIGINT) AS rnk,
             CAST(sum(rev_cents) OVER (ORDER BY rev_cents DESC, o_custkey)
                  AS BIGINT) AS cum_cents,
             CAST(sum(rev_cents) OVER () AS BIGINT) AS total_cents,
             CAST(count(*) OVER () AS BIGINT) AS n_cust
      FROM cust
    )
    SELECT o_custkey, rev_cents, rnk,
           floor(cum_cents * 1000000.0 / total_cents + 0.5) / 1000000.0
             AS cum_share,
           rnk * 5 <= n_cust AS in_top_20pct
    FROM ranked
    """,
)
def pareto_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC concentration analysis: customers ranked by revenue
    with the running share of total — "what fraction of revenue do the
    top 20% hold". Integer-cents revenue makes the running sums exact;
    the share is one floor-rounded division of exact integers. Shape
    note (migrated round 8): the global ordered pass runs through
    ``ranked_cumsum_two_pass`` — no window touches more rows than one
    value-range bucket (~|keys|/512) and the only single-partition
    window orders the 512-row bucket table, so the plan survives any
    customer cardinality. Exact integer cents make the bucketed running
    sums equal the single-window oracle bit-for-bit (equality pinned by
    the ``pareto_share_two_pass`` registered twin, which runs this same
    operator against the identical global-window oracle text)."""
    from cioos_siooc_data_transform_spark.operators.windows import (
        ranked_cumsum_two_pass,
    )

    o = _t(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long"))
        .cast("long")
        .alias("rev_cents")
    )
    ranked = ranked_cumsum_two_pass(
        cust, "rev_cents", "o_custkey", out_rank="rnk", out_cum="cum_cents"
    )
    tot = cust.agg(
        F.sum("rev_cents").cast("long").alias("total_cents"),
        F.count(F.lit(1)).cast("long").alias("n_cust"),
    )
    return ranked.crossJoin(F.broadcast(tot)).select(
        "o_custkey", "rev_cents", "rnk",
        (
            F.floor(F.col("cum_cents") * 1000000.0 / F.col("total_cents") + 0.5)
            / 1000000.0
        ).alias("cum_share"),
        (F.col("rnk") * 5 <= F.col("n_cust")).alias("in_top_20pct"),
    )


@register(
    "markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ), c AS (
      SELECT event_type AS from_type, next_type AS to_type,
             count(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n_transitions,
           floor(n * 1000000.0 / sum(n) OVER (PARTITION BY from_type) + 0.5)
             / 1000000.0 AS p_transition
    FROM c
    """,
)
def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for each
    (from, to) event-type pair, the count and row-normalized transition
    probability — session-modeling / anomalous-flow primitive. One
    window keyed by user (lead), one map-side-combinable count agg, one
    tiny window over the |types|² matrix for the row sums. Probabilities
    are floor-rounded divisions of exact integers."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    c = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    wrow = Window.partitionBy("from_type")
    return c.select(
        "from_type", "to_type",
        F.col("n").cast("long").alias("n_transitions"),
        (
            F.floor(F.col("n") * 1000000.0 / F.sum("n").over(wrow) + 0.5)
            / 1000000.0
        ).alias("p_transition"),
    )


@register(
    "cumulative_distinct_users",
    oracle="""
    WITH fs AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ), newu AS (
      SELECT day, count(*) AS new_users
      FROM fs WHERE rn = 1 GROUP BY day
    )
    SELECT day, CAST(new_users AS BIGINT) AS new_users,
           CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT)
             AS cumulative_users
    FROM newu
    """,
)
def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT-user count per day (cumulative reach) WITHOUT a
    distinct-over-window: each user contributes at their FIRST event
    (one row_number window keyed by user), daily firsts aggregate
    map-side, and the running total is a cumulative sum over the tiny
    day axis — the first-seen trick that turns an O(days × users)
    running-distinct into two linear passes. The standard growth metric
    done the way it scales."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fs = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") == 1)
    newu = fs.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    wc = Window.orderBy("day")
    return newu.select(
        "day",
        F.col("new_users").cast("long").alias("new_users"),
        F.sum("new_users").over(wc).cast("long").alias("cumulative_users"),
    )


@register(
    "time_weighted_average",
    oracle="""
    WITH seg AS (
      SELECT user_id, value,
             epoch_us(ts) AS t0,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS t1
      FROM events
    ), q AS (
      SELECT user_id,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS vq,
             CAST(floor((t1 - t0) / 1000.0) AS BIGINT) AS w_ms
      FROM seg WHERE t1 IS NOT NULL
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           floor(sum(vq * w_ms) / sum(w_ms) + 0.5) / 10000.0 AS twa_value
    FROM q GROUP BY user_id
    """,
)
def time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (sensor/position/price TWAP):
    each observation holds until the next one, so its weight is the
    integer-MILLISECOND segment duration from one lead() window. Values
    are quantized to integer 1e-4 units FIRST, so the weighted sum is
    pure integer arithmetic — order-independent and engine-exact — and
    only the final division leaves integers (then one floor-round). The
    unit choices are BIGINT-headroom math, not taste: 5e6 value-quanta ×
    month-long 2.6e9 ms gaps × 1e4 rows/user ≈ 1e14 per-user sums, five
    orders under overflow, where µs weights × 1e6 quanta overflowed.
    One window shuffle keyed by user + a map-side-combinable agg."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    seg = ev.select(
        "user_id",
        F.floor(F.col("value") * 10000.0 + 0.5).cast("long").alias("vq"),
        us.alias("t0"),
        F.lead(us).over(w).alias("t1"),
    ).filter(F.col("t1").isNotNull())
    q = seg.select(
        "user_id",
        "vq",
        F.floor((F.col("t1") - F.col("t0")) / 1000.0).cast("long").alias("w_ms"),
    )
    return q.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        (
            F.floor(
                F.sum(F.col("vq") * F.col("w_ms")) / F.sum("w_ms") + 0.5
            )
            / 10000.0
        ).alias("twa_value"),
    )
