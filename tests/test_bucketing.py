"""Bucketed co-located join: same result, zero shuffle in the plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_SMOKE


def test_bucketed_join_eliminates_shuffle(spark):
    from cioos_siooc_data_transform_spark.operators.bucketing import (
        bucketed_join,
        write_bucketed,
    )
    from cioos_siooc_data_transform_spark.session import read_table

    li = read_table(spark, SF_DIR_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = read_table(spark, SF_DIR_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    write_bucketed(li, "b_lineitem", "l_orderkey", 8)
    write_bucketed(orders, "b_orders", "l_orderkey", 8)

    # force the non-broadcast path (the tables here are tiny; at scale
    # the planner picks SMJ on its own) to show the bucketed co-location
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_lineitem", "b_orders", "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:2000]  # zero shuffle either side

        # result parity with the plain shuffled join
        expected = li.join(orders, "l_orderkey").count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_dedup_exact_bucketed_plan_and_parity(spark):
    """The registered dedup_exact_bucketed query: (a) its digest groupBy
    over the bucketed documents table plans with ZERO Exchange, (b) a
    digest self-join on the same table also plans Exchange-free, and
    (c) the answer matches plain dedup_exact row for row."""
    from cioos_siooc_data_transform_spark.operators.bucketing import (
        ensure_bucketed_documents,
    )
    from cioos_siooc_data_transform_spark.plans import QUERIES

    agg = QUERIES["dedup_exact_bucketed"](spark, SF_DIR_SMOKE)
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]

    table = ensure_bucketed_documents(spark, SF_DIR_SMOKE)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t = spark.table(table)
        self_join = t.alias("a").join(
            t.alias("b"), "text_hash"
        ).select("text_hash")
        jplan = self_join._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in jplan
        assert "Exchange" not in jplan, jplan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    plain = {
        (r["text_hash"], r["keeper_id"], r["n_copies"])
        for r in QUERIES["dedup_exact"](spark, SF_DIR_SMOKE).collect()
    }
    bucketed = {
        (r["text_hash"], r["keeper_id"], r["n_copies"])
        for r in agg.collect()
    }
    assert bucketed == plain


def test_ensure_bucketed_table_keyed_by_join_key_and_bucket_count(spark):
    """Regression for the round-5 cache fix: the same table requested
    with a DIFFERENT join key (or bucket count) must get its own
    physical layout — a silently reused first-key bucketing would
    reintroduce the Exchange this helper exists to eliminate."""
    from cioos_siooc_data_transform_spark.operators.bucketing import (
        ensure_bucketed_table,
    )
    from tests.conftest import SF_DIR_SMOKE

    t_cust = ensure_bucketed_table(spark, SF_DIR_SMOKE, "orders", "o_custkey")
    t_okey = ensure_bucketed_table(spark, SF_DIR_SMOKE, "orders", "o_orderkey")
    t_cust16 = ensure_bucketed_table(
        spark, SF_DIR_SMOKE, "orders", "o_custkey", num_buckets=16
    )
    assert len({t_cust, t_okey, t_cust16}) == 3, (t_cust, t_okey, t_cust16)
    # idempotent per (table, key, buckets)
    assert ensure_bucketed_table(spark, SF_DIR_SMOKE, "orders", "o_custkey") == t_cust

    def bucket_cols(name):
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect():
            if r.col_name == "Bucket Columns":
                return r.data_type
        return None

    assert "o_custkey" in bucket_cols(t_cust)
    assert "o_orderkey" in bucket_cols(t_okey)
