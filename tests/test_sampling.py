"""Sampling determinism and sketch accuracy (the checks the rows-only
driver comparison can't make)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_CORRECTNESS as SF


def test_deterministic_sample_is_stable(spark):
    from cioos_siooc_data_transform_spark.plans.sampling_queries import (
        deterministic_sample,
    )

    a = {r["o_orderkey"] for r in deterministic_sample(spark, SF).collect()}
    b = {r["o_orderkey"] for r in deterministic_sample(spark, SF).collect()}
    assert a == b and len(a) > 0
    # ~10% of 15000 with hash uniformity
    assert 1200 < len(a) < 1800


def test_sketch_accuracy_vs_exact(spark):
    from cioos_siooc_data_transform_spark.plans.sampling_queries import (
        sketch_distinct_users,
        sketch_quantiles,
    )
    from cioos_siooc_data_transform_spark.session import read_table

    ev = read_table(spark, SF, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in sketch_distinct_users(spark, SF).collect():
        assert abs(r["approx_users"] - exact[r["event_type"]]) <= max(
            3, 0.05 * exact[r["event_type"]]
        )

    o = read_table(spark, SF, "orders")
    exact_med = {
        r["o_orderstatus"]: r["m"]
        for r in o.groupBy("o_orderstatus")
        .agg(F.expr("percentile(o_totalprice, 0.5)").alias("m"))
        .collect()
    }
    for r in sketch_quantiles(spark, SF).collect():
        assert abs(r["pcts"][0] - exact_med[r["o_orderstatus"]]) / exact_med[
            r["o_orderstatus"]
        ] < 0.05
