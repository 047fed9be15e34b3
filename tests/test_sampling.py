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
    """The sketch queries emit their own tolerance booleans (that is the
    driver-checked contract); every group must be within tolerance, and
    the exact columns must agree with independent recomputation."""
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
    rows = sketch_distinct_users(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["sketch_within_5pct"], r
        assert r["exact_users"] == exact[r["event_type"]]

    rows = sketch_quantiles(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["p50_within_2pct"] and r["p90_within_2pct"] and r["p99_within_2pct"], r


def test_pack_training_shards_invariants(spark):
    """Every doc is assigned once; within each salt stream shards are
    filled greedily, so no shard's token total exceeds the 20k budget by
    more than one document."""
    from cioos_siooc_data_transform_spark.plans.sampling_queries import (
        pack_training_shards,
    )

    from cioos_siooc_data_transform_spark.session import read_table

    out = pack_training_shards(spark, SF).collect()
    docs = read_table(spark, SF, "documents").count()
    assert len(out) == docs
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r["n_tok"])
    for shard, toks in by_shard.items():
        # a shard stops filling once it crosses the budget → its total is
        # below budget + its largest (last) doc
        assert sum(toks) < 20000 + max(toks), shard


def test_train_val_test_split_proportions(spark):
    from cioos_siooc_data_transform_spark.plans.sampling_queries import (
        train_val_test_split,
    )

    counts = {
        r["split"]: r["count"]
        for r in train_val_test_split(spark, SF).groupBy("split").count().collect()
    }
    total = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    assert 0.7 < counts["train"] / total < 0.9
    # rerun is byte-identical (deterministic)
    again = {
        r["split"]: r["count"]
        for r in train_val_test_split(spark, SF).groupBy("split").count().collect()
    }
    assert again == counts
