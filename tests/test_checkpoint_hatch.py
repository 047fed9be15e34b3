"""checkpoint_df escape hatch: local default vs reliable-checkpoint mode.

The graph/iterative plans cut lineage through
``session.checkpoint_df``.  Default is ``localCheckpoint`` (executor-
local blocks, measured-best locally and at XL).  With
``$SPARK_GRAFT_CHECKPOINT_DIR`` set, every call site switches to the
RELIABLE ``checkpoint()`` into that directory so blocks survive
executor loss on preemptible clusters.  Both modes must yield the same
rows — only the storage tier differs.

NB: ``df.rdd`` re-wraps the internal RDD, so ``isLocallyCheckpointed``
is not observable from the Python facade; the tests assert on the two
things that matter — lineage truncation in the plan (ExistingRDD scan)
and, for the reliable mode, blocks actually written under the
configured directory.
"""
from __future__ import annotations

import os

from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.session import checkpoint_df


def _base(spark):
    return spark.range(0, 100).withColumn("v", F.col("id") % 7)


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_default_truncates_lineage_without_checkpoint_dir(
    spark, monkeypatch, tmp_path
):
    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR", raising=False)
    out = checkpoint_df(_base(spark), eager=True)
    # Lineage cut: the optimized plan is an RDD scan, not the
    # range+project tree.
    assert "LogicalRDD" in _plan(out)
    # Nothing written to any filesystem checkpoint dir.
    assert not (tmp_path / "ckpt").exists()
    assert out.count() == 100


def test_env_switches_to_reliable_checkpoint(spark, monkeypatch, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckpt)
    out = checkpoint_df(_base(spark), eager=True)
    assert "LogicalRDD" in _plan(out)
    # Reliable checkpoint: blocks land under the configured dir.
    ckpt_files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(ckpt)
        for f in fs
    ]
    assert ckpt_files, "reliable checkpoint wrote no files under the dir"
    assert sorted(r["id"] for r in out.collect()) == list(range(100))


def test_rows_identical_across_modes(spark, monkeypatch, tmp_path):
    agg = (
        _base(spark)
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR", raising=False)
    local_rows = sorted(
        (r["v"], r["n"]) for r in checkpoint_df(agg, eager=False).collect()
    )
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(tmp_path / "c2"))
    reliable_rows = sorted(
        (r["v"], r["n"]) for r in checkpoint_df(agg, eager=False).collect()
    )
    assert local_rows == reliable_rows
