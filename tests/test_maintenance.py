"""Small-file compaction: many skewed tiny files in -> few even files
out, same rows."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.operators.maintenance import compact_parquet
from cioos_siooc_data_transform_spark.session import read_table

SF = "/root/testdata/sf0.01"


def test_compact_small_files(spark):
    li = read_table(spark, SF, "lineitem")
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "fragmented")
        dst = os.path.join(tmp, "compacted")
        # simulate a fragmented sink: 64 small files
        li.repartition(64).write.parquet(src)
        n_in = len(glob.glob(os.path.join(src, "*.parquet")))
        assert n_in == 64
        total = sum(
            os.path.getsize(f) for f in glob.glob(os.path.join(src, "*.parquet"))
        )
        n = compact_parquet(spark, src, dst, target_file_bytes=total // 4)
        n_out = len(glob.glob(os.path.join(dst, "*.parquet")))
        assert n == 4 and n_out == 4
        # same rows, and output files are roughly even (round-robin):
        sizes = sorted(
            os.path.getsize(f) for f in glob.glob(os.path.join(dst, "*.parquet"))
        )
        assert sizes[-1] < 2 * sizes[0]
        assert spark.read.parquet(dst).count() == li.count()
        assert (
            spark.read.parquet(dst)
            .agg(F.sum("l_quantity").alias("s"))
            .collect()[0]["s"]
            == li.agg(F.sum("l_quantity").alias("s")).collect()[0]["s"]
        )
