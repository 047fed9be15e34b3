"""Table-maintenance operators: small-file compaction.

At 100 TB the silent killer is file-count, not byte-count: streaming
sinks and fine-grained partition overwrites leave thousands of KB-scale
files per partition, and every downstream scan then pays listing +
open + footer-parse per file (NameNode/objectstore pressure, task
scheduling overhead, dead columnar compression). Periodic compaction
rewrites each partition's files at a target size — the OPTIMIZE /
rewrite_data_files job of the table formats, expressed as one Spark
pass.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet directory at ~target-sized files; returns the
    partition count chosen.

    Sizing comes from the SOURCE bytes (cheap driver-side listing — at
    object-store scale, the same listing the scan already pays), not a
    count() pass over the data. repartition(n) is a round-robin shuffle:
    it equalizes output file sizes even when input files are skewed
    (coalesce(n) would glue adjacent small files and keep the skew, but
    saves the shuffle — offered via target_file_bytes<=0). Combine with
    write_zordered (operators/zorder.py) when the table should come out
    of compaction clustered, not just coarse."""
    df = spark.read.parquet(src)
    if target_file_bytes <= 0:
        out: DataFrame = df.coalesce(1)
        out.write.mode("overwrite").parquet(dst)
        return 1
    total = sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(src, "**", "*.parquet"), recursive=True)
    )
    if total == 0:
        # Non-local path (s3://, hdfs://, ...) or empty directory: the
        # driver-side glob sees nothing, and silently proceeding with
        # n=1 would funnel the whole table through one task. Use the
        # catalog's own sizing instead (Spark's file-index statistics),
        # which works for any Hadoop-compatible filesystem.
        total = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        if total <= 0:
            raise ValueError(
                f"cannot size {src!r}: no local parquet files and no "
                "catalog statistics; pass target_file_bytes<=0 for an "
                "explicit single-file coalesce or repartition manually"
            )
    n = max(1, round(total / target_file_bytes))
    out = df.repartition(n)
    out.write.mode("overwrite").parquet(dst)
    return n
