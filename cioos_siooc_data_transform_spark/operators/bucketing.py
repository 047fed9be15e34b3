"""Bucketed-table co-location (SURVEY.md §4 / 100 TB design).

Big fact⋈fact joins shuffle both sides on the join key every query. If
the tables are WRITTEN bucketed by that key (hash-partitioned files +
bucket metadata in the catalog), Spark plans the join with zero Exchange:
each task reads matching bucket files from both sides. This is the
pre-shuffle-once, join-many-times trade — essential when the same join
key is hit repeatedly at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Save as a bucketed (and optionally sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — plans without a
    shuffle Exchange on either side."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key)
