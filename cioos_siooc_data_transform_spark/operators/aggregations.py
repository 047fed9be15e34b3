"""Aggregation operators (SURVEY.md §2.4).

- channel_minmax (A1): per-group min/max/count — reference reads declared
  Minimum/Maximum per channel (IDT/ObsFile.py:328-329) and must recompute
  them to validate/emit.
- count_validation (A2): per-group count equality check
  (IDT/ObsFile.py:298-299 NUMBER OF CHANNELS vs parsed channel count).
- infer_time_increment (A4): (max−min)/(n−1) when TIME INCREMENT missing
  (IDT/ObsFile.py:501-505).

Scale notes: all are hash aggregations with map-side partial aggregation;
the shuffle carries one row per group. Group keys here (file/channel ids)
are high-cardinality and evenly distributed, so no salting is needed; AQE
coalesces post-shuffle partitions at small SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def channel_minmax(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    return df.groupBy(*group_cols).agg(
        F.min(value_col).alias("val_min"),
        F.max(value_col).alias("val_max"),
        F.count(value_col).alias("n_values"),
    )


def count_validation(
    df: DataFrame, group_cols: list[str], expected
) -> DataFrame:
    """Groups whose row count equals the expectation (others are anomalies).

    ``expected`` is an int literal, a Column, or a COLUMN NAME (a bare
    string resolves with F.col — comparing a count to a string LITERAL
    would throw under ANSI mode or silently filter everything without
    it, so a string here can only sensibly mean a column)."""
    if isinstance(expected, str):
        expected = F.col(expected)
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    return counts.filter(F.col("n_rows") == expected)


def infer_time_increment(df: DataFrame, group_col: str, ts_col: str) -> DataFrame:
    """Per group: (max(ts) − min(ts)) / (n − 1) in float seconds."""
    return (
        df.groupBy(group_col)
        .agg(
            F.unix_millis(F.max(ts_col)).alias("_max_ms"),
            F.unix_millis(F.min(ts_col)).alias("_min_ms"),
            F.count(F.lit(1)).alias("n_records"),
        )
        .filter(F.col("n_records") > 1)
        .select(
            group_col,
            "n_records",
            ((F.col("_max_ms") - F.col("_min_ms")) / F.lit(1000.0) / (F.col("n_records") - 1)).alias(
                "increment_s"
            ),
        )
    )
