"""Data-quality validation over parsed IOS files.

- validate_channel_bounds: recompute per-channel min/max from the data
  block (A1) and compare against the header's DECLARED Minimum/Maximum
  (IDT/ObsFile.py:328-329 reads them; the reference never cross-checks —
  this engine does, surfacing instrument-pipeline drift).
- validate_record_counts: header NUMBER OF RECORDS vs parsed rows (A2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate_channel_bounds(parsed: DataFrame, rel_tol: float = 0.05) -> DataFrame:
    """One row per (file, channel) with recomputed vs declared bounds and
    an `out_of_bounds` flag (true when observed values escape the declared
    envelope by more than rel_tol of its span)."""
    from cioos_siooc_data_transform_spark.sources.ios_source import (
        ios_channels,
        ios_measurements_masked,
    )

    meas = ios_measurements_masked(parsed)
    observed = meas.groupBy("file_id", "channel_idx").agg(
        F.min("value_num").alias("obs_min"),
        F.max("value_num").alias("obs_max"),
        F.count("value_num").alias("n_values"),
    )
    ch = ios_channels(parsed).select(
        "file_id",
        "channel_idx",
        "name",
        F.col("minimum").try_cast("double").alias("decl_min"),
        F.col("maximum").try_cast("double").alias("decl_max"),
    )
    joined = observed.join(ch, ["file_id", "channel_idx"])
    span = F.greatest(F.col("decl_max") - F.col("decl_min"), F.lit(1e-9))
    out = (
        (F.col("obs_min") < F.col("decl_min") - span * rel_tol)
        | (F.col("obs_max") > F.col("decl_max") + span * rel_tol)
    )
    return joined.withColumn(
        "out_of_bounds",
        F.when(
            F.col("decl_min").isNotNull() & F.col("decl_max").isNotNull(), out
        ).otherwise(F.lit(None)),
    )


def validate_record_counts(parsed: DataFrame) -> DataFrame:
    """Files whose parsed row count disagrees with the header's
    NUMBER OF RECORDS."""
    return parsed.select(
        "file_id",
        "n_records",
        F.size("records").alias("parsed_records"),
    ).filter(F.col("n_records") != F.col("parsed_records"))
