"""CF-convention Parquet sink (SURVEY.md §2.8 K1-K4).

Replaces the reference's per-file NetCDF writer (IDT/OceanNcFile.py:23-65)
with a columnar layout:

- measurements: long-format CF variables partitioned by observation year
  (the reference writes out_path/yy/file.nc, IDT/ios_data_transform_script.py:73-75
  → partitionBy('year') gives the same pruning, plus dynamic partition
  pruning on read);
- variables sidecar: per-file variable attributes (CF standard/long names,
  canonical units — FIXTURES.md §6);
- headers sidecar: full header tree as JSON (the reference stores it as a
  global attr, IDT/write_ctd_ncfile.py:36).

Idempotency: mode=overwrite with dynamic partitionOverwriteMode replaces
exactly the partitions being rewritten — this subsumes the reference's
orphan-delete (K3) and failed-write cleanup (K4) shell hacks; Spark's task
commit protocol guarantees no partial files.

Scale notes: partitionBy(year) keeps files clustered for time-range scans;
within a partition, writers are sized by the upstream shuffle — repartition
by (year) with AQE coalescing avoids small-file explosions at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_cf_dataset(
    parsed: DataFrame,
    out_dir: str,
    mode: str = "overwrite",
) -> dict[str, str]:
    """Write the full CF dataset (measurements + variables + headers +
    catalog). Returns the written paths."""
    from cioos_siooc_data_transform_spark.operators.bodc import assign_bodc_codes
    from cioos_siooc_data_transform_spark.sources.ios_source import (
        ios_catalog,
        ios_channels,
        ios_header_json,
        ios_measurements_masked,
    )

    spark = parsed.sparkSession
    # save/restore: mutating the shared session conf would silently
    # switch every LATER partitioned overwrite in this session from
    # static (truncate-table) to dynamic semantics
    prev_overwrite_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", None
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    # the binaryFile scan + Python parse feeds FOUR write actions (and
    # the cf plan references it three more times) — cache once like the
    # sibling sinks, or every file re-parses ~6x
    parsed = parsed.cache()

    catalog = ios_catalog(parsed)
    channels = ios_channels(parsed)
    codes = assign_bodc_codes(channels)
    meas = ios_measurements_masked(parsed)

    # CF measurements: only routed channels, keyed by var_code, with the
    # observation year for partitioning (profile files: start year).
    cf = (
        meas.join(codes.select("file_id", "channel_idx", "var_code"),
                  ["file_id", "channel_idx"])
        .join(catalog.select("file_id", "start_ts"), "file_id")
        .withColumn("year", F.year("start_ts"))
        .select("year", "file_id", "record_idx", "var_code", "value_num")
    )

    paths = {
        "measurements": os.path.join(out_dir, "measurements"),
        "variables": os.path.join(out_dir, "variables"),
        "headers": os.path.join(out_dir, "headers"),
        "catalog": os.path.join(out_dir, "catalog"),
    }
    try:
        cf.repartition("year").sortWithinPartitions(
            "file_id", "record_idx"
        ).write.mode(mode).option("compression", "zstd").partitionBy(
            "year"
        ).parquet(paths["measurements"])
        codes.write.mode(mode).option("compression", "zstd").parquet(
            paths["variables"]
        )
        ios_header_json(parsed).write.mode(mode).parquet(paths["headers"])
        catalog.write.mode(mode).parquet(paths["catalog"])
    finally:
        parsed.unpersist()
        if prev_overwrite_mode is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev_overwrite_mode
            )
    return paths


def reconcile_outputs(catalog_out: DataFrame, source_files: DataFrame) -> DataFrame:
    """K3: outputs whose source file vanished (LEFT ANTI on file_id) —
    callers drop these partitions (IDT/ios_data_transform_script.py:114-121)."""
    return catalog_out.join(source_files.select("file_id"), "file_id", "left_anti")
