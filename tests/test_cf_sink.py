"""CF Parquet sink round-trip: write the corpus, read it back, verify
partitioning, routing, and idempotent overwrite."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

IDT = "/root/reference/cioos_data_transform/ios_data_transform/ios_data_transform/tests/test_files"


def test_cf_sink_roundtrip(spark):
    from cioos_siooc_data_transform_spark.sinks.cf_parquet import write_cf_dataset
    from cioos_siooc_data_transform_spark.sources.ios_source import read_ios

    parsed = read_ios(spark, f"{IDT}/ctd_profile", ["ctd"])
    with tempfile.TemporaryDirectory() as out:
        paths = write_cf_dataset(parsed, out)
        meas = spark.read.parquet(paths["measurements"])
        assert set(meas.columns) == {"file_id", "record_idx", "var_code", "value_num", "year"}
        years = {r["year"] for r in meas.select("year").distinct().collect()}
        assert years == {2017}
        codes = {r["var_code"] for r in meas.select("var_code").distinct().collect()}
        assert "TEMPS901" in codes and "PRESPR01" in codes
        # partition pruning works on the year column
        pruned = spark.read.parquet(paths["measurements"]).filter(F.col("year") == 2017)
        assert pruned.count() == meas.count()
        # idempotent rewrite: second write replaces, row count unchanged
        n1 = meas.count()
        write_cf_dataset(parsed, out)
        assert spark.read.parquet(paths["measurements"]).count() == n1
        headers = spark.read.parquet(paths["headers"])
        assert headers.count() == 6
