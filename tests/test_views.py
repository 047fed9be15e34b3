from __future__ import annotations

from pyspark.sql import functions as F

IDT = "/root/reference/cioos_data_transform/ios_data_transform/ios_data_transform/tests/test_files"


def test_wide_profile_view(spark):
    from cioos_siooc_data_transform_spark.operators.views import wide_profile_view
    from cioos_siooc_data_transform_spark.sources.ios_source import read_ios

    parsed = read_ios(spark, f"{IDT}/ctd_profile", ["ctd"])
    wide = wide_profile_view(parsed)
    row = (
        wide.filter((F.col("file_id") == "2017-020-0474") & (F.col("record_idx") == 0))
        .first()
    )
    # first record of the cast: pressure 3.1, depth 3.1, ITS90 temp 6.2644
    assert row["PRESPR01"] == 3.1
    assert row["depth"] == 3.1
    assert row["TEMPS901"] == 6.2644
    assert row["PSALST01"] == 27.969
    assert abs(row["latitude"] - 71.3885) < 1e-4
    n = wide.filter(F.col("file_id") == "2017-020-0474").count()
    assert n == 189


def test_filter_new_files(spark):
    from cioos_siooc_data_transform_spark.operators.views import filter_new_files
    from cioos_siooc_data_transform_spark.sources.ios_source import discover_files

    files = discover_files(spark, f"{IDT}/ctd_profile", ["ctd"])
    # zero-width window: nothing is newer than "now"
    assert filter_new_files(files, 0.0).count() == 0
    # a huge window keeps everything
    assert filter_new_files(files, 1e7).count() == files.count()


def test_mooring_timeseries_view(spark):
    from cioos_siooc_data_transform_spark.operators.views import (
        mooring_timeseries_view,
    )
    from cioos_siooc_data_transform_spark.sources.ios_source import read_ios

    parsed = read_ios(spark, f"{IDT}/ctd_mooring", ["ctd"])
    ts = mooring_timeseries_view(parsed)
    first = (
        ts.filter(
            (F.col("file_id") == "a1_20080429_20080518_0034m")
            & (F.col("record_idx") == 1)
            & (F.col("channel_idx") == 4)
        ).first()
    )
    # second record, Temperature channel: 7.6285 at start+600s
    assert first["obs_ts"].isoformat() == "2008-04-29T20:50:01"
    assert first["value_num"] == 7.6285
