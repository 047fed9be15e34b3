"""End-to-end CLI conversion: the reference's primary entry point shape
(discover → parse → enrich → sink) in one call."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

IDT = "/root/reference/cioos_data_transform/ios_data_transform/ios_data_transform/tests/test_files"


def test_convert_all_ctd_with_geo_and_netcdf(spark):
    from cioos_siooc_data_transform_spark.cli import convert
    from cioos_siooc_data_transform_spark.sinks.netcdf3 import read_netcdf3

    with tempfile.TemporaryDirectory() as out:
        result = convert(
            "all",
            "ctd",
            f"{IDT}/ctd_profile",
            out,
            geojson=f"{IDT}/ios_polygons.geojson",
            netcdf=True,
            spark=spark,
        )
        assert result["files"] == 6 and result["errors"] == 0

        meas = spark.read.parquet(result["paths"]["measurements"])
        assert meas.count() > 0
        geo = spark.read.parquet(result["paths"]["geo_codes"])
        codes = {r["file_id"]: r["geo_code"] for r in geo.collect()}
        assert codes["2017-020-0474"] == "Canadian-Arctic-Archipelago-South"

        nc_path = os.path.join(out, "netcdf", "2017", "2017-020-0474.nc")
        assert os.path.exists(nc_path)
        nc = read_netcdf3(open(nc_path, "rb").read())
        assert nc["dims"]["z"] == 189
