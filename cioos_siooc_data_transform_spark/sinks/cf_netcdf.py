"""CF NetCDF export (SURVEY.md §2.8 K1/K2): one NetCDF-3 file per input
observation file, mirroring the reference writer's variable assembly
(IDT/write_ctd_ncfile.py:11-151 + IDT/OceanNcFile.py:23-81):

global attrs (featureType, title, institution, header JSON) + dimension z
(= record count) + envelope vars (latitude, longitude, time, profile id)
+ the routed BODC-coded channel variables (pad → NaN, float32, CF names).

BODC routing happens ONCE as the relational operator (assign_bodc_codes),
joined back to the parsed rows as an array column; the per-file byte
assembly is a mapInPandas over complete file rows. Output is
(file_id, year, nc_bytes) — a DataFrame, so callers can write to any
store; write_netcdf_dir materializes to a local directory tree
(out/yy/file.nc like the reference, IDT/ios_data_transform_script.py:73-75).
"""

from __future__ import annotations

import json
import math
import os
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_netcdf_bytes(parsed: DataFrame) -> DataFrame:
    """Parsed IOS rows → (file_id, year, nc_bytes)."""
    from cioos_siooc_data_transform_spark.operators.bodc import assign_bodc_codes
    from cioos_siooc_data_transform_spark.sources.ios_source import ios_channels

    codes = (
        assign_bodc_codes(ios_channels(parsed))
        .groupBy("file_id")
        .agg(
            F.collect_list(
                F.struct(
                    "channel_idx", "var_code", "units", "standard_name",
                    "long_name", "pad",
                )
            ).alias("cf_vars")
        )
    )
    enriched = parsed.join(codes, "file_id", "left")

    def build(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from cioos_siooc_data_transform_spark.sinks.netcdf3 import (
            NC_CHAR, NC_DOUBLE, NC_FLOAT, NcVariable, write_netcdf3,
        )

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                records = [list(r) for r in row["records"]]
                nrec = len(records)
                if nrec == 0:
                    # classic NetCDF defines a dimension of length 0 as
                    # the UNLIMITED record dimension — writing z=0 would
                    # silently change every ['z'] variable into a record
                    # variable; skip the file instead (same per-file
                    # isolation as a parse error)
                    continue
                raw_vars = row["cf_vars"]
                cf_vars = sorted(
                    (list(raw_vars) if raw_vars is not None else []),
                    key=lambda v: v["channel_idx"],
                )
                profile_id = str(row["file_id"])
                dims = {"z": nrec, "profile_strlen": max(len(profile_id), 1)}
                gattrs = {
                    "featureType": "profile",
                    "title": f"IOS observation {row['file_id']}",
                    "institution": row["agency"] or "",
                    "mission": row["mission"] or "",
                    "HEADER": json.dumps(
                        {k: dict(v) for k, v in (row["header_sections"] or {}).items()}
                    ),
                }
                variables = [
                    NcVariable(
                        "latitude", NC_FLOAT, [],
                        {"standard_name": "latitude", "units": "degrees_north"},
                        np.asarray(row["latitude"] if row["latitude"] is not None else math.nan),
                    ),
                    NcVariable(
                        # reference bug fixed: standard_name 'longitude'
                        # (IDT/OceanNcVar.py:63 wrote 'latitude')
                        "longitude", NC_FLOAT, [],
                        {"standard_name": "longitude", "units": "degrees_east"},
                        np.asarray(row["longitude"] if row["longitude"] is not None else math.nan),
                    ),
                    NcVariable(
                        "time", NC_DOUBLE, [],
                        {"standard_name": "time",
                         "units": "seconds since 1970-01-01 00:00:00+0000"},
                        # pd.notna, not `is not None`: a NULL start_ts
                        # arrives in mapInPandas as pd.NaT, which passes
                        # an identity check but raises on .timestamp()
                        np.asarray(
                            row["start_ts"].timestamp()
                            if pd.notna(row["start_ts"])
                            else math.nan
                        ),
                    ),
                    NcVariable(
                        "profile", NC_CHAR, ["profile_strlen"],
                        {"cf_role": "profile_id"}, profile_id,
                    ),
                ]
                for v in cf_vars:
                    ci = v["channel_idx"] - 1
                    pad = (v["pad"] or "").strip()
                    try:
                        pad_num = float(pad) if pad else None
                    except ValueError:
                        pad_num = None
                    vals = np.full(nrec, np.nan, dtype="f4")
                    for r in range(nrec):
                        try:
                            x = float(records[r][ci])
                        except (ValueError, IndexError):
                            continue
                        if pad_num is None or x != pad_num:
                            vals[r] = x
                    variables.append(
                        NcVariable(
                            v["var_code"], NC_FLOAT, ["z"],
                            {
                                "standard_name": v["standard_name"],
                                "long_name": v["long_name"],
                                "units": v["units"],
                                # np.float32 → packed as NC_FLOAT: CF
                                # requires _FillValue to have the
                                # variable's exact type
                                "_FillValue": np.float32("nan"),
                            },
                            vals,
                        )
                    )
                nc = write_netcdf3(dims, gattrs, variables)
                year = row["start_ts"].year if pd.notna(row["start_ts"]) else 0
                out.append((row["file_id"], year, bytearray(nc)))
            yield pd.DataFrame(out, columns=["file_id", "year", "nc_bytes"])

    return enriched.mapInPandas(build, schema="file_id string, year int, nc_bytes binary")


def write_netcdf_dir(parsed: DataFrame, out_dir: str) -> int:
    """Materialize one .nc per file under out_dir/<year>/<file_id>.nc.

    Executor-side writes via foreachPartition (no driver collect — file
    bytes never funnel through one process); a task retry simply rewrites
    the same paths, so the write is idempotent. Returns the file count.
    """

    def write_partition(rows) -> None:
        for r in rows:
            d = os.path.join(out_dir, str(r["year"]))
            os.makedirs(d, exist_ok=True)
            tmp = os.path.join(d, f".{r['file_id']}.nc.tmp")
            with open(tmp, "wb") as f:
                f.write(bytes(r["nc_bytes"]))
            os.replace(tmp, os.path.join(d, f"{r['file_id']}.nc"))

    nc = to_netcdf_bytes(parsed).cache()
    try:
        nc.foreachPartition(write_partition)
        return nc.count()
    finally:
        nc.unpersist()
