"""End-to-end reference-corpus snapshot builder (SURVEY.md §5(b)).

Runs the engine's full conversion pipeline — discover → parse → BODC
routing → CF variable assembly → NetCDF-3 bytes, plus geo-code
assignment against the reference's own ios_polygons.geojson — over the
reference repo's test corpus (IDT/tests/test_files/{ctd_profile,
ctd_mooring,bot}; the same 34 files the reference's own smoke loop,
IDT/tests/test.py:48-55, converts WITHOUT assertions) and reduces every
output .nc to a deterministic JSON-able snapshot:

per file: dims, global attrs, geo code, and per variable (sorted):
dims, canonicalized attrs, dtype, element count, bit-exact md5 of the
packed payload bytes, and the first/last values as text.

`tools/make_corpus_golden.py` writes the snapshot to
tests/golden/corpus_netcdf.json once; `tests/test_corpus_golden.py`
recomputes it and fails if ANY routed channel's values, BODC name, or
CF attr drifts — the assertion coverage the reference's smoke loop
never had.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np

IDT_TESTS = (
    "/root/reference/cioos_data_transform/ios_data_transform/"
    "ios_data_transform/tests"
)
CORPUS = (
    ("ctd_profile", ["ctd"]),
    ("ctd_mooring", ["ctd"]),
    ("bot", ["che"]),
)
POLYGONS = f"{IDT_TESTS}/test_files/ios_polygons.geojson"
GOLDEN_PATH = "tests/golden/corpus_netcdf.json"


def _canon_attr(v) -> str:
    if isinstance(v, list):
        return "[" + ", ".join(_canon_attr(x) for x in v) + "]"
    if isinstance(v, float) and v != v:
        return "nan"
    return repr(v) if not isinstance(v, str) else v


def _var_snapshot(var: dict) -> dict:
    data = var["data"]
    if isinstance(data, np.ndarray):
        flat = data.ravel()
        payload_md5 = hashlib.md5(flat.tobytes()).hexdigest()
        head = [repr(float(x)) for x in flat[:3]]
        tail = [repr(float(x)) for x in flat[-3:]]
        snap_data = {
            "dtype": str(flat.dtype),
            "n": int(flat.size),
            "payload_md5": payload_md5,
            "head": head,
            "tail": tail,
        }
    else:  # NC_CHAR scalar/string variable
        snap_data = {"dtype": "char", "text": str(data)}
    return {
        "dims": list(var["dims"]),
        "attrs": {k: _canon_attr(v) for k, v in sorted(var["attrs"].items())},
        **snap_data,
    }


def snapshot_corpus(spark) -> dict:
    """Run the whole pipeline over the reference corpus; return the
    snapshot dict keyed by file_id."""
    from cioos_siooc_data_transform_spark.sinks.cf_netcdf import to_netcdf_bytes
    from cioos_siooc_data_transform_spark.sinks.netcdf3 import read_netcdf3
    from cioos_siooc_data_transform_spark.sources.geojson_source import (
        assign_geo_code,
        read_geojson_polygons,
    )
    from cioos_siooc_data_transform_spark.sources.ios_source import (
        discover_files,
        ios_catalog,
        parse_ios,
    )

    parsed = None
    for subdir, exts in CORPUS:
        files = discover_files(spark, f"{IDT_TESTS}/test_files/{subdir}", exts)
        p = parse_ios(files)
        parsed = p if parsed is None else parsed.unionByName(p)
    parsed = parsed.cache()

    polys = read_geojson_polygons(spark, POLYGONS)
    geo = {
        r["file_id"]: r["geo_code"]
        for r in assign_geo_code(ios_catalog(parsed), polys)
        .select("file_id", "geo_code")
        .collect()
    }

    snap = {}
    for row in to_netcdf_bytes(parsed).collect():
        nc = read_netcdf3(bytes(row["nc_bytes"]))
        gattrs = dict(nc["attrs"])
        # HEADER is the full section JSON — hash it (bulky but must not
        # drift); keep the rest verbatim.
        gattrs["HEADER"] = "md5:" + hashlib.md5(
            gattrs.get("HEADER", "").encode()
        ).hexdigest()
        snap[row["file_id"]] = {
            "year": int(row["year"]),
            "dims": {k: int(v) for k, v in nc["dims"].items()},
            "global_attrs": {k: _canon_attr(v) for k, v in sorted(gattrs.items())},
            "geo_code": geo.get(row["file_id"]),
            "variables": {
                name: _var_snapshot(var)
                for name, var in sorted(nc["variables"].items())
            },
        }
    parsed.unpersist()
    return snap


def dump(snap: dict) -> str:
    return json.dumps(snap, indent=1, sort_keys=True, allow_nan=False)
