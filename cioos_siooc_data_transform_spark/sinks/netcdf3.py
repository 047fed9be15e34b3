"""Minimal NetCDF-3 classic (CDF-1) writer + reader, from the PUBLIC
file-format specification (Unidata "NetCDF Classic Format Spec").

The reference writes its output with python-netCDF4 (IDT/OceanNcFile.py:
23-65, default NETCDF4/HDF5 container). That library is not available
here, so this module implements the classic CDF-1 container from scratch:
enough for the reference's output shape — fixed dimensions, global +
per-variable attributes, float/double/int/char variables. Documented
divergence: NETCDF3_CLASSIC container instead of NETCDF4 (same data model
for this variable set; readable by every NetCDF tool).

Layout (spec): magic 'CDF\\x01' | numrecs | dim_list | gatt_list |
var_list | data. All names/values padded to 4-byte boundaries, big-endian.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
NC_DIMENSION, NC_VARIABLE, NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C

_TYPE_SIZE = {NC_BYTE: 1, NC_CHAR: 1, NC_SHORT: 2, NC_INT: 4, NC_FLOAT: 4, NC_DOUBLE: 8}
_NP_TO_NC = {"f4": NC_FLOAT, "f8": NC_DOUBLE, "i4": NC_INT, "i2": NC_SHORT, "i1": NC_BYTE}
_NC_TO_NP = {NC_FLOAT: ">f4", NC_DOUBLE: ">f8", NC_INT: ">i4", NC_SHORT: ">i2",
             NC_BYTE: ">i1", NC_CHAR: "S1"}


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * ((4 - len(b) % 4) % 4)


def _name(s: str) -> bytes:
    enc = s.encode("utf-8")
    return struct.pack(">i", len(enc)) + _pad4(enc)


def _attr_values(value) -> tuple[int, bytes]:
    """Attribute → (nc_type, packed nelems+values).

    The numpy dtype of the value pins the attribute's nc_type: pass
    np.float32 to emit NC_FLOAT (CF requires _FillValue to match the
    variable's type exactly — a double _FillValue on an NC_FLOAT variable
    fails strict readers and CF checkers). Plain Python floats remain
    NC_DOUBLE; smaller ints keep their width.
    """
    if isinstance(value, str):
        enc = value.encode("utf-8")
        return NC_CHAR, struct.pack(">i", len(enc)) + _pad4(enc)
    arr = np.atleast_1d(np.asarray(value))
    if arr.dtype.kind == "f":
        if arr.dtype.itemsize == 4:
            return NC_FLOAT, struct.pack(">i", arr.size) + arr.astype(">f4").tobytes()
        return NC_DOUBLE, struct.pack(">i", arr.size) + arr.astype(">f8").tobytes()
    if arr.dtype.kind == "i" and arr.dtype.itemsize == 2:
        return NC_SHORT, struct.pack(">i", arr.size) + _pad4(
            arr.astype(">i2").tobytes()
        )
    if arr.dtype.kind == "i" and arr.dtype.itemsize == 1:
        return NC_BYTE, struct.pack(">i", arr.size) + _pad4(
            arr.astype(">i1").tobytes()
        )
    arr = arr.astype(">i4")
    return NC_INT, struct.pack(">i", arr.size) + _pad4(arr.tobytes())


def _attr_list(attrs: dict) -> bytes:
    if not attrs:
        return struct.pack(">ii", 0, 0)
    out = struct.pack(">ii", NC_ATTRIBUTE, len(attrs))
    for k, v in attrs.items():
        nc_type, payload = _attr_values(v)
        out += _name(k) + struct.pack(">i", nc_type) + payload
    return out


@dataclass
class NcVariable:
    name: str
    nc_type: int
    dims: list[str]            # dimension names, [] = scalar
    attrs: dict = field(default_factory=dict)
    data: np.ndarray | str | None = None


def write_netcdf3(
    dims: dict[str, int],
    global_attrs: dict,
    variables: list[NcVariable],
) -> bytes:
    """Serialize one classic NetCDF-3 (CDF-1) file to bytes."""
    dim_names = list(dims)

    # header: magic + numrecs(0; no unlimited dims used)
    header = b"CDF\x01" + struct.pack(">i", 0)

    if dims:
        header += struct.pack(">ii", NC_DIMENSION, len(dims))
        for dname in dim_names:
            header += _name(dname) + struct.pack(">i", dims[dname])
    else:
        header += struct.pack(">ii", 0, 0)

    header += _attr_list(global_attrs)

    # variable payloads: compute sizes first, then begins after the header
    payloads: list[bytes] = []
    var_meta: list[tuple[NcVariable, int]] = []  # (var, vsize)
    for v in variables:
        if v.nc_type == NC_CHAR:
            text = v.data if isinstance(v.data, str) else ""
            size = 1
            for d in v.dims:
                size *= dims[d]
            raw = text.encode("utf-8")[:size].ljust(size, b"\x00")
        else:
            arr = np.asarray(v.data, dtype=_NC_TO_NP[v.nc_type])
            raw = arr.tobytes()
        payloads.append(_pad4(raw))
        var_meta.append((v, len(_pad4(raw))))

    # var_list with placeholder begins to measure header length
    def var_list(begins: list[int]) -> bytes:
        out = struct.pack(">ii", NC_VARIABLE, len(variables)) if variables else struct.pack(">ii", 0, 0)
        for (v, vsize), begin in zip(var_meta, begins):
            out += _name(v.name)
            out += struct.pack(">i", len(v.dims))
            for d in v.dims:
                out += struct.pack(">i", dim_names.index(d))
            out += _attr_list(v.attrs)
            out += struct.pack(">iii", v.nc_type, vsize, begin)
        return out

    probe = header + var_list([0] * len(variables))
    offset = len(probe)
    begins = []
    for _, vsize in var_meta:
        begins.append(offset)
        offset += vsize
    return header + var_list(begins) + b"".join(payloads)


def read_netcdf3(buf: bytes) -> dict:
    """Parse a classic CDF-1 file (round-trip verification)."""
    assert buf[:4] == b"CDF\x01", "not a CDF-1 file"
    pos = [8]

    def read_i() -> int:
        v = struct.unpack(">i", buf[pos[0] : pos[0] + 4])[0]
        pos[0] += 4
        return v

    def read_name() -> str:
        n = read_i()
        s = buf[pos[0] : pos[0] + n].decode("utf-8")
        pos[0] += n + ((4 - n % 4) % 4)
        return s

    def read_attrs() -> dict:
        tag, cnt = read_i(), read_i()
        out = {}
        for _ in range(cnt):
            name = read_name()
            nc_type = read_i()
            n = read_i()
            if nc_type == NC_CHAR:
                raw = buf[pos[0] : pos[0] + n]
                pos[0] += n + ((4 - n % 4) % 4)
                out[name] = raw.decode("utf-8")
            else:
                w = _TYPE_SIZE[nc_type]
                raw = buf[pos[0] : pos[0] + n * w]
                total = n * w
                pos[0] += total + ((4 - total % 4) % 4)
                out[name] = np.frombuffer(raw, dtype=_NC_TO_NP[nc_type]).tolist()
        return out

    tag, ndims = read_i(), read_i()
    dims = []
    for _ in range(ndims):
        dims.append((read_name(), read_i()))
    gattrs = read_attrs()
    tag, nvars = read_i(), read_i()
    variables = {}
    for _ in range(nvars):
        name = read_name()
        nd = read_i()
        dimids = [read_i() for _ in range(nd)]
        attrs = read_attrs()
        nc_type, vsize, begin = read_i(), read_i(), read_i()
        shape = tuple(dims[d][1] for d in dimids)
        count = int(np.prod(shape)) if shape else 1
        w = _TYPE_SIZE[nc_type]
        raw = buf[begin : begin + count * w]
        if nc_type == NC_CHAR:
            data = raw.rstrip(b"\x00").decode("utf-8")
        else:
            data = np.frombuffer(raw, dtype=_NC_TO_NP[nc_type]).reshape(shape)
        variables[name] = {"dims": [dims[d][0] for d in dimids], "attrs": attrs, "data": data}
    return {"dims": dict(dims), "attrs": gattrs, "variables": variables}
