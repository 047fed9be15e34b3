"""Minimal NetCDF classic writer + reader — CDF-1, CDF-2 (64-bit offset)
and CDF-5 (64-bit data) — from the PUBLIC file-format specifications
(Unidata "NetCDF Classic Format Spec" and the pnetcdf CDF-5 spec).

The reference writes its output with python-netCDF4 (IDT/OceanNcFile.py:
23-65, default NETCDF4/HDF5 container). That library is not available
here, so this module implements the classic containers from scratch:
enough for the reference's output shape — fixed dimensions, global +
per-variable attributes, float/double/int/char variables. Documented
divergence: classic container instead of NETCDF4 (same data model for
this variable set; readable by every NetCDF tool).

Version ladder (chosen automatically, or pinned via ``version=``):
- CDF-1 ('CDF\\x01'): 32-bit offsets — total file effectively < 2 GiB.
- CDF-2 ('CDF\\x02'): variable begin offsets widen to 64-bit — files may
  exceed 2 GiB as long as each single variable stays < 4 GiB.
- CDF-5 ('CDF\\x05'): every count/size/offset is 64-bit — single
  variables beyond 4 GiB (the 100 TB-scale sink path).

Layout (spec): magic | numrecs | dim_list | gatt_list | var_list | data.
All names/values padded to 4-byte boundaries, big-endian. The only
differences between versions are field widths: CDF-2 widens ``begin``;
CDF-5 widens every NON_NEG count (numrecs, list nelems, name lengths,
dim sizes, attr nelems, ndims, dimids, vsize) as well. The list tags
(NC_DIMENSION/NC_VARIABLE/NC_ATTRIBUTE) and nc_type stay 4-byte
constants in EVERY version, and an absent list is encoded as a 4-byte
zero tag followed by a count-width zero nelems (per the pnetcdf CDF-5
grammar: ``ABSENT = ZERO ZERO64``).
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

_MAX_I32 = 0x7FFFFFFF
_MAX_U32 = 0xFFFFFFFF


class _Fmt:
    """Field widths for one CDF version (the ONLY thing that varies)."""

    def __init__(self, version: int):
        self.version = version
        # CDF-5: every count is 64-bit; CDF-1/2: 32-bit.
        self.count = ">q" if version == 5 else ">i"
        # begin offsets: 64-bit from CDF-2 up.
        self.begin = ">q" if version >= 2 else ">i"

    def pack_count(self, v: int) -> bytes:
        return struct.pack(self.count, v)

    def pack_begin(self, v: int) -> bytes:
        return struct.pack(self.begin, v)

    def pack_tag(self, v: int) -> bytes:
        # List tags are 4-byte constants in every CDF version.
        return struct.pack(">i", v)

    def absent(self) -> bytes:
        # ABSENT = 4-byte zero tag + count-width zero nelems.
        return struct.pack(">i", 0) + self.pack_count(0)


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * ((4 - len(b) % 4) % 4)


def _name(s: str, fmt: _Fmt) -> bytes:
    enc = s.encode("utf-8")
    return fmt.pack_count(len(enc)) + _pad4(enc)


def _attr_values(value, fmt: _Fmt | None = None) -> tuple[int, bytes]:
    """Attribute → (nc_type, packed nelems+values).

    The numpy dtype of the value pins the attribute's nc_type: pass
    np.float32 to emit NC_FLOAT (CF requires _FillValue to match the
    variable's type exactly — a double _FillValue on an NC_FLOAT variable
    fails strict readers and CF checkers). Plain Python floats remain
    NC_DOUBLE; smaller ints keep their width.
    """
    fmt = fmt or _Fmt(1)
    if isinstance(value, str):
        enc = value.encode("utf-8")
        return NC_CHAR, fmt.pack_count(len(enc)) + _pad4(enc)
    arr = np.atleast_1d(np.asarray(value))
    if arr.dtype.kind == "f":
        if arr.dtype.itemsize == 4:
            return NC_FLOAT, fmt.pack_count(arr.size) + arr.astype(">f4").tobytes()
        return NC_DOUBLE, fmt.pack_count(arr.size) + arr.astype(">f8").tobytes()
    if arr.dtype.kind == "i" and arr.dtype.itemsize == 2:
        return NC_SHORT, fmt.pack_count(arr.size) + _pad4(
            arr.astype(">i2").tobytes()
        )
    if arr.dtype.kind == "i" and arr.dtype.itemsize == 1:
        return NC_BYTE, fmt.pack_count(arr.size) + _pad4(
            arr.astype(">i1").tobytes()
        )
    arr = arr.astype(">i4")
    return NC_INT, fmt.pack_count(arr.size) + _pad4(arr.tobytes())


def _attr_list(attrs: dict, fmt: _Fmt) -> bytes:
    if not attrs:
        return fmt.absent()
    out = fmt.pack_tag(NC_ATTRIBUTE) + fmt.pack_count(len(attrs))
    for k, v in attrs.items():
        nc_type, payload = _attr_values(v, fmt)
        out += _name(k, fmt) + struct.pack(">i", nc_type) + payload
    return out


@dataclass
class NcVariable:
    name: str
    nc_type: int
    dims: list[str]            # dimension names, [] = scalar
    attrs: dict = field(default_factory=dict)
    data: np.ndarray | str | None = None


def _payload(v: NcVariable, dims: dict[str, int]) -> bytes:
    if v.nc_type == NC_CHAR:
        text = v.data if isinstance(v.data, str) else ""
        size = 1
        for d in v.dims:
            size *= dims[d]
        raw = text.encode("utf-8")[:size].ljust(size, b"\x00")
    else:
        raw = np.asarray(v.data, dtype=_NC_TO_NP[v.nc_type]).tobytes()
    return _pad4(raw)


def _pick_version(dims: dict[str, int], payload_sizes: list[int]) -> int:
    """Smallest classic version that can hold the file: CDF-1 unless the
    file crosses 2 GiB (→ CDF-2), CDF-5 once any single variable or
    dimension needs 64-bit sizes."""
    if any(s > _MAX_U32 - 3 for s in payload_sizes) or any(
        n > _MAX_I32 for n in dims.values()
    ):
        return 5
    # conservative: header is small; begin offsets ≈ cumulative payloads
    if sum(payload_sizes) > _MAX_I32 - 65536:
        return 2
    return 1


def write_netcdf3(
    dims: dict[str, int],
    global_attrs: dict,
    variables: list[NcVariable],
    version: int | None = None,
) -> bytes:
    """Serialize one classic NetCDF file to bytes (CDF-1/2/5; smallest
    sufficient version chosen automatically unless pinned)."""
    dim_names = list(dims)
    payloads = [_payload(v, dims) for v in variables]
    if version is None:
        version = _pick_version(dims, [len(p) for p in payloads])
    if version not in (1, 2, 5):
        raise ValueError(f"unsupported CDF version {version}")
    fmt = _Fmt(version)

    header = b"CDF" + bytes([version]) + fmt.pack_count(0)  # numrecs=0

    if dims:
        header += fmt.pack_tag(NC_DIMENSION) + fmt.pack_count(len(dims))
        for dname in dim_names:
            header += _name(dname, fmt) + fmt.pack_count(dims[dname])
    else:
        header += fmt.absent()

    header += _attr_list(global_attrs, fmt)

    var_meta = [(v, len(p)) for v, p in zip(variables, payloads)]

    # var_list with placeholder begins to measure header length
    def var_list(begins: list[int]) -> bytes:
        if variables:
            out = fmt.pack_tag(NC_VARIABLE) + fmt.pack_count(len(variables))
        else:
            out = fmt.absent()
        for (v, vsize), begin in zip(var_meta, begins):
            out += _name(v.name, fmt)
            out += fmt.pack_count(len(v.dims))
            for d in v.dims:
                out += fmt.pack_count(dim_names.index(d))
            out += _attr_list(v.attrs, fmt)
            out += struct.pack(">i", v.nc_type)
            # vsize: 32-bit unsigned through CDF-2, 64-bit in CDF-5
            out += fmt.pack_count(vsize) if version == 5 else struct.pack(
                ">I", min(vsize, _MAX_U32 - 3)
            )
            out += fmt.pack_begin(begin)
        return out

    probe = header + var_list([0] * len(variables))
    offset = len(probe)
    begins = []
    for _, vsize in var_meta:
        begins.append(offset)
        offset += vsize
    return header + var_list(begins) + b"".join(payloads)


def read_netcdf3(buf: bytes) -> dict:
    """Parse a classic CDF-1/2/5 file (round-trip verification)."""
    assert buf[:3] == b"CDF" and buf[3] in (1, 2, 5), "not a classic CDF file"
    version = buf[3]
    fmt = _Fmt(version)
    cw = 8 if version == 5 else 4  # count width
    bw = 8 if version >= 2 else 4  # begin width
    pos = [4 + cw]  # skip magic + numrecs

    def read_count() -> int:
        v = struct.unpack(fmt.count, buf[pos[0] : pos[0] + cw])[0]
        pos[0] += cw
        return v

    def read_i4() -> int:
        v = struct.unpack(">i", buf[pos[0] : pos[0] + 4])[0]
        pos[0] += 4
        return v

    def read_begin() -> int:
        v = struct.unpack(fmt.begin, buf[pos[0] : pos[0] + bw])[0]
        pos[0] += bw
        return v

    def read_name() -> str:
        n = read_count()
        s = buf[pos[0] : pos[0] + n].decode("utf-8")
        pos[0] += n + ((4 - n % 4) % 4)
        return s

    def read_attrs() -> dict:
        tag, cnt = read_i4(), read_count()
        out = {}
        for _ in range(cnt):
            name = read_name()
            nc_type = read_i4()
            n = read_count()
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

    tag, ndims = read_i4(), read_count()
    dims = []
    for _ in range(ndims):
        dims.append((read_name(), read_count()))
    gattrs = read_attrs()
    tag, nvars = read_i4(), read_count()
    variables = {}
    for _ in range(nvars):
        name = read_name()
        nd = read_count()
        dimids = [read_count() for _ in range(nd)]
        attrs = read_attrs()
        nc_type = read_i4()
        if version == 5:
            vsize = read_count()
        else:
            (vsize,) = struct.unpack(">I", buf[pos[0] : pos[0] + 4])
            pos[0] += 4
        begin = read_begin()
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
