"""Property-based round-trip tests (SURVEY.md §5d): rendered fixed-width /
Fortran data blocks must parse back to the same values for arbitrary
channel layouts."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from cioos_siooc_data_transform_spark.sources.fortran_spec import (
    parse_format,
    read_record,
)
from cioos_siooc_data_transform_spark.sources.ios_format import (
    parse_dms,
    parse_ios_file_safe,
    parse_time_increment,
    read_data_fixed_width,
)

WIDTH = st.integers(min_value=8, max_value=14)
VALUE = st.floats(
    min_value=-999.99, max_value=9999.99, allow_nan=False, allow_infinity=False
)


@settings(max_examples=30, deadline=None)
@given(
    widths=st.lists(WIDTH, min_size=2, max_size=8),
    rows=st.integers(min_value=1, max_value=12),
    data=st.data(),
)
def test_fixed_width_roundtrip(widths, rows, data):
    table = [
        [data.draw(VALUE) for _ in widths] for _ in range(rows)
    ]
    lines = [
        "".join(f"{v:{w}.2f}"[:w].rjust(w) for v, w in zip(row, widths))
        for row in table
    ]
    parsed = read_data_fixed_width(lines, widths)
    assert len(parsed) == rows
    for row, orig in zip(parsed, table):
        for cell, v in zip(row, orig):
            assert abs(float(cell) - round(v, 2)) < 0.005


@settings(max_examples=30, deadline=None)
@given(vals=st.lists(VALUE, min_size=1, max_size=6))
def test_fortran_roundtrip(vals):
    spec = "(" + ",".join(["E15.7"] * len(vals)) + ")"
    line = "".join(f"{v:15.7E}" for v in vals)
    out = read_record(parse_format(spec), line)
    for got, want in zip(out, vals):
        assert math.isclose(got, want, rel_tol=1e-6, abs_tol=1e-6)


@settings(max_examples=50, deadline=None)
@given(
    deg=st.integers(min_value=0, max_value=179),
    minutes=st.floats(min_value=0, max_value=59.99999, allow_nan=False),
    hem=st.sampled_from(["N", "S", "E", "W"]),
)
def test_dms_roundtrip(deg, minutes, hem):
    raw = f" {deg:3d} {minutes:11.5f} {hem}"
    got = parse_dms(raw)
    want = deg + round(minutes, 5) / 60.0
    if hem in ("S", "W"):
        want = -want
    assert math.isclose(got, want, abs_tol=1e-6)


@settings(max_examples=50, deadline=None)
@given(
    d=st.integers(0, 3), h=st.integers(0, 23), m=st.integers(0, 59),
    s=st.floats(0, 59.999, allow_nan=False), ms=st.integers(0, 999),
)
def test_time_increment_roundtrip(d, h, m, s, ms):
    raw = f"{d} {h} {m} {s:.6f} {ms}  ! (day hr min sec ms)"
    got = parse_time_increment(raw)
    want = d * 86400 + h * 3600 + m * 60 + float(f"{s:.6f}") + ms * 0.001
    assert math.isclose(got, want, rel_tol=1e-12)


@settings(max_examples=15, deadline=None)
@given(
    n_channels=st.integers(min_value=1, max_value=6),
    n_records=st.integers(min_value=1, max_value=20),
    data=st.data(),
)
def test_whole_file_roundtrip(n_channels, n_records, data):
    """Render a complete synthetic IOS file and parse it back."""
    width = 10
    table = [
        [round(data.draw(VALUE), 2) for _ in range(n_channels)]
        for _ in range(n_records)
    ]
    ch_rows = "\n".join(
        f"       {i+1} Chan{i+1:02d}          n/a      0        1"
        for i in range(n_channels)
    )
    det_rows = "\n".join(
        f"       {i+1}  -99   ' '       {width}  F       ' '     2"
        for i in range(n_channels)
    )
    body = "\n".join(
        "".join(f"{v:{width}.2f}".rjust(width) for v in row) for row in table
    )
    text = f"""*2024/01/01 00:00:00.00
*IOS HEADER VERSION 2.0      2016/04/28 2016/06/13

*FILE
    START TIME          : UTC 2024/01/01 00:00:00.000
    NUMBER OF RECORDS   : {n_records}
    DATA DESCRIPTION    : CTD
    NUMBER OF CHANNELS  : {n_channels}

    $TABLE: CHANNELS
    ! No Name            Units    Minimum  Maximum
    !--- --------------- -------- -------- --------
{ch_rows}
    $END

    $TABLE: CHANNEL DETAIL
    ! No  Pad   Start  Width  Format  Type  Decimal_Places
    !---  ----  -----  -----  ------  ----  --------------
{det_rows}
    $END

*LOCATION
    LATITUDE            :  49  30.00000 N  ! (deg min)
    LONGITUDE           : 123  15.00000 W  ! (deg min)

*END OF HEADER
{body}
"""
    r = parse_ios_file_safe("/tmp/prop.ctd", text)
    assert r["error"] is None
    assert r["parse_strategy"] == "fixed_width"
    assert len(r["records"]) == n_records
    for row, orig in zip(r["records"], table):
        assert len(row) == n_channels
        for cell, v in zip(row, orig):
            assert math.isclose(float(cell), v, abs_tol=0.005)
