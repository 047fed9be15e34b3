"""End-to-end reference-corpus golden parity (SURVEY.md §5(b)).

The reference's own smoke loop (IDT/tests/test.py:48-55) converts the 34
corpus files with NO assertions. This test beats it: the engine's full
pipeline output (NetCDF variables, BODC names, CF attrs, geo codes) is
pinned against tests/golden/corpus_netcdf.json — any drift in any routed
channel's values, name, or attrs fails with a per-file diff.

Regenerate deliberately with: python tools/make_corpus_golden.py
"""

from __future__ import annotations

import json

import pytest

from tests.corpus_golden_lib import GOLDEN_PATH, snapshot_corpus


@pytest.fixture(scope="module")
def snap(spark):
    return snapshot_corpus(spark)


def _golden() -> dict:
    with open(GOLDEN_PATH) as f:
        return json.load(f)


def test_corpus_matches_golden(snap):
    golden = _golden()
    assert sorted(snap) == sorted(golden), (
        f"file set drift: only-now={sorted(set(snap) - set(golden))} "
        f"only-golden={sorted(set(golden) - set(snap))}"
    )
    for file_id, want in golden.items():
        got = snap[file_id]
        assert sorted(got["variables"]) == sorted(want["variables"]), (
            f"{file_id}: variable set drift "
            f"(now={sorted(got['variables'])} golden={sorted(want['variables'])})"
        )
        for vn, wv in want["variables"].items():
            gv = got["variables"][vn]
            assert gv == wv, (
                f"{file_id}/{vn} drift:\n now={gv}\n golden={wv}"
            )
        for key in ("dims", "global_attrs", "geo_code", "year"):
            assert got[key] == want[key], (
                f"{file_id}: {key} drift: now={got[key]} golden={want[key]}"
            )


def test_corpus_coverage_is_the_reference_loop(snap):
    """Same corpus the reference converts: 6 profile + 9 mooring + 19
    bottle files, every one with the 4 envelope variables and at least
    one routed BODC channel."""
    assert len(snap) == 34
    for file_id, entry in snap.items():
        names = set(entry["variables"])
        assert {"latitude", "longitude", "time", "profile"} <= names, file_id
        bodc = names - {"latitude", "longitude", "time", "profile"}
        assert bodc, f"{file_id}: no routed channels"


def test_pinned_reference_facts(snap):
    """Hand-derived anchors from the reference's own routing/format rules
    (so the golden can't silently ossify a wrong answer):
    2017-020-0474.ctd — header pins (IDT corpus file itself): 189
    records, 12 channels → TEMPS901/PSALST01/PRESPR01 BODC names per the
    reference's channel→BODC ladder (IDT/write_ctd_ncfile.py:64-130),
    first temperature 6.2644, first pressure 3.1, lat 71°23.31'N."""
    e = snap["2017-020-0474"]
    assert e["dims"]["z"] == 189
    v = e["variables"]
    assert {"TEMPS901", "PSALST01", "PRESPR01", "CNDCST01"} <= set(v)
    assert v["TEMPS901"]["head"][0].startswith("6.2644")
    assert v["PRESPR01"]["head"][0].startswith("3.0999")  # 3.1 as f4
    # units canonicalized exactly as the reference does: raw header
    # "'deg C (ITS90)'" → BODC units 'deg C' (IDT/OceanNcVar.py:175-189)
    assert v["TEMPS901"]["attrs"]["units"] == "deg C"
    lat = float(v["latitude"]["head"][0])
    assert lat == pytest.approx(71 + 23.31 / 60, abs=1e-4)
    # polygon assignment against the reference's ios_polygons.geojson
    assert e["geo_code"] == "Canadian-Arctic-Archipelago-South"

    # mooring: fixed 600 s increment, 2647 records (header-declared)
    m = snap["a1_20080429_20080518_0034m"]
    assert m["dims"]["z"] == 2647

    # bottle: PDT→UTC fixed-offset conversion lands start time at
    # 1990-10-12 23:53 UTC (IDT/ObsFile.py:185-203)
    b = snap["1990-033-0002"]
    assert b["year"] == 1990
    import datetime

    t = float(b["variables"]["time"]["head"][0])
    assert datetime.datetime.fromtimestamp(
        t, tz=datetime.timezone.utc
    ) == datetime.datetime(1990, 10, 12, 23, 53, tzinfo=datetime.timezone.utc)
