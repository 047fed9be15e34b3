"""The GSW ufunc coverage ledger (tools/gsw_ufunc_ledger.py) must stay
truthful: every 'covered'/'baseline' entry names a query that actually
exists (live registry or a staged slate), the table stays at the full
158-ufunc surface, and coverage never regresses below the round-9
level (140 covered+baseline, 4 atlas exclusions)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ledger():
    from tools.gsw_ufunc_ledger import LEDGER, all_known_query_names, counts

    return LEDGER, all_known_query_names(), counts()


def test_ledger_is_complete_and_well_formed():
    ledger, _, _ = _ledger()
    assert len(ledger) == 158
    for ufunc, entry in ledger.items():
        assert entry[0] in ("covered", "baseline", "planned", "out_of_scope"), ufunc
        if entry[0] in ("covered", "baseline"):
            assert entry[1].startswith(("gsw_", "latentheat_")), ufunc
        if entry[0] == "baseline":
            assert len(entry) == 3 and entry[2], f"{ufunc}: baseline needs a why"


def test_every_covered_query_exists():
    ledger, names, _ = _ledger()
    missing = {
        u: e[1]
        for u, e in ledger.items()
        if e[0] in ("covered", "baseline") and e[1] not in names
    }
    assert not missing, f"ledger references unknown queries: {missing}"


def test_coverage_floor():
    _, _, c = _ledger()
    assert c.get("covered", 0) + c.get("baseline", 0) >= 140
    assert c.get("out_of_scope", 0) <= 4
