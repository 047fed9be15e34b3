"""Full-registry round-over-round mover check (round-10 verdict item 5).

The 60-query bench headline is the only per-query wall-time record the
driver sees, so a silent slowdown in any of the other ~480 registered
queries would be invisible to BENCH (CORRECTNESS still catches wrong
answers; the plan detector catches shape regressions — this closes the
telemetry gap). This tool diffs two ``tools/driver_sim*.json``
artifacts (which carry per-query ``sec`` for the WHOLE registry) and
flags movers whose normalized ratio exceeds the threshold.

Normalization: the two sweeps may run on different host conditions
(CPU throttle, cache state), so raw ratios are divided by the MEDIAN
ratio over all shared queries — the same role the bench calibration
canary plays, but derived from the sweep itself (a sweep has no
dedicated canary run). A genuine single-query regression moves its own
ratio but barely moves the median of ~500; a host-wide slowdown moves
the median and is divided out.

Usage:
    python tools/sweep_movers.py OLD.json NEW.json [--threshold 1.5]
                                 [--min-sec 0.5] [--json OUT.json]

Exit status 1 if any mover is flagged (so a round closeout can gate on
it). Queries faster than --min-sec in BOTH sweeps are ignored: at
sub-second scale the JVM/GC noise floor dominates and a 1.5x ratio is
not evidence of anything.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def load_secs(path: str) -> tuple[dict[str, float], str]:
    with open(path) as fh:
        doc = json.load(fh)
    results = doc.get("results", doc)
    out = {}
    for name, row in results.items():
        if isinstance(row, dict) and isinstance(row.get("sec"), (int, float)):
            out[name] = float(row["sec"])
    order = doc.get("order", "priority") if isinstance(doc, dict) else "priority"
    return out, order


def movers(
    old: dict[str, float],
    new: dict[str, float],
    threshold: float = 1.5,
    min_sec: float = 0.5,
) -> dict:
    shared = sorted(set(old) & set(new))
    ratios = {n: new[n] / old[n] for n in shared if old[n] > 0}
    if not ratios:
        return {"shared": 0, "median_ratio": None, "movers": {}}
    median = statistics.median(ratios.values())
    flagged = {}
    for n, r in ratios.items():
        if max(old[n], new[n]) < min_sec:
            continue
        norm = r / median if median > 0 else r
        if norm > threshold:
            flagged[n] = {
                "old_sec": old[n],
                "new_sec": new[n],
                "ratio": round(r, 3),
                "normalized": round(norm, 3),
            }
    return {
        "shared": len(shared),
        "only_old": sorted(set(old) - set(new)),
        "only_new": sorted(set(new) - set(old)),
        "median_ratio": round(median, 4),
        "threshold": threshold,
        "min_sec": min_sec,
        "movers": dict(
            sorted(flagged.items(), key=lambda kv: -kv[1]["normalized"])
        ),
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--min-sec", type=float, default=0.5)
    ap.add_argument("--json", dest="out_json", default=None)
    args = ap.parse_args()

    old_secs, old_order = load_secs(args.old)
    new_secs, new_order = load_secs(args.new)
    if old_order != new_order:
        # Position-confounded comparison (the round-11 lesson): a query
        # that ran first-in-session in one sweep and deep-warm in the
        # other can flag 5-20x without any code change. Flags from a
        # mixed-order diff are candidates AT BEST.
        print(
            f"WARNING: sweep orders differ (old={old_order}, "
            f"new={new_order}) — per-query positions are not comparable; "
            "treat every flag as a position artifact until isolated "
            "re-measure"
        )
    rep = movers(
        old_secs,
        new_secs,
        threshold=args.threshold,
        min_sec=args.min_sec,
    )
    rep["order"] = {"old": old_order, "new": new_order}
    if args.out_json:
        with open(args.out_json, "w") as fh:
            json.dump(rep, fh, indent=1, sort_keys=True)
    print(
        f"shared={rep['shared']} median_ratio={rep['median_ratio']} "
        f"flagged={len(rep['movers'])} (>{args.threshold}x normalized, "
        f"min {args.min_sec}s)"
    )
    for name, row in rep["movers"].items():
        print(
            f"  {name}: {row['old_sec']:.2f}s -> {row['new_sec']:.2f}s "
            f"(x{row['ratio']}, normalized x{row['normalized']})"
        )
    return 1 if rep["movers"] else 0


if __name__ == "__main__":
    sys.exit(main())
