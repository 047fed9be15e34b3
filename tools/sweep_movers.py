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


def load_classes(plan_stats_path: str) -> dict[str, str]:
    """Per-query canary class from the committed plan-shape audit
    (round-12 verdict "What's wrong #1": mover adjudication should name
    which canary class each flag belongs to, because CPU throttle and
    shuffle/IO pressure move different query populations).

    shuffle-bound = the plan has >=2 REAL shuffles (Exchange minus
    BroadcastExchange — broadcasts are collect+rebroadcast, not a
    hash-partition round-trip); everything else (scan + broadcast-join
    + codegen arithmetic) is arith-bound. The class median ratio then
    plays the role the matching bench canary plays in BENCH
    adjudications — derived from the sweep itself, per class.
    """
    with open(plan_stats_path) as fh:
        doc = json.load(fh)
    classes = {}
    for name, feats in doc.get("queries", {}).items():
        real_shuffles = feats.get("exchanges", 0) - feats.get(
            "broadcast_exchanges", 0
        )
        classes[name] = "shuffle" if real_shuffles >= 2 else "arith"
    return classes


def movers(
    old: dict[str, float],
    new: dict[str, float],
    threshold: float = 1.5,
    min_sec: float = 0.5,
    classes: dict[str, str] | None = None,
) -> dict:
    shared = sorted(set(old) & set(new))
    ratios = {n: new[n] / old[n] for n in shared if old[n] > 0}
    if not ratios:
        return {"shared": 0, "median_ratio": None, "movers": {}}
    median = statistics.median(ratios.values())
    class_medians: dict[str, float] = {}
    if classes:
        by_class: dict[str, list[float]] = {}
        for n, r in ratios.items():
            by_class.setdefault(classes.get(n, "arith"), []).append(r)
        class_medians = {
            c: round(statistics.median(rs), 4) for c, rs in by_class.items()
        }
    flagged = {}
    for n, r in ratios.items():
        if max(old[n], new[n]) < min_sec:
            continue
        # Normalize by the MATCHING canary: the query's own class median
        # when a classification is supplied, the global median otherwise.
        cls = classes.get(n, "arith") if classes else None
        denom = class_medians.get(cls, median) if classes else median
        norm = r / denom if denom > 0 else r
        if norm > threshold:
            flagged[n] = {
                "old_sec": old[n],
                "new_sec": new[n],
                "ratio": round(r, 3),
                "normalized": round(norm, 3),
            }
            if cls is not None:
                flagged[n]["canary_class"] = cls
                flagged[n]["class_median_ratio"] = class_medians.get(cls)
    return {
        "shared": len(shared),
        "only_old": sorted(set(old) - set(new)),
        "only_new": sorted(set(new) - set(old)),
        "median_ratio": round(median, 4),
        "class_median_ratios": class_medians or None,
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
    ap.add_argument(
        "--plan-stats",
        default=None,
        help="tools/plan_stats.json path; enables per-class (arith vs "
        "shuffle) canary normalization of flags",
    )
    args = ap.parse_args()

    old_secs, old_order = load_secs(args.old)
    new_secs, new_order = load_secs(args.new)
    classes = load_classes(args.plan_stats) if args.plan_stats else None
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
        classes=classes,
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
    if rep.get("class_median_ratios"):
        print(f"class median ratios: {rep['class_median_ratios']}")
    for name, row in rep["movers"].items():
        cls = row.get("canary_class")
        tag = f", {cls}-bound" if cls else ""
        print(
            f"  {name}: {row['old_sec']:.2f}s -> {row['new_sec']:.2f}s "
            f"(x{row['ratio']}, normalized x{row['normalized']}{tag})"
        )
    return 1 if rep["movers"] else 0


if __name__ == "__main__":
    sys.exit(main())
