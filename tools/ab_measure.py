"""Interleaved A/B measurement of query-plan variants (one session).

Each variant is a zero-arg callable returning a DataFrame; runs are
interleaved A,B,A,B,... so host drift hits both arms equally, and each
run executes into the noop sink. Reports per-variant min/median.

Not a CLI — import from experiment scripts:

    from tools.ab_measure import ab
    ab({"old": lambda: q_old(spark, SF), "new": lambda: q_new(spark, SF)}, runs=5)
"""

from __future__ import annotations

import statistics
import time


def ab(variants: dict, runs: int = 5, warmup: int = 1) -> dict:
    results = {k: [] for k in variants}
    for k, fn in variants.items():
        for _ in range(warmup):
            fn().write.format("noop").mode("overwrite").save()
    for _ in range(runs):
        for k, fn in variants.items():
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            results[k].append(round(time.time() - t0, 3))
    out = {}
    for k, ts in results.items():
        out[k] = {
            "runs": ts,
            "min": min(ts),
            "median": round(statistics.median(ts), 3),
        }
        print(f"{k}: min={out[k]['min']} median={out[k]['median']} runs={ts}", flush=True)
    return out
