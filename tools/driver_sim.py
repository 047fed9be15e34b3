"""Driver simulation: run every registered query against its oracle at
sf0.01 with the strict (driver-faithful) harness, in __spark_entry__
priority order. Usage: python tools/driver_sim.py [--alpha] [sf_dir] [name ...]

--alpha runs the sweep in fixed ALPHABETICAL order. Use it for the
committed sf0.1 TIMING artifact: the default fresh-first priority order
changes every round, so per-query sweep seconds are position-confounded
(the round-11 filter_projection adjudication: 6.0 s when run first in a
fresh session, 0.29 s deep in a warm one) and tools/sweep_movers.py
would compare unlike-positioned runs. Correctness sweeps keep the
driver-faithful priority order.

Full sweeps also smoke the driver's FIRST contract call — entry(spark)
at sf0.001 — and record row count + schema as `entry_smoke` in the
artifact."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--alpha"]
    alpha = "--alpha" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    from cioos_siooc_data_transform_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("driver-sim", shuffle_partitions=16)
    from tests.oracle_harness import compare_query

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    entry_smoke = None
    if not only:
        try:
            edf = entrymod.entry(spark)
            entry_smoke = {
                "rows": edf.count(),
                "schema": edf.schema.simpleString()[:400],
            }
        except Exception as exc:  # noqa: BLE001
            entry_smoke = {"error": repr(exc)[:400]}
        print(f"entry_smoke: {entry_smoke}", flush=True)

    results = {}
    n_fail = 0
    items = sorted(qs.items()) if alpha else list(qs.items())
    for name, fn in items:
        if only and name not in only:
            continue
        oracle = oracles.get(name)
        t0 = time.time()
        if oracle is None:
            try:
                n = fn(spark, sf_dir).count()
                ok, msg = True, f"rows-only ({n})"
            except Exception as exc:  # noqa: BLE001
                ok, msg = False, f"error: {exc!r}"
        else:
            try:
                ok, msg = compare_query(spark, sf_dir, fn, oracle)
            except Exception as exc:  # noqa: BLE001
                ok, msg = False, f"error: {exc!r}"
        dt = time.time() - t0
        results[name] = {"ok": ok, "msg": msg[:400], "sec": round(dt, 2)}
        if not ok:
            n_fail += 1
        print(f"{'PASS' if ok else 'FAIL'} {name} ({dt:.1f}s) {'' if ok else msg[:200]}", flush=True)

    out = {
        "sf_dir": sf_dir,
        "n": len(results),
        "n_fail": n_fail,
        "order": "alphabetical" if alpha else "priority",
        "entry_smoke": entry_smoke,
        "results": results,
    }
    # Persist artifacts only for FULL sweeps — a name-filtered run must
    # not clobber the committed full-registry evidence. The SF-suffixed
    # copy lets tri-scale sweep evidence coexist on disk
    # (driver_sim_last.json is whichever full sweep ran last).
    if not only:
        with open("/root/repo/tools/driver_sim_last.json", "w") as f:
            json.dump(out, f, indent=1)
        sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        with open(f"/root/repo/tools/driver_sim_{sf_tag}.json", "w") as f:
            json.dump(out, f, indent=1)
    print(f"\n{len(results) - n_fail}/{len(results)} pass")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
