"""Driver simulation: run every registered query against its oracle at
sf0.01 with the strict (driver-faithful) harness, in __spark_entry__
priority order. Usage: python tools/driver_sim.py [sf_dir] [name ...]"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    from cioos_siooc_data_transform_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("driver-sim", shuffle_partitions=16)
    from tests.oracle_harness import compare_query

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    results = {}
    n_fail = 0
    for name, fn in qs.items():
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
