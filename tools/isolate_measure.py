"""Isolated per-query re-measure with host canaries — the adjudication
step of the sweep-mover protocol (SCALE.md round 11): a sweep_movers.py
flag only becomes a regression after (a) the query's code actually
changed and (b) an ISOLATED re-measure on an idle host reproduces the
ratio. This tool is that re-measure: fresh session, JVM warm-up, both
bench canaries (CPU + shuffle), then each named query several times.

Usage:
    python tools/isolate_measure.py [--runs N] [--sf-dir DIR] NAME ...

Prints one JSON line:
    {"sf_dir": ..., "calibration": s, "shuffle_calibration": s,
     "queries": {name: {"runs_sec": [...], "min_sec": s}}}

Compare min_sec across rounds as (min_sec / calibration) ratios — raw
seconds conflate host speed with plan cost (the round-2/7/9 lesson).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from cioos_siooc_data_transform_spark.plans import all_queries
    from cioos_siooc_data_transform_spark.session import get_spark

    spark = get_spark("isolate-measure")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    missing = [n for n in args.names if n not in queries]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        return 2

    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Same canaries as bench.py (fixed-size, repo-code-free): CPU-bound
    # arithmetic + fixed shuffle. min-of-3 each.
    calib = []
    for _ in range(3):
        t0 = time.time()
        spark.range(1_500_000_000).selectExpr(
            "sum(sin(id * 1e-6) * cos(id * 1e-7)) AS s", "sum(id % 1000) AS m"
        ).collect()
        calib.append(round(time.time() - t0, 3))
    shuf = []
    for _ in range(3):
        t0 = time.time()
        spark.range(30_000_000).selectExpr(
            "id", "id % 1000000 AS k", "CAST(id % 97 AS DOUBLE) AS v"
        ).repartition(64, "k").groupBy("k").agg({"v": "sum", "id": "max"}).selectExpr(
            "sum(`sum(v)`)", "max(`max(id)`)"
        ).collect()
        shuf.append(round(time.time() - t0, 3))

    out_q = {}
    for name in args.names:
        fn = queries[name]
        runs = []
        for _ in range(args.runs):
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        out_q[name] = {"runs_sec": runs, "min_sec": min(runs)}

    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "calibration": min(calib),
                "calibration_runs": calib,
                "shuffle_calibration": min(shuf),
                "shuffle_calibration_runs": shuf,
                "queries": out_q,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
