"""Capture `.explain("formatted")` for headline queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [sf_dir] [name ...]

Writes plans/<tag>/<query>_<suffix>.txt where suffix comes from
$SPARK_GRAFT_PLAN_SUFFIX (default "before"). Planning only — nothing
executes, so this is safe to run alongside other Spark jobs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = sys.argv[3:]
    suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "before")

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from cioos_siooc_data_transform_spark.plans import all_queries
    from cioos_siooc_data_transform_spark.session import get_spark

    import bench

    spark = get_spark("capture-plans", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    names = only or bench.HEADLINE

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {exc!r}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
