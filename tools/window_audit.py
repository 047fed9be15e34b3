"""Unpartitioned-window detector over every registered query plan.

Thin runner around cioos_siooc_data_transform_spark.plan_guards (the
test-shared implementation — tests/test_plans.py fails any registered
query with a non-allowlisted unpartitioned window). Usage:

    python tools/window_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cioos_siooc_data_transform_spark.plan_guards import (  # noqa: E402
    find_unpartitioned_windows,
    is_operator_internal,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from cioos_siooc_data_transform_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("window-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    hits: dict[str, list[tuple[str, str]]] = {}
    errors: dict[str, str] = {}
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            errors[name] = repr(exc)[:160]
            continue
        found = [
            (w, sig)
            for (w, sig) in find_unpartitioned_windows(plan)
            if not is_operator_internal(sig)
        ]
        if found:
            hits[name] = found
    print(f"{len(hits)} queries with non-operator-internal unpartitioned windows"
          f" ({len(errors)} errors)")
    for name, found in sorted(hits.items()):
        for w, sig in found:
            print(f"  {name}: {sig}")
    for name, err in errors.items():
        print(f"  ERROR {name}: {err}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
