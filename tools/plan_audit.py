"""Plan-shape audit over every registered query: counts the physical
operators that matter at 100 TB (Exchanges, broadcasts, sort-merge
joins, nested loops, Python crossings, whole-stage-codegen spans) from
each query's EXPLAIN — without executing anything.

Writes tools/plan_stats.json and prints a summary. Usage:

    python tools/plan_audit.py [sf_dir]

This is the measurable form of SCALE.md's shuffle-budget table: the
committed artifact lets a reviewer diff plan regressions round-over-
round (e.g. a new Exchange appearing in a previously 1-shuffle query).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FEATURES = {
    "exchanges": r"\bExchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)",
    "broadcast_exchanges": r"\bBroadcastExchange\b",
    "sort_merge_joins": r"\bSortMergeJoin\b",
    "broadcast_hash_joins": r"\bBroadcastHashJoin\b",
    "nested_loop_joins": r"\bBroadcastNestedLoopJoin\b",
    # global-window signature: every Exchange SinglePartition left in a
    # plan must be bounded-input by construction (<=n_buckets bucket
    # tables, dimension-sized aggregates) — the concentration-family
    # migration (round 8) removed the scan-sized ones
    "single_partition_exchanges": r"\bExchange SinglePartition\b",
    "cartesian": r"\bCartesianProduct\b",
    "window_ops": r"\bWindow\b|\bRunningWindowFunction\b",
    "python_ops": r"\bMapInPandas\b|\bFlatMapGroupsInPandas\b|\bArrowEvalPython\b|\bBatchEvalPython\b|\bPythonUDTF\b",
    "codegen_spans": r"\*\(\d+\)",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from cioos_siooc_data_transform_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("plan-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    stats: dict[str, dict[str, int]] = {}
    errors: dict[str, str] = {}
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            errors[name] = repr(exc)[:200]
            continue
        row = {}
        for feat, pat in FEATURES.items():
            if feat == "codegen_spans":
                row[feat] = len(set(re.findall(pat, plan)))
            else:
                row[feat] = len(re.findall(pat, plan))
        stats[name] = row

    totals = {
        feat: sum(r[feat] for r in stats.values()) for feat in FEATURES
    }
    out = {
        "sf_dir": sf_dir,
        "n_queries": len(stats),
        "totals": totals,
        "errors": errors,
        "queries": stats,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plan_stats.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)

    worst = sorted(stats.items(), key=lambda kv: -kv[1]["exchanges"])[:10]
    print(f"{len(stats)} queries audited ({len(errors)} errors) -> {path}")
    print("totals:", json.dumps(totals))
    print("most shuffles:")
    for name, r in worst:
        print(f"  {name:40s} exchanges={r['exchanges']} smj={r['sort_merge_joins']} "
              f"bhj={r['broadcast_hash_joins']} py={r['python_ops']}")
    cart = [n for n, r in stats.items() if r["cartesian"]]
    print("cartesian products:", cart or "none")
    return 0


if __name__ == "__main__":
    sys.exit(main())
