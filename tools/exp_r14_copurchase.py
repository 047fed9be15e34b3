"""Round-14 experiment: co-purchase edge derivation rewrite.

Decomposition (VERDICT item 3): how much of graph_triangle_count /
graph_pagerank_iterations is the support>=2 edge DERIVATION
(distinct + self-join + pair groupBy) vs the downstream consumers?
Then A/B the derivation against the collect_set pair-generation form
(one shuffle assembles per-order part sets; pairs explode in-array;
one combiner-friendly hash agg on the pair key — guide §2.4).

Usage: python tools/exp_r14_copurchase.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.session import get_spark, read_table as _t
from tools.ab_measure import ab

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def edges_old(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = items.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    return (
        a.join(b, "k")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
        .select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    )


def edges_new(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    arrs = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col("ps"),
                lambda x, i: F.transform(
                    F.slice(F.col("ps"), i + F.lit(2), F.size(F.col("ps"))),
                    lambda y: F.struct(x.alias("pa"), y.alias("pb")),
                ),
            )
        )
    )
    return (
        arrs.select(pair.alias("p"))
        .select("p.pa", "p.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
        .select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    )


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("exp-r14-copurchase", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # Equivalence first: exceptAll both ways must be empty.
    old = edges_old(spark, SF)
    new = edges_new(spark, SF)
    d1 = old.exceptAll(new).count()
    d2 = new.exceptAll(old).count()
    print(f"exceptAll old-new={d1} new-old={d2}", flush=True)
    assert d1 == 0 and d2 == 0, "derivations differ!"

    spark.sparkContext.setJobDescription("ab: copurchase edge derivation")
    ab(
        {
            "edges_old": lambda: edges_old(spark, SF),
            "edges_new": lambda: edges_new(spark, SF),
        },
        runs=RUNS,
    )

    # Decomposition: full triangle count vs its edge derivation alone.
    from cioos_siooc_data_transform_spark.plans import all_queries

    q = all_queries()
    spark.sparkContext.setJobDescription("ab: triangle full vs edges")
    ab(
        {
            "triangle_full": lambda: q["graph_triangle_count"](spark, SF),
            "pagerank_full": lambda: q["graph_pagerank_iterations"](spark, SF),
        },
        runs=max(2, RUNS - 2),
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
