"""Round-14 decomposition: part_abc_xyz_matrix (VERDICT item 5).

Stage-level breakdown: the (part, month) rollup `pm`, the per-part
second-level aggregate, and the full query (two-pass ranked cumshare +
broadcast grand total + class matrix). If pm ~ full, the query is at
its scan+rollup floor and the earlier "the rollup is the ~1 s floor"
note gets its numbers; otherwise the dominant stage gets attacked.

Usage: python tools/exp_r14_abc_xyz.py [sf_dir] [runs]
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


def pm_only(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("pk"),
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("month_id"),
    ).agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
        F.sum(F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long"))
        .cast("long")
        .alias("cents"),
    )


def per_part_only(spark, sf_dir):
    return pm_only(spark, sf_dir).groupBy("pk").agg(
        F.sum("cents").cast("long").alias("total_cents"),
        F.count(F.lit(1)).cast("long").alias("n_months"),
        F.sum(F.col("qty").cast("decimal(38,0)")).alias("sq"),
        F.sum(
            F.col("qty").cast("decimal(19,0)") * F.col("qty").cast("decimal(19,0)")
        ).alias("sqq"),
    )


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("exp-r14-abc", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    from cioos_siooc_data_transform_spark.plans import all_queries

    q = all_queries()
    spark.sparkContext.setJobDescription("decomp: part_abc_xyz_matrix")
    ab(
        {
            "pm_only": lambda: pm_only(spark, SF),
            "per_part_only": lambda: per_part_only(spark, SF),
            "full_query": lambda: q["part_abc_xyz_matrix"](spark, SF),
        },
        runs=RUNS,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
