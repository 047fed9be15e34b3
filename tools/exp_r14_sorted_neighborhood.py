"""Round-14 experiment: dedup_sorted_neighborhood decomposition + the
rank-shift equi-join rewrite (VERDICT item 5).

Decomposition: the query has three candidate cost centers —
(1) the blocked rank window, (2) the rank-neighbor candidate join
(currently an equi-join on `blk` ALONE with the distance-1-2 filter
applied post-join: every block of size n generates n^2 join rows
before the filter), (3) the shingle inverted-index confirm join.

Rewrite under test (guide §3 — avoid exploding joins): make the rank
part of the JOIN KEY. The b side explodes d in (1, 2) and joins on
(blk, rb - d) == (blk, ra), producing exactly the distance-1-2 pairs
with no quadratic intermediate. Equivalence: for a pair (a, b) in one
block with rb - ra = d in {1, 2}, the old join emits it once with
dist = d; the new join matches it exactly at that d; no other rows
are possible.

Usage: python tools/exp_r14_sorted_neighborhood.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.session import get_spark, read_table as _t
from tools.ab_measure import ab

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def _rank(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    blk = F.substring(F.col("text"), 1, 2)
    key = F.substring(F.col("text"), 1, 24)
    return docs.select(
        "doc_id",
        blk.alias("blk"),
        F.row_number()
        .over(Window.partitionBy(blk).orderBy(key, "doc_id"))
        .cast("long")
        .alias("rnk"),
    )


def cand_old(spark, sf_dir):
    r = _rank(spark, sf_dir)
    ra = r.select(F.col("doc_id").alias("doc_a"), "blk", F.col("rnk").alias("ra"))
    rb = r.select(
        F.col("doc_id").alias("doc_b"),
        F.col("blk").alias("blkb"),
        F.col("rnk").alias("rb"),
    )
    return ra.join(
        rb,
        (F.col("blk") == F.col("blkb"))
        & (F.col("rb") - F.col("ra")).isin(1, 2),
    ).select("doc_a", "doc_b", (F.col("rb") - F.col("ra")).alias("dist"))


def cand_new(spark, sf_dir):
    r = _rank(spark, sf_dir)
    ra = r.select(F.col("doc_id").alias("doc_a"), "blk", F.col("rnk").alias("ra"))
    rb = r.select(
        F.col("doc_id").alias("doc_b"),
        F.col("blk").alias("blkb"),
        F.col("rnk").alias("rb"),
    ).select(
        "doc_b",
        "blkb",
        "rb",
        F.explode(F.array(F.lit(1).cast("long"), F.lit(2).cast("long"))).alias(
            "d"
        ),
    )
    return ra.join(
        rb,
        (F.col("blk") == F.col("blkb")) & (F.col("ra") == F.col("rb") - F.col("d")),
    ).select("doc_a", "doc_b", F.col("d").alias("dist"))


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("exp-r14-snm", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    old = cand_old(spark, SF)
    new = cand_new(spark, SF)
    d1 = old.exceptAll(new).count()
    d2 = new.exceptAll(old).count()
    print(f"cand exceptAll old-new={d1} new-old={d2}", flush=True)
    assert d1 == 0 and d2 == 0, "candidate sets differ!"

    from cioos_siooc_data_transform_spark.plans import all_queries

    q = all_queries()
    spark.sparkContext.setJobDescription("decomp: sorted_neighborhood")
    ab(
        {
            "rank_only": lambda: _rank(spark, SF),
            "cand_old": lambda: cand_old(spark, SF),
            "cand_new": lambda: cand_new(spark, SF),
            "full_query": lambda: q["dedup_sorted_neighborhood"](spark, SF),
        },
        runs=RUNS,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
