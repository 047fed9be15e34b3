"""Round-14 experiment: dedup_ngram_jaccard decomposition.

The static plan builds the guarded-shingle subtree (scan -> explode ->
distinct -> df-guard Window on s) FOUR times (self-join sides a/b +
sizes sa/sb). The distinct Exchange is a deliberate runtime-reuse
anchor (see _distinct_shingles), but everything ABOVE it — the
Exchange(s) + Sort + Window hot-shingle guard — still re-executes per
consumer. Variants:

- shingles_only: the shared distinct-shingle derivation alone,
- guarded_only: + the df<=cap window guard,
- full_current: the registered query as-is,
- full_ckpt: guard computed once into a lazy localCheckpoint, then
  sizes + the inverted-index self-join reuse the materialized rows
  (the graph_triangle_count idiom).

Usage: python tools/exp_r14_ngram.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.session import checkpoint_df, get_spark
from tools.ab_measure import ab

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
_CAP = 10  # _MAX_SHINGLE_DF of the registered query


def _shingles(spark, sf_dir):
    from cioos_siooc_data_transform_spark.plans.dedup_queries import (
        _distinct_shingles,
    )

    return _distinct_shingles(spark, sf_dir)


def _guarded(spark, sf_dir):
    sh = _shingles(spark, sf_dir)
    w_df = Window.partitionBy("s")
    return (
        sh.withColumn("_df", F.count(F.lit(1)).over(w_df))
        .filter(F.col("_df") <= _CAP)
        .drop("_df")
    )


def _pairs_from(guarded):
    sizes = guarded.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = guarded.select(F.col("doc_id").alias("doc_a"), "s")
    b = guarded.select(F.col("doc_id").alias("doc_b"), "s")
    common = (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
    )
    return jac.filter(F.col("jaccard") >= 0.5).select("doc_a", "doc_b", "jaccard")


def full_ckpt(spark, sf_dir):
    return _pairs_from(checkpoint_df(_guarded(spark, sf_dir), eager=False))


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("exp-r14-ngram", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    from cioos_siooc_data_transform_spark.plans import all_queries

    q = all_queries()
    cur = q["dedup_ngram_jaccard"](spark, SF)
    new = full_ckpt(spark, SF)
    d1 = cur.exceptAll(new).count()
    d2 = new.exceptAll(cur).count()
    print(f"pairs exceptAll cur-new={d1} new-cur={d2}", flush=True)
    assert d1 == 0 and d2 == 0, "pair sets differ!"

    n_sh = _shingles(spark, SF).count()
    n_guard = _guarded(spark, SF).count()
    print(f"shingle rows={n_sh} guarded rows={n_guard}", flush=True)

    spark.sparkContext.setJobDescription("decomp: ngram_jaccard")
    ab(
        {
            "shingles_only": lambda: _shingles(spark, SF),
            "guarded_only": lambda: _guarded(spark, SF),
            "full_current": lambda: q["dedup_ngram_jaccard"](spark, SF),
            "full_ckpt": lambda: full_ckpt(spark, SF),
        },
        runs=RUNS,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
