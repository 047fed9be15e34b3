"""Round-14 experiment: dedup_fingerprint_winnowing per-window work.

The query is all map-side since round 13; its remaining cost is the
interpreted higher-order-function arithmetic: for each window start j,
fp(j) evaluates slice(h, j, w) THREE times (array_min, reverse+
position, and the min again) — Spark has no let-binding inside lambda
expressions, and HOFs are interpreted, so nothing eliminates the
repeats. Variant: stage the slice (and then the min) through nested
transforms so each is materialized once per window:

    seq -> struct(j, sl)            (slice once)
        -> struct(j, sl, mn)        (min once)
        -> fp struct                (reverse+position pass)

Same values by construction — the final expression computes the same
rightmost-minimum rule from the same slice.

Usage: python tools/exp_r14_winnowing_letbind.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.operators.dedup import (
    word_shingles,
    words_expr,
)
from cioos_siooc_data_transform_spark.session import get_spark, read_table as _t
from tools.ab_measure import ab

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def _staged(spark, sf_dir, w):
    docs = _t(spark, sf_dir, "documents")
    sh = word_shingles(words_expr(F.col("text")), 3)
    h = F.transform(
        sh, lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    )
    return docs.select("doc_id", h.alias("h")).filter(F.size("h") >= w)


def letbound(spark, sf_dir):
    from cioos_siooc_data_transform_spark.plans.staged_r5 import _WIN_W as w

    staged = _staged(spark, sf_dir, w)
    sliced = F.transform(
        F.sequence(F.lit(1), F.size("h") - w + 1),
        lambda j: F.struct(j.alias("j"), F.slice(F.col("h"), j, w).alias("sl")),
    )
    with_min = F.transform(
        sliced,
        lambda t: F.struct(
            t["j"].alias("j"),
            t["sl"].alias("sl"),
            F.array_min(t["sl"]).alias("mn"),
        ),
    )
    fps = F.transform(
        with_min,
        lambda t: F.struct(
            (
                t["j"] - 1 + (w + 1 - F.array_position(F.reverse(t["sl"]), t["mn"]))
            )
            .cast("long")
            .alias("fp_pos"),
            t["mn"].alias("fp_hash"),
        ),
    )
    return (
        staged.select("doc_id", F.explode(F.array_distinct(fps)).alias("u"))
        .select(
            "doc_id",
            F.col("u.fp_pos").alias("fp_pos"),
            F.col("u.fp_hash").alias("fp_hash"),
        )
    )


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("exp-r14-winnow", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    from cioos_siooc_data_transform_spark.plans import all_queries

    q = all_queries()
    cur = q["dedup_fingerprint_winnowing"](spark, SF)
    new = letbound(spark, SF)
    d1 = cur.exceptAll(new).count()
    d2 = new.exceptAll(cur).count()
    print(f"winnowing exceptAll cur-new={d1} new-cur={d2}", flush=True)
    assert d1 == 0 and d2 == 0, "fingerprint sets differ!"

    spark.sparkContext.setJobDescription("ab: winnowing let-bind")
    ab(
        {
            "current": lambda: q["dedup_fingerprint_winnowing"](spark, SF),
            "letbound": lambda: letbound(spark, SF),
        },
        runs=RUNS,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
