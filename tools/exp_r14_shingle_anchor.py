"""Round-14 experiment: the shared `_distinct_shingles` reuse anchor.

The helper's trailing global `.distinct()` is semantically a NO-OP —
rows are unique by construction (array_distinct dedups within the doc,
and doc_id is part of the row) — kept only because its Exchange is the
runtime-reuse anchor for every downstream consumer (sig agg + join
sides + sizes). Variants under test, same rows by construction:

- cur:    explode + distinct            (Exchange(doc_id,s) + 2 no-op
                                         HashAggregates; consumers each
                                         re-shuffle by doc_id or s)
- repart: explode + repartition(doc_id) (Exchange(doc_id) only — still
                                         a reuse anchor, no aggregate
                                         work, AND satisfies every
                                         downstream groupBy(doc_id)
                                         distribution so sig/sizes/
                                         collect_set plan shuffle-free)
- ckpt:   explode + lazy localCheckpoint (materialize once, no anchor
                                         Exchange at all; consumers
                                         re-shuffle from the
                                         checkpointed rows)

Guide §2.4 (remove shuffles outright / share one exchange keyed the
way consumers need it).

Usage: python tools/exp_r14_shingle_anchor.py [sf_dir] [runs]
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
from cioos_siooc_data_transform_spark.session import (
    checkpoint_df,
    get_spark,
    read_table as _t,
)
from tools.ab_measure import ab

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 5

QUERIES = [
    "dedup_ngram_jaccard",
    "dedup_bbit_minhash",
    "dedup_cross_snapshot",
    "dedup_sorted_neighborhood",
    "dedup_pipeline_pairs_xxhash",
]


def _exploded(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(words_expr(F.col("text")), 3))
        ).alias("s"),
    )


def sh_repart(spark, sf_dir):
    return _exploded(spark, sf_dir).repartition("doc_id")


def sh_ckpt(spark, sf_dir):
    return checkpoint_df(_exploded(spark, sf_dir), eager=False)


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("exp-r14-anchor", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    from cioos_siooc_data_transform_spark.plans import all_queries, dedup_queries

    orig = dedup_queries._distinct_shingles
    q = all_queries()

    def patched(fn):
        def build(name):
            dedup_queries._distinct_shingles = fn
            dedup_queries.distinct_shingles = fn
            try:
                return q[name](spark, SF)
            finally:
                dedup_queries._distinct_shingles = orig
                dedup_queries.distinct_shingles = orig

        return build

    build_cur = patched(orig)
    build_rep = patched(sh_repart)
    build_ck = patched(sh_ckpt)

    # Equivalence: exceptAll both ways per query per variant.
    for name in QUERIES:
        cur = build_cur(name)
        for label, b in (("repart", build_rep), ("ckpt", build_ck)):
            var = b(name)
            d1 = cur.exceptAll(var).count()
            d2 = var.exceptAll(cur).count()
            print(f"{name} {label}: exceptAll {d1}/{d2}", flush=True)
            assert d1 == 0 and d2 == 0, f"{name} {label} differs!"

    for name in QUERIES:
        spark.sparkContext.setJobDescription(f"anchor ab: {name}")
        ab(
            {
                f"{name}__cur": lambda n=name: build_cur(n),
                f"{name}__repart": lambda n=name: build_rep(n),
                f"{name}__ckpt": lambda n=name: build_ck(n),
            },
            runs=RUNS,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
