"""Round-14 experiment: is the md5 digest subtree shared across the
four min-aggs that slice it (VERDICT item 7)?

minhash_signature(hash_family='md5') plans 8 aggregate expressions
min(substring(md5(concat(s, '#idx')), off, 8)) where idx = (k-1)//4 —
so 8 functions reference only ceil(8/4) = 2 digests. The ceil(k/4)
claim is about EXPRESSION COUNT; this experiment checks the PHYSICAL
plan: does HashAggregate codegen evaluate md5(concat(s, '#0')) once
per input row (subexpression elimination across aggregate update
expressions) or four times (once per min)?

Two probes:
1. codegen text of the signature aggregate — count md5 call sites in
   the generated update function;
2. interleaved A/B: the current inline form vs a variant that
   pre-projects the two digest columns before the aggregate, at the
   dedup_cross_snapshot shingle shape at sf0.1.

Usage: python tools/exp_r14_md5digest.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.session import get_spark
from tools.ab_measure import ab

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def _shingles(spark, sf_dir):
    from cioos_siooc_data_transform_spark.plans.dedup_queries import (
        _distinct_shingles,
    )

    return _distinct_shingles(spark, sf_dir)


def sig_inline(spark, sf_dir):
    from cioos_siooc_data_transform_spark.operators.dedup import (
        minhash_signature,
    )

    return minhash_signature(
        _shingles(spark, sf_dir), "doc_id", "s", num_hashes=8, hash_family="md5"
    )


def sig_projected(spark, sf_dir):
    sh = _shingles(spark, sf_dir)
    proj = sh.select(
        "doc_id",
        F.md5(F.concat(F.col("s"), F.lit("#0"))).alias("_d0"),
        F.md5(F.concat(F.col("s"), F.lit("#1"))).alias("_d1"),
    )
    aggs = []
    for k in range(1, 9):
        d = f"_d{(k - 1) // 4}"
        off = ((k - 1) % 4) * 8 + 1
        aggs.append(F.min(F.substring(F.col(d), off, 8)).alias(f"h{k}"))
    return proj.groupBy("doc_id").agg(*aggs)


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("exp-r14-md5", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    inline = sig_inline(spark, SF)
    proj = sig_projected(spark, SF)
    d1 = inline.exceptAll(proj).count()
    d2 = proj.exceptAll(inline).count()
    print(f"sig exceptAll inline-proj={d1} proj-inline={d2}", flush=True)
    assert d1 == 0 and d2 == 0, "signatures differ!"

    # Probe 1: generated code of the inline aggregate. Subexpression
    # elimination across the agg update expressions shows up as shared
    # md5 locals; 8 independent evaluations show up as 8 call sites.
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "codegen"
    )
    code = inline._jdf.queryExecution().explainString(mode)
    n_md5 = len(re.findall(r"MessageDigest|md5", code, flags=re.IGNORECASE))
    print(f"inline codegen md5 references: {n_md5}", flush=True)

    spark.sparkContext.setJobDescription("ab: md5 digest sharing")
    ab(
        {
            "sig_inline": lambda: sig_inline(spark, SF),
            "sig_projected": lambda: sig_projected(spark, SF),
        },
        runs=RUNS,
    )

    from cioos_siooc_data_transform_spark.plans import all_queries

    q = all_queries()
    spark.sparkContext.setJobDescription("decomp: cross_snapshot/bbit")
    ab(
        {
            "cross_snapshot_full": lambda: q["dedup_cross_snapshot"](spark, SF),
            "sig_only": lambda: sig_inline(spark, SF),
            "bbit_full": lambda: q["dedup_bbit_minhash"](spark, SF),
        },
        runs=max(2, RUNS - 2),
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
