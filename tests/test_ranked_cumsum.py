"""Scale-safe global-ranking operators (operators/windows.py):
equality pins vs the single-window reference for the round-8 surfaces —
grouped/ascending modes of ranked_cumsum_two_pass, the exact
ntile_two_pass formula, and the peaked-distribution-proof
ranked_cumsum_range_shuffle (the bucket form's documented worst case is
one value dominating; the range form must stay exact AND split it)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _peaked(spark, n=5000, hot_frac=0.9):
    """n rows, hot_frac of them sharing ONE value — the distribution
    that defeats value-range bucketing (equal values share a bucket)."""
    n_hot = int(n * hot_frac)
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < n_hot, F.lit(1000))
        .otherwise((F.col("id") * 37 % 911).cast("long"))
        .alias("v"),
        ((F.col("id") * 13) % 97 + 1).cast("long").alias("w"),
    )


def _reference(df, ascending=False, weight_col=None):
    wcol = weight_col or "v"
    order = [
        F.col("v").asc() if ascending else F.col("v").desc(),
        F.col("k").asc(),
    ]
    w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return {
        r.k: (r.rnk, r.cum)
        for r in df.select(
            "k",
            F.row_number().over(w).cast("long").alias("rnk"),
            F.sum(wcol).over(w).cast("long").alias("cum"),
        ).collect()
    }


def test_range_shuffle_exact_on_peaked(spark):
    from cioos_siooc_data_transform_spark.operators.windows import (
        ranked_cumsum_range_shuffle,
    )

    df = _peaked(spark)
    got = {
        r.k: (r.rnk, r.cum)
        for r in ranked_cumsum_range_shuffle(df, "v", "k", num_partitions=16)
        .select("k", "rnk", "cum")
        .collect()
    }
    assert got == _reference(df)


def test_range_shuffle_splits_hot_value(spark):
    """With 90 % of rows on one value and 16 range partitions, no
    partition may hold more than ~2/16 of the rows — the whole point of
    sampling the COMPOSITE key (tie_col splits the hot value)."""
    from cioos_siooc_data_transform_spark.operators.windows import (
        ranked_cumsum_range_shuffle,
    )

    df = _peaked(spark, n=20_000)
    ranked = ranked_cumsum_range_shuffle(df, "v", "k", num_partitions=16)
    sizes = [
        r.n
        for r in ranked.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert max(sizes) <= 20_000 * 3 // 16, sizes


def test_range_shuffle_weighted_ascending(spark):
    from cioos_siooc_data_transform_spark.operators.windows import (
        ranked_cumsum_range_shuffle,
    )

    df = _peaked(spark, n=3000)
    got = {
        r.k: (r.rnk, r.cum)
        for r in ranked_cumsum_range_shuffle(
            df, "v", "k", num_partitions=8, weight_col="w", ascending=True
        )
        .select("k", "rnk", "cum")
        .collect()
    }
    assert got == _reference(df, ascending=True, weight_col="w")


def test_two_pass_grouped_mode(spark):
    """group_cols: per-group rank/cumsum must match a grouped window."""
    from cioos_siooc_data_transform_spark.operators.windows import (
        ranked_cumsum_two_pass,
    )

    df = spark.range(4000).select(
        (F.col("id") % 7).alias("g"),
        F.col("id").alias("k"),
        ((F.col("id") * 31) % 1009).cast("long").alias("v"),
    )
    got = {
        (r.g, r.k): (r.rnk, r.cum)
        for r in ranked_cumsum_two_pass(
            df, "v", "k", n_buckets=16, group_cols=["g"], ascending=True
        )
        .select("g", "k", "rnk", "cum")
        .collect()
    }
    w = Window.partitionBy("g").orderBy(F.col("v").asc(), F.col("k").asc())
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        (r.g, r.k): (r.rnk, r.cum)
        for r in df.select(
            "g",
            "k",
            F.row_number().over(w).cast("long").alias("rnk"),
            F.sum("v").over(wr).cast("long").alias("cum"),
        ).collect()
    }
    assert got == want


def test_ntile_two_pass_matches_builtin(spark):
    """Exact remainder formula == engine ntile for several (N, k),
    including N < k and N % k != 0."""
    from cioos_siooc_data_transform_spark.operators.windows import (
        ntile_two_pass,
    )

    for n, k in [(7, 10), (100, 10), (103, 10), (1000, 7)]:
        df = spark.range(n).select(
            F.col("id").alias("k"),
            ((F.col("id") * 37) % 211).cast("long").alias("v"),
        )
        got = {
            r.k: r.tile
            for r in ntile_two_pass(df, "v", "k", k, n_buckets=8).collect()
        }
        w = Window.orderBy(F.col("v").asc(), F.col("k").asc())
        want = {
            r.k: r.tile
            for r in df.select(
                "k", F.ntile(k).over(w).cast("long").alias("tile")
            ).collect()
        }
        assert got == want, f"N={n}, k={k}"


def test_running_extreme_two_pass_matches_builtin(spark):
    """Exclusive and inclusive running max/min must match the
    single-window reference row-for-row, including the NULL first row
    of the exclusive frame and ties in the ordering value (unique via
    the tie column)."""
    from cioos_siooc_data_transform_spark.operators.windows import (
        running_extreme_two_pass,
    )

    df = spark.range(1000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 37) % 211).cast("long").alias("v"),
        ((F.col("id") * 13) % 97).cast("long").alias("x"),
    )
    for agg in ("max", "min"):
        for inclusive in (False, True):
            got = {
                r.k: r.re
                for r in running_extreme_two_pass(
                    df, "v", "k", "x", out_col="re",
                    n_buckets=8, agg=agg, inclusive=inclusive,
                ).collect()
            }
            ext = F.max if agg == "max" else F.min
            w = Window.orderBy(F.col("v").asc(), F.col("k").asc()).rowsBetween(
                Window.unboundedPreceding, 0 if inclusive else -1
            )
            want = {
                r.k: r.re
                for r in df.select("k", ext("x").over(w).alias("re")).collect()
            }
            assert got == want, f"agg={agg}, inclusive={inclusive}"


def test_two_pass_grouped_weighted_mode(spark):
    """group_cols + weight_col TOGETHER (the grouped midrank substrate
    behind Brunner-Munzel, the per-dimension AUC sweep, and the
    per-language Heaps fit): per-group running WEIGHT sums must match a
    grouped weighted window bit-for-bit, including the doubled-midrank
    identity 2*cum - w + 1 on a distinct-value count table."""
    from cioos_siooc_data_transform_spark.operators.windows import (
        ranked_cumsum_two_pass,
    )

    # A per-(group, value) count table — unique (g, v) pairs, the
    # contract every midrank caller guarantees.
    df = (
        spark.range(3000)
        .select(
            (F.col("id") % 5).alias("g"),
            ((F.col("id") * 17) % 211).cast("long").alias("v"),
        )
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    got = {
        (r.g, r.v): (r.rnk, r.cum)
        for r in ranked_cumsum_two_pass(
            df, "v", "v", n_buckets=16,
            group_cols=["g"], weight_col="w", ascending=True,
        )
        .select("g", "v", "rnk", "cum")
        .collect()
    }
    w = Window.partitionBy("g").orderBy(F.col("v").asc(), F.col("v").asc())
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        (r.g, r.v): (r.rnk, r.cum)
        for r in df.select(
            "g",
            "v",
            F.row_number().over(w).cast("long").alias("rnk"),
            F.sum("w").over(wr).cast("long").alias("cum"),
        ).collect()
    }
    assert got == want
    # Doubled midranks 2*cum - w + 1 are odd/even-consistent integers
    # (the exactness the rank statistics depend on).
    wmap = {(r.g, r.v): r.w for r in df.collect()}
    for key, (_rnk, cum) in got.items():
        r2 = 2 * cum - wmap[key] + 1
        assert r2 >= 1
