"""STAGED round-18 queries — NOT registered (round-18 runway seed,
started in round 10; topped up in later rounds before activation).

Same contract as staged_r5..r17: LOCAL registry, strict-harness pytest
coverage in tests/test_staged_r18.py, idempotent ``activate()``.
Activation order: staged_r11 (round 11) -> ... -> staged_r17 (round
17) -> this module (round 18). Budget: <= 50 fresh names at
activation.

Content so far (partial seed):

- Wave A — data-contract / key-space audits: dbt-style column
  contract violations, key-vs-date rank correlation (two-pass ranks on
  both sides), priority mix by value decile.
- Wave B — behavioral: session depth curve, first-session conversion,
  top-percentile user concentration.
- Wave C — classical statistics: Anderson–Darling exponentiality of
  inter-order gaps (rank-paired order statistics on the two-pass
  operator), bimodality coefficient, the Fisher price index
  (completing the Laspeyres family with its Paasche dual).
- Wave D — LLM-pipeline: perplexity-outlier contamination flags,
  modality mix from payload magic bytes, LSH candidate-budget
  forecast by bucket-cap config.

Scale notes: every global ordering rides the two-pass range-bucket
operators; session/user windows are key-partitioned; candidate
forecasts come from bucket-size histograms (never the pair join
itself).
"""

from __future__ import annotations

import math
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.session import read_table as _t

STAGED_QUERIES: dict[str, Callable[..., Any]] = {}
STAGED_ORACLES: dict[str, str] = {}


def activate() -> int:
    """Round-18 activation (idempotent)."""
    from cioos_siooc_data_transform_spark.plans.registry import ORACLES, QUERIES

    n = 0
    for name, fn in STAGED_QUERIES.items():
        if name not in QUERIES:
            QUERIES[name] = fn
            ORACLES[name] = STAGED_ORACLES[name]
            n += 1
    return n


def _register(name: str, oracle: str):
    def deco(fn: Callable[..., Any]) -> Callable[..., Any]:
        STAGED_QUERIES[name] = fn
        STAGED_ORACLES[name] = oracle
        return fn

    return deco


# ===========================================================================
# Wave A — data-contract / key-space audits.
# ===========================================================================

# ---------------------------------------------------------------------------
# Column contract audit (the dbt-tests shape): per declared rule, the
# violation count over lineitem — the single most-run query class in a
# production warehouse. Rules are literals; one scan, conditional sums.
# ---------------------------------------------------------------------------
_CONTRACT_SQL = """
    WITH checks AS (
      SELECT
        CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                 THEN 1 ELSE 0 END) AS BIGINT) AS qty_range,
        CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.10 + 1e-9
                 THEN 1 ELSE 0 END) AS BIGINT) AS discount_range,
        CAST(sum(CASE WHEN l_tax < 0.0 OR l_tax > 0.08 + 1e-9
                 THEN 1 ELSE 0 END) AS BIGINT) AS tax_range,
        CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS price_positive,
        CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                 THEN 1 ELSE 0 END) AS BIGINT) AS returnflag_domain,
        CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1994-01-01'
                       OR l_shipdate >= TIMESTAMP '2003-01-01'
                 THEN 1 ELSE 0 END) AS BIGINT) AS shipdate_window,
        CAST(count(*) AS BIGINT) AS n_rows
      FROM lineitem
    )
    SELECT rule, violations, n_rows
    FROM checks
    UNPIVOT (violations FOR rule IN (
      qty_range, discount_range, tax_range, price_positive,
      returnflag_domain, shipdate_window))
    ORDER BY rule
"""


@_register("lineitem_contract_violation_audit", oracle=_CONTRACT_SQL)
def lineitem_contract_violation_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Six declared column contracts checked in ONE scan (conditional
    sums), emitted one row per rule — the dbt-style DQ gate."""
    li = _t(spark, sf_dir, "lineitem")
    checks = li.agg(
        F.sum(
            F.when(
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("qty_range"),
        F.sum(
            F.when(
                (F.col("l_discount") < 0.0)
                | (F.col("l_discount") > 0.10 + 1e-9),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("discount_range"),
        F.sum(
            F.when(
                (F.col("l_tax") < 0.0) | (F.col("l_tax") > 0.08 + 1e-9), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("tax_range"),
        F.sum(F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("price_positive"),
        F.sum(
            F.when(~F.col("l_returnflag").isin("A", "N", "R"), 1).otherwise(0)
        )
        .cast("long")
        .alias("returnflag_domain"),
        F.sum(
            F.when(
                (F.col("l_shipdate") < F.lit("1994-01-01").cast("timestamp"))
                | (
                    F.col("l_shipdate")
                    >= F.lit("2003-01-01").cast("timestamp")
                ),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("shipdate_window"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    rules = [
        "qty_range", "discount_range", "tax_range", "price_positive",
        "returnflag_domain", "shipdate_window",
    ]
    out = checks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("rule"), F.col(r).alias("violations")
                    )
                    for r in rules
                ]
            )
        ).alias("c"),
        "n_rows",
    ).select(
        F.col("c.rule").alias("rule"),
        F.col("c.violations").alias("violations"),
        "n_rows",
    )
    return out.orderBy("rule")


# ---------------------------------------------------------------------------
# Key-vs-date rank correlation: TPC-H order keys are roughly
# time-ordered — a broken backfill destroys that. Spearman over TWO
# two-pass rankings joined on the key (integer-exact d² sums).
# ---------------------------------------------------------------------------
_KEYDATE_SQL = """
    WITH o AS (
      SELECT o_orderkey AS k,
             CAST(floor(epoch(o_orderdate)) AS BIGINT) AS d
      FROM orders
    ),
    rk AS (
      SELECT k, CAST(row_number() OVER (ORDER BY k ASC) AS BIGINT) AS r_key
      FROM o
    ),
    rd AS (
      SELECT k, CAST(row_number() OVER (ORDER BY d ASC, k ASC) AS BIGINT)
               AS r_date
      FROM o
    ),
    j AS (
      SELECT rk.r_key, rd.r_date FROM rk JOIN rd ON rk.k = rd.k
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(r_key - r_date AS HUGEINT)
                      * (r_key - r_date)) AS HUGEINT) AS d2
      FROM j
    )
    SELECT n AS n_orders,
           floor((1.0 - 6.0 * CAST(d2 AS DOUBLE)
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * n - 1.0)))
                 * 1.0e6 + 0.5) / 1.0e6 AS key_date_spearman
    FROM s
"""


@_register("orders_key_date_rank_corr", oracle=_KEYDATE_SQL)
def orders_key_date_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman ρ between key rank and date rank: BOTH rankings from
    ranked_cumsum_two_pass (key spaces scale with |orders|), one
    key-keyed join, exact integer d² sum."""
    from cioos_siooc_data_transform_spark.operators.windows import (
        ranked_cumsum_two_pass,
    )

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.floor(F.unix_timestamp(F.col("o_orderdate"))).cast("long").alias("d"),
    )
    rk = ranked_cumsum_two_pass(
        o.select("k"), "k", "k", ascending=True, out_rank="r_key",
        out_cum="__c1",
    ).select("k", F.col("r_key").cast("long").alias("r_key"))
    rd = ranked_cumsum_two_pass(
        o, "d", "k", ascending=True, out_rank="r_date", out_cum="__c2"
    ).select("k", F.col("r_date").cast("long").alias("r_date"))
    j = rk.join(rd, "k")
    dec = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    s = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            dec(F.col("r_key") - F.col("r_date"))
            * dec(F.col("r_key") - F.col("r_date"))
        )
        .cast("decimal(38,0)")
        .alias("d2"),
    )
    nd = F.col("n").cast("double")
    return s.select(
        F.col("n").alias("n_orders"),
        (
            F.floor(
                (
                    1.0
                    - 6.0
                    * F.col("d2").cast("double")
                    / (nd * (nd * nd - 1.0))
                )
                * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("key_date_spearman"),
    )


# ---------------------------------------------------------------------------
# Priority mix by value decile: order-priority composition across
# exact totalprice deciles — the cross of two bounded alphabets after
# a two-pass ntile.
# ---------------------------------------------------------------------------
_PRIOMIX_SQL = """
    WITH rows_ AS (
      SELECT o_orderkey AS k, o_orderpriority AS prio,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    tiled AS (
      SELECT prio,
             CAST(ntile(10) OVER (ORDER BY cents ASC, k ASC) AS BIGINT)
               AS decile
      FROM rows_
    ),
    cell AS (
      SELECT decile, prio, CAST(count(*) AS BIGINT) AS n
      FROM tiled GROUP BY 1, 2
    ),
    dt AS (SELECT decile, CAST(sum(n) AS BIGINT) AS nd FROM cell GROUP BY 1)
    SELECT c.decile, c.prio, c.n,
           floor(CAST(c.n AS DOUBLE) / d.nd * 1.0e6 + 0.5) / 1.0e6 AS share
    FROM cell c JOIN dt d ON c.decile = d.decile
    ORDER BY c.decile, c.prio
"""


@_register("orders_priority_mix_by_value_decile", oracle=_PRIOMIX_SQL)
def orders_priority_mix_by_value_decile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Priority shares within exact value deciles (ntile_two_pass):
    bounded 10×5 mix table."""
    from cioos_siooc_data_transform_spark.operators.windows import (
        ntile_two_pass,
    )

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    tiled = ntile_two_pass(o, "cents", "k", n_tiles=10, out_col="decile")
    cell = tiled.groupBy("decile", "prio").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    dt = cell.groupBy("decile").agg(F.sum("n").cast("long").alias("nd"))
    return (
        cell.join(F.broadcast(dt), "decile")
        .select(
            "decile",
            "prio",
            "n",
            (
                F.floor(F.col("n").cast("double") / F.col("nd") * 1.0e6 + 0.5)
                / 1.0e6
            ).alias("share"),
        )
        .orderBy("decile", "prio")
    )


# ===========================================================================
# Wave B — behavioral.
# ===========================================================================

# ---------------------------------------------------------------------------
# Session depth curve: share of sessions reaching >= k events
# (30-minute gap sessionization, the registered convention) — the
# engagement funnel in one bounded rollup.
# ---------------------------------------------------------------------------
_DEPTH_SQL = """
    WITH seq AS (
      SELECT user_id, ts,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(lag(ts) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id)))
                         AS BIGINT) > 1800
                    OR lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ),
    sess AS (
      SELECT user_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS sid
      FROM seq
    ),
    depth AS (
      SELECT user_id, sid, CAST(count(*) AS BIGINT) AS d
      FROM sess GROUP BY 1, 2
    ),
    ks AS (SELECT unnest([1, 2, 3, 5, 10]) AS k),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM depth)
    SELECT ks.k AS min_depth,
           CAST(sum(CASE WHEN d.d >= ks.k THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sessions,
           floor(CAST(sum(CASE WHEN d.d >= ks.k THEN 1 ELSE 0 END) AS DOUBLE)
                 / max(t.n) * 1.0e6 + 0.5) / 1.0e6 AS share
    FROM depth d CROSS JOIN ks CROSS JOIN tot t
    GROUP BY ks.k ORDER BY ks.k
"""


@_register("events_session_depth_curve", oracle=_DEPTH_SQL)
def events_session_depth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement funnel over 30-min-gap sessions: user-partitioned
    sessionization windows, per-session depth, a 5-row broadcast
    threshold sweep."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.floor(F.unix_timestamp(F.col("ts")))
    prev = F.lag("ts").over(w)
    seq = ev.select(
        "user_id",
        "ts",
        F.when(
            prev.isNull()
            | ((sec - F.floor(F.unix_timestamp(prev))) > 1800),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    ws = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = seq.select("user_id", F.sum("new_s").over(ws).alias("sid"))
    depth = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    ks = spark.createDataFrame(
        [(1,), (2,), (3,), (5,), (10,)], "k int"
    ).select(F.col("k").cast("long").alias("k"))
    tot = depth.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        depth.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("k").alias("min_depth"))
        .agg(
            F.sum(F.when(F.col("d") >= F.col("k"), 1).otherwise(0))
            .cast("long")
            .alias("n_sessions"),
            (
                F.floor(
                    F.sum(
                        F.when(F.col("d") >= F.col("k"), 1).otherwise(0)
                    ).cast("double")
                    / F.max("n")
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("share"),
        )
        .orderBy("min_depth")
    )


# ---------------------------------------------------------------------------
# First-session conversion: did the user purchase in their FIRST
# session vs any later session — the activation-quality split.
# ---------------------------------------------------------------------------
_FIRSTCONV_SQL = """
    WITH seq AS (
      SELECT user_id, ts, event_type,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(lag(ts) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id)))
                         AS BIGINT) > 1800
                    OR lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ),
    sess AS (
      SELECT user_id, event_type,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS sid
      FROM seq
    ),
    per_user AS (
      SELECT user_id,
             CAST(max(CASE WHEN sid = 1 AND event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS BIGINT) AS conv_first,
             CAST(max(CASE WHEN sid > 1 AND event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS BIGINT) AS conv_later,
             CAST(max(sid) AS BIGINT) AS n_sessions
      FROM sess GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           floor(CAST(sum(conv_first) AS DOUBLE) / count(*) * 1.0e6 + 0.5)
             / 1.0e6 AS first_session_conv,
           floor(CAST(sum(CASE WHEN n_sessions > 1 THEN conv_later ELSE 0 END)
                      AS DOUBLE)
                 / nullif(sum(CASE WHEN n_sessions > 1 THEN 1 ELSE 0 END), 0)
                 * 1.0e6 + 0.5) / 1.0e6 AS later_session_conv
    FROM per_user
"""


@_register("events_first_session_conversion", oracle=_FIRSTCONV_SQL)
def events_first_session_conversion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Purchase rate in the first session vs any later session: the
    same key-partitioned sessionization, one user rollup."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.floor(F.unix_timestamp(F.col("ts")))
    prev = F.lag("ts").over(w)
    seq = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.when(
            prev.isNull()
            | ((sec - F.floor(F.unix_timestamp(prev))) > 1800),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    ws = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = seq.select(
        "user_id", "event_type", F.sum("new_s").over(ws).alias("sid")
    )
    per_user = sess.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("sid") == 1) & (F.col("event_type") == "purchase"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("conv_first"),
        F.max(
            F.when(
                (F.col("sid") > 1) & (F.col("event_type") == "purchase"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("conv_later"),
        F.max("sid").cast("long").alias("n_sessions"),
    )
    q6 = lambda e: F.floor(e * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    multi = F.sum(F.when(F.col("n_sessions") > 1, 1).otherwise(0))
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        q6(F.sum("conv_first").cast("double") / F.count(F.lit(1))).alias(
            "first_session_conv"
        ),
        q6(
            F.sum(
                F.when(F.col("n_sessions") > 1, F.col("conv_later")).otherwise(
                    0
                )
            ).cast("double")
            / F.nullif(multi.cast("double"), F.lit(0.0))
        ).alias("later_session_conv"),
    )


# ---------------------------------------------------------------------------
# Top-percentile user concentration: share of all events from the top
# 1% / 5% / 10% most active users — ranks from the two-pass operator.
# ---------------------------------------------------------------------------
_USERCONC_SQL = """
    WITH act AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT c, CAST(row_number() OVER (ORDER BY c DESC, user_id ASC)
                  AS BIGINT) AS r
      FROM act
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS nu, CAST(sum(c) AS BIGINT) AS ne
      FROM act
    ),
    ps AS (SELECT unnest([1, 5, 10]) AS pct)
    SELECT ps.pct AS top_percent,
           CAST(greatest(floor(ps.pct / 100.0 * max(t.nu)), 1) AS BIGINT)
             AS n_top_users,
           floor(CAST(sum(CASE WHEN rk.r <= greatest(
                   floor(ps.pct / 100.0 * t.nu), 1)
                 THEN rk.c ELSE 0 END) AS DOUBLE) / max(t.ne) * 1.0e6 + 0.5)
             / 1.0e6 AS event_share
    FROM ranked rk CROSS JOIN tot t CROSS JOIN ps
    GROUP BY ps.pct ORDER BY ps.pct
"""


@_register("events_user_concentration_topk", oracle=_USERCONC_SQL)
def events_user_concentration_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Event share of the top 1/5/10% users: activity ranks via
    ranked_cumsum_two_pass, thresholds from a broadcast totals row."""
    from cioos_siooc_data_transform_spark.operators.windows import (
        ranked_cumsum_two_pass,
    )

    ev = _t(spark, sf_dir, "events")
    act = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ranked = ranked_cumsum_two_pass(
        act, "c", "user_id", ascending=False, out_rank="r", out_cum="__cum"
    ).select("c", F.col("r").cast("long").alias("r"))
    tot = act.agg(
        F.count(F.lit(1)).cast("long").alias("nu"),
        F.sum("c").cast("long").alias("ne"),
    )
    ps = spark.createDataFrame([(1,), (5,), (10,)], "pct int").select(
        F.col("pct").cast("long").alias("pct")
    )
    cut = F.greatest(
        F.floor(F.col("pct") / 100.0 * F.col("nu")), F.lit(1)
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ps))
        .groupBy(F.col("pct").alias("top_percent"))
        .agg(
            F.greatest(
                F.floor(F.col("top_percent") / 100.0 * F.max("nu")), F.lit(1)
            )
            .cast("long")
            .alias("n_top_users"),
            (
                F.floor(
                    F.sum(
                        F.when(F.col("r") <= cut, F.col("c")).otherwise(0)
                    ).cast("double")
                    / F.max("ne")
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("event_share"),
        )
        .orderBy("top_percent")
    )


# ===========================================================================
# Wave C — classical statistics.
# ===========================================================================

# ---------------------------------------------------------------------------
# Anderson–Darling exponentiality test of customer inter-order gaps:
# A² = −n − (1/n)·Σ(2i−1)[ln F(x_(i)) + ln(1−F(x_(n+1−i)))] with
# F(x) = 1 − exp(−x/x̄). Order statistics pair via rank i ↔ n+1−i —
# a rank-keyed self-join on the two-pass ranking, no global sort task.
# ---------------------------------------------------------------------------
_AD_SQL = """
    WITH seq AS (
      SELECT o_custkey,
             CAST(date_diff('day', lag(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS BIGINT) AS gap,
             o_orderkey AS k
      FROM orders
    ),
    g AS (SELECT gap, k FROM seq WHERE gap IS NOT NULL AND gap > 0),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(gap) AS DOUBLE) / count(*) AS xbar
      FROM g
    ),
    ranked AS (
      SELECT gap, CAST(row_number() OVER (ORDER BY gap ASC, k ASC) AS BIGINT)
               AS i
      FROM g
    ),
    paired AS (
      SELECT a.i, a.gap AS xi, b.gap AS xrev
      FROM ranked a JOIN ranked b CROSS JOIN mom m
        ON b.i = m.n + 1 - a.i
    ),
    terms AS (
      SELECT CAST(sum(CAST(floor(
               (2.0 * p.i - 1)
               * (ln(1.0 - exp(-p.xi / m.xbar))
                  + (-p.xrev / m.xbar)) * 1.0e6 + 0.5) AS BIGINT)) AS BIGINT)
               AS s_u
      FROM paired p CROSS JOIN mom m
    )
    SELECT m.n AS n_gaps,
           floor(m.xbar * 1.0e4 + 0.5) / 1.0e4 AS mean_gap_days,
           floor((-CAST(m.n AS DOUBLE)
                  - CAST(t.s_u AS DOUBLE) / 1.0e6 / m.n) * 1.0e6 + 0.5)
             / 1.0e6 AS ad_statistic
    FROM mom m CROSS JOIN terms t
"""


@_register("orders_gap_anderson_darling", oracle=_AD_SQL)
def orders_gap_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A² exponentiality of inter-order gaps: ascending ranks from
    ranked_cumsum_two_pass, the i ↔ n+1−i order-statistic pairing as a
    rank-keyed join (one bounded shuffle — never a single-task sort),
    per-term quantization at 1e-6. ln(1−F) simplifies to −x/x̄ exactly."""
    from cioos_siooc_data_transform_spark.operators.windows import (
        ranked_cumsum_two_pass,
    )

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("gap"),
        F.col("o_orderkey").alias("k"),
    )
    g = seq.filter(F.col("gap").isNotNull() & (F.col("gap") > 0))
    mom = g.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum("gap").cast("double") / F.count(F.lit(1))).alias("xbar"),
    )
    ranked = ranked_cumsum_two_pass(
        g, "gap", "k", ascending=True, out_rank="i", out_cum="__cum"
    ).select("gap", F.col("i").cast("long").alias("i"))
    a = ranked.select(F.col("i").alias("ia"), F.col("gap").alias("xi"))
    b = ranked.select(F.col("i").alias("ib"), F.col("gap").alias("xrev"))
    paired = (
        a.crossJoin(F.broadcast(mom))
        .join(b, F.col("ib") == F.col("n") + 1 - F.col("ia"))
    )
    term_u = F.floor(
        (2.0 * F.col("ia") - 1)
        * (
            F.log(1.0 - F.exp(-F.col("xi") / F.col("xbar")))
            + (-F.col("xrev") / F.col("xbar"))
        )
        * 1.0e6
        + 0.5
    ).cast("long")
    terms = paired.agg(F.sum(term_u).cast("long").alias("s_u"))
    return mom.crossJoin(F.broadcast(terms)).select(
        F.col("n").alias("n_gaps"),
        (F.floor(F.col("xbar") * 1.0e4 + 0.5) / 1.0e4).alias("mean_gap_days"),
        (
            F.floor(
                (
                    -F.col("n").cast("double")
                    - F.col("s_u").cast("double") / 1.0e6 / F.col("n")
                )
                * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("ad_statistic"),
    )


# ---------------------------------------------------------------------------
# Sarle's bimodality coefficient of account balances: BC =
# (skew² + 1)/kurtosis — BC > 5/9 suggests bimodality. Exact cents
# central moments via the expanded power sums.
# ---------------------------------------------------------------------------
_BIMODAL_SQL = """
    WITH x AS (
      SELECT CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS v FROM customer
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS HUGEINT) AS s1,
             CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS s2,
             CAST(sum(CAST(v AS HUGEINT) * v * v) AS HUGEINT) AS s3,
             CAST(sum(CAST(v AS HUGEINT) * v * v * v) AS HUGEINT) AS s4
      FROM x
    ),
    c AS (
      SELECT n, CAST(s1 AS DOUBLE) / n AS mu,
             CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n)
               * (CAST(s1 AS DOUBLE) / n) AS m2,
             CAST(s3 AS DOUBLE) / n
               - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
               + 2.0 * pow(CAST(s1 AS DOUBLE) / n, 3) AS m3,
             CAST(s4 AS DOUBLE) / n
               - 4.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
               + 6.0 * pow(CAST(s1 AS DOUBLE) / n, 2)
                 * (CAST(s2 AS DOUBLE) / n)
               - 3.0 * pow(CAST(s1 AS DOUBLE) / n, 4) AS m4
      FROM m
    )
    SELECT n AS n_customers,
           floor(m3 / pow(m2, 1.5) * 1.0e6 + 0.5) / 1.0e6 AS skewness,
           floor(m4 / (m2 * m2) * 1.0e6 + 0.5) / 1.0e6 AS kurtosis,
           floor((pow(m3 / pow(m2, 1.5), 2) + 1.0) / (m4 / (m2 * m2))
                 * 1.0e6 + 0.5) / 1.0e6 AS bimodality_coefficient
    FROM c
"""


@_register("customer_acctbal_bimodality", oracle=_BIMODAL_SQL)
def customer_acctbal_bimodality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sarle's BC from exact integer power sums (one pass): BC > 5/9 ≈
    0.555 flags a possibly bimodal balance distribution."""
    cust = _t(spark, sf_dir, "customer")
    x = cust.select(
        F.floor(F.col("c_acctbal") * 100.0 + 0.5).cast("long").alias("v")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    v19 = F.col("v").cast("decimal(19,0)")
    m = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("decimal(38,0)").alias("s1"),
        F.sum(v19 * v19).cast("decimal(38,0)").alias("s2"),
        F.sum((v19 * v19).cast("decimal(38,0)") * v19)
        .cast("decimal(38,0)")
        .alias("s3"),
        F.sum(
            ((v19 * v19).cast("decimal(38,0)") * (v19 * v19).cast("decimal(38,0)")).cast(
                "decimal(38,0)"
            )
        )
        .cast("decimal(38,0)")
        .alias("s4"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    m2 = F.col("s2").cast("double") / F.col("n") - mu * mu
    m3 = (
        F.col("s3").cast("double") / F.col("n")
        - 3.0 * mu * (F.col("s2").cast("double") / F.col("n"))
        + 2.0 * F.pow(mu, 3)
    )
    m4 = (
        F.col("s4").cast("double") / F.col("n")
        - 4.0 * mu * (F.col("s3").cast("double") / F.col("n"))
        + 6.0 * F.pow(mu, 2) * (F.col("s2").cast("double") / F.col("n"))
        - 3.0 * F.pow(mu, 4)
    )
    skew = m3 / F.pow(m2, 1.5)
    kurt = m4 / (m2 * m2)
    q6 = lambda e: F.floor(e * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    return m.select(
        F.col("n").alias("n_customers"),
        q6(skew).alias("skewness"),
        q6(kurt).alias("kurtosis"),
        q6((skew * skew + 1.0) / kurt).alias("bimodality_coefficient"),
    )


# ---------------------------------------------------------------------------
# Fisher price index (the geometric mean of Laspeyres and Paasche),
# first vs last calendar year, part-level prices weighted by
# quantities — completes the registered Laspeyres family.
# ---------------------------------------------------------------------------
_FISHER_SQL = """
    WITH yr AS (
      SELECT l.l_partkey AS pk, CAST(year(o.o_orderdate) AS BIGINT) AS y,
             CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev_c,
             CAST(sum(CAST(floor(l.l_quantity * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS qty_c
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    lims AS (SELECT min(y) AS y0, max(y) AS y1 FROM yr),
    base AS (
      SELECT pk, rev_c AS rev0, qty_c AS qty0 FROM yr, lims WHERE y = y0
    ),
    cur AS (
      SELECT pk, rev_c AS rev1, qty_c AS qty1 FROM yr, lims WHERE y = y1
    ),
    j AS (
      SELECT b.pk,
             CAST(b.rev0 AS DOUBLE) / b.qty0 AS p0,
             CAST(c.rev1 AS DOUBLE) / c.qty1 AS p1,
             CAST(b.qty0 AS DOUBLE) AS q0, CAST(c.qty1 AS DOUBLE) AS q1
      FROM base b JOIN cur c ON b.pk = c.pk
      WHERE b.qty0 > 0 AND c.qty1 > 0
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_parts,
             sum(p1 * q0) / sum(p0 * q0) AS laspeyres,
             sum(p1 * q1) / sum(p0 * q1) AS paasche
      FROM j
    )
    SELECT n_parts,
           floor(laspeyres * 1.0e6 + 0.5) / 1.0e6 AS laspeyres,
           floor(paasche * 1.0e6 + 0.5) / 1.0e6 AS paasche,
           floor(sqrt(laspeyres * paasche) * 1.0e6 + 0.5) / 1.0e6
             AS fisher_index
    FROM s
"""


@_register("lineitem_price_index_fisher", oracle=_FISHER_SQL)
def lineitem_price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher ideal index (√(Laspeyres·Paasche)) first-vs-last year:
    part×year rollup, part-keyed basket join, two weighted sums."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    yr = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_partkey").alias("pk"),
            F.year("o_orderdate").cast("long").alias("y"),
        )
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
            )
            .cast("long")
            .alias("rev_c"),
            F.sum(F.floor(F.col("l_quantity") * 100.0 + 0.5).cast("long"))
            .cast("long")
            .alias("qty_c"),
        )
    )
    lims = yr.agg(F.min("y").alias("y0"), F.max("y").alias("y1"))
    base = (
        yr.crossJoin(F.broadcast(lims))
        .filter(F.col("y") == F.col("y0"))
        .select("pk", F.col("rev_c").alias("rev0"), F.col("qty_c").alias("qty0"))
    )
    cur = (
        yr.crossJoin(F.broadcast(lims))
        .filter(F.col("y") == F.col("y1"))
        .select("pk", F.col("rev_c").alias("rev1"), F.col("qty_c").alias("qty1"))
    )
    j = (
        base.join(cur, "pk")
        .filter((F.col("qty0") > 0) & (F.col("qty1") > 0))
        .select(
            (F.col("rev0").cast("double") / F.col("qty0")).alias("p0"),
            (F.col("rev1").cast("double") / F.col("qty1")).alias("p1"),
            F.col("qty0").cast("double").alias("q0"),
            F.col("qty1").cast("double").alias("q1"),
        )
    )
    s = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        (
            F.sum(F.col("p1") * F.col("q0")) / F.sum(F.col("p0") * F.col("q0"))
        ).alias("laspeyres"),
        (
            F.sum(F.col("p1") * F.col("q1")) / F.sum(F.col("p0") * F.col("q1"))
        ).alias("paasche"),
    )
    q6 = lambda e: F.floor(e * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    return s.select(
        "n_parts",
        q6(F.col("laspeyres")).alias("laspeyres"),
        q6(F.col("paasche")).alias("paasche"),
        q6(F.sqrt(F.col("laspeyres") * F.col("paasche"))).alias(
            "fisher_index"
        ),
    )


# ===========================================================================
# Wave D — LLM-pipeline audits.
# ===========================================================================

# ---------------------------------------------------------------------------
# Perplexity-outlier contamination flags: held-out docs whose add-one
# unigram logprob under the TRAIN model is anomalously HIGH (z > 2 vs
# the held-out mean) — memorization/contamination candidates the
# shingle check misses when text is lightly paraphrased.
# ---------------------------------------------------------------------------
_PPLOUT_SQL = """
    WITH tok AS (
      SELECT doc_id, source,
             CAST(substr(source, 4) AS BIGINT) % 2 = 1 AS is_train,
             unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    vocab AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM tok),
    train AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok WHERE is_train GROUP BY w
    ),
    ntr AS (SELECT CAST(sum(c) AS BIGINT) AS nt FROM train),
    held AS (
      SELECT doc_id, source, w FROM tok WHERE NOT is_train
    ),
    per_doc AS (
      SELECT h.doc_id, h.source,
             CAST(count(*) AS BIGINT) AS n_tok,
             CAST(sum(CAST(floor(ln((coalesce(t.c, 0) + 1.0)
                   / (ntr.nt + vocab.v)) * 1.0e6 + 0.5) AS BIGINT))
                  AS BIGINT) AS lp_u
      FROM held h
      LEFT JOIN train t ON h.w = t.w
      CROSS JOIN ntr CROSS JOIN vocab
      GROUP BY h.doc_id, h.source
    ),
    scored AS (
      SELECT doc_id, source,
             CAST(lp_u AS DOUBLE) / 1.0e6 / n_tok AS lp_per_tok
      FROM per_doc
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n, sum(lp_per_tok) AS s1,
             sum(lp_per_tok * lp_per_tok) AS s2
      FROM scored
    )
    SELECT s.source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN (s.lp_per_tok - m.s1 / m.n)
                  / sqrt((m.s2 - m.s1 * m.s1 / m.n) / (m.n - 1)) > 2.0
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_suspicious,
           floor(CAST(sum(CASE WHEN (s.lp_per_tok - m.s1 / m.n)
                  / sqrt((m.s2 - m.s1 * m.s1 / m.n) / (m.n - 1)) > 2.0
                  THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 1.0e6 + 0.5)
             / 1.0e6 AS suspicious_rate
    FROM scored s CROSS JOIN mom m
    GROUP BY s.source ORDER BY s.source
"""


@_register("decontam_perplexity_outliers", oracle=_PPLOUT_SQL)
def decontam_perplexity_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out docs scoring anomalously WELL under the train unigram
    model (per-token logprob z > 2): per-token terms quantized at 1e-6,
    population moments broadcast, per-source flag rates."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        (F.substring(F.col("source"), 4, 10).cast("long") % 2 == 1).alias(
            "is_train"
        ),
        F.explode(words_expr(F.col("text"))).alias("w"),
    )
    vocab = tok.agg(F.countDistinct("w").cast("long").alias("v"))
    train = tok.filter(F.col("is_train")).groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ntr = train.agg(F.sum("c").cast("long").alias("nt"))
    held = tok.filter(~F.col("is_train"))
    term_u = F.floor(
        F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
            / (F.col("nt") + F.col("v"))
        )
        * 1.0e6
        + 0.5
    ).cast("long")
    per_doc = (
        held.join(F.broadcast(train), "w", "left")
        .crossJoin(F.broadcast(ntr))
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.sum(term_u).cast("long").alias("lp_u"),
        )
    )
    scored = per_doc.select(
        "doc_id",
        "source",
        (F.col("lp_u").cast("double") / 1.0e6 / F.col("n_tok")).alias(
            "lp_per_tok"
        ),
    )
    mom = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("lp_per_tok").alias("s1"),
        F.sum(F.col("lp_per_tok") * F.col("lp_per_tok")).alias("s2"),
    )
    z = (F.col("lp_per_tok") - F.col("s1") / F.col("n")) / F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
        / (F.col("n") - 1)
    )
    flagged = F.sum(F.when(z > 2.0, 1).otherwise(0))
    return (
        scored.crossJoin(F.broadcast(mom))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            flagged.cast("long").alias("n_suspicious"),
            (
                F.floor(
                    flagged.cast("double") / F.count(F.lit(1)) * 1.0e6 + 0.5
                )
                / 1.0e6
            ).alias("suspicious_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Modality mix from payload "magic bytes": the fake-codec convention
# classifies payloads by first-character class — the mix per source is
# the routing table a multimodal pipeline shards by.
# ---------------------------------------------------------------------------
_MODMIX_SQL = """
    WITH m AS (
      SELECT source,
             CASE WHEN substr(text, 1, 1) BETWEEN 'a' AND 'h' THEN 'image'
                  WHEN substr(text, 1, 1) BETWEEN 'i' AND 'q' THEN 'audio'
                  ELSE 'video' END AS modality
      FROM documents
    ),
    cell AS (
      SELECT source, modality, CAST(count(*) AS BIGINT) AS n
      FROM m GROUP BY 1, 2
    ),
    st AS (SELECT source, CAST(sum(n) AS BIGINT) AS ns FROM cell GROUP BY 1)
    SELECT c.source, c.modality, c.n,
           floor(CAST(c.n AS DOUBLE) / s.ns * 1.0e6 + 0.5) / 1.0e6 AS share
    FROM cell c JOIN st s ON c.source = s.source
    ORDER BY c.source, c.modality
"""


@_register("multimodal_modality_mix", oracle=_MODMIX_SQL)
def multimodal_modality_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source modality routing table from the deterministic
    magic-byte classifier: one bounded rollup."""
    docs = _t(spark, sf_dir, "documents")
    first = F.substring(F.col("text"), 1, 1)
    modality = (
        F.when(first.between("a", "h"), "image")
        .when(first.between("i", "q"), "audio")
        .otherwise("video")
    )
    cell = docs.select("source", modality.alias("modality")).groupBy(
        "source", "modality"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    st = cell.groupBy("source").agg(F.sum("n").cast("long").alias("ns"))
    return (
        cell.join(F.broadcast(st), "source")
        .select(
            "source",
            "modality",
            "n",
            (
                F.floor(F.col("n").cast("double") / F.col("ns") * 1.0e6 + 0.5)
                / 1.0e6
            ).alias("share"),
        )
        .orderBy("source", "modality")
    )


# ---------------------------------------------------------------------------
# LSH candidate-budget forecast: predicted pair counts per bucket-size
# cap (10/50/200) from the BUCKET-SIZE HISTOGRAM alone — Σ b(b−1)/2
# over retained buckets — the capacity-planning number you compute
# BEFORE running the self-join.
# ---------------------------------------------------------------------------
def _budget_oracle() -> str:
    from cioos_siooc_data_transform_spark.plans.dedup_queries import (
        _LSH_SIG_CTES,
        _SHINGLES_CTE,
    )

    return f"""
    WITH {_SHINGLES_CTE},
    {_LSH_SIG_CTES},
    bsize AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS b FROM bands GROUP BY bucket
    ),
    caps AS (SELECT unnest([10, 50, 200]) AS cap)
    SELECT caps.cap AS bucket_cap,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(CASE WHEN b <= caps.cap THEN 1 ELSE 0 END) AS BIGINT)
             AS retained_buckets,
           CAST(sum(CASE WHEN b <= caps.cap THEN b * (b - 1) / 2 ELSE 0 END)
                AS BIGINT) AS forecast_pairs,
           CAST(sum(CASE WHEN b > caps.cap THEN b * (b - 1) / 2 ELSE 0 END)
                AS BIGINT) AS dropped_pairs
    FROM bsize CROSS JOIN caps
    GROUP BY caps.cap ORDER BY caps.cap
    """


@_register("dedup_candidate_budget_by_cap", oracle="__BUDGET__")
def dedup_candidate_budget_by_cap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pair-count forecast per bucket cap from the bucket-size
    histogram only (Σ b(b−1)/2) — the guard-tuning readout computed
    WITHOUT the candidate join."""
    from cioos_siooc_data_transform_spark.operators.dedup import (
        lsh_band_buckets,
        minhash_signature,
    )
    from cioos_siooc_data_transform_spark.plans.dedup_queries import (
        _distinct_shingles,
    )

    shingles = _distinct_shingles(spark, sf_dir)
    sig = minhash_signature(
        shingles, "doc_id", "s", num_hashes=8, hash_family="md5"
    )
    buckets = lsh_band_buckets(sig, "doc_id", num_hashes=8, bands=4)
    bsize = buckets.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("b")
    )
    caps = spark.createDataFrame([(10,), (50,), (200,)], "cap int").select(
        F.col("cap").cast("long").alias("cap")
    )
    pairs = (F.col("b") * (F.col("b") - 1) / 2).cast("long")
    return (
        bsize.crossJoin(F.broadcast(caps))
        .groupBy(F.col("cap").alias("bucket_cap"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum(F.when(F.col("b") <= F.col("cap"), 1).otherwise(0))
            .cast("long")
            .alias("retained_buckets"),
            F.sum(F.when(F.col("b") <= F.col("cap"), pairs).otherwise(0))
            .cast("long")
            .alias("forecast_pairs"),
            F.sum(F.when(F.col("b") > F.col("cap"), pairs).otherwise(0))
            .cast("long")
            .alias("dropped_pairs"),
        )
        .orderBy("bucket_cap")
    )


STAGED_ORACLES["dedup_candidate_budget_by_cap"] = _budget_oracle()


# ---------------------------------------------------------------------------
# Pareto crossing point: the smallest customer-share p with revenue
# share >= 80% — the single-number inverse of the Lorenz curve (the
# "is it 80/20 or 80/5?" KPI). Rides the two-pass running revenue sum.
# ---------------------------------------------------------------------------
_PARETO_X_SQL = """
    WITH rev AS (
      SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT cents,
             CAST(row_number() OVER (ORDER BY cents DESC, o_custkey ASC)
                  AS BIGINT) AS r,
             CAST(sum(cents) OVER (ORDER BY cents DESC, o_custkey ASC
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS cum
      FROM rev
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS t
      FROM rev
    ),
    crossing AS (
      SELECT min(r) AS r80
      FROM ranked CROSS JOIN tot
      WHERE CAST(cum AS DOUBLE) / t >= 0.8
    )
    SELECT t.n AS n_customers, c.r80 AS customers_for_80pct,
           floor(CAST(c.r80 AS DOUBLE) / t.n * 1.0e6 + 0.5) / 1.0e6
             AS pareto_crossing_share
    FROM crossing c CROSS JOIN tot t
"""


@_register("orders_pareto_crossing_point", oracle=_PARETO_X_SQL)
def orders_pareto_crossing_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smallest top-customer share holding >= 80% of revenue: running
    revenue share from ranked_cumsum_two_pass (descending, custkey
    tiebreak), crossing found by one min aggregate."""
    from cioos_siooc_data_transform_spark.operators.windows import (
        ranked_cumsum_two_pass,
    )

    o = _t(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long"))
        .cast("long")
        .alias("cents")
    )
    ranked = ranked_cumsum_two_pass(
        rev, "cents", "o_custkey", ascending=False, out_rank="r", out_cum="cum"
    ).select(
        F.col("r").cast("long").alias("r"),
        F.col("cum").cast("long").alias("cum"),
    )
    tot = rev.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("t"),
    )
    crossing = (
        ranked.crossJoin(F.broadcast(tot))
        .filter(F.col("cum").cast("double") / F.col("t") >= 0.8)
        .agg(F.min("r").alias("r80"))
    )
    return crossing.crossJoin(F.broadcast(tot)).select(
        F.col("n").alias("n_customers"),
        F.col("r80").alias("customers_for_80pct"),
        (
            F.floor(F.col("r80").cast("double") / F.col("n") * 1.0e6 + 0.5)
            / 1.0e6
        ).alias("pareto_crossing_share"),
    )
