"""STAGED round-18 queries — NOT registered (round-18 runway seed,
started in round 10; topped up in later rounds before activation).

Same contract as staged_r5..r17: LOCAL registry, strict-harness pytest
coverage in tests/test_staged_r18.py, idempotent ``activate()``.
Activation order: staged_r11 (round 11) -> ... -> staged_r17 (round
17) -> this module (round 18). Budget: <= 50 fresh names at
activation.

COMPLETE at the 50-name budget (50 new, 0 replacements) as of round
11 — and this module is the RUNWAY ENDPOINT: per the round-10 verdict
(What's missing #2) no staged_r19 will be seeded; the staged-slate
cadence ends here and later rounds spend the budget on depth
(regression rotation, scale soaks) instead of breadth.

ACTIVATION NOTE (round 18, pre-audited in round 11 via
plan_guards.find_unpartitioned_windows at sf0.001): exactly THREE
queries carry a bounded unpartitioned window — add them to
tests/test_plans.py::_ALLOWED_UNPARTITIONED_WINDOWS at activation
with the justifications recorded in
tests/test_staged_r18.py::EXPECTED_BOUNDED_WINDOW_QUERIES
(orders_qoq_growth_profile, orders_conformal_forecast_coverage,
events_zero_activity_windows — all calendar-bounded axes); everything
else in the slate is detector-clean. The four ios_* queries are
covered by the hidden-actions test's ios_ prefix exemption (cached
mapInPandas parse); no new _EAGER_BY_DESIGN entries are needed.

Content:

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
- Wave E — classical stats: two-sample Cramér–von Mises (two-pass
  ranks), D'Agostino skewness z, Cronbach's alpha, empirical-Bayes
  beta-binomial shrinkage, Goh–Barabási memory coefficient.
- Wave F — business series: QoQ growth, per-nation market beta,
  split-conformal forecast coverage, terminal-digit preference,
  per-customer trailing-30d RANGE window.
- Wave G — relational surface: ROLLUP subtotals + GROUPING, explicit
  value-list PIVOT, exact equi-depth histogram on ntile_two_pass.
- Wave H — DQ contracts: header-vs-detail amount reconciliation,
  linenumber positional bias, order fanout vs spec, same-day
  multi-order screen, orderkey keyspace density, brand x type catalog
  coverage, sub-cent billing residue.
- Wave I — LLM pipeline: dedup survivor length bias, temperature
  sampling mix, code-switching share, quantization bits MSE ladder,
  binary-payload exact dedup, histogram overlap coefficient, packing
  waste vs LP lower bound.
- Wave J — stream health: zero-activity windows (islands over the
  calendar minute grid), per-user 60 s burst bot screen,
  streaming-dedup state-size sweep.
- Wave K — embedding-index audits: cosine-vs-L2 rank agreement,
  top-k diversity, norm-by-label bias.
- Wave L — oceanographic QC through the real IOS parse path on two
  self-authored casts: Argo-style spike test, depth-monotonicity
  audit, depth-bin climatology, cross-file channel-unit consistency.

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


# ===========================================================================
# Wave E — classical statistics not yet in the registry
# ===========================================================================

# ---------------------------------------------------------------------------
# Two-sample Cramér–von Mises: click vs view event values. The combined
# ranking is fact-scaled, so it rides ranked_cumsum_two_pass (integer
# cents, event_id tiebreak); the T statistic is the rank-sum form
# T = U/(nm(n+m)) - (4nm-1)/(6(n+m)) with
# U = n*sum_click (r_i - i)^2 + m*sum_view (s_j - j)^2, where r/s are
# combined ranks and i/j within-sample ranks — exact integer sums.
# ---------------------------------------------------------------------------
_CVM_SQL = """
    WITH s AS (
      SELECT event_id,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
             event_type
      FROM events WHERE event_type IN ('click', 'view')
    ),
    r AS (
      SELECT event_type,
             CAST(row_number() OVER (ORDER BY cents ASC, event_id ASC)
                  AS BIGINT) AS rc,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY cents ASC, event_id ASC)
                  AS BIGINT) AS rw
      FROM s
    ),
    agg AS (
      SELECT
        CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             AS BIGINT) AS n,
        CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             AS BIGINT) AS m,
        sum(CASE WHEN event_type = 'click'
                 THEN CAST(rc - rw AS HUGEINT) * (rc - rw) END) AS uc,
        sum(CASE WHEN event_type = 'view'
                 THEN CAST(rc - rw AS HUGEINT) * (rc - rw) END) AS uv
      FROM r
    )
    SELECT n AS n_click, m AS n_view,
           floor((
             (CAST(n AS DOUBLE) * CAST(uc AS DOUBLE)
              + CAST(m AS DOUBLE) * CAST(uv AS DOUBLE))
             / (CAST(n AS DOUBLE) * m * (n + m))
             - (4.0 * n * m - 1.0) / (6.0 * (n + m))
           ) * 1.0e6 + 0.5) / 1.0e6 AS cvm_t
    FROM agg
"""


@_register("events_value_cramer_von_mises", oracle=_CVM_SQL)
def events_value_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises T between click and view values —
    the EDF-distance complement to the registered KS/Mann–Whitney
    tests (CvM weights the whole curve, not the max gap). Combined
    AND within-sample ranks both come from ranked_cumsum_two_pass
    (never a single-partition window); the U statistic is an exact
    integer sum of squared rank offsets, accumulated in DECIMAL(38,0)
    to mirror the oracle's HUGEINT (a BIGINT accumulator would wrap
    around sf>=10, ~3M click/view rows)."""
    from cioos_siooc_data_transform_spark.operators.windows import (
        ranked_cumsum_two_pass,
    )

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            "event_id",
            "event_type",
            F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
        )
    )
    combined = ranked_cumsum_two_pass(
        ev, "cents", "event_id", ascending=True, out_rank="rc", out_cum="__c"
    ).drop("__c")
    within = ranked_cumsum_two_pass(
        combined,
        "cents",
        "event_id",
        group_cols=["event_type"],
        ascending=True,
        out_rank="rw",
        out_cum="__c2",
    ).drop("__c2")
    # Squared rank offsets accumulate in DECIMAL(38,0), not BIGINT: each
    # d2 <= (min(n,m))^2 is long-safe, but the SUM over ~rows values
    # wraps a BIGINT around sf>=10 (~3M click/view rows). DECIMAL keeps
    # Spark exact wherever the DuckDB oracle's HUGEINT accumulator is.
    d = within.select(
        "event_type",
        (
            (F.col("rc") - F.col("rw")).cast("decimal(19,0)")
            * (F.col("rc") - F.col("rw"))
        ).alias("d2"),
    )
    agg = d.groupBy().agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("n"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("m"),
        F.sum(F.when(F.col("event_type") == "click", F.col("d2")))
        .cast("decimal(38,0)")
        .alias("uc"),
        F.sum(F.when(F.col("event_type") == "view", F.col("d2")))
        .cast("decimal(38,0)")
        .alias("uv"),
    )
    n, m = F.col("n").cast("double"), F.col("m").cast("double")
    t_stat = (
        (n * F.col("uc").cast("double") + m * F.col("uv").cast("double"))
        / (n * m * (n + m))
        - (4.0 * n * m - 1.0) / (6.0 * (n + m))
    )
    return agg.select(
        F.col("n").alias("n_click"),
        F.col("m").alias("n_view"),
        (F.floor(t_stat * 1.0e6 + 0.5) / 1.0e6).alias("cvm_t"),
    )


# ---------------------------------------------------------------------------
# D'Agostino skewness z-test on order totals: the sample-size-aware
# normality test for skew alone (Jarque–Bera pools skew+kurtosis).
# Transformation per D'Agostino (1970): exact central moment sums,
# then Y = b1 * sqrt((n+1)(n+3) / (6(n-2))), and the Z via the
# log/delta transform — all closed-form doubles over one aggregate.
# ---------------------------------------------------------------------------
_DAGO_SQL = """
    WITH m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             avg(o_totalprice) AS mu
      FROM orders
    ),
    c AS (
      SELECT m.n AS n,
             sum((o_totalprice - mu) * (o_totalprice - mu)) / m.n AS m2,
             sum((o_totalprice - mu) * (o_totalprice - mu)
                 * (o_totalprice - mu)) / m.n AS m3
      FROM orders, m
      GROUP BY m.n
    ),
    g AS (
      SELECT n, m3 / pow(m2, 1.5) AS b1 FROM c
    ),
    y AS (
      SELECT n, b1,
             b1 * sqrt((CAST(n AS DOUBLE) + 1.0) * (n + 3.0)
                       / (6.0 * (n - 2.0))) AS yy,
             3.0 * (CAST(n AS DOUBLE) * n + 27.0 * n - 70.0) * (n + 1.0)
               * (n + 3.0)
               / ((CAST(n AS DOUBLE) - 2.0) * (n + 5.0) * (n + 7.0)
                  * (n + 9.0)) AS beta2
      FROM g
    ),
    w AS (
      SELECT n, b1, yy,
             sqrt(-1.0 + sqrt(2.0 * (beta2 - 1.0))) AS ww
      FROM y
    ),
    z AS (
      SELECT n, b1, yy, ww,
             1.0 / sqrt(ln(ww)) AS delta,
             sqrt(2.0 / (ww * ww - 1.0)) AS alpha
      FROM w
    )
    SELECT n AS n_orders,
           floor(b1 * 1.0e6 + 0.5) / 1.0e6 AS skewness_b1,
           floor(delta * ln(yy / alpha
                            + sqrt((yy / alpha) * (yy / alpha) + 1.0))
                 * 1.0e6 + 0.5) / 1.0e6 AS dagostino_z
    FROM z
"""


@_register("orders_price_dagostino_skew_test", oracle=_DAGO_SQL)
def orders_price_dagostino_skew_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """D'Agostino (1970) skewness z-test on o_totalprice — the
    size-aware normality test for skew alone, complementing the
    registered Jarque–Bera (which pools skew and kurtosis into one
    chi-square). Two map-side-combinable aggregates (mean, then
    central moments vs the broadcast mean); the transform chain is
    scalar arithmetic on a 1-row frame."""
    o = _t(spark, sf_dir, "orders")
    m = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("o_totalprice").alias("mu"),
    )
    d = F.col("o_totalprice") - F.col("mu")
    c = (
        o.crossJoin(F.broadcast(m))
        .groupBy("n")
        .agg(
            (F.sum(d * d) / F.col("n")).alias("m2"),
            (F.sum(d * d * d) / F.col("n")).alias("m3"),
        )
    )
    nD = F.col("n").cast("double")
    b1 = F.col("m3") / F.pow(F.col("m2"), 1.5)
    g = c.select("n", b1.alias("b1"))
    yy = F.col("b1") * F.sqrt((nD + 1.0) * (nD + 3.0) / (6.0 * (nD - 2.0)))
    beta2 = (
        3.0 * (nD * nD + 27.0 * nD - 70.0) * (nD + 1.0) * (nD + 3.0)
        / ((nD - 2.0) * (nD + 5.0) * (nD + 7.0) * (nD + 9.0))
    )
    y = g.select("n", "b1", yy.alias("yy"), beta2.alias("beta2"))
    ww = F.sqrt(-1.0 + F.sqrt(2.0 * (F.col("beta2") - 1.0)))
    w = y.select("n", "b1", "yy", ww.alias("ww"))
    z = w.select(
        "n",
        "b1",
        "yy",
        (1.0 / F.sqrt(F.log(F.col("ww")))).alias("delta"),
        F.sqrt(2.0 / (F.col("ww") * F.col("ww") - 1.0)).alias("alpha"),
    )
    ya = F.col("yy") / F.col("alpha")
    return z.select(
        F.col("n").alias("n_orders"),
        (F.floor(F.col("b1") * 1.0e6 + 0.5) / 1.0e6).alias("skewness_b1"),
        (
            F.floor(
                F.col("delta") * F.log(ya + F.sqrt(ya * ya + 1.0)) * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("dagostino_z"),
    )


# ---------------------------------------------------------------------------
# Cronbach's alpha over the 5 event-type engagement "items": per-user
# counts per type are the item scores; alpha = k/(k-1) *
# (1 - sum(var_item)/var_total) with POPULATION variances from exact
# integer count sums. One conditional-sum rollup per user (no pivot
# shuffle), one variance aggregate — both map-side combinable.
# ---------------------------------------------------------------------------
_CRONBACH_SQL = """
    WITH u AS (
      SELECT user_id,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c2,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c3,
             CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS c4,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS c5
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c1) AS BIGINT) AS s1, CAST(sum(CAST(c1 AS HUGEINT)*c1) AS BIGINT) AS q1,
             CAST(sum(c2) AS BIGINT) AS s2, CAST(sum(CAST(c2 AS HUGEINT)*c2) AS BIGINT) AS q2,
             CAST(sum(c3) AS BIGINT) AS s3, CAST(sum(CAST(c3 AS HUGEINT)*c3) AS BIGINT) AS q3,
             CAST(sum(c4) AS BIGINT) AS s4, CAST(sum(CAST(c4 AS HUGEINT)*c4) AS BIGINT) AS q4,
             CAST(sum(c5) AS BIGINT) AS s5, CAST(sum(CAST(c5 AS HUGEINT)*c5) AS BIGINT) AS q5,
             CAST(sum(c1+c2+c3+c4+c5) AS BIGINT) AS st,
             CAST(sum(CAST(c1+c2+c3+c4+c5 AS HUGEINT)*(c1+c2+c3+c4+c5)) AS BIGINT) AS qt
      FROM u
    )
    SELECT n AS n_users,
           floor((
             (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n)
             + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)*s2/n)
             + (CAST(q3 AS DOUBLE) - CAST(s3 AS DOUBLE)*s3/n)
             + (CAST(q4 AS DOUBLE) - CAST(s4 AS DOUBLE)*s4/n)
             + (CAST(q5 AS DOUBLE) - CAST(s5 AS DOUBLE)*s5/n)
           ) / (CAST(qt AS DOUBLE) - CAST(st AS DOUBLE)*st/n)
           * 1.0e6 + 0.5) / 1.0e6 AS item_to_total_var_ratio,
           floor(1.25 * (1.0 - (
             (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n)
             + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)*s2/n)
             + (CAST(q3 AS DOUBLE) - CAST(s3 AS DOUBLE)*s3/n)
             + (CAST(q4 AS DOUBLE) - CAST(s4 AS DOUBLE)*s4/n)
             + (CAST(q5 AS DOUBLE) - CAST(s5 AS DOUBLE)*s5/n)
           ) / (CAST(qt AS DOUBLE) - CAST(st AS DOUBLE)*st/n))
           * 1.0e6 + 0.5) / 1.0e6 AS cronbach_alpha
    FROM s
"""


@_register("events_type_engagement_cronbach_alpha", oracle=_CRONBACH_SQL)
def events_type_engagement_cronbach_alpha(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cronbach's alpha treating the five event types as items of a
    per-user engagement scale — the internal-consistency coefficient
    (do the five activity counts move together across users?). All
    variances come from exact integer sum/sum-of-squares pairs; k is
    the FIXED 5-type alphabet, so k/(k-1) = 1.25 is a literal."""
    ev = _t(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    per_user = ev.groupBy("user_id").agg(
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("long")
            .alias(f"c{i+1}")
            for i, t in enumerate(types)
        ]
    )
    tot = sum(F.col(f"c{i+1}") for i in range(5))
    s = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            agg
            for i in range(5)
            for agg in (
                F.sum(f"c{i+1}").cast("long").alias(f"s{i+1}"),
                F.sum(F.col(f"c{i+1}") * F.col(f"c{i+1}"))
                .cast("long")
                .alias(f"q{i+1}"),
            )
        ],
        F.sum(tot).cast("long").alias("st"),
        F.sum(tot * tot).cast("long").alias("qt"),
    )
    nD = F.col("n").cast("double")
    item_ss = sum(
        F.col(f"q{i+1}").cast("double")
        - F.col(f"s{i+1}").cast("double") * F.col(f"s{i+1}") / nD
        for i in range(5)
    )
    total_ss = (
        F.col("qt").cast("double")
        - F.col("st").cast("double") * F.col("st") / nD
    )
    ratio = item_ss / total_ss
    return s.select(
        F.col("n").alias("n_users"),
        (F.floor(ratio * 1.0e6 + 0.5) / 1.0e6).alias("item_to_total_var_ratio"),
        (F.floor(1.25 * (1.0 - ratio) * 1.0e6 + 0.5) / 1.0e6).alias(
            "cronbach_alpha"
        ),
    )


# ---------------------------------------------------------------------------
# Empirical-Bayes (beta-binomial) shrinkage of per-brand return rates:
# method-of-moments prior strength M = pbar(1-pbar)/s2 - 1 from the
# equally-weighted brand-rate mean/variance, then
# shrunk = (x + M*pbar) / (n + M) — the James-Stein-flavored estimator
# that pulls small-sample brands toward the pooled rate.
# ---------------------------------------------------------------------------
_EB_SQL = """
    WITH b AS (
      SELECT p.p_brand AS brand,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand
    ),
    prior AS (
      SELECT avg(CAST(x AS DOUBLE) / n) AS pbar,
             sum((CAST(x AS DOUBLE) / n) * (CAST(x AS DOUBLE) / n))
               / count(*)
             - avg(CAST(x AS DOUBLE) / n) * avg(CAST(x AS DOUBLE) / n)
               AS s2
      FROM b
    ),
    m AS (
      SELECT pbar, s2,
             CASE WHEN s2 > 0 AND pbar * (1.0 - pbar) / s2 - 1.0 > 0
                  THEN pbar * (1.0 - pbar) / s2 - 1.0
                  ELSE 100.0 END AS strength
      FROM prior
    )
    SELECT b.brand, b.n AS n_lines,
           floor(CAST(b.x AS DOUBLE) / b.n * 1.0e6 + 0.5) / 1.0e6
             AS raw_rate,
           floor((b.x + m.strength * m.pbar) / (b.n + m.strength)
                 * 1.0e6 + 0.5) / 1.0e6 AS shrunk_rate
    FROM b, m
    ORDER BY brand
"""


@_register("lineitem_brand_return_eb_shrinkage", oracle=_EB_SQL)
def lineitem_brand_return_eb_shrinkage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Beta-binomial empirical-Bayes shrinkage of per-brand return
    rates (method-of-moments prior from the brand-rate spread) — the
    standard small-sample correction before ranking brands by a rate.
    The part dim broadcasts into the lineitem join; the prior is a
    1-row broadcast over the ~25-brand rollup."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    b = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("x"),
        )
    )
    rate = F.col("x").cast("double") / F.col("n")
    prior = b.agg(
        F.avg(rate).alias("pbar"),
        (F.sum(rate * rate) / F.count(F.lit(1)) - F.avg(rate) * F.avg(rate))
        .alias("s2"),
    )
    strength = F.when(
        (F.col("s2") > 0)
        & (F.col("pbar") * (1.0 - F.col("pbar")) / F.col("s2") - 1.0 > 0),
        F.col("pbar") * (1.0 - F.col("pbar")) / F.col("s2") - 1.0,
    ).otherwise(F.lit(100.0))
    m = prior.select("pbar", strength.alias("strength"))
    return (
        b.crossJoin(F.broadcast(m))
        .select(
            "brand",
            F.col("n").alias("n_lines"),
            (F.floor(rate * 1.0e6 + 0.5) / 1.0e6).alias("raw_rate"),
            (
                F.floor(
                    (F.col("x") + F.col("strength") * F.col("pbar"))
                    / (F.col("n") + F.col("strength"))
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("shrunk_rate"),
        )
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# Goh–Barabási memory coefficient M: lag-1 Pearson correlation of
# consecutive per-user inter-arrival times (seconds), pooled across
# users — the companion to the registered burstiness B (B,M together
# locate a point process on the burstiness-memory plane). The lag
# windows are PARTITIONED BY user; the correlation is exact integer
# sums (seconds fit comfortably in BIGINT squares at any fact scale).
# ---------------------------------------------------------------------------
@_register("events_interarrival_memory_coeff", oracle="__MEMORY__")
def events_interarrival_memory_coeff(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Goh–Barabási memory coefficient M = corr(tau_i, tau_{i+1}) of
    consecutive per-user inter-arrival seconds, pooled over users. All
    windows (the arrival lag and the pairing lead) are partitioned by
    user_id — bounded per-key state at any scale; the correlation is
    one exact integer aggregate."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(ts) div 1000000").alias("sec"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    tau = (
        ev.withColumn("tau", F.col("sec") - F.lag("sec").over(w))
        .filter(F.col("tau").isNotNull())
        .withColumn("tau_next", F.lead("tau").over(w))
        .filter(F.col("tau_next").isNotNull())
    )
    x, y = F.col("tau"), F.col("tau_next")
    s = tau.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("long").alias("sx"),
        F.sum(y).cast("long").alias("sy"),
        F.sum(x * y).cast("long").alias("sxy"),
        F.sum(x * x).cast("long").alias("sxx"),
        F.sum(y * y).cast("long").alias("syy"),
    )
    nD = F.col("n").cast("double")
    cov = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / nD
    vx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / nD
    vy = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / nD
    return s.select(
        F.col("n").alias("n_pairs"),
        (F.floor(cov / F.sqrt(vx * vy) * 1.0e6 + 0.5) / 1.0e6).alias(
            "memory_coeff"
        ),
    )


STAGED_ORACLES["events_interarrival_memory_coeff"] = """
    WITH e AS (
      SELECT user_id, epoch_us(ts) // 1000000 AS sec, event_id
      FROM events
    ),
    g AS (
      SELECT user_id, sec, event_id,
             sec - lag(sec) OVER (PARTITION BY user_id
                                  ORDER BY sec, event_id) AS tau
      FROM e
    ),
    p AS (
      SELECT user_id, tau,
             lead(tau) OVER (PARTITION BY user_id
                             ORDER BY sec, event_id) AS tau_next
      FROM g WHERE tau IS NOT NULL
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(tau) AS BIGINT) AS sx,
             CAST(sum(tau_next) AS BIGINT) AS sy,
             CAST(sum(CAST(tau AS HUGEINT) * tau_next) AS BIGINT) AS sxy,
             CAST(sum(CAST(tau AS HUGEINT) * tau) AS BIGINT) AS sxx,
             CAST(sum(CAST(tau_next AS HUGEINT) * tau_next) AS BIGINT) AS syy
      FROM p WHERE tau_next IS NOT NULL
    )
    SELECT n AS n_pairs,
           floor((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
                 / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                        * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n))
                 * 1.0e6 + 0.5) / 1.0e6 AS memory_coeff
    FROM s
"""


# ===========================================================================
# Wave F — business / finance series
# ===========================================================================

# ---------------------------------------------------------------------------
# Quarter-over-quarter growth: the quarterly rollup is calendar-bounded
# (~27 quarters over the 6.5-year order range), so the single lag
# window over it is bounded by construction (EXPECTED_BOUNDED entry).
# ---------------------------------------------------------------------------
_QOQ_SQL = """
    WITH q AS (
      SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS yr,
             CAST(date_part('quarter', o_orderdate) AS BIGINT) AS qtr,
             CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    )
    SELECT yr, qtr, cents AS revenue_cents,
           CASE WHEN lag(cents) OVER (ORDER BY yr, qtr) IS NULL THEN NULL
                ELSE floor((CAST(cents AS DOUBLE)
                            / lag(cents) OVER (ORDER BY yr, qtr) - 1.0)
                           * 1.0e6 + 0.5) / 1.0e6
           END AS qoq_growth
    FROM q ORDER BY yr, qtr
"""


@_register("orders_qoq_growth_profile", oracle=_QOQ_SQL)
def orders_qoq_growth_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarter-over-quarter revenue growth over the calendar-bounded
    quarterly rollup (~27 rows regardless of fact scale — the lag
    window's input is bounded by construction)."""
    o = _t(spark, sf_dir, "orders")
    q = o.groupBy(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("yr", "qtr")
    prev = F.lag("cents").over(w)
    return q.select(
        "yr",
        "qtr",
        F.col("cents").alias("revenue_cents"),
        F.when(prev.isNull(), F.lit(None).cast("double"))
        .otherwise(
            F.floor(
                (F.col("cents").cast("double") / prev - 1.0) * 1.0e6 + 0.5
            )
            / 1.0e6
        )
        .alias("qoq_growth"),
    ).orderBy("yr", "qtr")


# ---------------------------------------------------------------------------
# Per-nation revenue "market beta": monthly nation revenue regressed on
# the monthly market total, beta = cov/var over the ~80 month axis.
# ---------------------------------------------------------------------------
_BETA_SQL = """
    WITH m AS (
      SELECT n.n_name AS nation,
             date_trunc('month', o.o_orderdate) AS mo,
             CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    mkt AS (
      SELECT mo, CAST(sum(cents) AS BIGINT) AS mcents FROM m GROUP BY mo
    ),
    j AS (SELECT m.nation, m.cents, mkt.mcents FROM m JOIN mkt USING (mo)),
    s AS (
      SELECT nation,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(cents AS DOUBLE)) AS sx,
             sum(CAST(mcents AS DOUBLE)) AS sy,
             sum(CAST(cents AS DOUBLE) * mcents) AS sxy,
             sum(CAST(mcents AS DOUBLE) * mcents) AS syy
      FROM j GROUP BY nation
    )
    SELECT nation, n AS n_months,
           floor((sxy - sx * sy / n) / (syy - sy * sy / n) * 1.0e6 + 0.5)
             / 1.0e6 AS market_beta
    FROM s ORDER BY nation
"""


@_register("orders_nation_market_beta", oracle=_BETA_SQL)
def orders_nation_market_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPM-flavored sensitivity of each nation's monthly revenue to
    the total market: beta = cov(nation, market)/var(market) over the
    calendar-bounded month axis. Customer and nation dims broadcast;
    the month join is a tiny rollup-to-rollup equi-join."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    m = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_trunc("month", F.col("o_orderdate")).alias("mo"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    mkt = m.groupBy("mo").agg(F.sum("cents").cast("long").alias("mcents"))
    j = m.join(F.broadcast(mkt), "mo")
    x = F.col("cents").cast("double")
    y = F.col("mcents").cast("double")
    s = j.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
    )
    nD = F.col("n").cast("double")
    beta = (F.col("sxy") - F.col("sx") * F.col("sy") / nD) / (
        F.col("syy") - F.col("sy") * F.col("sy") / nD
    )
    return s.select(
        "nation",
        F.col("n").alias("n_months"),
        (F.floor(beta * 1.0e6 + 0.5) / 1.0e6).alias("market_beta"),
    ).orderBy("nation")


# ---------------------------------------------------------------------------
# Split-conformal coverage of a weekday-mean revenue forecaster:
# calibrate the 90% absolute-residual quantile on pre-2000 days, then
# measure empirical coverage on the 2000+ days. The residual ranking
# runs over the calendar-bounded day axis (EXPECTED_BOUNDED entry).
# ---------------------------------------------------------------------------
_CONFORMAL_SQL = """
    WITH d AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(date_part('isodow', o_orderdate) AS BIGINT) AS dow,
             CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ),
    wk AS (
      SELECT dow, avg(CAST(cents AS DOUBLE)) AS mu
      FROM d WHERE day < TIMESTAMP '2000-01-01' GROUP BY dow
    ),
    cal AS (
      SELECT abs(CAST(d.cents AS DOUBLE) - wk.mu) AS r, d.day
      FROM d JOIN wk USING (dow) WHERE d.day < TIMESTAMP '2000-01-01'
    ),
    ranked AS (
      SELECT r, CAST(row_number() OVER (ORDER BY r, day) AS BIGINT) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS ncal
      FROM cal
    ),
    q AS (
      SELECT min(r) AS q90, max(ncal) AS ncal FROM ranked
      WHERE rn >= CAST(ceil(0.9 * (ncal + 1)) AS BIGINT)
    ),
    test AS (
      SELECT abs(CAST(d.cents AS DOUBLE) - wk.mu) AS r
      FROM d JOIN wk USING (dow) WHERE d.day >= TIMESTAMP '2000-01-01'
    )
    SELECT q.ncal AS n_calibration,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(floor(q.q90 + 0.5) AS BIGINT) AS q90_abs_residual_cents,
           floor(avg(CASE WHEN test.r <= q.q90 THEN 1.0 ELSE 0.0 END)
                 * 1.0e6 + 0.5) / 1.0e6 AS empirical_coverage
    FROM test, q GROUP BY q.ncal, q.q90
"""


@_register("orders_conformal_forecast_coverage", oracle=_CONFORMAL_SQL)
def orders_conformal_forecast_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Split-conformal prediction audit of a weekday-mean daily-revenue
    forecaster: the 90% conformal band is the ceil(0.9*(n+1))-th
    smallest calibration |residual| (pre-2000 days), and the reported
    number is the band's empirical coverage on the 2000+ holdout —
    the distribution-free calibration check. All rollups are
    calendar-bounded; the one unpartitioned rank runs over ~1800
    calibration days."""
    o = _t(spark, sf_dir, "orders")
    d = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day"),
        F.dayofweek(F.col("o_orderdate")).cast("long").alias("dow"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long"))
        .cast("long")
        .alias("cents")
    )
    cut = F.lit("2000-01-01").cast("timestamp")
    wk = (
        d.filter(F.col("day") < cut)
        .groupBy("dow")
        .agg(F.avg(F.col("cents").cast("double")).alias("mu"))
    )
    r_expr = F.abs(F.col("cents").cast("double") - F.col("mu"))
    cal = (
        d.filter(F.col("day") < cut)
        .join(F.broadcast(wk), "dow")
        .select(r_expr.alias("r"), "day")
    )
    wrank = Window.orderBy("r", "day")
    ranked = cal.select(
        "r",
        F.row_number().over(wrank).cast("long").alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("ncal"),
    )
    q = (
        ranked.filter(
            F.col("rn") >= F.ceil(0.9 * (F.col("ncal") + 1)).cast("long")
        )
        .groupBy()
        .agg(F.min("r").alias("q90"), F.max("ncal").alias("ncal"))
    )
    test = (
        d.filter(F.col("day") >= cut)
        .join(F.broadcast(wk), "dow")
        .select(r_expr.alias("r"))
    )
    return (
        test.crossJoin(F.broadcast(q))
        .groupBy("ncal", "q90")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            (
                F.floor(
                    F.avg(F.when(F.col("r") <= F.col("q90"), 1.0).otherwise(0.0))
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("empirical_coverage"),
        )
        .select(
            F.col("ncal").alias("n_calibration"),
            "n_test",
            F.floor(F.col("q90") + 0.5).alias("q90_abs_residual_cents"),
            "empirical_coverage",
        )
    )


# ---------------------------------------------------------------------------
# Digit-preference audit of the cents field: last cents digit 0-9 vs
# the uniform expectation (psychological-pricing / fabrication check,
# the digit companion to the registered Benford first/second tests).
# ---------------------------------------------------------------------------
_DIGIT_SQL = """
    WITH c AS (
      SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) % 10 AS digit
      FROM orders
    ),
    h AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY digit
    ),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM h)
    SELECT h.digit, h.n,
           floor(CAST(h.n AS DOUBLE) / t.tot * 1.0e6 + 0.5) / 1.0e6 AS share,
           floor((CAST(h.n AS DOUBLE) - t.tot / 10.0)
                 * (CAST(h.n AS DOUBLE) - t.tot / 10.0)
                 / (t.tot / 10.0) * 1.0e6 + 0.5) / 1.0e6 AS chisq_term
    FROM h, t ORDER BY h.digit
"""


@_register("orders_price_digit_preference", oracle=_DIGIT_SQL)
def orders_price_digit_preference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terminal-digit preference of the cents field: histogram of the
    last cents digit with per-digit chi-square contributions vs
    uniform — the digit-preference screen used in price-fabrication
    and data-entry audits (distinct from Benford: terminal digits of
    honest continuous data should be UNIFORM, not logarithmic). One
    map-side-combinable rollup to 10 rows."""
    o = _t(spark, sf_dir, "orders")
    h = o.select(
        (F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long") % 10).alias(
            "digit"
        )
    ).groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    t = h.agg(F.sum("n").cast("long").alias("tot"))
    nD = F.col("n").cast("double")
    e = F.col("tot") / 10.0
    return (
        h.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            (F.floor(nD / F.col("tot") * 1.0e6 + 0.5) / 1.0e6).alias("share"),
            (F.floor((nD - e) * (nD - e) / e * 1.0e6 + 0.5) / 1.0e6).alias(
                "chisq_term"
            ),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# Per-customer trailing-30-day revenue: a RANGE frame over integer
# epoch days, PARTITIONED BY customer — the fact-scaled rolling window
# done the scale-safe way (per-key state only; never a global sort).
# ---------------------------------------------------------------------------
_TRAIL_SQL = """
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_orderkey,
           CAST(sum(cents) OVER (
             PARTITION BY o_custkey ORDER BY day
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS trailing_30d_cents
    FROM o
"""


@_register("orders_trailing_30d_revenue", oracle=_TRAIL_SQL)
def orders_trailing_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day revenue at every order, per customer: a RANGE
    frame over integer epoch days partitioned by o_custkey — bounded
    per-key window state at any fact scale (the frame is
    value-bounded, so same-day ties contribute identically on both
    engines regardless of intra-day order)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("day"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        F.sum("cents").over(w).cast("long").alias("trailing_30d_cents"),
    )


# ===========================================================================
# Wave G — relational-surface demos (ROLLUP subtotals, PIVOT, exact
# equi-depth histogram on the two-pass operator)
# ===========================================================================

_GSETS_SQL = """
    SELECT CASE WHEN GROUPING(r.r_name) = 1 THEN 'ALL' ELSE r.r_name END
             AS region,
           CASE WHEN GROUPING(date_part('year', o.o_orderdate)) = 1
                THEN 'ALL'
                ELSE CAST(CAST(date_part('year', o.o_orderdate) AS BIGINT)
                          AS VARCHAR) END AS yr,
           CAST(GROUPING(r.r_name) * 2
                + GROUPING(date_part('year', o.o_orderdate)) AS BIGINT)
             AS grouping_level,
           CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, date_part('year', o.o_orderdate))
    ORDER BY grouping_level, region, yr
"""


@_register("orders_revenue_grouping_sets", oracle=_GSETS_SQL)
def orders_revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals in one pass: revenue by (region, year), by
    region, and grand total, with the grouping level exposed — the
    relational subtotal surface (Catalyst expands the rollup into one
    Expand + a single aggregate; the region/nation/customer dims all
    broadcast)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    base = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(
            F.col("r_name").alias("rname"),
            F.year("o_orderdate").cast("long").alias("yrnum"),
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
    )
    g = base.rollup("rname", "yrnum").agg(
        F.sum("cents").cast("long").alias("revenue_cents"),
        (F.grouping("rname") * 2 + F.grouping("yrnum"))
        .cast("long")
        .alias("grouping_level"),
    )
    return g.select(
        F.when(F.col("grouping_level") >= 2, F.lit("ALL"))
        .otherwise(F.col("rname"))
        .alias("region"),
        F.when(F.col("grouping_level") % 2 == 1, F.lit("ALL"))
        .otherwise(F.col("yrnum").cast("string"))
        .alias("yr"),
        "grouping_level",
        "revenue_cents",
    ).orderBy("grouping_level", "region", "yr")


_PIVOT_SQL = """
    SELECT o_orderpriority AS priority,
           CAST(sum(CASE WHEN date_part('year', o_orderdate) = 1995 THEN 1 ELSE 0 END) AS BIGINT) AS y1995,
           CAST(sum(CASE WHEN date_part('year', o_orderdate) = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS y1996,
           CAST(sum(CASE WHEN date_part('year', o_orderdate) = 1997 THEN 1 ELSE 0 END) AS BIGINT) AS y1997,
           CAST(sum(CASE WHEN date_part('year', o_orderdate) = 1998 THEN 1 ELSE 0 END) AS BIGINT) AS y1998,
           CAST(sum(CASE WHEN date_part('year', o_orderdate) = 1999 THEN 1 ELSE 0 END) AS BIGINT) AS y1999,
           CAST(sum(CASE WHEN date_part('year', o_orderdate) = 2000 THEN 1 ELSE 0 END) AS BIGINT) AS y2000,
           CAST(sum(CASE WHEN date_part('year', o_orderdate) = 2001 THEN 1 ELSE 0 END) AS BIGINT) AS y2001
    FROM orders GROUP BY o_orderpriority ORDER BY priority
"""


@_register("orders_priority_year_pivot", oracle=_PIVOT_SQL)
def orders_priority_year_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority x year order-count crosstab through the REAL
    DataFrame.pivot surface with an explicit value list (no
    distinct-scan job; Catalyst compiles it to the same single-pass
    conditional aggregate the oracle spells out)."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").alias("yrnum"),
    )
    years = [1995, 1996, 1997, 1998, 1999, 2000, 2001]
    p = (
        o.groupBy("priority")
        .pivot("yrnum", years)
        .agg(F.count(F.lit(1)).cast("long"))
    )
    out = p.select(
        "priority",
        *[
            F.coalesce(F.col(str(y)).cast("long"), F.lit(0)).alias(f"y{y}")
            for y in years
        ],
    )
    return out.orderBy("priority")


_EQUIDEPTH_SQL = """
    WITH v AS (
      SELECT event_id,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    t AS (
      SELECT cents,
             CAST(ntile(10) OVER (ORDER BY cents, event_id) AS BIGINT)
               AS tile
      FROM v
    )
    SELECT tile, CAST(count(*) AS BIGINT) AS n,
           CAST(min(cents) AS BIGINT) AS lo_cents,
           CAST(max(cents) AS BIGINT) AS hi_cents
    FROM t GROUP BY tile ORDER BY tile
"""


@_register("events_equi_depth_value_histogram", oracle=_EQUIDEPTH_SQL)
def events_equi_depth_value_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact 10-bin equi-depth histogram of event values (bin
    boundaries + counts) — the optimizer-statistics primitive, built
    on ntile_two_pass so the global ordering never runs in one task
    (bit-identical to the engine ntile builtin)."""
    from cioos_siooc_data_transform_spark.operators.windows import (
        ntile_two_pass,
    )

    v = _t(spark, sf_dir, "events").select(
        "event_id",
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    t = ntile_two_pass(v, "cents", "event_id", 10, out_col="tile")
    return (
        t.groupBy(F.col("tile").cast("long").alias("tile"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("cents").cast("long").alias("lo_cents"),
            F.max("cents").cast("long").alias("hi_cents"),
        )
        .orderBy("tile")
    )


# ===========================================================================
# Wave H — data-quality / contract audits
# ===========================================================================

# ---------------------------------------------------------------------------
# Header-vs-detail amount reconciliation: o_totalprice against the
# recomputed lineitem amount sum per order — the financial-close
# integrity check (the key-orphan side lives in
# tpch_referential_integrity_profile; this is the AMOUNT side).
# ---------------------------------------------------------------------------
_RECON_SQL = """
    WITH l AS (
      SELECT l_orderkey,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                 * (1 + l_tax) * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS line_cents
      FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
      SELECT CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
               AS header_cents,
             l.line_cents
      FROM orders o JOIN l ON o.o_orderkey = l.l_orderkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN header_cents = line_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_exact_match,
           CAST(sum(CASE WHEN abs(header_cents - line_cents) > 100
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_off_by_over_1usd,
           CAST(max(abs(header_cents - line_cents)) AS BIGINT)
             AS max_abs_diff_cents
    FROM j
"""


@_register("orders_amount_reconciliation_audit", oracle=_RECON_SQL)
def orders_amount_reconciliation_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Header-vs-detail reconciliation: o_totalprice compared to the
    per-order sum of l_extendedprice*(1-disc)*(1+tax) in exact cents —
    match rate, big-mismatch count, and worst absolute gap. One
    co-keyed join of two rollups (both shuffle on orderkey once)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    amt = F.floor(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
        * 100.0
        + 0.5
    ).cast("long")
    l = li.groupBy("l_orderkey").agg(
        F.sum(amt).cast("long").alias("line_cents")
    )
    j = o.join(l, o["o_orderkey"] == l["l_orderkey"]).select(
        F.floor(F.col("o_totalprice") * 100.0 + 0.5)
        .cast("long")
        .alias("header_cents"),
        "line_cents",
    )
    diff = F.abs(F.col("header_cents") - F.col("line_cents"))
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(F.col("header_cents") == F.col("line_cents"), 1).otherwise(0))
        .cast("long")
        .alias("n_exact_match"),
        F.sum(F.when(diff > 100, 1).otherwise(0))
        .cast("long")
        .alias("n_off_by_over_1usd"),
        F.max(diff).cast("long").alias("max_abs_diff_cents"),
    )


# ---------------------------------------------------------------------------
# Line-position bias: per l_linenumber, count and mean qty/price — the
# positional-bias screen (ETL that truncates or reorders lines shows
# up as a broken count staircase or position-correlated values).
# ---------------------------------------------------------------------------
_LINENO_SQL = """
    SELECT l_linenumber AS linenumber,
           CAST(count(*) AS BIGINT) AS n,
           floor(avg(l_quantity) * 1.0e6 + 0.5) / 1.0e6 AS avg_qty,
           floor(avg(l_extendedprice) * 1.0e4 + 0.5) / 1.0e4 AS avg_price
    FROM lineitem GROUP BY l_linenumber ORDER BY linenumber
"""


@_register("lineitem_linenumber_bias_profile", oracle=_LINENO_SQL)
def lineitem_linenumber_bias_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Positional-bias profile by l_linenumber (counts must form a
    non-increasing staircase; value means should be position-flat) —
    one bounded rollup over the 1..7 position alphabet."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_linenumber").alias("linenumber"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.floor(F.avg("l_quantity") * 1.0e6 + 0.5) / 1.0e6).alias(
                "avg_qty"
            ),
            (F.floor(F.avg("l_extendedprice") * 1.0e4 + 0.5) / 1.0e4).alias(
                "avg_price"
            ),
        )
        .orderBy("linenumber")
    )


_FANOUT_SQL = """
    WITH f AS (
      SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY l_orderkey
    ),
    h AS (
      SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders
      FROM f GROUP BY n_lines
    ),
    t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS tot FROM h)
    SELECT h.n_lines, h.n_orders,
           floor(CAST(h.n_orders AS DOUBLE) / t.tot * 1.0e6 + 0.5) / 1.0e6
             AS share,
           CASE WHEN h.n_lines BETWEEN 1 AND 7 THEN 0 ELSE 1 END
             AS out_of_spec
    FROM h, t ORDER BY h.n_lines
"""


@_register("lineitem_order_fanout_histogram", oracle=_FANOUT_SQL)
def lineitem_order_fanout_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Lines-per-order fanout histogram with the TPC-H 1..7 spec flag —
    the join-cardinality contract a denormalizing pipeline checks
    before assuming bounded fanout. Two nested map-side-combinable
    rollups."""
    li = _t(spark, sf_dir, "lineitem")
    f = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines")
    )
    h = f.groupBy("n_lines").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    t = h.agg(F.sum("n_orders").cast("long").alias("tot"))
    return (
        h.crossJoin(F.broadcast(t))
        .select(
            "n_lines",
            "n_orders",
            (
                F.floor(
                    F.col("n_orders").cast("double") / F.col("tot") * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("share"),
            F.when(F.col("n_lines").between(1, 7), 0).otherwise(1).alias(
                "out_of_spec"
            ),
        )
        .orderBy("n_lines")
    )


_SAMEDAY_SQL = """
    WITH cd AS (
      SELECT o_custkey, CAST(date_trunc('day', o_orderdate) AS TIMESTAMP)
               AS day,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1, 2
    )
    SELECT n_orders AS orders_that_day,
           CAST(count(*) AS BIGINT) AS n_customer_days
    FROM cd GROUP BY n_orders ORDER BY orders_that_day
"""


@_register("orders_same_day_multiorder_profile", oracle=_SAMEDAY_SQL)
def orders_same_day_multiorder_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Same-customer same-day multi-order histogram — the
    duplicate-submission screen (a spike at 2+ flags double-fired
    order feeds). Two rollups, both shuffling on the (customer, day)
    composite then the tiny count key."""
    o = _t(spark, sf_dir, "orders")
    cd = o.groupBy(
        "o_custkey", F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    return (
        cd.groupBy(F.col("n_orders").alias("orders_that_day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_customer_days"))
        .orderBy("orders_that_day")
    )


_KEYGAP_SQL = """
    WITH s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(min(o_orderkey) AS BIGINT) AS kmin,
             CAST(max(o_orderkey) AS BIGINT) AS kmax
      FROM orders
    ),
    m AS (
      SELECT CAST(o_orderkey % 8 AS BIGINT) AS residue,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1
    )
    SELECT m.residue, m.cnt,
           floor(CAST(m.cnt AS DOUBLE) / s.n * 1.0e6 + 0.5) / 1.0e6
             AS share,
           s.n AS n_keys,
           floor(CAST(s.n AS DOUBLE) / (s.kmax - s.kmin + 1) * 1.0e6 + 0.5)
             / 1.0e6 AS keyspace_density
    FROM m, s ORDER BY m.residue
"""


@_register("orders_orderkey_gap_profile", oracle=_KEYGAP_SQL)
def orders_orderkey_gap_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-space density + mod-8 residue histogram of o_orderkey (the
    TPC-H generator uses only 2 of every 8 key values; a dense or
    residue-skewed key space means the data didn't come from the
    claimed generator — and residue skew breaks mod-N sharding). No
    global sort: density is count over span, residues one rollup."""
    o = _t(spark, sf_dir, "orders")
    s = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("o_orderkey").cast("long").alias("kmin"),
        F.max("o_orderkey").cast("long").alias("kmax"),
    )
    m = o.groupBy((F.col("o_orderkey") % 8).cast("long").alias("residue")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    return (
        m.crossJoin(F.broadcast(s))
        .select(
            "residue",
            "cnt",
            (
                F.floor(F.col("cnt").cast("double") / F.col("n") * 1.0e6 + 0.5)
                / 1.0e6
            ).alias("share"),
            F.col("n").alias("n_keys"),
            (
                F.floor(
                    F.col("n").cast("double")
                    / (F.col("kmax") - F.col("kmin") + 1)
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("keyspace_density"),
        )
        .orderBy("residue")
    )


_BRANDTYPE_SQL = """
    WITH cell AS (
      SELECT p_brand, p_type, CAST(count(*) AS BIGINT) AS n
      FROM part GROUP BY 1, 2
    ),
    d AS (
      SELECT CAST(count(DISTINCT p_brand) AS BIGINT) AS n_brands,
             CAST(count(DISTINCT p_type) AS BIGINT) AS n_types
      FROM part
    )
    SELECT d.n_brands, d.n_types,
           CAST(count(*) AS BIGINT) AS n_populated_cells,
           CAST(d.n_brands * d.n_types - count(*) AS BIGINT)
             AS n_missing_cells,
           floor(CAST(count(*) AS DOUBLE) / (d.n_brands * d.n_types)
                 * 1.0e6 + 0.5) / 1.0e6 AS coverage,
           CAST(max(cell.n) AS BIGINT) AS max_cell,
           CAST(min(cell.n) AS BIGINT) AS min_populated_cell
    FROM cell, d GROUP BY d.n_brands, d.n_types
"""


@_register("part_brand_type_coverage", oracle=_BRANDTYPE_SQL)
def part_brand_type_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand x type catalog-coverage audit: populated cells vs the
    full cross product, plus cell-size extremes — the assortment
    completeness check before any per-cell model is trained. Bounded
    alphabets (~25 brands x ~150 types)."""
    p = _t(spark, sf_dir, "part")
    cell = p.groupBy("p_brand", "p_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    d = p.agg(
        F.countDistinct("p_brand").cast("long").alias("n_brands"),
        F.countDistinct("p_type").cast("long").alias("n_types"),
    )
    return (
        cell.crossJoin(F.broadcast(d))
        .groupBy("n_brands", "n_types")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_populated_cells"),
            F.max("n").cast("long").alias("max_cell"),
            F.min("n").cast("long").alias("min_populated_cell"),
        )
        .select(
            "n_brands",
            "n_types",
            "n_populated_cells",
            (F.col("n_brands") * F.col("n_types") - F.col("n_populated_cells"))
            .cast("long")
            .alias("n_missing_cells"),
            (
                F.floor(
                    F.col("n_populated_cells").cast("double")
                    / (F.col("n_brands") * F.col("n_types"))
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("coverage"),
            "max_cell",
            "min_populated_cell",
        )
    )


# ---------------------------------------------------------------------------
# Sub-cent billing residue: does extprice*(1-disc)*(1+tax) land on
# whole cents? Bucket the first sub-cent decimal of the computed
# amount — billing engines must agree on the rounding rule BEFORE
# invoices go out, and this measures how much rounding is happening.
# ---------------------------------------------------------------------------
_ROUNDING_SQL = """
    WITH a AS (
      SELECT l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100.0
               AS amt_cents
      FROM lineitem
    ),
    b AS (
      SELECT CAST(floor((amt_cents - floor(amt_cents)) * 10.0) AS BIGINT)
               AS subcent_decile
      FROM a
    ),
    h AS (
      SELECT subcent_decile, CAST(count(*) AS BIGINT) AS n
      FROM b GROUP BY subcent_decile
    ),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM h)
    SELECT h.subcent_decile, h.n,
           floor(CAST(h.n AS DOUBLE) / t.tot * 1.0e6 + 0.5) / 1.0e6 AS share
    FROM h, t ORDER BY h.subcent_decile
"""


@_register("lineitem_amount_rounding_audit", oracle=_ROUNDING_SQL)
def lineitem_amount_rounding_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sub-cent residue histogram of the computed line amount (the
    invoice-rounding exposure audit: a uniform residue means ~half a
    cent of rounding per line is being decided by the billing rule).
    The amount expression is written in the identical literal order on
    both engines, so the IEEE doubles agree bit-for-bit."""
    li = _t(spark, sf_dir, "lineitem")
    amt = (
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
        * 100.0
    )
    b = li.select(
        F.floor((amt - F.floor(amt)) * 10.0).cast("long").alias("subcent_decile")
    )
    h = b.groupBy("subcent_decile").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t = h.agg(F.sum("n").cast("long").alias("tot"))
    return (
        h.crossJoin(F.broadcast(t))
        .select(
            "subcent_decile",
            "n",
            (
                F.floor(F.col("n").cast("double") / F.col("tot") * 1.0e6 + 0.5)
                / 1.0e6
            ).alias("share"),
        )
        .orderBy("subcent_decile")
    )


# ===========================================================================
# Wave I — LLM-pipeline operators
# ===========================================================================

# ---------------------------------------------------------------------------
# Selection-bias audit of exact dedup: keep-min-doc_id per md5 group,
# then kept/dropped counts per length bucket — dedup that silently
# drops one length class shifts the training distribution.
# ---------------------------------------------------------------------------
_SURVIVOR_SQL = """
    WITH g AS (
      SELECT doc_id, n_chars,
             md5(text) AS h,
             min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
      FROM documents
    ),
    b AS (
      SELECT CAST(n_chars // 200 AS BIGINT) AS len_bucket,
             CASE WHEN doc_id = keeper THEN 1 ELSE 0 END AS kept
      FROM g
    )
    SELECT len_bucket,
           CAST(sum(kept) AS BIGINT) AS n_kept,
           CAST(sum(1 - kept) AS BIGINT) AS n_dropped,
           floor(CAST(sum(1 - kept) AS DOUBLE) / count(*) * 1.0e6 + 0.5)
             / 1.0e6 AS drop_share
    FROM b GROUP BY len_bucket ORDER BY len_bucket
"""


@_register("docs_dedup_survivor_length_bias", oracle=_SURVIVOR_SQL)
def docs_dedup_survivor_length_bias(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Length-bucket survival rates under exact dedup (keeper =
    min doc_id per md5 group): dedup that disproportionately drops one
    length class shifts the corpus distribution, which is exactly what
    a pipeline owner checks before shipping the deduped snapshot. The
    keeper window is partitioned by digest (bounded duplicate groups,
    the registered dedup_exact shape)."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text"))
    g = docs.select(
        "doc_id",
        "n_chars",
        F.min("doc_id").over(w).alias("keeper"),
    )
    b = g.select(
        F.floor(F.col("n_chars") / 200).cast("long").alias("len_bucket"),
        F.when(F.col("doc_id") == F.col("keeper"), 1).otherwise(0).alias("kept"),
    )
    return (
        b.groupBy("len_bucket")
        .agg(
            F.sum("kept").cast("long").alias("n_kept"),
            F.sum(1 - F.col("kept")).cast("long").alias("n_dropped"),
            (
                F.floor(
                    F.sum(1 - F.col("kept")).cast("double")
                    / F.count(F.lit(1))
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("drop_share"),
        )
        .orderBy("len_bucket")
    )


# ---------------------------------------------------------------------------
# Temperature-scaled source mixing: sampling weights w_s ∝ n_s^alpha
# for the standard alpha ladder — THE multilingual/multi-source rebalance
# rule (alpha=1 is proportional, alpha->0 uniform).
# ---------------------------------------------------------------------------
_TEMPMIX_SQL = """
    WITH n AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    -- alpha must leave as DOUBLE: the bare list literal types it
    -- DECIMAL(2,1), a banned driver-canon result type (type lint)
    a AS (SELECT CAST(unnest([0.3, 0.5, 0.7, 1.0]) AS DOUBLE) AS alpha),
    p AS (
      SELECT a.alpha, n.source, n.n_docs,
             pow(CAST(n.n_docs AS DOUBLE), a.alpha) AS raw
      FROM n, a
    ),
    z AS (
      SELECT alpha, CAST(sum(raw) AS DOUBLE) AS zsum,
             CAST(sum(n_docs) AS BIGINT) AS tot
      FROM p GROUP BY alpha
    )
    SELECT p.alpha, p.source, p.n_docs,
           floor(p.raw / z.zsum * 1.0e6 + 0.5) / 1.0e6 AS weight,
           floor((p.raw / z.zsum) * z.tot / p.n_docs * 1.0e6 + 0.5) / 1.0e6
             AS epochs_at_budget
    FROM p JOIN z USING (alpha) ORDER BY p.alpha, p.source
"""


@_register("source_temperature_sampling_mix", oracle=_TEMPMIX_SQL)
def source_temperature_sampling_mix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-scaled sampling mix over sources: weights
    w_s ∝ n_s^alpha for alpha in {0.3, 0.5, 0.7, 1.0} plus the implied
    per-source epoch multiplier at a one-epoch token budget — the
    standard rebalancing rule for skewed multi-source corpora. The
    source rollup is ~20 rows; the alpha ladder is a 4-row literal
    cross join."""
    docs = _t(spark, sf_dir, "documents")
    n = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    alphas = spark.createDataFrame(
        [(0.3,), (0.5,), (0.7,), (1.0,)], "alpha DOUBLE"
    )
    p = n.crossJoin(F.broadcast(alphas)).select(
        "alpha",
        "source",
        "n_docs",
        F.pow(F.col("n_docs").cast("double"), F.col("alpha")).alias("raw"),
    )
    z = p.groupBy("alpha").agg(
        F.sum("raw").alias("zsum"), F.sum("n_docs").cast("long").alias("tot")
    )
    return (
        p.join(F.broadcast(z), "alpha")
        .select(
            "alpha",
            "source",
            "n_docs",
            (F.floor(F.col("raw") / F.col("zsum") * 1.0e6 + 0.5) / 1.0e6).alias(
                "weight"
            ),
            (
                F.floor(
                    (F.col("raw") / F.col("zsum"))
                    * F.col("tot")
                    / F.col("n_docs")
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("epochs_at_budget"),
        )
        .orderBy("alpha", "source")
    )


# ---------------------------------------------------------------------------
# Code-switching share: each token's majority language comes from the
# corpus-wide token x lang counts (ties to the smallest lang for
# determinism); a doc's off-lang share is the fraction of its tokens
# whose majority lang differs from the doc's label.
# ---------------------------------------------------------------------------
_CODESWITCH_SQL = """
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    tl AS (
      SELECT w, lang, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY w, lang
    ),
    maj AS (
      SELECT w, lang AS major_lang FROM (
        SELECT w, lang,
               row_number() OVER (PARTITION BY w ORDER BY c DESC, lang ASC)
                 AS rn
        FROM tl
      ) WHERE rn = 1
    ),
    per_doc AS (
      SELECT tok.doc_id, tok.lang,
             avg(CASE WHEN maj.major_lang <> tok.lang THEN 1.0 ELSE 0.0 END)
               AS off_share
      FROM tok JOIN maj USING (w)
      GROUP BY tok.doc_id, tok.lang
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           floor(avg(off_share) * 1.0e6 + 0.5) / 1.0e6 AS avg_off_lang_share,
           CAST(sum(CASE WHEN off_share > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_suspect_docs
    FROM per_doc GROUP BY lang ORDER BY lang
"""


@_register("docs_code_switching_share", oracle=_CODESWITCH_SQL)
def docs_code_switching_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-switching / mislabeled-language audit: per doc, the share
    of tokens whose corpus-majority language differs from the doc's
    label; docs over 50% off-lang are suspects. The token->majority
    table is vocabulary-scaled (window partitioned by token, bounded
    by the lang alphabet per token) and joins back by token — never a
    doc x doc comparison."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    )
    tl = tok.groupBy("w", "lang").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wmaj = Window.partitionBy("w").orderBy(F.col("c").desc(), F.col("lang").asc())
    maj = (
        tl.withColumn("rn", F.row_number().over(wmaj))
        .filter(F.col("rn") == 1)
        .select("w", F.col("lang").alias("major_lang"))
    )
    per_doc = (
        tok.join(maj, "w")
        .groupBy("doc_id", "lang")
        .agg(
            F.avg(
                F.when(F.col("major_lang") != F.col("lang"), 1.0).otherwise(0.0)
            ).alias("off_share")
        )
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            (F.floor(F.avg("off_share") * 1.0e6 + 0.5) / 1.0e6).alias(
                "avg_off_lang_share"
            ),
            F.sum(F.when(F.col("off_share") > 0.5, 1).otherwise(0))
            .cast("long")
            .alias("n_suspect_docs"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Symmetric-quantization MSE ladder: global max-abs scale, b-bit grid
# for b in {2,4,8} — the precision-vs-size curve read before choosing
# an embedding storage format (the int8 point has a registered recall
# audit; this is its rate-distortion context).
# ---------------------------------------------------------------------------
_QBITS_SQL = """
    WITH x AS (
      SELECT CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings
    ),
    s AS (SELECT max(abs(v)) AS scale FROM x),
    b AS (SELECT unnest([2, 4, 8]) AS bits),
    q AS (
      SELECT b.bits, x.v, s.scale,
             pow(2.0, b.bits - 1) - 1.0 AS hi
      FROM x, s, b
    ),
    e AS (
      SELECT bits,
             v - (CASE WHEN floor(v / scale * hi + 0.5) > hi THEN hi
                       WHEN floor(v / scale * hi + 0.5) < -hi THEN -hi
                       ELSE floor(v / scale * hi + 0.5) END
                  * scale / hi) AS err
      FROM q
    )
    SELECT CAST(bits AS BIGINT) AS bits,
           CAST(count(*) AS BIGINT) AS n_values,
           floor(avg(err * err) * 1.0e9 + 0.5) / 1.0e9 AS mse
    FROM e GROUP BY bits ORDER BY bits
"""


@_register("embedding_quantization_bits_sweep", oracle=_QBITS_SQL)
def embedding_quantization_bits_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rate-distortion ladder for symmetric embedding quantization:
    reconstruction MSE at 2/4/8 bits with one global max-abs scale
    (clamped round-half-up grid, identical literal arithmetic on both
    engines). posexplode + a 1-row broadcast scale + a 3-row bit
    ladder — all map-side combinable."""
    emb = _t(spark, sf_dir, "embeddings")
    x = emb.select(
        F.explode("embedding").alias("vf")
    ).select(F.col("vf").cast("double").alias("v"))
    s = x.agg(F.max(F.abs(F.col("v"))).alias("scale"))
    bits = spark.createDataFrame([(2,), (4,), (8,)], "bits INT")
    q = x.crossJoin(F.broadcast(s)).crossJoin(F.broadcast(bits))
    hi = F.pow(F.lit(2.0), F.col("bits") - 1) - 1.0
    raw = F.floor(F.col("v") / F.col("scale") * hi + 0.5)
    code = F.when(raw > hi, hi).when(raw < -hi, -hi).otherwise(raw)
    err = F.col("v") - code * F.col("scale") / hi
    return (
        q.select(F.col("bits").cast("long").alias("bits"), err.alias("err"))
        .groupBy("bits")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_values"),
            (F.floor(F.avg(F.col("err") * F.col("err")) * 1.0e9 + 0.5) / 1.0e9)
            .alias("mse"),
        )
        .orderBy("bits")
    )


# ---------------------------------------------------------------------------
# Exact dedup on BINARY payloads (the multimodal twin of dedup_exact):
# md5 over the payload bytes, dedup ratio + storage saved.
# ---------------------------------------------------------------------------
_PAYLOADDEDUP_SQL = """
    WITH g AS (
      SELECT md5(text) AS h,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(min(strlen(text)) AS BIGINT) AS nbytes
      FROM documents GROUP BY md5(text)
    )
    SELECT CAST(sum(cnt) AS BIGINT) AS n_payloads,
           CAST(count(*) AS BIGINT) AS n_unique,
           CAST(sum(cnt) - count(*) AS BIGINT) AS n_duplicates,
           CAST(sum((cnt - 1) * nbytes) AS BIGINT) AS bytes_saved
    FROM g
"""


@_register("multimodal_payload_exact_dedup", oracle=_PAYLOADDEDUP_SQL)
def multimodal_payload_exact_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact dedup over BINARY media payloads: md5 of the payload
    bytes (via the attach_binary_payload media table, so the digest
    runs on the binary column, not a string), reporting dedup ratio
    and bytes reclaimed — the first pass of any multimodal ingest.
    Digest group-by only; never pairwise."""
    from cioos_siooc_data_transform_spark.operators.multimodal import (
        attach_binary_payload,
    )

    docs = _t(spark, sf_dir, "documents")
    media = attach_binary_payload(docs, "doc_id", "text", "source")
    g = media.groupBy(F.md5("payload").alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.min(F.length("payload")).cast("long").alias("nbytes"),
    )
    return g.agg(
        F.sum("cnt").cast("long").alias("n_payloads"),
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        (F.sum("cnt") - F.count(F.lit(1))).cast("long").alias("n_duplicates"),
        F.sum((F.col("cnt") - 1) * F.col("nbytes"))
        .cast("long")
        .alias("bytes_saved"),
    )


# ---------------------------------------------------------------------------
# Histogram-overlap coefficient between click and purchase values:
# sum over 20 fixed bins of min(p, q) — the [0,1] similarity of two
# usage distributions (1 = identical mix).
# ---------------------------------------------------------------------------
_OVERLAP_SQL = """
    WITH b AS (
      SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS nc,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS np
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1
    ),
    t AS (
      SELECT CAST(sum(nc) AS BIGINT) AS tc, CAST(sum(np) AS BIGINT) AS tp
      FROM b
    )
    SELECT t.tc AS n_click, t.tp AS n_purchase,
           floor(sum(least(CAST(b.nc AS DOUBLE) / t.tc,
                           CAST(b.np AS DOUBLE) / t.tp))
                 * 1.0e6 + 0.5) / 1.0e6 AS overlap_coefficient
    FROM b, t GROUP BY t.tc, t.tp
"""


@_register("events_value_overlap_coefficient", oracle=_OVERLAP_SQL)
def events_value_overlap_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Histogram-overlap coefficient (Σ min(p_i, q_i) over 20 fixed
    value bins) between click and purchase values — the plain-language
    distribution-similarity number product teams read alongside the
    registered KS/JSD drift stats. One conditional rollup to ≤20
    bins."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    b = ev.groupBy(
        F.floor(F.col("value") / 25.0).cast("long").alias("bin")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("nc"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("np"),
    )
    t = b.agg(
        F.sum("nc").cast("long").alias("tc"),
        F.sum("np").cast("long").alias("tp"),
    )
    return (
        b.crossJoin(F.broadcast(t))
        .groupBy("tc", "tp")
        .agg(
            (
                F.floor(
                    F.sum(
                        F.least(
                            F.col("nc").cast("double") / F.col("tc"),
                            F.col("np").cast("double") / F.col("tp"),
                        )
                    )
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("overlap_coefficient")
        )
        .select(
            F.col("tc").alias("n_click"),
            F.col("tp").alias("n_purchase"),
            "overlap_coefficient",
        )
    )


# ---------------------------------------------------------------------------
# Packing overhead vs the LP lower bound: greedy no-split bins per
# source vs ceil(total_tokens / capacity) — how much of the bin count
# is packing-rule overhead rather than volume.
# ---------------------------------------------------------------------------
_PACKLB_SQL = """
    WITH RECURSIVE d AS (
      SELECT source, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
      WHERE len(string_split(text, ' ')) > 0
    ),
    s AS (
      SELECT source, doc_id, tokens, rn,
             CAST(1 AS BIGINT) AS bin_id, tokens AS fill
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.source, d.doc_id, d.tokens, d.rn,
             CASE WHEN s.fill + d.tokens > 512
                  THEN s.bin_id + 1 ELSE s.bin_id END,
             CASE WHEN s.fill + d.tokens > 512
                  THEN d.tokens ELSE s.fill + d.tokens END
      FROM d JOIN s ON d.source = s.source AND d.rn = s.rn + 1
    ),
    per_source AS (
      SELECT source,
             CAST(max(bin_id) AS BIGINT) AS n_bins,
             CAST(sum(tokens) AS BIGINT) AS total_tokens
      FROM s GROUP BY source
    )
    SELECT source, n_bins, total_tokens,
           CAST(ceil(CAST(total_tokens AS DOUBLE) / 512.0) AS BIGINT)
             AS lb_bins,
           CAST(n_bins * 512 - total_tokens AS BIGINT) AS waste_tokens,
           floor(CAST(n_bins AS DOUBLE)
                 / ceil(CAST(total_tokens AS DOUBLE) / 512.0)
                 * 1.0e6 + 0.5) / 1.0e6 AS overhead_ratio
    FROM per_source ORDER BY source
"""


@_register("pack_waste_vs_lower_bound", oracle=_PACKLB_SQL)
def pack_waste_vs_lower_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy no-split packing overhead against the LP lower bound
    ceil(tokens/capacity), per source at capacity 512 — how many of
    the bins are the no-split rule's fault vs sheer volume (the number
    that justifies moving to a splitting packer). Reuses the
    registered pack_greedy_nosplit operator verbatim."""
    from cioos_siooc_data_transform_spark.operators.packing import (
        pack_greedy_nosplit,
    )

    docs = _t(spark, sf_dir, "documents")
    per_source = (
        pack_greedy_nosplit(docs, 512)
        .groupBy("source")
        .agg(
            F.max("bin_id").cast("long").alias("n_bins"),
            F.sum("tokens").cast("long").alias("total_tokens"),
        )
    )
    lb = F.ceil(F.col("total_tokens").cast("double") / 512.0).cast("long")
    return per_source.select(
        "source",
        "n_bins",
        "total_tokens",
        lb.alias("lb_bins"),
        (F.col("n_bins") * 512 - F.col("total_tokens"))
        .cast("long")
        .alias("waste_tokens"),
        (
            F.floor(F.col("n_bins").cast("double") / lb * 1.0e6 + 0.5) / 1.0e6
        ).alias("overhead_ratio"),
    ).orderBy("source")


# ===========================================================================
# Wave J — event-stream health
# ===========================================================================

# ---------------------------------------------------------------------------
# Zero-activity windows: the calendar minute grid (bounded by the data
# time span, NOT the fact count) anti-joined against active minutes,
# runs-of-missing found by the index-minus-rank islands trick.
# ---------------------------------------------------------------------------
_IDLE_SQL = """
    WITH span AS (
      SELECT CAST(min(epoch_us(ts) // 60000000) AS BIGINT) AS m0,
             CAST(max(epoch_us(ts) // 60000000) AS BIGINT) AS m1
      FROM events
    ),
    grid AS (
      SELECT unnest(generate_series(m0, m1)) AS minute FROM span
    ),
    active AS (
      SELECT DISTINCT CAST(epoch_us(ts) // 60000000 AS BIGINT) AS minute
      FROM events
    ),
    missing AS (
      SELECT g.minute,
             g.minute - row_number() OVER (ORDER BY g.minute) AS island
      FROM grid g LEFT JOIN active a ON g.minute = a.minute
      WHERE a.minute IS NULL
    ),
    runs AS (
      SELECT island, CAST(count(*) AS BIGINT) AS run_len
      FROM missing GROUP BY island
    )
    SELECT CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(coalesce(max(run_len), 0) AS BIGINT) AS longest_gap_min,
           CAST(coalesce(sum(run_len), 0) AS BIGINT) AS total_idle_min
    FROM runs
"""


@_register("events_zero_activity_windows", oracle=_IDLE_SQL)
def events_zero_activity_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-outage detection: minutes with ZERO events, grouped into
    contiguous runs (count / longest / total) via the islands trick.
    The grid is the calendar minute axis — bounded by the time span
    regardless of fact scale — so the one global rank runs over at
    most |span| rows (EXPECTED_BOUNDED entry)."""
    ev = _t(spark, sf_dir, "events")
    span = ev.agg(
        F.expr("min(unix_micros(ts) div 60000000)").cast("long").alias("m0"),
        F.expr("max(unix_micros(ts) div 60000000)").cast("long").alias("m1"),
    )
    grid = span.select(
        F.explode(F.sequence(F.col("m0"), F.col("m1"))).alias("minute")
    )
    active = ev.select(
        F.expr("unix_micros(ts) div 60000000").cast("long").alias("minute")
    ).distinct()
    missing = grid.join(active, "minute", "left_anti")
    w = Window.orderBy("minute")
    runs = (
        missing.select(
            "minute",
            (F.col("minute") - F.row_number().over(w)).alias("island"),
        )
        .groupBy("island")
        .agg(F.count(F.lit(1)).cast("long").alias("run_len"))
    )
    return runs.agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.coalesce(F.max("run_len"), F.lit(0)).cast("long").alias(
            "longest_gap_min"
        ),
        F.coalesce(F.sum("run_len"), F.lit(0)).cast("long").alias(
            "total_idle_min"
        ),
    )


# ---------------------------------------------------------------------------
# Bot-rate heuristic: per-user peak event count inside any trailing
# 60-second window (RANGE frame per user) — superhuman burst = bot.
# ---------------------------------------------------------------------------
_BOT_SQL = """
    WITH e AS (
      SELECT user_id, CAST(epoch_us(ts) // 1000000 AS BIGINT) AS sec
      FROM events
    ),
    b AS (
      SELECT user_id,
             CAST(count(*) OVER (
               PARTITION BY user_id ORDER BY sec
               RANGE BETWEEN 60 PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS burst
      FROM e
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(burst) AS BIGINT) AS max_burst_60s,
           CASE WHEN max(burst) >= 5 THEN 1 ELSE 0 END AS flagged
    FROM b GROUP BY user_id ORDER BY user_id
"""


@_register("events_bot_rate_heuristic", oracle=_BOT_SQL)
def events_bot_rate_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user peak 60-second burst (trailing RANGE frame over epoch
    seconds, PARTITIONED BY user — bounded per-key state at any fact
    scale) with a superhuman-rate flag — the first-pass bot screen a
    training pipeline applies to behavioral logs. The frame is
    value-bounded so same-second ties agree across engines."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_micros(ts) div 1000000").alias("sec")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-60, Window.currentRow)
    )
    b = ev.select(
        "user_id", F.count(F.lit(1)).over(w).cast("long").alias("burst")
    )
    return (
        b.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max("burst").cast("long").alias("max_burst_60s"),
            F.when(F.max("burst") >= 5, 1).otherwise(0).alias("flagged"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Streaming-dedup state sizing: for watermark windows of 10/30/60
# minutes, the (key, window-bucket) state cardinality and the dedup
# survival ratio — the capacity-planning sweep behind the registered
# bounded-state streaming dedup's watermark choice.
# ---------------------------------------------------------------------------
_STATESWEEP_SQL = """
    WITH w AS (SELECT unnest([10, 30, 60]) AS win_min),
    k AS (
      SELECT w.win_min, e.user_id, e.event_type,
             CAST(epoch_us(e.ts) // (CAST(w.win_min AS BIGINT) * 60000000)
                  AS BIGINT) AS bucket
      FROM events e, w
    ),
    s AS (
      SELECT win_min,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT (user_id, event_type, bucket)) AS BIGINT)
               AS n_state_entries
      FROM k GROUP BY win_min
    )
    SELECT CAST(win_min AS BIGINT) AS win_min, n_events, n_state_entries,
           floor((1.0 - CAST(n_state_entries AS DOUBLE) / n_events)
                 * 1.0e6 + 0.5) / 1.0e6 AS dedup_ratio
    FROM s ORDER BY win_min
"""


@_register("streaming_dedup_state_sweep", oracle=_STATESWEEP_SQL)
def streaming_dedup_state_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-window sweep for the bounded-state streaming dedup:
    distinct (user, type, window) state cardinality and dedup survival
    ratio at 10/30/60-minute windows — the state-size forecast that
    prices a watermark before the stream runs. One distinct-aggregate
    per window constant (3-row ladder), all map-side combinable."""
    ev = _t(spark, sf_dir, "events")
    wins = spark.createDataFrame([(10,), (30,), (60,)], "win_min INT")
    k = ev.crossJoin(F.broadcast(wins)).select(
        "win_min",
        "user_id",
        "event_type",
        (
            F.expr("unix_micros(ts)")
            / (F.col("win_min").cast("long") * 60000000)
        )
        .cast("long")
        .alias("bucket"),
    )
    s = k.groupBy("win_min").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id", "event_type", "bucket")
        .cast("long")
        .alias("n_state_entries"),
    )
    return s.select(
        F.col("win_min").cast("long").alias("win_min"),
        "n_events",
        "n_state_entries",
        (
            F.floor(
                (
                    1.0
                    - F.col("n_state_entries").cast("double")
                    / F.col("n_events")
                )
                * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("dedup_ratio"),
    ).orderBy("win_min")


# ===========================================================================
# Wave K — embedding-index audits
# ===========================================================================

# ---------------------------------------------------------------------------
# Metric choice audit: top-20 by cosine vs top-20 by Euclidean for 3
# probes — on UNNORMALIZED vectors the two disagree, and this measures
# by how much (overlap@20). Metrics round to 4dp before ranking (the
# established float-stability idiom), ids break ties.
# ---------------------------------------------------------------------------
_METRIC_AGREE_SQL = """
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id IN (1, 2, 3)
    ),
    c AS (
      SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings
    ),
    scored AS (
      SELECT q.query_id, c.neighbor_id,
             round(list_cosine_similarity(q.qv, c.cv), 4) AS cos_sim,
             round(list_distance(q.qv, c.cv), 4) AS l2_dist
      FROM q, c WHERE q.query_id <> c.neighbor_id
    ),
    rc AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id ASC)
               AS r_cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY l2_dist ASC, neighbor_id ASC)
               AS r_l2
      FROM scored
    )
    SELECT query_id,
           CAST(sum(CASE WHEN r_cos <= 20 AND r_l2 <= 20 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_common,
           floor(sum(CASE WHEN r_cos <= 20 AND r_l2 <= 20 THEN 1.0
                     ELSE 0.0 END) / 20.0 * 1.0e6 + 0.5) / 1.0e6
             AS overlap_at_20
    FROM rc GROUP BY query_id ORDER BY query_id
"""


@_register("similarity_metric_rank_agreement", oracle=_METRIC_AGREE_SQL)
def similarity_metric_rank_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Overlap@20 between cosine and Euclidean top-k for 3 probe
    vectors — the metric-choice audit run before building an index on
    unnormalized embeddings (agreement 1.0 would mean the metric
    doesn't matter; low overlap means normalize-or-choose). The 3-row
    probe side broadcasts and streams the corpus once; both rankings
    ride the same probe-partitioned window (the registered brute-force
    top-k shape)."""
    from cioos_siooc_data_transform_spark.operators.similarity import (
        cosine_expr,
        dot_expr,
    )

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id").isin(1, 2, 3)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    diff = F.zip_with(
        F.col("qv"),
        F.col("cv"),
        lambda x, y: x.cast("double") - y.cast("double"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("cv")), 4).alias("cos_sim"),
            F.round(F.sqrt(dot_expr(diff, diff)), 4).alias("l2_dist"),
        )
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    wl = Window.partitionBy("query_id").orderBy(
        F.col("l2_dist").asc(), F.col("neighbor_id").asc()
    )
    rc = scored.select(
        "query_id",
        F.row_number().over(wc).alias("r_cos"),
        F.row_number().over(wl).alias("r_l2"),
    )
    both = F.when((F.col("r_cos") <= 20) & (F.col("r_l2") <= 20), 1).otherwise(0)
    return (
        rc.groupBy("query_id")
        .agg(
            F.sum(both).cast("long").alias("n_common"),
            (
                F.floor(F.sum(both).cast("double") / 20.0 * 1.0e6 + 0.5) / 1.0e6
            ).alias("overlap_at_20"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Result-set diversity: mean pairwise cosine among each probe's top-10
# — near-1 means the index returns 10 copies of the same thing (the
# MMR/diversity motivation). Pairs are top-10 x top-10 per probe:
# bounded 45 pairs per probe by construction.
# ---------------------------------------------------------------------------
_TOPK_DIVERSITY_SQL = """
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id IN (1, 2, 3)
    ),
    c AS (
      SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings
    ),
    topk AS (
      SELECT query_id, neighbor_id, cv FROM (
        SELECT q.query_id, c.neighbor_id, c.cv,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY round(list_cosine_similarity(q.qv, c.cv), 4) DESC,
                          c.neighbor_id ASC
               ) AS rn
        FROM q, c WHERE q.query_id <> c.neighbor_id
      ) WHERE rn <= 10
    ),
    pairs AS (
      SELECT a.query_id,
             round(list_cosine_similarity(a.cv, b.cv), 4) AS pair_cos
      FROM topk a JOIN topk b
        ON a.query_id = b.query_id AND a.neighbor_id < b.neighbor_id
    )
    SELECT query_id,
           CAST(count(*) AS BIGINT) AS n_pairs,
           floor(avg(pair_cos) * 1.0e6 + 0.5) / 1.0e6 AS mean_pairwise_cos
    FROM pairs GROUP BY query_id ORDER BY query_id
"""


@_register("similarity_topk_diversity_audit", oracle=_TOPK_DIVERSITY_SQL)
def similarity_topk_diversity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mean pairwise cosine inside each probe's top-10 result set —
    the redundancy number motivating MMR-style diversification (1.0 =
    ten near-copies). The pair join is top-10 x top-10 WITHIN a probe:
    45 pairs per probe by construction, never corpus-scaled."""
    from cioos_siooc_data_transform_spark.operators.similarity import (
        cosine_expr,
    )

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id").isin(1, 2, 3)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(cosine_expr(F.col("qv"), F.col("cv")), 4).desc(),
        F.col("neighbor_id").asc(),
    )
    topk = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("query_id", "neighbor_id", "cv")
    )
    a = topk.select(
        "query_id",
        F.col("neighbor_id").alias("na"),
        F.col("cv").alias("va"),
    )
    b = topk.select(
        F.col("query_id").alias("qb"),
        F.col("neighbor_id").alias("nb"),
        F.col("cv").alias("vb"),
    )
    pairs = a.join(
        b, (F.col("query_id") == F.col("qb")) & (F.col("na") < F.col("nb"))
    ).select(
        "query_id",
        F.round(cosine_expr(F.col("va"), F.col("vb")), 4).alias("pair_cos"),
    )
    return (
        pairs.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            (F.floor(F.avg("pair_cos") * 1.0e6 + 0.5) / 1.0e6).alias(
                "mean_pairwise_cos"
            ),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Norm-by-label audit: per-label L2 norm mean/std — label-correlated
# norms are the classic embedding pathology (frequency bias) that
# breaks dot-product retrieval.
# ---------------------------------------------------------------------------
_NORMLABEL_SQL = """
    WITH n AS (
      SELECT label,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * x))) AS nrm
      FROM embeddings
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           floor(avg(nrm) * 1.0e6 + 0.5) / 1.0e6 AS mean_norm,
           floor(sqrt(sum(nrm * nrm) / count(*)
                      - avg(nrm) * avg(nrm)) * 1.0e6 + 0.5) / 1.0e6
             AS std_norm
    FROM n GROUP BY label ORDER BY label
"""


@_register("embedding_norm_by_label_audit", oracle=_NORMLABEL_SQL)
def embedding_norm_by_label_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-label embedding-norm mean/std — the frequency-bias screen
    (labels with systematically larger norms dominate dot-product
    retrieval, the reason indexes normalize first). One JVM-side array
    reduction per row, one bounded rollup."""
    from cioos_siooc_data_transform_spark.operators.similarity import dot_expr

    emb = _t(spark, sf_dir, "embeddings")
    n = emb.select(
        "label", F.sqrt(dot_expr(F.col("embedding"), F.col("embedding"))).alias("nrm")
    )
    return (
        n.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            (F.floor(F.avg("nrm") * 1.0e6 + 0.5) / 1.0e6).alias("mean_norm"),
            (
                F.floor(
                    F.sqrt(
                        F.sum(F.col("nrm") * F.col("nrm")) / F.count(F.lit(1))
                        - F.avg("nrm") * F.avg("nrm")
                    )
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("std_norm"),
        )
        .orderBy("label")
    )


# ===========================================================================
# Wave L — oceanographic QC over the real IOS parse path (reference
# domain: the Argo/GTSPP-style automated profile checks the reference's
# pipeline leaves to humans; cites IDT convert routines only for the
# shared parse surface, sources/ios_format.py carries the anchors).
# Two SELF-AUTHORED sample files (same grammar as the corpus, not
# copied from it): qc-a has a temperature spike, qc-b has a depth
# reversal and reports temperature on the IPTS-68 scale.
# ===========================================================================

SAMPLE_IOS_QC_A = """*2024/02/01 00:00:00.00
*IOS HEADER VERSION 2.0      2016/04/28 2016/06/13

*FILE
    START TIME          : UTC 2024/02/01 00:00:00.000
    TIME INCREMENT      : 0 1 0 0 0  ! (day hr min sec ms)
    NUMBER OF RECORDS   : 6
    DATA DESCRIPTION    : CTD
    PAD                 : -99
    NUMBER OF CHANNELS  : 3

    $TABLE: CHANNELS
    ! No Name                 Units           Minimum  Maximum
    !--- -------------------- --------------- -------- --------
       1 Depth                metres          2.0      12.0
       2 Temperature:Primary  'deg C (ITS90)' 7.0      9.9
       3 Salinity:T0:C0       PSS-78          30.1     30.6
    $END

    $TABLE: CHANNEL DETAIL
    ! No  Pad   Start  Width  Format  Type  Decimal_Places
    !---  ----  -----  -----  ------  ----  --------------
       1  -99   ' '        8  F       ' '     1
       2  -99   ' '        8  F       ' '     4
       3  -99   ' '        8  F       ' '     4
    $END

*LOCATION
    STATION             : QCA
    EVENT NUMBER        : 1
    LATITUDE            :  49  30.00000 N  ! (deg min)
    LONGITUDE           : 123  15.00000 W  ! (deg min)

*END OF HEADER
     2.0  7.0000 30.1000
     4.0  7.1000 30.2000
     6.0  9.9000 30.3000
     8.0  7.3000 30.4000
    10.0  7.4000 30.5000
    12.0  7.5000 30.6000
"""

SAMPLE_IOS_QC_B = """*2024/02/02 00:00:00.00
*IOS HEADER VERSION 2.0      2016/04/28 2016/06/13

*FILE
    START TIME          : UTC 2024/02/02 00:00:00.000
    TIME INCREMENT      : 0 1 0 0 0  ! (day hr min sec ms)
    NUMBER OF RECORDS   : 6
    DATA DESCRIPTION    : CTD
    PAD                 : -99
    NUMBER OF CHANNELS  : 3

    $TABLE: CHANNELS
    ! No Name                 Units           Minimum  Maximum
    !--- -------------------- --------------- -------- --------
       1 Depth                metres          2.0      10.0
       2 Temperature:Primary  'deg C (IPTS68)' 8.0     8.5
       3 Salinity:T0:C0       PSS-78          31.0     31.5
    $END

    $TABLE: CHANNEL DETAIL
    ! No  Pad   Start  Width  Format  Type  Decimal_Places
    !---  ----  -----  -----  ------  ----  --------------
       1  -99   ' '        8  F       ' '     1
       2  -99   ' '        8  F       ' '     4
       3  -99   ' '        8  F       ' '     4
    $END

*LOCATION
    STATION             : QCB
    EVENT NUMBER        : 2
    LATITUDE            :  48  30.00000 N  ! (deg min)
    LONGITUDE           : 124  15.00000 W  ! (deg min)

*END OF HEADER
     2.0  8.0000 31.0000
     4.0  8.1000 31.1000
     6.0  8.2000 31.2000
     5.0  8.3000 31.3000
     8.0  8.4000 31.4000
    10.0  8.5000 31.5000
"""

# Raw measurements transcribed from the two literals above, reused by
# every wave-L oracle so engine and oracle apply the identical QC
# arithmetic to the identical doubles (no hand-computed floats).
_QC_VALUES = """
    (VALUES
      ('qc-a', 0, 2.0, 7.0, 30.1), ('qc-a', 1, 4.0, 7.1, 30.2),
      ('qc-a', 2, 6.0, 9.9, 30.3), ('qc-a', 3, 8.0, 7.3, 30.4),
      ('qc-a', 4, 10.0, 7.4, 30.5), ('qc-a', 5, 12.0, 7.5, 30.6),
      ('qc-b', 0, 2.0, 8.0, 31.0), ('qc-b', 1, 4.0, 8.1, 31.1),
      ('qc-b', 2, 6.0, 8.2, 31.2), ('qc-b', 3, 5.0, 8.3, 31.3),
      ('qc-b', 4, 8.0, 8.4, 31.4), ('qc-b', 5, 10.0, 8.5, 31.5)
    ) AS t(file_id, record_idx, depth, temp, sal)
"""


def _parsed_qc(spark: SparkSession):
    from cioos_siooc_data_transform_spark.plans.ios_queries import _parse_cached

    a = _parse_cached(spark, "qc_a", "memory://qc-a.ctd", SAMPLE_IOS_QC_A)
    b = _parse_cached(spark, "qc_b", "memory://qc-b.ctd", SAMPLE_IOS_QC_B)
    return a.unionByName(b)


def _qc_profile(spark: SparkSession):
    """(file_id, record_idx, depth, temp, sal) through the REAL parse
    path: mapInPandas parse -> masked long format -> pivot by the
    channel catalog's name (never a hardcoded index)."""
    from cioos_siooc_data_transform_spark.sources.ios_source import (
        ios_channels,
        ios_measurements_masked,
    )

    parsed = _parsed_qc(spark)
    meas = ios_measurements_masked(parsed)
    ch = ios_channels(parsed).select(
        "file_id",
        "channel_idx",
        F.split(F.col("name"), ":").getItem(0).alias("base_name"),
    )
    j = meas.join(ch, ["file_id", "channel_idx"])
    return j.groupBy("file_id", "record_idx").agg(
        F.max(F.when(F.col("base_name") == "Depth", F.col("value_num"))).alias(
            "depth"
        ),
        F.max(
            F.when(F.col("base_name") == "Temperature", F.col("value_num"))
        ).alias("temp"),
        F.max(
            F.when(F.col("base_name") == "Salinity", F.col("value_num"))
        ).alias("sal"),
    )


_SPIKE_SQL = f"""
    WITH m AS (SELECT * FROM {_QC_VALUES}),
    s AS (
      SELECT file_id,
             abs(temp - (lag(temp) OVER w + lead(temp) OVER w) / 2.0)
             - abs((lag(temp) OVER w - lead(temp) OVER w) / 2.0) AS score
      FROM m
      WINDOW w AS (PARTITION BY file_id ORDER BY record_idx)
    )
    SELECT file_id,
           CAST(count(score) AS BIGINT) AS n_tested,
           CAST(sum(CASE WHEN score > 2.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_spikes,
           floor(max(score) * 1.0e6 + 0.5) / 1.0e6 AS max_spike_score
    FROM s GROUP BY file_id ORDER BY file_id
"""


@_register("ios_spike_test_qc", oracle=_SPIKE_SQL)
def ios_spike_test_qc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argo/GTSPP spike test (test 9) on the temperature profile:
    score = |v2 - (v1+v3)/2| - |(v1-v3)/2| per interior record, spike
    when score > 2.0 degC — run through the REAL IOS parse path on two
    self-authored casts (qc-a plants one spike). The lag/lead windows
    are partitioned by file — bounded per-cast state at fleet scale."""
    p = _qc_profile(spark)
    w = Window.partitionBy("file_id").orderBy("record_idx")
    s = p.select(
        "file_id",
        (
            F.abs(
                F.col("temp")
                - (F.lag("temp").over(w) + F.lead("temp").over(w)) / 2.0
            )
            - F.abs((F.lag("temp").over(w) - F.lead("temp").over(w)) / 2.0)
        ).alias("score"),
    )
    return (
        s.groupBy("file_id")
        .agg(
            F.count("score").cast("long").alias("n_tested"),
            F.sum(F.when(F.col("score") > 2.0, 1).otherwise(0))
            .cast("long")
            .alias("n_spikes"),
            (F.floor(F.max("score") * 1.0e6 + 0.5) / 1.0e6).alias(
                "max_spike_score"
            ),
        )
        .orderBy("file_id")
    )


_MONO_SQL = f"""
    WITH m AS (SELECT * FROM {_QC_VALUES}),
    d AS (
      SELECT file_id,
             depth - lag(depth) OVER (PARTITION BY file_id
                                      ORDER BY record_idx) AS step
      FROM m
    )
    SELECT file_id,
           CAST(count(step) AS BIGINT) AS n_steps,
           CAST(sum(CASE WHEN step < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_reversals,
           floor(coalesce(max(CASE WHEN step < 0 THEN -step END), 0.0)
                 * 1.0e6 + 0.5) / 1.0e6 AS max_reversal_m
    FROM d GROUP BY file_id ORDER BY file_id
"""


@_register("ios_monotonic_depth_audit", oracle=_MONO_SQL)
def ios_monotonic_depth_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-monotonicity QC (the pressure-reversal screen applied
    before any profile interpolation): per-cast count and worst
    magnitude of negative depth steps — qc-b plants one 1 m reversal.
    Per-file lag window only."""
    p = _qc_profile(spark)
    w = Window.partitionBy("file_id").orderBy("record_idx")
    d = p.select(
        "file_id", (F.col("depth") - F.lag("depth").over(w)).alias("step")
    )
    return (
        d.groupBy("file_id")
        .agg(
            F.count("step").cast("long").alias("n_steps"),
            F.sum(F.when(F.col("step") < 0, 1).otherwise(0))
            .cast("long")
            .alias("n_reversals"),
            (
                F.floor(
                    F.coalesce(
                        F.max(F.when(F.col("step") < 0, -F.col("step"))),
                        F.lit(0.0),
                    )
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("max_reversal_m"),
        )
        .orderBy("file_id")
    )


_CLIM_SQL = f"""
    WITH m AS (SELECT * FROM {_QC_VALUES})
    SELECT CAST(floor(depth / 4.0) AS BIGINT) AS depth_bin,
           CAST(count(*) AS BIGINT) AS n_obs,
           floor(avg(temp) * 1.0e6 + 0.5) / 1.0e6 AS mean_temp,
           floor(avg(sal) * 1.0e6 + 0.5) / 1.0e6 AS mean_sal
    FROM m GROUP BY 1 ORDER BY depth_bin
"""


@_register("ios_depth_bin_climatology", oracle=_CLIM_SQL)
def ios_depth_bin_climatology(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-binned temperature/salinity climatology across casts (4 m
    bins) — the classic multi-cast oceanographic product the reference
    pipeline feeds into ERDDAP. One bounded rollup over the parsed
    long format; at fleet scale the bin axis stays bounded by ocean
    depth, not by cast count."""
    p = _qc_profile(spark)
    return (
        p.groupBy(
            F.floor(F.col("depth") / 4.0).cast("long").alias("depth_bin")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            (F.floor(F.avg("temp") * 1.0e6 + 0.5) / 1.0e6).alias("mean_temp"),
            (F.floor(F.avg("sal") * 1.0e6 + 0.5) / 1.0e6).alias("mean_sal"),
        )
        .orderBy("depth_bin")
    )


_UNITCONS_SQL = """
    SELECT * FROM (VALUES
      ('Depth', CAST(2 AS BIGINT), CAST(1 AS BIGINT), 'metres', 0),
      ('Salinity', CAST(2 AS BIGINT), CAST(1 AS BIGINT), 'PSS-78', 0),
      ('Temperature', CAST(2 AS BIGINT), CAST(2 AS BIGINT),
       'deg C (IPTS68)|deg C (ITS90)', 1)
    ) AS t(base_name, n_files, n_units, units_sorted, inconsistent)
    ORDER BY base_name
"""


@_register("ios_channel_unit_consistency", oracle=_UNITCONS_SQL)
def ios_channel_unit_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-file channel-unit consistency audit: per base channel
    name, the distinct units seen across the fleet (qc-b reports
    temperature on the IPTS-68 scale — the exact inconsistency that
    silently corrupts a merged climatology; the reference's CHANNELS
    catalog carries the units, sources/ios_format.py:161). Bounded
    channel alphabet; sorted-set concat is deterministic."""
    from cioos_siooc_data_transform_spark.sources.ios_source import ios_channels

    ch = ios_channels(_parsed_qc(spark)).select(
        F.split(F.col("name"), ":").getItem(0).alias("base_name"),
        "file_id",
        F.regexp_replace(F.col("units"), "'", "").alias("u"),
    )
    return (
        ch.groupBy("base_name")
        .agg(
            F.countDistinct("file_id").cast("long").alias("n_files"),
            F.countDistinct("u").cast("long").alias("n_units"),
            F.array_join(F.array_sort(F.collect_set("u")), "|").alias(
                "units_sorted"
            ),
            F.when(F.countDistinct("u") > 1, 1).otherwise(0).alias(
                "inconsistent"
            ),
        )
        .orderBy("base_name")
    )
