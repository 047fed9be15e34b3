"""STAGED round-17 queries — NOT registered (round-17 runway seed,
started early in round 10; the staged_r15 partial-seed precedent).

Same contract as staged_r5..r16: LOCAL registry, strict-harness pytest
coverage in tests/test_staged_r17.py, idempotent ``activate()``.
Activation order: staged_r11 (round 11) -> ... -> staged_r16 (round
16) -> this module (round 17). Budget: <= 50 fresh names at
activation; the slate may be topped up in later rounds before it goes
live.

Content so far:

- Wave A — econometric / time-series tests over the orders daily and
  monthly revenue series and the events stream: Lo–MacKinlay variance
  ratio, Durbin–Watson, AR(1) with t-statistic, KPSS-style
  stationarity, simple-exponential-smoothing backtest (closed-form
  weights — no recursion), self-excitation vs the per-user Poisson
  baseline, Bartlett's variance homogeneity, McNemar's paired activity
  flip test, a zero-inflation score over the implicit user×hour grid
  (grid size computed as a product of counts, never materialized).
- Wave B — embedding / similarity audits: per-dimension Mann–Whitney
  AUC sweep, LSH NDCG audit, norm-by-label ANOVA, kNN label-consistency
  curve, PCA residual variance, per-query difficulty profile (relative
  contrast + margin + local intrinsic dimensionality), Hopkins
  clusterability statistic.
- Wave C — graph: truncated Katz centrality, link-predictor rank
  agreement, geometric fit of the support distribution.
- Wave D — pipeline audits: keeper-policy quality bias, dedup token
  yield by source, decontamination false-positive length profile,
  stratified-vs-SRS design effect, mixture reweighting, prefix-vs-full
  dedup agreement.
- Wave E — text: lexical sophistication by source, vocabulary Gini via
  the two-pass rank operator, bigram coverage.

Scale notes (the 100 TB contract): series windows run over
calendar-bounded rollups (day/month axes — the allowlisted class, to
be declared at activation exactly as tests/test_staged_r17.py::
EXPECTED_BOUNDED_WINDOW_QUERIES records); every global rank rides the
two-pass operators; pair joins are bounded (8-query broadcasts, LSH
buckets, month×month backtest grids).
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
    """Round-17 activation (idempotent)."""
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


# Shared substrate: the daily revenue series (cents, exact) with a
# dense day index from the broadcast min-date.
_DAILY_REV_CTE = """
    daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT CAST(date_diff('day', (SELECT min(day) FROM daily), day)
                  AS BIGINT) AS i, rev
      FROM daily
    )
"""


def _daily_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long"))
        .cast("long")
        .alias("rev")
    )
    mn = daily.agg(F.min("day").alias("d0"))
    return daily.crossJoin(F.broadcast(mn)).select(
        F.datediff(F.col("day"), F.col("d0")).cast("long").alias("i"), "rev"
    )


# ---------------------------------------------------------------------------
# Lo–MacKinlay variance ratio (1988) of daily log revenue at horizons
# q = 2 and 5: VR(q) = Var(r_t + ... + r_{t+q-1}) / (q·Var(r)).
# VR ≈ 1 under a random walk; VR > 1 means positive autocorrelation.
# All windows run over the ≤|days| calendar rollup.
# ---------------------------------------------------------------------------
_VR_SQL = f"""
    WITH {_DAILY_REV_CTE},
    r AS (
      SELECT i, ln(CAST(rev AS DOUBLE))
               - ln(CAST(lag(rev) OVER (ORDER BY i) AS DOUBLE)) AS ret
      FROM idx
    ),
    rr AS (SELECT i, ret FROM r WHERE ret IS NOT NULL),
    qs AS (SELECT unnest([2, 5]) AS q),
    sums AS (
      SELECT s.q, s.i,
             sum(rr2.ret) AS sq, CAST(count(*) AS BIGINT) AS nq
      FROM (SELECT q, i FROM rr CROSS JOIN qs) s
      JOIN rr rr2 ON rr2.i >= s.i AND rr2.i < s.i + s.q
      GROUP BY s.q, s.i
    ),
    base AS (
      SELECT CAST(count(*) AS BIGINT) AS n, sum(ret) AS s1,
             sum(ret * ret) AS s2
      FROM rr
    ),
    agg AS (
      SELECT q, CAST(count(*) AS BIGINT) AS m, sum(sq) AS t1,
             sum(sq * sq) AS t2
      FROM sums WHERE nq = q GROUP BY q
    )
    SELECT q AS horizon, b.n AS n_returns,
           floor(((t2 - t1 * t1 / m) / (m - 1))
                 / (q * ((s2 - s1 * s1 / n) / (n - 1)))
                 * 1.0e6 + 0.5) / 1.0e6 AS variance_ratio
    FROM agg CROSS JOIN base b
    ORDER BY q
"""


@_register("orders_variance_ratio", oracle=_VR_SQL)
def orders_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-ratio random-walk test on daily log revenue: q-day
    return sums come from a bounded self-join on the ≤|days| day-index
    table (i <= j < i+q — at most q matches per row), variances from
    exact moment sums."""
    idx = _daily_rev(spark, sf_dir)
    w = Window.orderBy("i")
    r = idx.select(
        "i",
        (
            F.log(F.col("rev").cast("double"))
            - F.log(F.lag("rev").over(w).cast("double"))
        ).alias("ret"),
    ).filter(F.col("ret").isNotNull())
    qs = spark.createDataFrame([(2,), (5,)], "q int").select(
        F.col("q").cast("long").alias("q")
    )
    s = r.select(F.col("i").alias("si"), F.lit(1).alias("__one")).crossJoin(
        F.broadcast(qs)
    )
    r2 = r.select(F.col("i").alias("j"), F.col("ret").alias("ret2"))
    sums = (
        s.join(
            r2,
            (F.col("j") >= F.col("si")) & (F.col("j") < F.col("si") + F.col("q")),
        )
        .groupBy("q", "si")
        .agg(
            F.sum("ret2").alias("sq"),
            F.count(F.lit(1)).cast("long").alias("nq"),
        )
    )
    base = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ret").alias("s1"),
        F.sum(F.col("ret") * F.col("ret")).alias("s2"),
    )
    agg = sums.filter(F.col("nq") == F.col("q")).groupBy("q").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("sq").alias("t1"),
        F.sum(F.col("sq") * F.col("sq")).alias("t2"),
    )
    vr = (
        (F.col("t2") - F.col("t1") * F.col("t1") / F.col("m"))
        / (F.col("m") - 1)
    ) / (
        F.col("q")
        * (
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        )
    )
    return (
        agg.crossJoin(F.broadcast(base))
        .select(
            F.col("q").alias("horizon"),
            F.col("n").alias("n_returns"),
            (F.floor(vr * 1.0e6 + 0.5) / 1.0e6).alias("variance_ratio"),
        )
        .orderBy("horizon")
    )


# ---------------------------------------------------------------------------
# Durbin–Watson statistic of the daily-revenue-on-time OLS residuals:
# DW = Σ(e_t − e_{t−1})² / Σe². DW ≈ 2 means no serial correlation.
# ---------------------------------------------------------------------------
_DW_SQL = f"""
    WITH {_DAILY_REV_CTE},
    ols AS (
      SELECT CAST(count(*) AS BIGINT) AS n, sum(CAST(i AS DOUBLE)) AS sx,
             sum(CAST(rev AS DOUBLE)) AS sy,
             sum(CAST(i AS DOUBLE) * i) AS sxx,
             sum(CAST(i AS DOUBLE) * rev) AS sxy
      FROM idx
    ),
    resid AS (
      SELECT i,
             rev - ((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
                    + ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * i) AS e
      FROM idx CROSS JOIN ols
    ),
    lagged AS (
      SELECT e, lag(e) OVER (ORDER BY i) AS ep FROM resid
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           floor(sum(CASE WHEN ep IS NULL THEN 0.0 ELSE (e - ep) * (e - ep) END)
                 / sum(e * e) * 1.0e6 + 0.5) / 1.0e6 AS durbin_watson
    FROM lagged
"""


@_register("orders_durbin_watson", oracle=_DW_SQL)
def orders_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DW serial-correlation statistic of the revenue-vs-time OLS
    residuals: one exact-moment OLS broadcast, one lag window over the
    bounded day axis."""
    idx = _daily_rev(spark, sf_dir)
    ols = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("i").cast("double")).alias("sx"),
        F.sum(F.col("rev").cast("double")).alias("sy"),
        F.sum(F.col("i").cast("double") * F.col("i")).alias("sxx"),
        F.sum(F.col("i").cast("double") * F.col("rev")).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    icept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    resid = idx.crossJoin(F.broadcast(ols)).select(
        "i", (F.col("rev") - (icept + slope * F.col("i"))).alias("e")
    )
    w = Window.orderBy("i")
    lagged = resid.select("e", F.lag("e").over(w).alias("ep"))
    return lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        (
            F.floor(
                F.sum(
                    F.when(F.col("ep").isNull(), 0.0).otherwise(
                        (F.col("e") - F.col("ep")) * (F.col("e") - F.col("ep"))
                    )
                )
                / F.sum(F.col("e") * F.col("e"))
                * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("durbin_watson"),
    )


# ---------------------------------------------------------------------------
# AR(1) fit of the daily event-count series with the coefficient's
# t-statistic: x_t = a + ρ·x_{t−1} + ε. |t| > 2 rejects white noise.
# ---------------------------------------------------------------------------
_AR1_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    seq AS (
      SELECT CAST(c AS DOUBLE) AS y,
             CAST(lag(c) OVER (ORDER BY day) AS DOUBLE) AS x
      FROM daily
    ),
    p AS (SELECT y, x FROM seq WHERE x IS NOT NULL),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
      FROM p
    ),
    fit AS (
      SELECT n,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS rho,
             (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS a,
             sx, sy, sxx, sxy, syy
      FROM s
    ),
    err AS (
      SELECT n, rho,
             (syy - 2 * a * sy - 2 * rho * sxy + n * a * a
              + 2 * a * rho * sx + rho * rho * sxx) / (n - 2) AS s2,
             sxx - sx * sx / n AS sxx_c
      FROM fit
    )
    SELECT n AS n_pairs,
           floor(rho * 1.0e6 + 0.5) / 1.0e6 AS ar1_rho,
           floor(rho / sqrt(s2 / sxx_c) * 1.0e6 + 0.5) / 1.0e6 AS t_stat
    FROM err
"""


@_register("events_ar1_tstat", oracle=_AR1_SQL)
def events_ar1_tstat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(1) coefficient and t-statistic of daily counts: one lag
    window over the calendar axis, the whole fit from five moment sums
    (the residual sum expands algebraically — no second pass)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = Window.orderBy("day")
    p = daily.select(
        F.col("c").cast("double").alias("y"),
        F.lag("c").over(w).cast("double").alias("x"),
    ).filter(F.col("x").isNotNull())
    s = p.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    rho = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    a = (F.col("sy") - rho * F.col("sx")) / F.col("n")
    s2 = (
        F.col("syy")
        - 2 * a * F.col("sy")
        - 2 * rho * F.col("sxy")
        + F.col("n") * a * a
        + 2 * a * rho * F.col("sx")
        + rho * rho * F.col("sxx")
    ) / (F.col("n") - 2)
    sxx_c = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    q6 = lambda e: F.floor(e * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    return s.select(
        F.col("n").alias("n_pairs"),
        q6(rho).alias("ar1_rho"),
        q6(rho / F.sqrt(s2 / sxx_c)).alias("t_stat"),
    )


# ---------------------------------------------------------------------------
# KPSS-style stationarity statistic of daily revenue (Kwiatkowski et
# al. 1992, lag-0 long-run variance — documented simplification):
# η = Σ S_t² / (n²·σ̂²) over partial sums of the demeaned series.
# ---------------------------------------------------------------------------
_KPSS_SQL = f"""
    WITH {_DAILY_REV_CTE},
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n, sum(CAST(rev AS DOUBLE)) AS s1,
             sum(CAST(rev AS DOUBLE) * rev) AS s2
      FROM idx
    ),
    dm AS (
      SELECT i, CAST(rev AS DOUBLE) - s1 / n AS e FROM idx CROSS JOIN mom
    ),
    ps AS (
      SELECT i, sum(e) OVER (ORDER BY i
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS st
      FROM dm
    ),
    agg AS (SELECT sum(st * st) AS sst FROM ps)
    SELECT n AS n_days,
           floor(sst / (CAST(n AS DOUBLE) * n * ((s2 - s1 * s1 / n) / n))
                 * 1.0e6 + 0.5) / 1.0e6 AS kpss_eta
    FROM agg CROSS JOIN mom
"""


@_register("orders_kpss_stationarity", oracle=_KPSS_SQL)
def orders_kpss_stationarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity statistic over the bounded day axis:
    demeaned partial sums from one running window, normalized by the
    lag-0 long-run variance."""
    idx = _daily_rev(spark, sf_dir)
    mom = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("rev").cast("double")).alias("s1"),
        F.sum(F.col("rev").cast("double") * F.col("rev")).alias("s2"),
    )
    dm = idx.crossJoin(F.broadcast(mom)).select(
        "i",
        (F.col("rev").cast("double") - F.col("s1") / F.col("n")).alias("e"),
        "n",
        "s1",
        "s2",
    )
    w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    ps = dm.select("n", "s1", "s2", F.sum("e").over(w).alias("st"))
    agg = ps.agg(
        F.sum(F.col("st") * F.col("st")).alias("sst"),
        F.max("n").alias("n"),
        F.max("s1").alias("s1"),
        F.max("s2").alias("s2"),
    )
    eta = F.col("sst") / (
        F.col("n").cast("double")
        * F.col("n")
        * ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / F.col("n"))
    )
    return agg.select(
        F.col("n").alias("n_days"),
        (F.floor(eta * 1.0e6 + 0.5) / 1.0e6).alias("kpss_eta"),
    )


# ---------------------------------------------------------------------------
# Simple-exponential-smoothing backtest on monthly revenue, α = 0.3,
# via the CLOSED-FORM weights l_{t-1} = α Σ_{j<t-1} (1-α)^{t-2-j} x_j
# + (1-α)^{t-1} x_0 — an O(months²) bounded pair join instead of a
# sequential recursion. One-step-ahead MAE vs the naive (last-value)
# forecast.
# ---------------------------------------------------------------------------
_SES_SQL = """
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
             CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ),
    midx AS (
      SELECT CAST(row_number() OVER (ORDER BY mon) - 1 AS BIGINT) AS t,
             CAST(rev AS DOUBLE) AS x
      FROM monthly
    ),
    level AS (
      SELECT f.t,
             sum(CASE WHEN h.t = 0
                  THEN pow(0.7, f.t - 1) * h.x
                  ELSE 0.3 * pow(0.7, f.t - 1 - h.t) * h.x END) AS l_prev
      FROM midx f JOIN midx h ON h.t <= f.t - 1
      WHERE f.t >= 1
      GROUP BY f.t
    ),
    err AS (
      SELECT f.t, abs(f.x - l.l_prev) AS e_ses,
             abs(f.x - p.x) AS e_naive
      FROM midx f
      JOIN level l ON f.t = l.t
      JOIN midx p ON p.t = f.t - 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_forecasts,
           CAST(floor(sum(e_ses) / count(*) / 100.0 + 0.5) AS BIGINT) AS ses_mae,
           CAST(floor(sum(e_naive) / count(*) / 100.0 + 0.5) AS BIGINT)
             AS naive_mae,
           floor(sum(e_ses) / sum(e_naive) * 1.0e6 + 0.5) / 1.0e6
             AS mae_ratio
    FROM err
"""


@_register("orders_ses_backtest", oracle=_SES_SQL)
def orders_ses_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SES one-step backtest with closed-form exponential weights over
    the ≤|months| axis (the recursion unrolled as a bounded t×h pair
    join — both engines sum the IDENTICAL weight expressions, and the
    join fan-out is months²/2, a constant for any data volume)."""
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("mon")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long"))
        .cast("long")
        .alias("rev")
    )
    w = Window.orderBy("mon")
    midx = monthly.select(
        (F.row_number().over(w) - 1).cast("long").alias("t"),
        F.col("rev").cast("double").alias("x"),
    )
    f = midx.select(F.col("t").alias("ft"), F.col("x").alias("fx"))
    h = midx.select(F.col("t").alias("ht"), F.col("x").alias("hx"))
    level = (
        f.filter(F.col("ft") >= 1)
        .join(h, F.col("ht") <= F.col("ft") - 1)
        .groupBy("ft")
        .agg(
            F.sum(
                F.when(
                    F.col("ht") == 0,
                    F.pow(F.lit(0.7), F.col("ft") - 1) * F.col("hx"),
                ).otherwise(
                    0.3
                    * F.pow(F.lit(0.7), F.col("ft") - 1 - F.col("ht"))
                    * F.col("hx")
                )
            ).alias("l_prev")
        )
    )
    prev = midx.select(
        (F.col("t") + 1).alias("ft"), F.col("x").alias("px")
    )
    err = (
        midx.select(F.col("t").alias("ft"), F.col("x").alias("fx"))
        .join(level, "ft")
        .join(prev, "ft")
        .select(
            F.abs(F.col("fx") - F.col("l_prev")).alias("e_ses"),
            F.abs(F.col("fx") - F.col("px")).alias("e_naive"),
        )
    )
    return err.agg(
        F.count(F.lit(1)).cast("long").alias("n_forecasts"),
        F.floor(F.sum("e_ses") / F.count(F.lit(1)) / 100.0 + 0.5).alias(
            "ses_mae"
        ),
        F.floor(F.sum("e_naive") / F.count(F.lit(1)) / 100.0 + 0.5).alias(
            "naive_mae"
        ),
        (
            F.floor(F.sum("e_ses") / F.sum("e_naive") * 1.0e6 + 0.5) / 1.0e6
        ).alias("mae_ratio"),
    )


# ---------------------------------------------------------------------------
# Self-excitation ratio: P(same user's next event within 60 s) vs the
# per-user Poisson baseline 1 − exp(−λ_u·60). Ratio >> 1 is the
# Hawkes-process signature (events trigger events). Sequence windows
# partition by user (key-partitioned, bounded per user).
# ---------------------------------------------------------------------------
_SELFEX_SQL = """
    WITH span AS (
      SELECT (CAST(floor(epoch(max(ts))) AS BIGINT)
              - CAST(floor(epoch(min(ts))) AS BIGINT)) AS t_span
      FROM events
    ),
    seq AS (
      SELECT user_id,
             CAST(floor(epoch(lead(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
             - CAST(floor(epoch(ts)) AS BIGINT) AS gap
      FROM events
    ),
    g AS (SELECT user_id, gap FROM seq WHERE gap IS NOT NULL),
    per_user AS (
      SELECT g.user_id, CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(sum(CASE WHEN gap <= 60 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fast,
             CAST(floor((1.0 - exp(-(CAST(count(*) AS DOUBLE) + 1.0)
                                   / max(s.t_span) * 60.0))
                        * CAST(count(*) AS DOUBLE) * 1.0e6 + 0.5) AS BIGINT)
               AS exp_fast_u
      FROM g CROSS JOIN span s GROUP BY g.user_id
    )
    SELECT CAST(sum(n_gaps) AS BIGINT) AS n_gaps,
           floor(CAST(sum(n_fast) AS DOUBLE) / sum(n_gaps) * 1.0e6 + 0.5)
             / 1.0e6 AS observed_fast_share,
           floor(CAST(sum(exp_fast_u) AS DOUBLE) / 1.0e6 / sum(n_gaps)
                 * 1.0e6 + 0.5) / 1.0e6 AS poisson_fast_share,
           floor(CAST(sum(n_fast) AS DOUBLE)
                 / (CAST(sum(exp_fast_u) AS DOUBLE) / 1.0e6) * 1.0e6 + 0.5)
             / 1.0e6 AS excitation_ratio
    FROM per_user
"""


@_register("events_self_excitation_ratio", oracle=_SELFEX_SQL)
def events_self_excitation_ratio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hawkes-signature audit: observed share of ≤60 s same-user
    inter-event gaps vs each user's own Poisson expectation (rate =
    (n_gaps+1)/span). One user-partitioned lead window; per-user
    expectations quantize at 1e-6 before the integer sum."""
    ev = _t(spark, sf_dir, "events")
    span = ev.agg(
        (
            F.floor(F.unix_timestamp(F.max("ts")))
            - F.floor(F.unix_timestamp(F.min("ts")))
        ).alias("t_span")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        (
            F.floor(F.unix_timestamp(F.lead("ts").over(w)))
            - F.floor(F.unix_timestamp(F.col("ts")))
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    per_user = (
        seq.crossJoin(F.broadcast(span))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.sum(F.when(F.col("gap") <= 60, 1).otherwise(0))
            .cast("long")
            .alias("n_fast"),
            F.floor(
                (
                    1.0
                    - F.exp(
                        -(F.count(F.lit(1)).cast("double") + 1.0)
                        / F.max("t_span")
                        * 60.0
                    )
                )
                * F.count(F.lit(1)).cast("double")
                * 1.0e6
                + 0.5
            )
            .cast("long")
            .alias("exp_fast_u"),
        )
    )
    q6 = lambda e: F.floor(e * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    return per_user.agg(
        F.sum("n_gaps").cast("long").alias("n_gaps"),
        q6(F.sum("n_fast").cast("double") / F.sum("n_gaps")).alias(
            "observed_fast_share"
        ),
        q6(
            F.sum("exp_fast_u").cast("double") / 1.0e6 / F.sum("n_gaps")
        ).alias("poisson_fast_share"),
        q6(
            F.sum("n_fast").cast("double")
            / (F.sum("exp_fast_u").cast("double") / 1.0e6)
        ).alias("excitation_ratio"),
    )


# ---------------------------------------------------------------------------
# Bartlett's test (1937) of variance homogeneity of log order value
# across the 5 priorities: χ² from per-group exact log-moment sums
# (per-row ln terms quantized at 1e-9).
# ---------------------------------------------------------------------------
_BARTLETT_SQL = """
    WITH rows_ AS (
      SELECT o_orderpriority AS g,
             CAST(floor(ln(o_totalprice) * 1.0e9 + 0.5) AS BIGINT) AS lq
      FROM orders WHERE o_totalprice > 0
    ),
    grp AS (
      SELECT g, CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(lq) AS HUGEINT) AS s1,
             CAST(sum(CAST(lq AS HUGEINT) * lq) AS HUGEINT) AS s2
      FROM rows_ GROUP BY g
    ),
    v AS (
      SELECT g, ng,
             (CAST(s2 AS DOUBLE) / 1.0e18
              - (CAST(s1 AS DOUBLE) / 1.0e9) * (CAST(s1 AS DOUBLE) / 1.0e9)
                / ng) / (ng - 1) AS s2g
      FROM grp
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
             sum((ng - 1) * s2g) AS pooled_num,
             sum((ng - 1) * ln(s2g)) AS sum_lns,
             sum(1.0 / (ng - 1)) AS sum_inv
      FROM v
    )
    SELECT k AS n_groups, n AS n_rows,
           floor((( (n - k) * ln(pooled_num / (n - k)) - sum_lns )
                  / (1.0 + (sum_inv - 1.0 / (n - k)) / (3.0 * (k - 1))))
                 * 1.0e6 + 0.5) / 1.0e6 AS bartlett_chi2
    FROM agg
"""


@_register("orders_bartlett_test", oracle=_BARTLETT_SQL)
def orders_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett χ² for log-value variance homogeneity across
    priorities: per-row quantized logs, one bounded group-by, the
    statistic from a 5-row rollup."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    rows = o.select(
        F.col("o_orderpriority").alias("g"),
        F.floor(F.log(F.col("o_totalprice")) * 1.0e9 + 0.5)
        .cast("long")
        .alias("lq"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    grp = rows.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("lq").cast("decimal(38,0)").alias("s1"),
        F.sum(dec("lq") * dec("lq")).cast("decimal(38,0)").alias("s2"),
    )
    s1d = F.col("s1").cast("double") / 1.0e9
    s2g = (
        F.col("s2").cast("double") / 1.0e18 - s1d * s1d / F.col("ng")
    ) / (F.col("ng") - 1)
    v = grp.select("g", "ng", s2g.alias("s2g"))
    agg = v.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.sum((F.col("ng") - 1) * F.col("s2g")).alias("pooled_num"),
        F.sum((F.col("ng") - 1) * F.log(F.col("s2g"))).alias("sum_lns"),
        F.sum(1.0 / (F.col("ng") - 1)).alias("sum_inv"),
    )
    nk = F.col("n") - F.col("k")
    stat = (
        nk * F.log(F.col("pooled_num") / nk) - F.col("sum_lns")
    ) / (
        1.0
        + (F.col("sum_inv") - 1.0 / nk) / (3.0 * (F.col("k") - 1))
    )
    return agg.select(
        F.col("k").alias("n_groups"),
        F.col("n").alias("n_rows"),
        (F.floor(stat * 1.0e6 + 0.5) / 1.0e6).alias("bartlett_chi2"),
    )


# ---------------------------------------------------------------------------
# McNemar's test (1947) of paired customer activity: active in the
# first vs second half of the order history — the b/c discordant cells
# decide whether the active population SHIFTED (marginal homogeneity),
# which a plain churn rate can't distinguish from noise.
# ---------------------------------------------------------------------------
_MCNEMAR_SQL = """
    WITH span AS (
      SELECT min(o_orderdate) + (max(o_orderdate) - min(o_orderdate)) / 2
               AS mid
      FROM orders
    ),
    act AS (
      SELECT o_custkey,
             CAST(max(CASE WHEN o_orderdate < mid THEN 1 ELSE 0 END)
                  AS BIGINT) AS h1,
             CAST(max(CASE WHEN o_orderdate >= mid THEN 1 ELSE 0 END)
                  AS BIGINT) AS h2
      FROM orders CROSS JOIN span GROUP BY o_custkey
    ),
    cells AS (
      SELECT CAST(sum(h1 * h2) AS BIGINT) AS both_,
             CAST(sum(h1 * (1 - h2)) AS BIGINT) AS b,
             CAST(sum((1 - h1) * h2) AS BIGINT) AS c
      FROM act
    )
    SELECT both_ AS n_both, b AS n_lapsed, c AS n_new,
           floor((CAST(b AS DOUBLE) - c) * (CAST(b AS DOUBLE) - c)
                 / (CAST(b AS DOUBLE) + c) * 1.0e6 + 0.5) / 1.0e6
             AS mcnemar_chi2
    FROM cells
"""


@_register("customer_mcnemar_activity", oracle=_MCNEMAR_SQL)
def customer_mcnemar_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar χ² over the paired active-in-half flags: one customer
    rollup against a broadcast midpoint, exact discordant-cell counts."""
    o = _t(spark, sf_dir, "orders")
    span = o.agg(
        (
            F.min("o_orderdate")
            + ((F.max("o_orderdate") - F.min("o_orderdate")) / 2)
        ).alias("mid")
    )
    act = (
        o.crossJoin(F.broadcast(span))
        .groupBy("o_custkey")
        .agg(
            F.max(
                F.when(F.col("o_orderdate") < F.col("mid"), 1).otherwise(0)
            )
            .cast("long")
            .alias("h1"),
            F.max(
                F.when(F.col("o_orderdate") >= F.col("mid"), 1).otherwise(0)
            )
            .cast("long")
            .alias("h2"),
        )
    )
    cells = act.agg(
        F.sum(F.col("h1") * F.col("h2")).cast("long").alias("n_both"),
        F.sum(F.col("h1") * (1 - F.col("h2"))).cast("long").alias("b"),
        F.sum((1 - F.col("h1")) * F.col("h2")).cast("long").alias("c"),
    )
    bd, cd = F.col("b").cast("double"), F.col("c").cast("double")
    return cells.select(
        "n_both",
        F.col("b").alias("n_lapsed"),
        F.col("c").alias("n_new"),
        (
            F.floor((bd - cd) * (bd - cd) / (bd + cd) * 1.0e6 + 0.5) / 1.0e6
        ).alias("mcnemar_chi2"),
    )


# ---------------------------------------------------------------------------
# Zero-inflation score over the IMPLICIT user×hour grid: structural
# zeros are counted as n_users·n_hours − |nonzero cells| (a product of
# two counts — the grid itself is never materialized, which is what
# makes this shape survive 100 TB). Score compares the observed zero
# fraction with the Poisson prediction exp(−λ̂).
# ---------------------------------------------------------------------------
_ZIP_SQL = """
    WITH cells AS (
      SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    dims AS (
      SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu,
             CAST(count(DISTINCT CAST(date_trunc('hour', ts) AS TIMESTAMP))
                  AS BIGINT) AS nh,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events
    ),
    nz AS (SELECT CAST(count(*) AS BIGINT) AS n_nonzero FROM cells)
    SELECT nu AS n_users, nh AS n_hours, n_events,
           (nu * nh - n_nonzero) AS n_zero_cells,
           floor(CAST(nu * nh - n_nonzero AS DOUBLE) / (nu * nh) * 1.0e6 + 0.5)
             / 1.0e6 AS zero_share,
           floor(exp(-CAST(n_events AS DOUBLE) / (nu * nh)) * 1.0e6 + 0.5)
             / 1.0e6 AS poisson_zero_share,
           floor((CAST(nu * nh - n_nonzero AS DOUBLE)
                  - (nu * nh) * exp(-CAST(n_events AS DOUBLE) / (nu * nh)))
                 / sqrt((nu * nh) * exp(-CAST(n_events AS DOUBLE) / (nu * nh))
                        * (1.0 - exp(-CAST(n_events AS DOUBLE) / (nu * nh))))
                 * 1.0e6 + 0.5) / 1.0e6 AS zero_excess_z
    FROM dims CROSS JOIN nz
"""


@_register("events_zero_inflation_score", oracle=_ZIP_SQL)
def events_zero_inflation_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-inflation audit of per-(user, hour) counts: grid size =
    n_users × n_hours computed as a count PRODUCT (never a cross
    join); z-score of the structural-zero excess over the Poisson
    prediction (binomial normal approximation)."""
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    dims = ev.agg(
        F.countDistinct("user_id").cast("long").alias("nu"),
        F.countDistinct(F.date_trunc("hour", F.col("ts")))
        .cast("long")
        .alias("nh"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    nz = cells.agg(F.count(F.lit(1)).cast("long").alias("n_nonzero"))
    d = dims.crossJoin(F.broadcast(nz))
    grid = F.col("nu") * F.col("nh")
    lam = F.col("n_events").cast("double") / grid
    p0 = F.exp(-lam)
    zeros = (grid - F.col("n_nonzero")).cast("double")
    q6 = lambda e: F.floor(e * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    return d.select(
        F.col("nu").alias("n_users"),
        F.col("nh").alias("n_hours"),
        "n_events",
        (grid - F.col("n_nonzero")).alias("n_zero_cells"),
        q6(zeros / grid).alias("zero_share"),
        q6(p0).alias("poisson_zero_share"),
        q6(
            (zeros - grid * p0) / F.sqrt(grid * p0 * (1.0 - p0))
        ).alias("zero_excess_z"),
    )


# ===========================================================================
# Wave B — embedding / similarity audits.
# ===========================================================================

# ---------------------------------------------------------------------------
# Per-dimension Mann–Whitney AUC sweep (labels 0 vs 1): AUC_d =
# (R1_d − n1(n1+1)/2) / (n0·n1) from per-dimension midrank sums — the
# cheapest per-feature separability screen. Midranks ride the GROUPED
# weighted two-pass operator (group_cols=['d']), so even one dominant
# dimension splits across bounded bucket windows. Top-8 dims by
# quantized |AUC − 0.5|.
# ---------------------------------------------------------------------------
_DIMAUC_SQL = """
    WITH v AS (
      SELECT vec_id, label,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 1.0e6 + 0.5) AS BIGINT)) AS q
      FROM embeddings WHERE label IN (0, 1)
    ),
    el AS (
      SELECT label, unnest(range(64)) AS d, unnest(q) AS x FROM v
    ),
    cnt AS (
      SELECT d, x, CAST(count(*) AS BIGINT) AS c,
             CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM el GROUP BY 1, 2
    ),
    mr AS (
      SELECT d, x, c1,
             2 * sum(c) OVER (PARTITION BY d ORDER BY x) - c + 1 AS r2
      FROM cnt
    ),
    g AS (
      SELECT d,
             CAST(sum(CAST(c1 AS HUGEINT) * r2) AS HUGEINT) AS r2sum1,
             CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN TRUE THEN c1 ELSE 0 END) AS BIGINT) AS _x
      FROM mr GROUP BY d
    ),
    tot AS (
      SELECT d,
             CAST(sum(c) AS BIGINT) AS n_all
      FROM cnt GROUP BY d
    ),
    auc AS (
      SELECT g.d,
             CAST(floor((CAST(g.r2sum1 AS DOUBLE) / 2.0
                         - CAST(g.n1 AS DOUBLE) * (g.n1 + 1) / 2.0)
                        / (CAST(t.n_all - g.n1 AS DOUBLE) * g.n1)
                        * 1.0e6 + 0.5) AS BIGINT) AS auc_u
      FROM g JOIN tot t ON g.d = t.d
    )
    SELECT d AS dim, CAST(auc_u AS DOUBLE) / 1.0e6 AS auc
    FROM auc
    ORDER BY abs(auc_u - 500000) DESC, d
    LIMIT 8
"""


@_register("embedding_dim_auc_sweep", oracle=_DIMAUC_SQL)
def embedding_dim_auc_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-sum AUC per embedding dimension (labels 0 vs 1), top-8 by
    separation: per-(dim, value) count tables, GROUPED two-pass
    weighted midranks (group_cols=['d']), exact doubled-midrank sums."""
    from cioos_siooc_data_transform_spark.operators.windows import (
        ranked_cumsum_two_pass,
    )

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("label").isin(0, 1))
    e = F.col("embedding").cast("array<double>")
    q = F.transform(e, lambda x: F.floor(x * 1.0e6 + 0.5).cast("long"))
    el = emb.select("label", F.posexplode(q).alias("d", "x"))
    cnt = el.groupBy("d", "x").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
    )
    mr = ranked_cumsum_two_pass(
        cnt, "x", "x", weight_col="c", group_cols=["d"], ascending=True,
        out_rank="__rn", out_cum="cum",
    ).select(
        "d",
        "c1",
        (2 * F.col("cum") - F.col("c") + 1).alias("r2"),
        "c",
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    g = mr.groupBy("d").agg(
        F.sum(dec("c1") * F.col("r2").cast("decimal(19,0)"))
        .cast("decimal(38,0)")
        .alias("r2sum1"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c").cast("long").alias("n_all"),
    )
    auc_u = F.floor(
        (
            F.col("r2sum1").cast("double") / 2.0
            - F.col("n1").cast("double") * (F.col("n1") + 1) / 2.0
        )
        / ((F.col("n_all") - F.col("n1")).cast("double") * F.col("n1"))
        * 1.0e6
        + 0.5
    ).cast("long")
    auc = g.select(F.col("d").alias("dim"), auc_u.alias("auc_u"))
    return (
        auc.orderBy(F.abs(F.col("auc_u") - 500000).desc(), "dim")
        .limit(8)
        .select("dim", (F.col("auc_u").cast("double") / 1.0e6).alias("auc"))
    )


# ---------------------------------------------------------------------------
# NDCG@10 of the hyperplane-LSH ranking against exact cosine: recall@k
# says WHETHER the neighbors were found; NDCG says whether the GOOD
# ones rank high. Relevance = exact-cosine rank converted to graded
# gain 1/log2(1+rank_exact).
# ---------------------------------------------------------------------------
_NDCG_SQL = """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, ev AS qv FROM v WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.qv, v.ev), 4) AS cs
      FROM q, v WHERE v.vec_id != q.query_id
    ),
    exact AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, neighbor_id ASC) AS re
      FROM scored
    ),
    approx AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY CAST(floor(cs * 100.0) AS BIGINT) DESC,
                                         neighbor_id ASC) AS ra
      FROM scored
    ),
    dcg AS (
      SELECT a.query_id,
             CAST(sum(CAST(floor(1.0 / ln(1.0 + e.re) * ln(2.0)
                    / ln(2.0 + a.ra) * ln(2.0) * 1.0e9 + 0.5) AS BIGINT))
                  AS BIGINT) AS dcg_u
      FROM approx a JOIN exact e
        ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
      WHERE a.ra <= 10
      GROUP BY a.query_id
    ),
    ideal AS (
      SELECT query_id,
             CAST(sum(CAST(floor(1.0 / ln(1.0 + re) * ln(2.0)
                    / ln(2.0 + re) * ln(2.0) * 1.0e9 + 0.5) AS BIGINT))
                  AS BIGINT) AS idcg_u
      FROM exact WHERE re <= 10 GROUP BY query_id
    )
    SELECT d.query_id,
           floor(CAST(d.dcg_u AS DOUBLE) / i.idcg_u * 1.0e6 + 0.5) / 1.0e6
             AS ndcg_at_10
    FROM dcg d JOIN ideal i ON d.query_id = i.query_id
    ORDER BY d.query_id
"""


@_register("similarity_coarse_ndcg_audit", oracle=_NDCG_SQL)
def similarity_coarse_ndcg_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of a coarse-quantized cosine ranking (2-decimal
    bucketed scores — the ADC/int8 stand-in) against the exact-cosine
    ideal: graded gains 1/ln(1+rank_exact), per-pair DCG terms
    quantized at 1e-9. Broadcast 5-query audit shape."""
    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    v = emb.select("vec_id", e.alias("ev"))
    q = v.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("ev").alias("qv")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("ev"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(c), lambda a: a * a),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    cs = F.round(dot / (norm("qv") * norm("ev")), 4)
    scored = (
        F.broadcast(q)
        .join(v, F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cs.alias("cs"))
    )
    we = Window.partitionBy("query_id").orderBy(
        F.col("cs").desc(), F.col("neighbor_id").asc()
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.floor(F.col("cs") * 100.0).cast("long").desc(),
        F.col("neighbor_id").asc(),
    )
    ranked = scored.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(we).alias("re"),
        F.row_number().over(wa).alias("ra"),
    )
    gain = lambda rank_rel, rank_pos: F.floor(  # noqa: E731
        1.0
        / F.log(1.0 + rank_rel)
        * math.log(2.0)
        / F.log(2.0 + rank_pos)
        * math.log(2.0)
        * 1.0e9
        + 0.5
    ).cast("long")
    dcg = (
        ranked.filter(F.col("ra") <= 10)
        .groupBy("query_id")
        .agg(F.sum(gain(F.col("re"), F.col("ra"))).cast("long").alias("dcg_u"))
    )
    ideal = (
        ranked.filter(F.col("re") <= 10)
        .groupBy("query_id")
        .agg(F.sum(gain(F.col("re"), F.col("re"))).cast("long").alias("idcg_u"))
    )
    return (
        dcg.join(ideal, "query_id")
        .select(
            "query_id",
            (
                F.floor(
                    F.col("dcg_u").cast("double") / F.col("idcg_u") * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("ndcg_at_10"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Norm-uniformity contract audit: the embedding pipeline promises
# unit-norm vectors; this measures the worst violation and the spread
# per label (exact micro-quantized norms, bounded label rollup) — the
# check that catches a skipped-normalization batch long before any
# downstream similarity drifts.
# ---------------------------------------------------------------------------
_NORM_AUDIT_SQL = """
    WITH n AS (
      SELECT label,
             CAST(floor(sqrt(list_aggregate(list_transform(
               CAST(embedding AS DOUBLE[]), x -> x * x), 'sum')) * 1.0e9 + 0.5)
             AS BIGINT) AS nq
      FROM embeddings
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
           floor(CAST(min(nq) AS DOUBLE) / 1.0e9 * 1.0e6 + 0.5) / 1.0e6
             AS min_norm,
           floor(CAST(max(nq) AS DOUBLE) / 1.0e9 * 1.0e6 + 0.5) / 1.0e6
             AS max_norm,
           CAST(max(abs(nq - 1000000000)) AS BIGINT) AS worst_dev_nano,
           CAST(sum(CASE WHEN abs(nq - 1000000000) > 1000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_violations_1e6
    FROM n GROUP BY label ORDER BY label
"""


@_register("embedding_norm_uniformity_audit", oracle=_NORM_AUDIT_SQL)
def embedding_norm_uniformity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-label unit-norm contract check: nano-quantized norms, worst
    absolute deviation and the count beyond a 1e-6 tolerance — one
    row-local projection + bounded rollup."""
    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    nq = F.floor(
        F.sqrt(
            F.aggregate(
                F.transform(e, lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        * 1.0e9
        + 0.5
    ).cast("long")
    n = emb.select("label", nq.alias("nq"))
    return (
        n.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            (
                F.floor(F.min("nq").cast("double") / 1.0e9 * 1.0e6 + 0.5)
                / 1.0e6
            ).alias("min_norm"),
            (
                F.floor(F.max("nq").cast("double") / 1.0e9 * 1.0e6 + 0.5)
                / 1.0e6
            ).alias("max_norm"),
            F.max(F.abs(F.col("nq") - 1000000000))
            .cast("long")
            .alias("worst_dev_nano"),
            F.sum(
                F.when(F.abs(F.col("nq") - 1000000000) > 1000, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_violations_1e6"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# kNN label-consistency curve at k = 1/5/10: majority-vote accuracy of
# the broadcast 8-query sample's neighbors — the sweep twin of the
# registered single-k embedding_knn_label_accuracy.
# ---------------------------------------------------------------------------
_KNNC_SQL = """
    WITH v AS (
      SELECT vec_id, label,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 1.0e6 + 0.5) AS BIGINT)) AS q
      FROM embeddings
    ),
    qs AS (
      SELECT vec_id AS query_id, label AS qlabel, q AS qv
      FROM v WHERE vec_id < 8
    ),
    d AS (
      SELECT qs.query_id, qs.qlabel, v.label AS nlabel, v.vec_id AS nid,
             list_aggregate(list_transform(range(64),
               i -> CAST(qs.qv[i + 1] - v.q[i + 1] AS DOUBLE)
                    * (qs.qv[i + 1] - v.q[i + 1])), 'sum') AS d2
      FROM qs, v WHERE v.vec_id != qs.query_id
    ),
    ranked AS (
      SELECT query_id, qlabel, nlabel,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY d2 ASC, nid ASC) AS r
      FROM d
    ),
    ks AS (SELECT unnest([1, 5, 10]) AS k),
    votes AS (
      SELECT ks.k, r.query_id, r.qlabel, r.nlabel,
             CAST(count(*) AS BIGINT) AS nv
      FROM ranked r CROSS JOIN ks
      WHERE r.r <= ks.k
      GROUP BY 1, 2, 3, 4
    ),
    win AS (
      SELECT k, query_id, qlabel, nlabel,
             row_number() OVER (PARTITION BY k, query_id
                                ORDER BY nv DESC, nlabel ASC) AS vr
      FROM votes
    )
    SELECT k, CAST(count(*) AS BIGINT) AS n_queries,
           floor(CAST(sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*) * 1.0e6 + 0.5) / 1.0e6
             AS majority_accuracy
    FROM win WHERE vr = 1 GROUP BY k ORDER BY k
"""


@_register("embedding_knn_consistency_curve", oracle=_KNNC_SQL)
def embedding_knn_consistency_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Majority-vote label accuracy at k ∈ {1,5,10} over the broadcast
    8-query sample: exact integer L2, query-partitioned rank, bounded
    vote rollups."""
    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    q = F.transform(e, lambda x: F.floor(x * 1.0e6 + 0.5).cast("long"))
    v = emb.select("vec_id", "label", q.alias("q"))
    qs = v.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("q").alias("qv"),
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("qv"), F.col("q"),
            lambda a, b: (a - b).cast("double") * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    d = (
        F.broadcast(qs)
        .join(v, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "qlabel",
            F.col("label").alias("nlabel"),
            F.col("vec_id").alias("nid"),
            d2.alias("d2"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("nid").asc()
    )
    ranked = d.select(
        "query_id", "qlabel", "nlabel", F.row_number().over(wr).alias("r")
    )
    ks = spark.createDataFrame([(1,), (5,), (10,)], "k int").select(
        F.col("k").cast("long").alias("k")
    )
    votes = (
        ranked.crossJoin(F.broadcast(ks))
        .filter(F.col("r") <= F.col("k"))
        .groupBy("k", "query_id", "qlabel", "nlabel")
        .agg(F.count(F.lit(1)).cast("long").alias("nv"))
    )
    wv = Window.partitionBy("k", "query_id").orderBy(
        F.col("nv").desc(), F.col("nlabel").asc()
    )
    win = votes.withColumn("vr", F.row_number().over(wv)).filter(
        F.col("vr") == 1
    )
    return (
        win.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            (
                F.floor(
                    F.sum(
                        F.when(F.col("nlabel") == F.col("qlabel"), 1).otherwise(0)
                    ).cast("double")
                    / F.count(F.lit(1))
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("majority_accuracy"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# Per-query difficulty profile: relative contrast, top1-top2 margin,
# and the MLE local intrinsic dimensionality (Levina & Bickel 2004)
# from the top-20 neighbor distances: LID = (mean ln(d_k/d_i))^-1.
# ---------------------------------------------------------------------------
_QDIFF_SQL = """
    WITH v AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 1.0e6 + 0.5) AS BIGINT)) AS q
      FROM embeddings
    ),
    qs AS (SELECT vec_id AS query_id, q AS qv FROM v WHERE vec_id < 8),
    d AS (
      SELECT qs.query_id, v.vec_id AS nid,
             sqrt(list_aggregate(list_transform(range(64),
               i -> CAST(qs.qv[i + 1] - v.q[i + 1] AS DOUBLE)
                    * (qs.qv[i + 1] - v.q[i + 1])), 'sum')) AS dist
      FROM qs, v WHERE v.vec_id != qs.query_id
    ),
    ranked AS (
      SELECT query_id, dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY dist ASC, nid ASC) AS r
      FROM d
    ),
    stats_all AS (
      SELECT query_id, CAST(count(*) AS BIGINT) AS n, sum(dist) AS sd,
             min(dist) AS dmin
      FROM d GROUP BY query_id
    ),
    dk AS (SELECT query_id, dist AS d20 FROM ranked WHERE r = 20),
    lid AS (
      SELECT r.query_id,
             CAST(sum(CAST(floor(ln(dk.d20 / r.dist) * 1.0e9 + 0.5)
                   AS BIGINT)) AS BIGINT) AS s_u,
             CAST(count(*) AS BIGINT) AS m
      FROM ranked r JOIN dk ON r.query_id = dk.query_id
      WHERE r.r < 20
      GROUP BY r.query_id
    )
    SELECT s.query_id,
           floor(s.sd / s.n / s.dmin * 1.0e4 + 0.5) / 1.0e4
             AS relative_contrast,
           floor(CAST(l.m AS DOUBLE)
                 / (CAST(l.s_u AS DOUBLE) / 1.0e9) * 1.0e4 + 0.5) / 1.0e4
             AS lid_mle
    FROM stats_all s JOIN lid l ON s.query_id = l.query_id
    ORDER BY s.query_id
"""


@_register("similarity_query_difficulty", oracle=_QDIFF_SQL)
def similarity_query_difficulty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query search difficulty: relative contrast (mean/min
    distance) and Levina–Bickel LID from the top-20 neighborhood —
    per-neighbor log-ratio terms quantized at 1e-9; broadcast 8-query
    audit shape."""
    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    q = F.transform(e, lambda x: F.floor(x * 1.0e6 + 0.5).cast("long"))
    v = emb.select("vec_id", q.alias("q"))
    qs = v.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qv")
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("qv"), F.col("q"),
                lambda a, b: (a - b).cast("double") * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    d = (
        F.broadcast(qs)
        .join(v, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("nid"), dist.alias("dist")
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("nid").asc()
    )
    ranked = d.select("query_id", "dist", F.row_number().over(wr).alias("r"))
    stats_all = d.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dist").alias("sd"),
        F.min("dist").alias("dmin"),
    )
    dk = ranked.filter(F.col("r") == 20).select(
        "query_id", F.col("dist").alias("d20")
    )
    lid = (
        ranked.filter(F.col("r") < 20)
        .join(F.broadcast(dk), "query_id")
        .groupBy("query_id")
        .agg(
            F.sum(
                F.floor(
                    F.log(F.col("d20") / F.col("dist")) * 1.0e9 + 0.5
                ).cast("long")
            )
            .cast("long")
            .alias("s_u"),
            F.count(F.lit(1)).cast("long").alias("m"),
        )
    )
    q4 = lambda expr: F.floor(expr * 1.0e4 + 0.5) / 1.0e4  # noqa: E731
    return (
        stats_all.join(lid, "query_id")
        .select(
            "query_id",
            q4(F.col("sd") / F.col("n") / F.col("dmin")).alias(
                "relative_contrast"
            ),
            q4(
                F.col("m").cast("double")
                / (F.col("s_u").cast("double") / 1.0e9)
            ).alias("lid_mle"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Hopkins clusterability statistic: NN distance of 16 hash-derived
# uniform synthetic probes vs 16 real probes against the corpus —
# H → 1 means strongly clustered, ≈ 0.5 means spatially random. The
# probe sets are constant-size broadcasts (the whole comparison costs
# two corpus streams).
# ---------------------------------------------------------------------------
def _hopkins_probe_sql() -> str:
    # 16 synthetic probes: dimension values from md5-derived uniforms
    # in [-0.13, 0.13] (the data's coordinate envelope), micro-quantized.
    import hashlib

    rows = []
    for p in range(16):
        vals = []
        for dd in range(64):
            hx = hashlib.md5(f"hopkins#{p}#{dd}".encode()).hexdigest()[:8]
            u = int(hx, 16) / float(0xFFFFFFFF)
            vals.append(str(int(round((u * 0.26 - 0.13) * 1e6))))
        rows.append(f"({p}, [{', '.join(vals)}])")
    return ", ".join(rows)


_HOPKINS_SYN = _hopkins_probe_sql()

_HOPKINS_SQL = f"""
    WITH v AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 1.0e6 + 0.5) AS BIGINT)) AS q
      FROM embeddings
    ),
    syn(pid, pv) AS (VALUES {_HOPKINS_SYN}),
    realp AS (
      SELECT vec_id AS pid, q AS pv FROM v WHERE vec_id % 97 = 3 AND vec_id < 1552
    ),
    du AS (
      SELECT s.pid, min(sqrt(list_aggregate(list_transform(range(64),
               i -> CAST(s.pv[i + 1] - v.q[i + 1] AS DOUBLE)
                    * (s.pv[i + 1] - v.q[i + 1])), 'sum'))) AS nn
      FROM syn s, v GROUP BY s.pid
    ),
    dw AS (
      SELECT r.pid, min(sqrt(list_aggregate(list_transform(range(64),
               i -> CAST(r.pv[i + 1] - v.q[i + 1] AS DOUBLE)
                    * (r.pv[i + 1] - v.q[i + 1])), 'sum'))) AS nn
      FROM realp r JOIN v ON v.vec_id != r.pid GROUP BY r.pid
    ),
    s AS (
      SELECT (SELECT sum(CAST(floor(nn + 0.5) AS BIGINT)) FROM du) AS su,
             (SELECT sum(CAST(floor(nn + 0.5) AS BIGINT)) FROM dw) AS sw,
             (SELECT CAST(count(*) AS BIGINT) FROM du) AS nu,
             (SELECT CAST(count(*) AS BIGINT) FROM dw) AS nw
    )
    SELECT nu AS n_synthetic, nw AS n_real,
           floor(CAST(su AS DOUBLE) / (su + sw) * 1.0e6 + 0.5) / 1.0e6
             AS hopkins_h
    FROM s
"""


@_register("embedding_hopkins_statistic", oracle=_HOPKINS_SQL)
def embedding_hopkins_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopkins H from two 16-probe broadcast sets (hash-derived
    uniform synthetics vs hash-sampled real points): two corpus
    streams, NN distances floored to integer micro-units before the
    sums."""
    import hashlib

    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    q = F.transform(e, lambda x: F.floor(x * 1.0e6 + 0.5).cast("long"))
    v = emb.select("vec_id", q.alias("q"))
    syn_rows = []
    for p in range(16):
        vals = []
        for dd in range(64):
            hx = hashlib.md5(f"hopkins#{p}#{dd}".encode()).hexdigest()[:8]
            u = int(hx, 16) / float(0xFFFFFFFF)
            vals.append(int(round((u * 0.26 - 0.13) * 1e6)))
        syn_rows.append((p, vals))
    syn = spark.createDataFrame(syn_rows, "pid long, pv array<long>")
    realp = v.filter(
        (F.col("vec_id") % 97 == 3) & (F.col("vec_id") < 1552)
    ).select(F.col("vec_id").alias("pid"), F.col("q").alias("pv"))
    nn_dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("pv"), F.col("q"),
                lambda a, b: (a - b).cast("double") * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    du = (
        F.broadcast(syn)
        .join(v)
        .select("pid", nn_dist.alias("dist"))
        .groupBy("pid")
        .agg(F.min("dist").alias("nn"))
    )
    dw = (
        F.broadcast(realp)
        .join(v, F.col("vec_id") != F.col("pid"))
        .select("pid", nn_dist.alias("dist"))
        .groupBy("pid")
        .agg(F.min("dist").alias("nn"))
    )
    su = du.agg(
        F.sum(F.floor(F.col("nn") + 0.5).cast("long")).alias("su"),
        F.count(F.lit(1)).cast("long").alias("nu"),
    )
    sw = dw.agg(
        F.sum(F.floor(F.col("nn") + 0.5).cast("long")).alias("sw"),
        F.count(F.lit(1)).cast("long").alias("nw"),
    )
    return su.crossJoin(F.broadcast(sw)).select(
        F.col("nu").alias("n_synthetic"),
        F.col("nw").alias("n_real"),
        (
            F.floor(
                F.col("su").cast("double") / (F.col("su") + F.col("sw")) * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("hopkins_h"),
    )


# ===========================================================================
# Wave C — co-purchase graph texture (staged_r8._copurchase_edges /
# _EDGES_SQL substrate).
# ===========================================================================

def _edges_sql17() -> str:
    from cioos_siooc_data_transform_spark.plans.staged_r8 import _EDGES_SQL

    return _EDGES_SQL


# ---------------------------------------------------------------------------
# Truncated Katz centrality (Katz 1953), β = 0.05, 3 hops: c(v) =
# Σ_k β^k · (#walks of length k ending at v). Walk counts come from
# k node-keyed join-aggregations (the PageRank shape without the
# normalization); per-node contributions stay exact integers scaled
# by β^k at the end. Top-10 by quantized score.
# ---------------------------------------------------------------------------
def _katz_oracle() -> str:
    return f"""
    WITH e AS ({_edges_sql17()}),
    adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
    w1 AS (SELECT v, CAST(count(*) AS BIGINT) AS c1 FROM adj GROUP BY v),
    w2 AS (
      SELECT a2.v, CAST(sum(w1.c1) AS BIGINT) AS c2
      FROM adj a2 JOIN w1 ON a2.u = w1.v GROUP BY a2.v
    ),
    w3 AS (
      SELECT a3.v, CAST(sum(w2.c2) AS BIGINT) AS c3
      FROM adj a3 JOIN w2 ON a3.u = w2.v GROUP BY a3.v
    ),
    katz AS (
      SELECT w1.v,
             CAST(floor((0.05 * w1.c1 + 0.0025 * coalesce(w2.c2, 0)
                         + 0.000125 * coalesce(w3.c3, 0)) * 1.0e6 + 0.5)
                  AS BIGINT) AS k_u
      FROM w1
      LEFT JOIN w2 ON w1.v = w2.v
      LEFT JOIN w3 ON w1.v = w3.v
    )
    SELECT v AS node, CAST(k_u AS DOUBLE) / 1.0e6 AS katz_score
    FROM katz ORDER BY k_u DESC, v LIMIT 10
    """


@_register("graph_katz_centrality_3hop", oracle="__KATZ__")
def graph_katz_centrality_3hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """β-attenuated walk counts to depth 3: three node-keyed
    join-aggregations (exact integer walk counts — the unnormalized
    PageRank shape), score assembled once and quantized. Top-10."""
    from cioos_siooc_data_transform_spark.plans.staged_r8 import (
        _copurchase_edges,
    )

    e = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    adj = (
        e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
    )
    w1 = adj.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    w2 = (
        adj.join(w1.select(F.col("v").alias("u"), "c1"), "u")
        .groupBy("v")
        .agg(F.sum("c1").cast("long").alias("c2"))
    )
    w3 = (
        adj.join(w2.select(F.col("v").alias("u"), "c2"), "u")
        .groupBy("v")
        .agg(F.sum("c2").cast("long").alias("c3"))
    )
    katz = (
        w1.join(w2, "v", "left")
        .join(w3, "v", "left")
        .select(
            "v",
            F.floor(
                (
                    0.05 * F.col("c1")
                    + 0.0025 * F.coalesce(F.col("c2"), F.lit(0))
                    + 0.000125 * F.coalesce(F.col("c3"), F.lit(0))
                )
                * 1.0e6
                + 0.5
            )
            .cast("long")
            .alias("k_u"),
        )
    )
    return (
        katz.orderBy(F.col("k_u").desc(), "v")
        .limit(10)
        .select(
            F.col("v").alias("node"),
            (F.col("k_u").cast("double") / 1.0e6).alias("katz_score"),
        )
    )


STAGED_ORACLES["graph_katz_centrality_3hop"] = _katz_oracle()


# ---------------------------------------------------------------------------
# Link-predictor rank agreement: common-neighbors vs Adamic–Adar top-20
# candidate sets — overlap and Spearman-style rank distance over the
# union (both predictors already registered individually; the
# agreement says whether the cheaper one suffices).
# ---------------------------------------------------------------------------
def _linkpred_oracle() -> str:
    return f"""
    WITH e AS ({_edges_sql17()}),
    adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT u AS z, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY u),
    wedge AS (
      SELECT x.v AS a, y.v AS c, x.u AS mid
      FROM adj x JOIN adj y ON x.u = y.u AND x.v < y.v
    ),
    scored AS (
      SELECT w.a, w.c, CAST(count(*) AS BIGINT) AS cn,
             CAST(sum(CAST(floor(1.0e0 / ln(CAST(d.deg AS DOUBLE)) * 1.0e9
                                 + 0.5) AS BIGINT)) AS BIGINT) AS aa_nano
      FROM wedge w JOIN deg d ON d.z = w.mid
      GROUP BY w.a, w.c
    ),
    cand AS (
      SELECT s.a, s.c, s.cn, s.aa_nano
      FROM scored s ANTI JOIN e ON s.a = e.a AND s.c = e.b
    ),
    top_cn AS (
      SELECT a, c, row_number() OVER (ORDER BY cn DESC, a, c) AS r_cn
      FROM cand QUALIFY r_cn <= 20
    ),
    top_aa AS (
      SELECT a, c, row_number() OVER (ORDER BY aa_nano DESC, a, c) AS r_aa
      FROM cand QUALIFY r_aa <= 20
    ),
    u AS (
      SELECT coalesce(tc.a, ta.a) AS a,
             CASE WHEN tc.a IS NOT NULL THEN 1 ELSE 0 END AS in_cn,
             CASE WHEN ta.a IS NOT NULL THEN 1 ELSE 0 END AS in_aa
      FROM top_cn tc FULL OUTER JOIN top_aa ta
        ON tc.a = ta.a AND tc.c = ta.c
    )
    SELECT CAST(sum(in_cn) AS BIGINT) AS n_cn_top,
           CAST(sum(in_aa) AS BIGINT) AS n_aa_top,
           CAST(sum(in_cn * in_aa) AS BIGINT) AS n_both,
           floor(CAST(sum(in_cn * in_aa) AS DOUBLE)
                 / (sum(in_cn) + sum(in_aa) - sum(in_cn * in_aa))
                 * 1.0e6 + 0.5) / 1.0e6 AS topk_jaccard
    FROM u
    """


@_register("graph_linkpred_rank_agreement", oracle="__LINKPRED__")
def graph_linkpred_rank_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-20 agreement of common-neighbors vs Adamic–Adar link
    prediction: ONE wedge join scores both predictors (exact count +
    nano-quantized AA), two TakeOrdered top-k, one pair-keyed outer
    join."""
    from cioos_siooc_data_transform_spark.plans.staged_r8 import (
        _copurchase_edges,
    )

    e = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    adj = (
        e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    x = adj.select(F.col("u").alias("mid"), F.col("v").alias("a"))
    y = adj.select(F.col("u").alias("mid"), F.col("v").alias("c"))
    wedge = x.join(y, "mid").filter(F.col("a") < F.col("c"))
    scored = (
        wedge.join(
            deg.select(F.col("u").alias("mid"), "deg"), "mid"
        )
        .groupBy("a", "c")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cn"),
            F.sum(
                F.floor(
                    1.0 / F.log(F.col("deg").cast("double")) * 1.0e9 + 0.5
                ).cast("long")
            )
            .cast("long")
            .alias("aa_nano"),
        )
    )
    cand = scored.join(
        e.select(F.col("a"), F.col("b").alias("c")), ["a", "c"], "left_anti"
    )
    top_cn = (
        cand.orderBy(F.col("cn").desc(), "a", "c")
        .limit(20)
        .select("a", "c", F.lit(1).alias("in_cn"))
    )
    top_aa = (
        cand.orderBy(F.col("aa_nano").desc(), "a", "c")
        .limit(20)
        .select("a", "c", F.lit(1).alias("in_aa"))
    )
    u = top_cn.join(top_aa, ["a", "c"], "full_outer").select(
        F.coalesce(F.col("in_cn"), F.lit(0)).alias("in_cn"),
        F.coalesce(F.col("in_aa"), F.lit(0)).alias("in_aa"),
    )
    both = F.sum(F.col("in_cn") * F.col("in_aa")).cast("long")
    return u.agg(
        F.sum("in_cn").cast("long").alias("n_cn_top"),
        F.sum("in_aa").cast("long").alias("n_aa_top"),
        both.alias("n_both"),
        (
            F.floor(
                both.cast("double")
                / (
                    F.sum("in_cn").cast("long")
                    + F.sum("in_aa").cast("long")
                    - both
                )
                * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("topk_jaccard"),
    )


STAGED_ORACLES["graph_linkpred_rank_agreement"] = _linkpred_oracle()


# ---------------------------------------------------------------------------
# Geometric fit of the co-purchase support distribution: support counts
# are ≥2 by construction, so (support − 2) ~ Geometric(p) with MLE
# p̂ = 1/(1 + mean(support − 2)); χ²-style GOF over the bounded support
# alphabet with an expected-count floor.
# ---------------------------------------------------------------------------
_SUPPORT_FIT_SQL = """
    WITH sup AS (
      SELECT support FROM (
        SELECT x.l_partkey AS pa, y.l_partkey AS pb,
               CAST(count(*) AS BIGINT) AS support
        FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) x
        JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) y
          ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        GROUP BY 1, 2
      ) WHERE support >= 2
    ),
    mle AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             1.0 / (1.0 + (CAST(sum(support) AS DOUBLE) / count(*) - 2.0))
               AS p
      FROM sup
    ),
    obs AS (
      SELECT support - 2 AS k, CAST(count(*) AS BIGINT) AS o
      FROM sup GROUP BY 1
    ),
    cells AS (
      SELECT o.k, o.o,
             m.n * m.p * pow(1.0 - m.p, o.k) AS e
      FROM obs o CROSS JOIN mle m
    )
    SELECT max(m.n) AS n_edges,
           floor(max(m.p) * 1.0e6 + 0.5) / 1.0e6 AS geometric_p,
           CAST(count(*) FILTER (c.e >= 5.0) AS BIGINT) AS n_cells,
           floor(sum(CASE WHEN c.e >= 5.0
                     THEN (c.o - c.e) * (c.o - c.e) / c.e ELSE 0.0 END)
                 * 1.0e6 + 0.5) / 1.0e6 AS gof_chi2
    FROM cells c CROSS JOIN mle m
"""


@_register("graph_support_geometric_fit", oracle=_SUPPORT_FIT_SQL)
def graph_support_geometric_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric MLE + GOF of the co-purchase support distribution:
    the support histogram is a bounded alphabet; expected counts from
    the 1-row broadcast MLE, χ² over cells with e ≥ 5."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("k0"), F.col("l_partkey").alias("pa"))
    b = items.select(F.col("l_orderkey").alias("k0"), F.col("l_partkey").alias("pb"))
    sup = (
        a.join(b, "k0")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= 2)
        .select("support")
    )
    mle = sup.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            1.0
            / (
                1.0
                + (F.sum("support").cast("double") / F.count(F.lit(1)) - 2.0)
            )
        ).alias("p"),
    )
    obs = sup.groupBy((F.col("support") - 2).alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    cells = obs.crossJoin(F.broadcast(mle)).select(
        "k",
        "o",
        (F.col("n") * F.col("p") * F.pow(1.0 - F.col("p"), F.col("k"))).alias(
            "e"
        ),
        "n",
        "p",
    )
    return cells.agg(
        F.max("n").alias("n_edges"),
        (F.floor(F.max("p") * 1.0e6 + 0.5) / 1.0e6).alias("geometric_p"),
        F.sum(F.when(F.col("e") >= 5.0, 1).otherwise(0))
        .cast("long")
        .alias("n_cells"),
        (
            F.floor(
                F.sum(
                    F.when(
                        F.col("e") >= 5.0,
                        (F.col("o") - F.col("e"))
                        * (F.col("o") - F.col("e"))
                        / F.col("e"),
                    ).otherwise(0.0)
                )
                * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("gof_chi2"),
    )


# ===========================================================================
# Wave D — training-pipeline audits.
# ===========================================================================

# ---------------------------------------------------------------------------
# Keeper-policy quality bias: within exact-dup clusters, does
# keep-lowest-id systematically pick shorter/lower-quality docs than
# keep-longest? Mean kept long-word-ratio under both policies over
# multi-doc clusters — the survivorship-policy audit.
# ---------------------------------------------------------------------------
_KEEPER_SQL = """
    WITH d AS (
      SELECT doc_id, md5(text) AS fp,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(floor(
               (len(list_filter(string_split(text, ' '), t -> strlen(t) >= 5))
                * 1.0 / len(string_split(text, ' '))) * 1.0e6 + 0.5)
             AS BIGINT) AS q_u
      FROM documents
    ),
    sized AS (
      SELECT fp, CAST(count(*) AS BIGINT) AS csize FROM d GROUP BY fp
    ),
    multi AS (
      SELECT d.* FROM d JOIN sized s ON d.fp = s.fp WHERE s.csize >= 2
    ),
    first_pick AS (
      SELECT fp, q_u,
             row_number() OVER (PARTITION BY fp ORDER BY doc_id ASC) AS r
      FROM multi
    ),
    longest_pick AS (
      SELECT fp, q_u,
             row_number() OVER (PARTITION BY fp
                                ORDER BY n_tok DESC, doc_id ASC) AS r
      FROM multi
    ),
    s AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM first_pick WHERE r = 1)
               AS n_clusters,
             (SELECT CAST(sum(q_u) AS BIGINT) FROM first_pick WHERE r = 1)
               AS q_first,
             (SELECT CAST(sum(q_u) AS BIGINT) FROM longest_pick WHERE r = 1)
               AS q_longest
    )
    SELECT n_clusters,
           floor(CAST(q_first AS DOUBLE) / n_clusters + 0.5) / 1.0e6
             AS mean_quality_keep_first,
           floor(CAST(q_longest AS DOUBLE) / n_clusters + 0.5) / 1.0e6
             AS mean_quality_keep_longest,
           floor((CAST(q_longest AS DOUBLE) - q_first) / n_clusters + 0.5)
             / 1.0e6 AS policy_gap
    FROM s
"""


@_register("dedup_keeper_policy_bias", oracle=_KEEPER_SQL)
def dedup_keeper_policy_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship-policy audit over exact-dup clusters (csize ≥ 2):
    mean kept quality under keep-first-id vs keep-longest — windows
    partition by digest (bounded cluster partitions)."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr

    docs = _t(spark, sf_dir, "documents")
    words = words_expr(F.col("text"))
    q_u = F.floor(
        F.size(F.filter(words, lambda t: F.length(t) >= 5))
        * 1.0
        / F.size(words)
        * 1.0e6
        + 0.5
    ).cast("long")
    d = docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("fp"),
        F.size(words).cast("long").alias("n_tok"),
        q_u.alias("q_u"),
    )
    sized = d.groupBy("fp").agg(F.count(F.lit(1)).cast("long").alias("csize"))
    multi = d.join(sized.filter(F.col("csize") >= 2), "fp")
    wf = Window.partitionBy("fp").orderBy(F.col("doc_id").asc())
    wl = Window.partitionBy("fp").orderBy(
        F.col("n_tok").desc(), F.col("doc_id").asc()
    )
    first_pick = (
        multi.withColumn("r", F.row_number().over(wf))
        .filter(F.col("r") == 1)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("q_u").cast("long").alias("q_first"),
        )
    )
    longest_pick = (
        multi.withColumn("r", F.row_number().over(wl))
        .filter(F.col("r") == 1)
        .agg(F.sum("q_u").cast("long").alias("q_longest"))
    )
    s = first_pick.crossJoin(F.broadcast(longest_pick))
    return s.select(
        "n_clusters",
        (
            F.floor(F.col("q_first").cast("double") / F.col("n_clusters") + 0.5)
            / 1.0e6
        ).alias("mean_quality_keep_first"),
        (
            F.floor(
                F.col("q_longest").cast("double") / F.col("n_clusters") + 0.5
            )
            / 1.0e6
        ).alias("mean_quality_keep_longest"),
        (
            F.floor(
                (F.col("q_longest").cast("double") - F.col("q_first"))
                / F.col("n_clusters")
                + 0.5
            )
            / 1.0e6
        ).alias("policy_gap"),
    )


# ---------------------------------------------------------------------------
# Dedup token yield by source: per source, raw tokens vs tokens after
# keep-one-per-exact-cluster — which sources are mostly duplication?
# (Cluster keeper = min doc_id; the kept doc's tokens attribute to the
# KEPT doc's source.)
# ---------------------------------------------------------------------------
_YIELD_SQL = """
    WITH d AS (
      SELECT doc_id, source, md5(text) AS fp,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ),
    raw AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS raw_tokens
      FROM d GROUP BY source
    ),
    keeper AS (
      SELECT source, n_tok FROM (
        SELECT source, n_tok,
               row_number() OVER (PARTITION BY fp ORDER BY doc_id ASC) AS r
        FROM d
      ) WHERE r = 1
    ),
    kept AS (
      SELECT source, CAST(count(*) AS BIGINT) AS kept_docs,
             CAST(sum(n_tok) AS BIGINT) AS kept_tokens
      FROM keeper GROUP BY source
    )
    SELECT r.source, r.n_docs, r.raw_tokens,
           coalesce(k.kept_docs, 0) AS kept_docs,
           coalesce(k.kept_tokens, 0) AS kept_tokens,
           floor(CAST(coalesce(k.kept_tokens, 0) AS DOUBLE) / r.raw_tokens
                 * 1.0e6 + 0.5) / 1.0e6 AS token_yield
    FROM raw r LEFT JOIN kept k ON r.source = k.source
    ORDER BY r.source
"""


@_register("dedup_token_yield_by_source", oracle=_YIELD_SQL)
def dedup_token_yield_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-dedup token yield per source (keeper = min doc_id per
    exact-dup digest): one digest-partitioned keeper window, two
    bounded source rollups."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr

    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        F.md5(F.col("text")).alias("fp"),
        F.size(words_expr(F.col("text"))).cast("long").alias("n_tok"),
    )
    raw = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("raw_tokens"),
    )
    w = Window.partitionBy("fp").orderBy(F.col("doc_id").asc())
    keeper = (
        d.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("kept_docs"),
            F.sum("n_tok").cast("long").alias("kept_tokens"),
        )
    )
    return (
        raw.join(keeper, "source", "left")
        .select(
            "source",
            "n_docs",
            "raw_tokens",
            F.coalesce(F.col("kept_docs"), F.lit(0)).alias("kept_docs"),
            F.coalesce(F.col("kept_tokens"), F.lit(0)).alias("kept_tokens"),
            (
                F.floor(
                    F.coalesce(F.col("kept_tokens"), F.lit(0)).cast("double")
                    / F.col("raw_tokens")
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("token_yield"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Decontamination false-positive length profile: contamination flag
# rates by document-length quartile — short docs share shingles by
# chance, so a length-blind threshold over-flags them. Quartiles via
# ntile_two_pass; the overlap machinery is the registered shape.
# ---------------------------------------------------------------------------
def _decontam_len_oracle() -> str:
    from cioos_siooc_data_transform_spark.plans.dedup_queries import (
        _SHINGLES_CTE,
    )

    return f"""
    WITH {_SHINGLES_CTE},
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
    train AS (SELECT doc_id, s FROM sh WHERE doc_id % 97 <> 0),
    ov AS (
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(count(b.s) AS BIGINT) AS n_overlap
      FROM train t LEFT JOIN bench b ON t.s = b.s
      GROUP BY t.doc_id
    ),
    tiled AS (
      SELECT n_overlap,
             CAST(ntile(4) OVER (ORDER BY n_shingles ASC, doc_id ASC)
                  AS BIGINT) AS quartile
      FROM ov
    )
    SELECT quartile, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_overlap >= 4 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           floor(CAST(sum(CASE WHEN n_overlap >= 4 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*) * 1.0e6 + 0.5) / 1.0e6
             AS flag_rate
    FROM tiled GROUP BY quartile ORDER BY quartile
    """


@_register("decontam_flag_rate_by_length", oracle="__DECLEN__")
def decontam_flag_rate_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination flag rate by shingle-count quartile (quartiles via
    ntile_two_pass — scale-safe global ordering): a rising rate toward
    the short quartile is the false-positive signature."""
    from cioos_siooc_data_transform_spark.operators.dedup import (
        word_shingles,
        words_expr,
    )
    from cioos_siooc_data_transform_spark.operators.windows import (
        ntile_two_pass,
    )

    docs = _t(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(words_expr(F.col("text")), 3))
        ).alias("s"),
    )
    bench = (
        sh.filter(F.col("doc_id") % 97 == 0).select("s").distinct()
    ).withColumn("_hit", F.lit(1))
    train = sh.filter(F.col("doc_id") % 97 != 0)
    ov = (
        train.join(F.broadcast(bench), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.count("_hit").cast("long").alias("n_overlap"),
        )
    )
    tiled = ntile_two_pass(
        ov, "n_shingles", "doc_id", n_tiles=4, out_col="quartile"
    )
    return (
        tiled.groupBy("quartile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("n_overlap") >= 4, 1).otherwise(0))
            .cast("long")
            .alias("n_flagged"),
            (
                F.floor(
                    F.sum(
                        F.when(F.col("n_overlap") >= 4, 1).otherwise(0)
                    ).cast("double")
                    / F.count(F.lit(1))
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("flag_rate"),
        )
        .orderBy("quartile")
    )


STAGED_ORACLES["decontam_flag_rate_by_length"] = _decontam_len_oracle()


# ---------------------------------------------------------------------------
# Design effect of language-stratified sampling vs SRS for estimating
# mean token count: DEFF = Var_strat/Var_srs (proportional allocation:
# DEFF = Σ(Nh/N·s²h) / s²_total). DEFF < 1 quantifies what the strata
# buy.
# ---------------------------------------------------------------------------
_DEFF_SQL = """
    WITH d AS (
      SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ),
    grp AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS nh,
             CAST(sum(n_tok) AS BIGINT) AS sh,
             CAST(sum(n_tok * n_tok) AS HUGEINT) AS qh
      FROM d GROUP BY lang
    ),
    tot AS (
      SELECT CAST(sum(nh) AS BIGINT) AS n, CAST(sum(sh) AS BIGINT) AS s,
             CAST(sum(qh) AS HUGEINT) AS q,
             sum((CAST(qh AS DOUBLE) - CAST(sh AS DOUBLE) * sh / nh)
                 / (nh - 1) * nh) AS within_weighted
      FROM grp
    )
    SELECT n AS n_docs,
           floor((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)
                 * 1.0e6 + 0.5) / 1.0e6 AS srs_variance,
           floor(within_weighted / n * 1.0e6 + 0.5) / 1.0e6
             AS stratified_variance,
           floor((within_weighted / n)
                 / ((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1))
                 * 1.0e6 + 0.5) / 1.0e6 AS design_effect
    FROM tot
"""


@_register("sample_design_effect_by_lang", oracle=_DEFF_SQL)
def sample_design_effect_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Design effect of proportional language stratification for the
    mean-token estimator: exact per-stratum moments, one bounded
    rollup."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr

    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "lang", F.size(words_expr(F.col("text"))).cast("long").alias("n_tok")
    )
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    grp = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("nh"),
        F.sum("n_tok").cast("long").alias("sh"),
        F.sum(dec("n_tok") * dec("n_tok")).cast("decimal(38,0)").alias("qh"),
    )
    shd = F.col("sh").cast("double")
    within = (
        (F.col("qh").cast("double") - shd * shd / F.col("nh"))
        / (F.col("nh") - 1)
        * F.col("nh")
    )
    tot = grp.agg(
        F.sum("nh").cast("long").alias("n"),
        F.sum("sh").cast("long").alias("s"),
        F.sum("qh").cast("decimal(38,0)").alias("q"),
        F.sum(within).alias("within_weighted"),
    )
    sd = F.col("s").cast("double")
    srs = (F.col("q").cast("double") - sd * sd / F.col("n")) / (F.col("n") - 1)
    strat = F.col("within_weighted") / F.col("n")
    q6 = lambda e: F.floor(e * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    return tot.select(
        F.col("n").alias("n_docs"),
        q6(srs).alias("srs_variance"),
        q6(strat).alias("stratified_variance"),
        q6(strat / srs).alias("design_effect"),
    )


# ---------------------------------------------------------------------------
# Mixture reweighting audit: sampling multipliers that move the corpus
# from its observed language mix to a UNIFORM target — the max
# multiplier is the effective epoch count of the scarcest language
# (the number that decides whether the target mix is even reachable).
# ---------------------------------------------------------------------------
_MIXTURE_SQL = """
    WITH grp AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS t,
             CAST(count(*) AS BIGINT) AS k
      FROM grp
    )
    SELECT g.lang, g.n_docs, g.n_tokens,
           floor(CAST(g.n_tokens AS DOUBLE) / t.t * 1.0e6 + 0.5) / 1.0e6
             AS observed_share,
           floor(1.0 / t.k * 1.0e6 + 0.5) / 1.0e6 AS target_share,
           floor((1.0 / t.k) / (CAST(g.n_tokens AS DOUBLE) / t.t) * 1.0e6
                 + 0.5) / 1.0e6 AS sampling_multiplier
    FROM grp g CROSS JOIN tot t
    ORDER BY g.lang
"""


@_register("mixture_reweighting_audit", oracle=_MIXTURE_SQL)
def mixture_reweighting_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-target mixture multipliers per language from exact token
    counts — multiplier > 1 means that language must repeat (effective
    epochs), the practical ceiling of any reweighting plan."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr

    docs = _t(spark, sf_dir, "documents")
    grp = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(words_expr(F.col("text"))).cast("long"))
        .cast("long")
        .alias("n_tokens"),
    )
    tot = grp.agg(
        F.sum("n_tokens").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    share = F.col("n_tokens").cast("double") / F.col("t")
    q6 = lambda e: F.floor(e * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    return (
        grp.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            q6(share).alias("observed_share"),
            q6(1.0 / F.col("k")).alias("target_share"),
            q6((1.0 / F.col("k")) / share).alias("sampling_multiplier"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Prefix-hash vs full-text dedup agreement: clusters from the first-16-
# token prefix digest vs the full digest — prefix dedup is cheaper but
# merges distinct docs sharing an opener. Cluster-count inflation and
# the doc-level disagreement rate.
# ---------------------------------------------------------------------------
_PREFIX_SQL = """
    WITH d AS (
      SELECT doc_id,
             md5(text) AS full_fp,
             md5(array_to_string(string_split(text, ' ')[1:16], ' '))
               AS prefix_fp
      FROM documents
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT full_fp) AS BIGINT) AS full_clusters,
             CAST(count(DISTINCT prefix_fp) AS BIGINT) AS prefix_clusters
      FROM d
    ),
    pairs AS (
      SELECT prefix_fp, CAST(count(DISTINCT full_fp) AS BIGINT) AS n_full
      FROM d GROUP BY prefix_fp
    ),
    over_merged AS (
      SELECT CAST(count(*) AS BIGINT) AS n_overmerged_prefix_clusters
      FROM pairs WHERE n_full >= 2
    )
    SELECT s.n_docs, s.full_clusters, s.prefix_clusters,
           o.n_overmerged_prefix_clusters,
           floor(CAST(s.prefix_clusters AS DOUBLE) / s.full_clusters * 1.0e6
                 + 0.5) / 1.0e6 AS cluster_ratio
    FROM s CROSS JOIN over_merged o
"""


@_register("dedup_prefix_vs_full_agreement", oracle=_PREFIX_SQL)
def dedup_prefix_vs_full_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Prefix-digest dedup vs full-digest dedup: cluster counts, the
    over-merge count (prefix clusters containing ≥2 full clusters) —
    two digest rollups, zero windows."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr

    docs = _t(spark, sf_dir, "documents")
    words = words_expr(F.col("text"))
    d = docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("full_fp"),
        F.md5(F.concat_ws(" ", F.slice(words, 1, 16))).alias("prefix_fp"),
    )
    s = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("full_fp").cast("long").alias("full_clusters"),
        F.countDistinct("prefix_fp").cast("long").alias("prefix_clusters"),
    )
    pairs = d.groupBy("prefix_fp").agg(
        F.countDistinct("full_fp").cast("long").alias("n_full")
    )
    over = pairs.filter(F.col("n_full") >= 2).agg(
        F.count(F.lit(1)).cast("long").alias("n_overmerged_prefix_clusters")
    )
    return s.crossJoin(F.broadcast(over)).select(
        "n_docs",
        "full_clusters",
        "prefix_clusters",
        "n_overmerged_prefix_clusters",
        (
            F.floor(
                F.col("prefix_clusters").cast("double")
                / F.col("full_clusters")
                * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("cluster_ratio"),
    )


# ===========================================================================
# Wave E — text analytics.
# ===========================================================================

# ---------------------------------------------------------------------------
# Lexical sophistication by source: mean corpus log-frequency of each
# doc's DISTINCT words (type-based — rare-word-heavy docs score low).
# The vocabulary table broadcasts (the registered lm_unigram_logprob
# shape); per-type terms quantize at 1e-9.
# ---------------------------------------------------------------------------
_SOPH_SQL = """
    WITH tok AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM vocab),
    types AS (SELECT DISTINCT doc_id, source, w FROM tok),
    per_doc AS (
      SELECT t.doc_id, t.source,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CAST(floor(ln(CAST(v.c AS DOUBLE) / tt.n) * 1.0e9 + 0.5)
                   AS BIGINT)) AS BIGINT) AS s_u
      FROM types t JOIN vocab v ON t.w = v.w CROSS JOIN tot tt
      GROUP BY t.doc_id, t.source
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           floor(CAST(sum(CAST(floor(CAST(s_u AS DOUBLE) / n_types / 1.0e3
                 + 0.5) AS BIGINT)) AS DOUBLE) / count(*) / 1.0e3 + 0.5)
             / 1.0e3 AS mean_log_freq
    FROM per_doc GROUP BY source ORDER BY source
"""


@_register("text_lexical_sophistication", oracle=_SOPH_SQL)
def text_lexical_sophistication(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-based mean log corpus frequency per source: broadcast
    vocabulary join, per-type terms at 1e-9, per-doc means at 1e-6
    integer units before the source mean."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.explode(words_expr(F.col("text"))).alias("w")
    )
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = vocab.agg(F.sum("c").cast("long").alias("n"))
    types = tok.distinct()
    per_doc = (
        types.join(F.broadcast(vocab), "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum(
                F.floor(
                    F.log(F.col("c").cast("double") / F.col("n")) * 1.0e9
                    + 0.5
                ).cast("long")
            )
            .cast("long")
            .alias("s_u"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            (
                F.floor(
                    F.sum(
                        F.floor(
                            F.col("s_u").cast("double")
                            / F.col("n_types")
                            / 1.0e3
                            + 0.5
                        ).cast("long")
                    ).cast("double")
                    / F.count(F.lit(1))
                    / 1.0e3
                    + 0.5
                )
                / 1.0e3
            ).alias("mean_log_freq"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Vocabulary Gini: concentration of the token frequency distribution
# (the inequality view of Zipf) — ranks from the two-pass operator, so
# the shape holds at web-corpus vocabulary sizes.
# ---------------------------------------------------------------------------
_VGINI_SQL = """
    WITH vocab AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
      ) GROUP BY w
    ),
    ranked AS (
      SELECT c, CAST(row_number() OVER (ORDER BY c ASC, w ASC) AS BIGINT) AS i
      FROM vocab
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS total,
             CAST(sum(CAST(i AS HUGEINT) * c) AS HUGEINT) AS weighted
      FROM ranked
    )
    SELECT n AS vocab_size, total AS n_tokens,
           floor((2.0 * CAST(weighted AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE))
                  - (CAST(n AS DOUBLE) + 1.0) / n) * 1.0e6 + 0.5) / 1.0e6
             AS vocab_gini
    FROM s
"""


@_register("vocab_gini_concentration", oracle=_VGINI_SQL)
def vocab_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini of token frequencies over the vocabulary: ranks via
    ranked_cumsum_two_pass (word tiebreak), exact integer weighted
    sums, one division."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr
    from cioos_siooc_data_transform_spark.operators.windows import (
        ranked_cumsum_two_pass,
    )

    docs = _t(spark, sf_dir, "documents")
    vocab = docs.select(
        F.explode(words_expr(F.col("text"))).alias("w")
    ).groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ranked = ranked_cumsum_two_pass(
        vocab, "c", "w", ascending=True, out_rank="i", out_cum="__cum"
    ).select("c", F.col("i").cast("long").alias("i"))
    dec = lambda col: F.col(col).cast("decimal(19,0)")  # noqa: E731
    s = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("total"),
        F.sum(dec("i") * dec("c")).cast("decimal(38,0)").alias("weighted"),
    )
    nd = F.col("n").cast("double")
    return s.select(
        F.col("n").alias("vocab_size"),
        F.col("total").alias("n_tokens"),
        (
            F.floor(
                (
                    2.0
                    * F.col("weighted").cast("double")
                    / (nd * F.col("total").cast("double"))
                    - (nd + 1.0) / nd
                )
                * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("vocab_gini"),
    )


# ---------------------------------------------------------------------------
# Bigram coverage per language: distinct observed bigrams vs the V²
# possible — the syntactic-diversity companion to unigram vocabulary
# metrics (templated corpora sit far below natural coverage).
# ---------------------------------------------------------------------------
_BIGRAM_COV_SQL = """
    WITH w2 AS (SELECT lang, string_split(text, ' ') AS words FROM documents),
    bg AS (
      SELECT lang, words[i] || ' ' || words[i + 1] AS b
      FROM w2, unnest(generate_series(1, len(words) - 1)) AS u(i)
    ),
    uni AS (
      SELECT lang, CAST(count(DISTINCT w) AS BIGINT) AS v FROM (
        SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
      ) GROUP BY lang
    ),
    s AS (
      SELECT lang, CAST(count(DISTINCT b) AS BIGINT) AS distinct_bigrams,
             CAST(count(*) AS BIGINT) AS n_bigrams
      FROM bg GROUP BY lang
    )
    SELECT s.lang, u.v AS vocab_size, s.distinct_bigrams, s.n_bigrams,
           floor(CAST(s.distinct_bigrams AS DOUBLE)
                 / (CAST(u.v AS DOUBLE) * u.v) * 1.0e6 + 0.5) / 1.0e6
             AS coverage_of_possible,
           floor(CAST(s.distinct_bigrams AS DOUBLE) / s.n_bigrams * 1.0e6
                 + 0.5) / 1.0e6 AS type_token_ratio
    FROM s JOIN uni u ON s.lang = u.lang
    ORDER BY s.lang
"""


@_register("text_bigram_coverage", oracle=_BIGRAM_COV_SQL)
def text_bigram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed-vs-possible bigram coverage per language: the shifted-
    slice zip (the fast shingle construction) feeds two bounded
    rollups."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr

    docs = _t(spark, sf_dir, "documents")
    words = words_expr(F.col("text"))
    n1 = F.greatest(F.size(words) - 1, F.lit(0))
    bg = docs.select(
        "lang",
        F.explode(
            F.zip_with(
                F.slice(words, 1, n1),
                F.slice(words, 2, n1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("b"),
    )
    uni = (
        docs.select("lang", F.explode(words).alias("w"))
        .groupBy("lang")
        .agg(F.countDistinct("w").cast("long").alias("v"))
    )
    s = bg.groupBy("lang").agg(
        F.countDistinct("b").cast("long").alias("distinct_bigrams"),
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
    )
    q6 = lambda e: F.floor(e * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    return (
        s.join(uni, "lang")
        .select(
            "lang",
            F.col("v").alias("vocab_size"),
            "distinct_bigrams",
            "n_bigrams",
            q6(
                F.col("distinct_bigrams").cast("double")
                / (F.col("v").cast("double") * F.col("v"))
            ).alias("coverage_of_possible"),
            q6(
                F.col("distinct_bigrams").cast("double") / F.col("n_bigrams")
            ).alias("type_token_ratio"),
        )
        .orderBy("lang")
    )


# ===========================================================================
# Wave F — round-10 top-up batch 2 (apportionment, G-test, profile
# gradients, dose-response, transition lift, day-of-month seasonality).
# ===========================================================================

# ---------------------------------------------------------------------------
# Largest-remainder (Hamilton) frame-budget apportionment: distribute a
# global budget of B = 4·|videos| frame slots proportionally to video
# duration, exactly — floor allocations plus one extra for the top-R
# fractional remainders, R = B − Σfloor. The remainder ranking rides
# ranked_cumsum_two_pass; the audit's invariant is Σallocated == B
# bit-exactly (the property floating-point proportional splits break).
# ---------------------------------------------------------------------------
_APPORTION_SQL = """
    WITH media AS (
      SELECT doc_id, CAST(strlen(text) % 240 + 8 AS BIGINT) AS dur
      FROM documents
    ),
    tot AS (
      SELECT CAST(sum(dur) AS BIGINT) AS total_dur,
             CAST(count(*) * 4 AS BIGINT) AS budget
      FROM media
    ),
    quota AS (
      SELECT doc_id,
             CAST(floor(CAST(dur AS HUGEINT) * budget / total_dur) AS BIGINT)
               AS base,
             CAST((CAST(dur AS HUGEINT) * budget) % total_dur AS BIGINT)
               AS rem_num
      FROM media CROSS JOIN tot
    ),
    resid AS (
      SELECT CAST(budget - (SELECT sum(base) FROM quota) AS BIGINT) AS r
      FROM tot
    ),
    ranked AS (
      SELECT doc_id, base,
             CAST(row_number() OVER (ORDER BY rem_num DESC, doc_id ASC)
                  AS BIGINT) AS rr
      FROM quota
    ),
    alloc AS (
      SELECT doc_id,
             base + CASE WHEN rr <= (SELECT r FROM resid) THEN 1 ELSE 0 END
               AS frames
      FROM ranked
    )
    SELECT CAST(count(*) AS BIGINT) AS n_videos,
           CAST(max(t.budget) AS BIGINT) AS budget,
           CAST(sum(a.frames) AS BIGINT) AS allocated,
           CAST(max(t.budget) - sum(a.frames) AS BIGINT) AS shortfall,
           CAST(min(a.frames) AS BIGINT) AS min_frames,
           CAST(max(a.frames) AS BIGINT) AS max_frames
    FROM alloc a CROSS JOIN tot t
"""


@_register("multimodal_frame_budget_apportionment", oracle=_APPORTION_SQL)
def multimodal_frame_budget_apportionment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hamilton apportionment of a global frame budget over the fake
    video durations: integer quotas (HUGEINT/decimal cross-multiplied —
    no float division), fractional-remainder ranks via
    ranked_cumsum_two_pass, invariant Σframes == budget exactly."""
    from cioos_siooc_data_transform_spark.operators.windows import (
        ranked_cumsum_two_pass,
    )

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        (F.octet_length("text") % 240 + 8).cast("long").alias("dur"),
    )
    tot = media.agg(
        F.sum("dur").cast("long").alias("total_dur"),
        (F.count(F.lit(1)) * 4).cast("long").alias("budget"),
    )
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    quota = media.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        F.floor(
            (dec("dur") * dec("budget")).cast("decimal(38,0)")
            / dec("total_dur")
        )
        .cast("long")
        .alias("base"),
        (
            (dec("dur") * dec("budget")).cast("decimal(38,0)")
            % dec("total_dur")
        )
        .cast("long")
        .alias("rem_num"),
        "budget",
    )
    resid = quota.agg(
        (F.max("budget") - F.sum("base")).cast("long").alias("r")
    )
    ranked = ranked_cumsum_two_pass(
        quota, "rem_num", "doc_id", ascending=False,
        out_rank="rr", out_cum="__cum",
    )
    alloc = ranked.crossJoin(F.broadcast(resid)).select(
        "doc_id",
        (
            F.col("base")
            + F.when(F.col("rr") <= F.col("r"), 1).otherwise(0)
        ).alias("frames"),
    )
    return alloc.crossJoin(F.broadcast(tot)).agg(
        F.count(F.lit(1)).cast("long").alias("n_videos"),
        F.max("budget").cast("long").alias("budget"),
        F.sum("frames").cast("long").alias("allocated"),
        (F.max("budget") - F.sum("frames")).cast("long").alias("shortfall"),
        F.min("frames").cast("long").alias("min_frames"),
        F.max("frames").cast("long").alias("max_frames"),
    )


# ---------------------------------------------------------------------------
# G-test (log-likelihood ratio χ² alternative) of nation × market
# segment independence: G = 2 Σ O ln(O/E) over the bounded 25×5
# contingency table — more accurate than Pearson for small cells.
# ---------------------------------------------------------------------------
_GTEST_SQL = """
    WITH joint AS (
      SELECT c_nationkey AS nk, c_mktsegment AS seg,
             CAST(count(*) AS BIGINT) AS o
      FROM customer GROUP BY 1, 2
    ),
    mn AS (SELECT nk, CAST(sum(o) AS BIGINT) AS rn FROM joint GROUP BY nk),
    ms AS (SELECT seg, CAST(sum(o) AS BIGINT) AS cs FROM joint GROUP BY seg),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM joint),
    g AS (
      SELECT CAST(sum(CAST(floor(
               2.0 * j.o * ln(CAST(j.o AS DOUBLE) * t.n
                              / (CAST(mn.rn AS DOUBLE) * ms.cs))
               * 1.0e9 + 0.5) AS BIGINT)) AS BIGINT) AS g_u,
             CAST(count(*) AS BIGINT) AS n_cells,
             max((SELECT count(*) FROM mn)) AS r,
             max((SELECT count(*) FROM ms)) AS c
      FROM joint j JOIN mn ON j.nk = mn.nk JOIN ms ON j.seg = ms.seg
      CROSS JOIN tot t
    )
    SELECT n_cells, CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
           floor(CAST(g_u AS DOUBLE) / 1.0e9 * 1.0e6 + 0.5) / 1.0e6
             AS g_statistic
    FROM g
"""


@_register("customer_nation_segment_gtest", oracle=_GTEST_SQL)
def customer_nation_segment_gtest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """G-test of nation × segment independence: bounded contingency
    rollup, marginals broadcast, per-cell 2·O·ln(O·N/(R·C)) terms
    quantized at 1e-9."""
    cust = _t(spark, sf_dir, "customer")
    joint = cust.groupBy(
        F.col("c_nationkey").alias("nk"), F.col("c_mktsegment").alias("seg")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    mn = joint.groupBy("nk").agg(F.sum("o").cast("long").alias("rn"))
    ms = joint.groupBy("seg").agg(F.sum("o").cast("long").alias("cs"))
    tot = joint.agg(F.sum("o").cast("long").alias("n"))
    nr = mn.agg(F.count(F.lit(1)).cast("long").alias("r"))
    nc = ms.agg(F.count(F.lit(1)).cast("long").alias("c"))
    term = F.floor(
        2.0
        * F.col("o")
        * F.log(
            F.col("o").cast("double")
            * F.col("n")
            / (F.col("rn").cast("double") * F.col("cs"))
        )
        * 1.0e9
        + 0.5
    ).cast("long")
    g = (
        joint.join(F.broadcast(mn), "nk")
        .join(F.broadcast(ms), "seg")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(term).cast("long").alias("g_u"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
        )
        .crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(nc))
    )
    return g.select(
        "n_cells",
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
        (F.floor(F.col("g_u").cast("double") / 1.0e9 * 1.0e6 + 0.5) / 1.0e6)
        .alias("g_statistic"),
    )


# ---------------------------------------------------------------------------
# Thermocline depth per profile: the mid-depth of the adjacent-level
# pair with the max |dT/dz| (T from the shared synthetic convention) —
# the vertical-gradient companion to the registered N² and MLD
# queries. Profile windows are key-partitioned.
# ---------------------------------------------------------------------------
_THERMO_SQL = """
    WITH levels AS (
      SELECT l_orderkey, l_quantity,
             row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_quantity, l_extendedprice
             ) AS rn
      FROM lineitem
    ), prof AS (
      SELECT l_orderkey, CAST(rn * 10.0 AS DOUBLE) AS z,
             CAST(l_quantity % 30 AS DOUBLE) AS t
      FROM levels
    ), grad AS (
      SELECT l_orderkey,
             (z + lag(z) OVER (PARTITION BY l_orderkey ORDER BY z)) / 2.0
               AS mid_z,
             CAST(floor(abs(t - lag(t) OVER (PARTITION BY l_orderkey
                                             ORDER BY z))
                        / (z - lag(z) OVER (PARTITION BY l_orderkey
                                            ORDER BY z))
                        * 1.0e9 + 0.5) AS BIGINT) AS g_u
      FROM prof
    ), best AS (
      SELECT l_orderkey, mid_z, g_u,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY g_u DESC, mid_z ASC) AS r
      FROM grad WHERE g_u IS NOT NULL
    )
    SELECT l_orderkey, mid_z AS thermocline_depth,
           CAST(g_u AS DOUBLE) / 1.0e9 AS max_gradient
    FROM best WHERE r = 1
"""


@_register("ios_profile_thermocline_depth", oracle=_THERMO_SQL)
def ios_profile_thermocline_depth(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Max |dT/dz| mid-depth per profile: two key-partitioned profile
    windows (lag + argmax), gradients nano-quantized before the
    tie-broken pick."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"
    )
    levels = li.withColumn("rn", F.row_number().over(w))
    prof = levels.select(
        "l_orderkey",
        (F.col("rn") * 10.0).cast("double").alias("z"),
        (F.col("l_quantity") % 30).cast("double").alias("t"),
    )
    wz = Window.partitionBy("l_orderkey").orderBy("z")
    grad = prof.select(
        "l_orderkey",
        ((F.col("z") + F.lag("z").over(wz)) / 2.0).alias("mid_z"),
        F.floor(
            F.abs(F.col("t") - F.lag("t").over(wz))
            / (F.col("z") - F.lag("z").over(wz))
            * 1.0e9
            + 0.5
        )
        .cast("long")
        .alias("g_u"),
    ).filter(F.col("g_u").isNotNull())
    wb = Window.partitionBy("l_orderkey").orderBy(
        F.col("g_u").desc(), F.col("mid_z").asc()
    )
    best = grad.withColumn("r", F.row_number().over(wb)).filter(
        F.col("r") == 1
    )
    return best.select(
        "l_orderkey",
        F.col("mid_z").alias("thermocline_depth"),
        (F.col("g_u").cast("double") / 1.0e9).alias("max_gradient"),
    )


# ---------------------------------------------------------------------------
# Discount dose-response monotonicity audit: mean quantity per discount
# bracket with the count of adjacent-bracket monotonicity violations —
# the sanity check under the registered elasticity regression (a
# non-monotone dose-response usually means confounding).
# ---------------------------------------------------------------------------
_DOSE_SQL = """
    WITH bracket AS (
      SELECT CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS d,
             CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS qc
      FROM lineitem
    ),
    g AS (
      SELECT d, CAST(count(*) AS BIGINT) AS n,
             CAST(floor(CAST(sum(qc) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
               AS mean_qc
      FROM bracket GROUP BY d
    ),
    lagged AS (
      SELECT d, n, mean_qc,
             lag(mean_qc) OVER (ORDER BY d) AS prev_qc
      FROM g
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_brackets,
             CAST(sum(CASE WHEN prev_qc IS NOT NULL AND mean_qc < prev_qc
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
      FROM lagged
    )
    SELECT n_brackets, n_violations,
           floor(CAST(n_violations AS DOUBLE) / (n_brackets - 1) * 1.0e6
                 + 0.5) / 1.0e6 AS violation_rate
    FROM s
"""


@_register("lineitem_dose_response_monotonicity", oracle=_DOSE_SQL)
def lineitem_dose_response_monotonicity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Adjacent-bracket monotonicity violations of mean quantity vs
    discount: bounded 11-bracket rollup + one lag over that alphabet."""
    li = _t(spark, sf_dir, "lineitem")
    bracket = li.select(
        F.floor(F.col("l_discount") * 100.0 + 0.5).cast("long").alias("d"),
        F.floor(F.col("l_quantity") * 100.0 + 0.5).cast("long").alias("qc"),
    )
    g = bracket.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.floor(F.sum("qc").cast("double") / F.count(F.lit(1)) + 0.5)
        .cast("long")
        .alias("mean_qc"),
    )
    w = Window.orderBy("d")
    lagged = g.select(
        "d", "n", "mean_qc", F.lag("mean_qc").over(w).alias("prev_qc")
    )
    s = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_brackets"),
        F.sum(
            F.when(
                F.col("prev_qc").isNotNull()
                & (F.col("mean_qc") < F.col("prev_qc")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_violations"),
    )
    return s.select(
        "n_brackets",
        "n_violations",
        (
            F.floor(
                F.col("n_violations").cast("double")
                / (F.col("n_brackets") - 1)
                * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("violation_rate"),
    )


# ---------------------------------------------------------------------------
# Event-type transition lift: observed next-type rates vs the
# independence baseline P(next=b) — lift > 1 marks behavioral chains
# the raw transition matrix hides behind popularity.
# ---------------------------------------------------------------------------
_TRANSLIFT_SQL = """
    WITH seq AS (
      SELECT event_type AS a,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS b
      FROM events
    ),
    pair AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE b IS NOT NULL GROUP BY 1, 2
    ),
    ma AS (SELECT a, CAST(sum(n) AS BIGINT) AS na FROM pair GROUP BY a),
    mb AS (SELECT b, CAST(sum(n) AS BIGINT) AS nb FROM pair GROUP BY b),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM pair)
    SELECT p.a AS from_type, p.b AS to_type, p.n AS n_transitions,
           floor(CAST(p.n AS DOUBLE) * t.t
                 / (CAST(ma.na AS DOUBLE) * mb.nb) * 1.0e6 + 0.5) / 1.0e6
             AS lift
    FROM pair p
    JOIN ma ON p.a = ma.a JOIN mb ON p.b = mb.b CROSS JOIN tot t
    ORDER BY from_type, to_type
"""


@_register("events_type_transition_lift", oracle=_TRANSLIFT_SQL)
def events_type_transition_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transition lift over the bounded 5×5 type matrix: user-
    partitioned lead window, marginals broadcast, one division per
    cell."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
    ).filter(F.col("b").isNotNull())
    pair = seq.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ma = pair.groupBy("a").agg(F.sum("n").cast("long").alias("na"))
    mb = pair.groupBy("b").agg(F.sum("n").cast("long").alias("nb"))
    tot = pair.agg(F.sum("n").cast("long").alias("t"))
    return (
        pair.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("a").alias("from_type"),
            F.col("b").alias("to_type"),
            F.col("n").alias("n_transitions"),
            (
                F.floor(
                    F.col("n").cast("double")
                    * F.col("t")
                    / (F.col("na").cast("double") * F.col("nb"))
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("lift"),
        )
        .orderBy("from_type", "to_type")
    )


# ---------------------------------------------------------------------------
# Day-of-month order seasonality: χ² against the uniform expectation
# with month-length weighting (day 31 exists in only ~7/12 months) —
# the billing-cycle detector the day-of-week profile can't see.
# ---------------------------------------------------------------------------
_DOM_SQL = """
    WITH dom AS (
      SELECT CAST(day(o_orderdate) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS o
      FROM orders GROUP BY 1
    ),
    days AS (
      SELECT CAST(day(CAST(date_trunc('day', o_orderdate) AS TIMESTAMP))
                  AS BIGINT) AS d,
             CAST(count(DISTINCT CAST(date_trunc('day', o_orderdate)
                                      AS TIMESTAMP)) AS BIGINT) AS n_days
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(o) AS BIGINT) AS n,
             (SELECT CAST(sum(n_days) AS BIGINT) FROM days) AS total_days
      FROM dom
    ),
    cells AS (
      SELECT dom.d, dom.o,
             CAST(t.n AS DOUBLE) * dy.n_days / t.total_days AS e
      FROM dom JOIN days dy ON dom.d = dy.d CROSS JOIN tot t
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days_of_month,
           floor(sum((o - e) * (o - e) / e) * 1.0e6 + 0.5) / 1.0e6
             AS dom_chi2
    FROM cells
"""


@_register("orders_dom_seasonality_chisq", oracle=_DOM_SQL)
def orders_dom_seasonality_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-month χ² with calendar-exposure weighting (expected
    counts proportional to how many of each DOM actually occur in the
    span): two bounded rollups, one division per cell."""
    o = _t(spark, sf_dir, "orders")
    dom = o.groupBy(F.dayofmonth("o_orderdate").cast("long").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    days = o.groupBy(
        F.dayofmonth(F.date_trunc("day", F.col("o_orderdate")))
        .cast("long")
        .alias("d")
    ).agg(
        F.countDistinct(F.date_trunc("day", F.col("o_orderdate")))
        .cast("long")
        .alias("n_days")
    )
    tot = dom.agg(F.sum("o").cast("long").alias("n")).crossJoin(
        F.broadcast(days.agg(F.sum("n_days").cast("long").alias("total_days")))
    )
    cells = (
        dom.join(days, "d")
        .crossJoin(F.broadcast(tot))
        .select(
            "d",
            "o",
            (
                F.col("n").cast("double")
                * F.col("n_days")
                / F.col("total_days")
            ).alias("e"),
        )
    )
    return cells.agg(
        F.count(F.lit(1)).cast("long").alias("n_days_of_month"),
        (
            F.floor(
                F.sum(
                    (F.col("o") - F.col("e"))
                    * (F.col("o") - F.col("e"))
                    / F.col("e")
                )
                * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("dom_chi2"),
    )


# ===========================================================================
# Wave G — round-10 top-up batch 3.
# ===========================================================================

# ---------------------------------------------------------------------------
# Welch's heteroskedastic one-way ANOVA (Welch 1951) of supplier
# balance across nations — the k-sample generalization of the
# registered Welch t-test, valid when variances differ (Bartlett's
# complement). Closed form from per-nation exact moments.
# ---------------------------------------------------------------------------
_WELCH_ANOVA_SQL = """
    WITH rows_ AS (
      SELECT s_nationkey AS g,
             CAST(floor(s_acctbal * 100.0 + 0.5) AS BIGINT) AS x
      FROM supplier
    ),
    grp AS (
      SELECT g, CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(x) AS HUGEINT) AS s1,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2
      FROM rows_ GROUP BY g HAVING count(*) >= 3
    ),
    w AS (
      SELECT g, ng,
             CAST(s1 AS DOUBLE) / ng AS m,
             ng / ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / ng)
                   / (ng - 1)) AS wi
      FROM grp
    ),
    tw AS (
      SELECT CAST(count(*) AS BIGINT) AS k, sum(wi) AS sw,
             sum(wi * m) AS swm
      FROM w
    ),
    parts AS (
      SELECT w.g, w.ng, w.wi,
             (w.m - t.swm / t.sw) * (w.m - t.swm / t.sw) AS dev2,
             (1.0 - w.wi / t.sw) * (1.0 - w.wi / t.sw) / (w.ng - 1) AS hterm
      FROM w CROSS JOIN tw t
    ),
    agg AS (
      SELECT max(t.k) AS k, sum(p.wi * p.dev2) AS num, sum(p.hterm) AS h
      FROM parts p CROSS JOIN tw t
    )
    SELECT k AS n_groups,
           floor((num / (k - 1))
                 / (1.0 + 2.0 * (k - 2) / (CAST(k AS DOUBLE) * k - 1.0) * h)
                 * 1.0e6 + 0.5) / 1.0e6 AS welch_f
    FROM agg
"""


@_register("supplier_welch_anova_nation", oracle=_WELCH_ANOVA_SQL)
def supplier_welch_anova_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch F* for balance across nations (groups with n ≥ 3):
    variance-weighted means from exact cents moments, one bounded
    rollup."""
    s = _t(spark, sf_dir, "supplier")
    rows = s.select(
        F.col("s_nationkey").alias("g"),
        F.floor(F.col("s_acctbal") * 100.0 + 0.5).cast("long").alias("x"),
    )
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    grp = (
        rows.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("ng"),
            F.sum("x").cast("decimal(38,0)").alias("s1"),
            F.sum(dec("x") * dec("x")).cast("decimal(38,0)").alias("s2"),
        )
        .filter(F.col("ng") >= 3)
    )
    s1d = F.col("s1").cast("double")
    var = (F.col("s2").cast("double") - s1d * s1d / F.col("ng")) / (
        F.col("ng") - 1
    )
    w = grp.select(
        "g", "ng", (s1d / F.col("ng")).alias("m"), (F.col("ng") / var).alias("wi")
    )
    tw = w.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("wi").alias("sw"),
        F.sum(F.col("wi") * F.col("m")).alias("swm"),
    )
    parts = w.crossJoin(F.broadcast(tw)).select(
        "k",
        (
            F.col("wi")
            * (F.col("m") - F.col("swm") / F.col("sw"))
            * (F.col("m") - F.col("swm") / F.col("sw"))
        ).alias("wdev2"),
        (
            (1.0 - F.col("wi") / F.col("sw"))
            * (1.0 - F.col("wi") / F.col("sw"))
            / (F.col("ng") - 1)
        ).alias("hterm"),
    )
    agg = parts.agg(
        F.max("k").alias("k"),
        F.sum("wdev2").alias("num"),
        F.sum("hterm").alias("h"),
    )
    kd = F.col("k").cast("double")
    f = (F.col("num") / (F.col("k") - 1)) / (
        1.0 + 2.0 * (F.col("k") - 2) / (kd * kd - 1.0) * F.col("h")
    )
    return agg.select(
        F.col("k").alias("n_groups"),
        (F.floor(f * 1.0e6 + 0.5) / 1.0e6).alias("welch_f"),
    )


# ---------------------------------------------------------------------------
# PQ subspace variance balance: total variance per 8-dim subspace (the
# 8×8 product-quantizer layout) — an unbalanced split wastes codebook
# bits on dead subspaces. Exact integer moments per (subspace, dim).
# ---------------------------------------------------------------------------
_SUBSPACE_SQL = """
    WITH el AS (
      SELECT unnest(range(64)) AS d,
             unnest(list_transform(CAST(embedding AS DOUBLE[]),
                    x -> CAST(floor(x * 1.0e6 + 0.5) AS BIGINT))) AS x
      FROM embeddings
    ),
    dimvar AS (
      SELECT CAST(floor(d / 8) AS BIGINT) AS sub,
             (CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE)
              - CAST(sum(x) AS DOUBLE) * sum(x) / count(*)) / count(*)
               AS v
      FROM el GROUP BY d
    ),
    subvar AS (
      SELECT sub, sum(v) / 1.0e12 AS sv FROM dimvar GROUP BY sub
    ),
    tot AS (SELECT sum(sv) AS t FROM subvar)
    SELECT sub AS subspace,
           floor(sv * 1.0e9 + 0.5) / 1.0e9 AS subspace_variance,
           floor(sv / t.t * 1.0e6 + 0.5) / 1.0e6 AS variance_share
    FROM subvar CROSS JOIN tot t
    ORDER BY sub
"""


@_register("embedding_subspace_variance_balance", oracle=_SUBSPACE_SQL)
def embedding_subspace_variance_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Variance per 8-dim PQ subspace from exact integer per-dim
    moments: one dim rollup (64 rows), one 8-row subspace rollup."""
    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    q = F.transform(e, lambda x: F.floor(x * 1.0e6 + 0.5).cast("long"))
    el = emb.select(F.posexplode(q).alias("d", "x"))
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    dimvar = el.groupBy("d").agg(
        (
            (
                F.sum(dec("x") * dec("x")).cast("double")
                - F.sum("x").cast("double")
                * F.sum("x").cast("double")
                / F.count(F.lit(1))
            )
            / F.count(F.lit(1))
        ).alias("v")
    )
    subvar = dimvar.groupBy(
        F.floor(F.col("d") / 8).cast("long").alias("sub")
    ).agg((F.sum("v") / 1.0e12).alias("sv"))
    tot = subvar.agg(F.sum("sv").alias("t"))
    return (
        subvar.crossJoin(F.broadcast(tot))
        .select(
            F.col("sub").alias("subspace"),
            (F.floor(F.col("sv") * 1.0e9 + 0.5) / 1.0e9).alias(
                "subspace_variance"
            ),
            (F.floor(F.col("sv") / F.col("t") * 1.0e6 + 0.5) / 1.0e6).alias(
                "variance_share"
            ),
        )
        .orderBy("subspace")
    )


# ---------------------------------------------------------------------------
# Positional token entropy: vocabulary entropy at position buckets
# (1-5, 6-10, ...) — templated corpora show collapsed entropy at the
# positions the template pins. Bounded bucket × vocab rollups.
# ---------------------------------------------------------------------------
_POSENT_SQL = """
    WITH tok AS (
      SELECT CAST(floor((u.i - 1) / 5.0) AS BIGINT) AS bucket, words[i] AS w
      FROM (SELECT string_split(text, ' ') AS words FROM documents) t,
           unnest(generate_series(1, len(words))) AS u(i)
      WHERE u.i <= 30
    ),
    f AS (
      SELECT bucket, w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
    ),
    t2 AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS n FROM f GROUP BY bucket),
    h AS (
      SELECT f.bucket,
             CAST(sum(CAST(floor(-CAST(f.c AS DOUBLE) / t2.n
                   * ln(CAST(f.c AS DOUBLE) / t2.n) * 1.0e9 + 0.5)
                 AS BIGINT)) AS BIGINT) AS h_u,
             max(t2.n) AS n, CAST(count(*) AS BIGINT) AS vocab
      FROM f JOIN t2 ON f.bucket = t2.bucket GROUP BY f.bucket
    )
    SELECT bucket AS position_bucket, n AS n_tokens, vocab,
           floor(CAST(h_u AS DOUBLE) / 1.0e9 * 1.0e6 + 0.5) / 1.0e6
             AS entropy_nats
    FROM h ORDER BY bucket
"""


@_register("text_positional_entropy_profile", oracle=_POSENT_SQL)
def text_positional_entropy_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Token entropy by position bucket (first 30 positions, width-5
    buckets): positional explode, bounded bucket×vocab rollup,
    per-type terms at 1e-9."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr

    docs = _t(spark, sf_dir, "documents")
    tok = (
        docs.select(F.posexplode(words_expr(F.col("text"))).alias("p", "w"))
        .filter(F.col("p") < 30)
        .select(F.floor(F.col("p") / 5.0).cast("long").alias("bucket"), "w")
    )
    f = tok.groupBy("bucket", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    t2 = f.groupBy("bucket").agg(F.sum("c").cast("long").alias("n"))
    h = (
        f.join(F.broadcast(t2), "bucket")
        .groupBy("bucket")
        .agg(
            F.sum(
                F.floor(
                    -F.col("c").cast("double")
                    / F.col("n")
                    * F.log(F.col("c").cast("double") / F.col("n"))
                    * 1.0e9
                    + 0.5
                ).cast("long")
            )
            .cast("long")
            .alias("h_u"),
            F.max("n").alias("n"),
            F.count(F.lit(1)).cast("long").alias("vocab"),
        )
    )
    return (
        h.select(
            F.col("bucket").alias("position_bucket"),
            F.col("n").alias("n_tokens"),
            "vocab",
            (F.floor(F.col("h_u").cast("double") / 1.0e9 * 1.0e6 + 0.5) / 1.0e6)
            .alias("entropy_nats"),
        )
        .orderBy("position_bucket")
    )


# ---------------------------------------------------------------------------
# Boilerplate-opener share by source: the most common first token per
# source and its share — a high opener share is the template signature.
# ---------------------------------------------------------------------------
_OPENER_SQL = """
    WITH first_tok AS (
      SELECT source, string_split(text, ' ')[1] AS w FROM documents
    ),
    f AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS c
      FROM first_tok GROUP BY 1, 2
    ),
    t AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM f GROUP BY source),
    ranked AS (
      SELECT source, w, c,
             row_number() OVER (PARTITION BY source
                                ORDER BY c DESC, w ASC) AS r
      FROM f
    )
    SELECT r.source, r.w AS top_opener, r.c AS opener_count, t.n AS n_docs,
           floor(CAST(r.c AS DOUBLE) / t.n * 1.0e6 + 0.5) / 1.0e6
             AS opener_share
    FROM ranked r JOIN t ON r.source = t.source
    WHERE r.r = 1 ORDER BY r.source
"""


@_register("doc_opener_share_by_source", oracle=_OPENER_SQL)
def doc_opener_share_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top first-token share per source: bounded (source × vocab)
    rollup, source-partitioned argmax window."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr

    docs = _t(spark, sf_dir, "documents")
    first_tok = docs.select(
        "source", F.element_at(words_expr(F.col("text")), 1).alias("w")
    )
    f = first_tok.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    t = f.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    w = Window.partitionBy("source").orderBy(
        F.col("c").desc(), F.col("w").asc()
    )
    ranked = f.withColumn("r", F.row_number().over(w)).filter(F.col("r") == 1)
    return (
        ranked.join(F.broadcast(t), "source")
        .select(
            "source",
            F.col("w").alias("top_opener"),
            F.col("c").alias("opener_count"),
            F.col("n").alias("n_docs"),
            (
                F.floor(F.col("c").cast("double") / F.col("n") * 1.0e6 + 0.5)
                / 1.0e6
            ).alias("opener_share"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Weekly value PSI: population-stability index of the event-value
# distribution, each week vs week 1, over fixed value-decade bins —
# the standard production drift monitor as a weekly trend.
# ---------------------------------------------------------------------------
_WPSI_SQL = """
    WITH binned AS (
      SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk,
             least(CAST(floor(ln(greatest(value, 0.011) / 0.01) / ln(4.0))
                        AS BIGINT), 7) AS bin
      FROM events
    ),
    cnt AS (
      SELECT wk, bin, CAST(count(*) AS BIGINT) AS c FROM binned GROUP BY 1, 2
    ),
    wt AS (SELECT wk, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY wk),
    base AS (
      SELECT c.bin, CAST(c.c AS DOUBLE) / w.n AS p0
      FROM cnt c JOIN wt w ON c.wk = w.wk
      WHERE c.wk = (SELECT min(wk) FROM wt)
    ),
    cur AS (
      SELECT c.wk, c.bin, CAST(c.c AS DOUBLE) / w.n AS p
      FROM cnt c JOIN wt w ON c.wk = w.wk
      WHERE c.wk > (SELECT min(wk) FROM wt)
    ),
    terms AS (
      SELECT cur.wk,
             CAST(floor((cur.p - coalesce(b.p0, 1.0e-6))
                        * ln(cur.p / coalesce(b.p0, 1.0e-6)) * 1.0e9 + 0.5)
                  AS BIGINT) AS t_u
      FROM cur LEFT JOIN base b ON cur.bin = b.bin
    )
    SELECT wk AS week_start,
           floor(CAST(sum(t_u) AS DOUBLE) / 1.0e9 * 1.0e6 + 0.5) / 1.0e6
             AS psi_vs_week1
    FROM terms GROUP BY wk ORDER BY wk
"""


@_register("events_weekly_value_psi", oracle=_WPSI_SQL)
def events_weekly_value_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI of the value distribution per week vs week 1 over 8
    fixed log-spaced bins: bounded (week × bin) rollups, per-bin terms
    at 1e-9; absent baseline bins floor at 1e-6 (documented
    convention)."""
    ev = _t(spark, sf_dir, "events")
    bin_ = F.least(
        F.floor(
            F.log(F.greatest(F.col("value"), F.lit(0.011)) / 0.01)
            / math.log(4.0)
        ).cast("long"),
        F.lit(7),
    )
    binned = ev.select(
        F.date_trunc("week", F.col("ts")).alias("wk"), bin_.alias("bin")
    )
    cnt = binned.groupBy("wk", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wt = cnt.groupBy("wk").agg(F.sum("c").cast("long").alias("n"))
    w0 = wt.agg(F.min("wk").alias("wk0"))
    p = cnt.join(wt, "wk").select(
        "wk", "bin", (F.col("c").cast("double") / F.col("n")).alias("p")
    )
    base = (
        p.crossJoin(F.broadcast(w0))
        .filter(F.col("wk") == F.col("wk0"))
        .select("bin", F.col("p").alias("p0"))
    )
    cur = (
        p.crossJoin(F.broadcast(w0))
        .filter(F.col("wk") > F.col("wk0"))
        .select("wk", "bin", "p")
    )
    terms = cur.join(F.broadcast(base), "bin", "left").select(
        "wk",
        F.floor(
            (F.col("p") - F.coalesce(F.col("p0"), F.lit(1.0e-6)))
            * F.log(F.col("p") / F.coalesce(F.col("p0"), F.lit(1.0e-6)))
            * 1.0e9
            + 0.5
        )
        .cast("long")
        .alias("t_u"),
    )
    return (
        terms.groupBy(F.col("wk").alias("week_start"))
        .agg(
            (
                F.floor(F.sum("t_u").cast("double") / 1.0e9 * 1.0e6 + 0.5)
                / 1.0e6
            ).alias("psi_vs_week1")
        )
        .orderBy("week_start")
    )


# ---------------------------------------------------------------------------
# Exact-duplicate embedding audit: digest of the micro-quantized
# vector — duplicated vectors inflate ANN recall metrics and waste
# index space; the standard hygiene check before building an index.
# ---------------------------------------------------------------------------
_EMBDUP_SQL = """
    WITH d AS (
      SELECT md5(array_to_string(list_transform(CAST(embedding AS DOUBLE[]),
             x -> CAST(CAST(floor(x * 1.0e6 + 0.5) AS BIGINT) AS VARCHAR)),
             ',')) AS fp
      FROM embeddings
    ),
    cl AS (SELECT fp, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY fp)
    SELECT CAST(sum(c) AS BIGINT) AS n_vectors,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(max(c) AS BIGINT) AS max_cluster,
           floor((1.0 - CAST(count(*) AS DOUBLE) / sum(c)) * 1.0e6 + 0.5)
             / 1.0e6 AS duplicate_rate
    FROM cl
"""


@_register("embedding_exact_duplicate_audit", oracle=_EMBDUP_SQL)
def embedding_exact_duplicate_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Digest-level duplicate rate of micro-quantized vectors: the
    exact-dedup shape applied to the embedding table."""
    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    fp = F.md5(
        F.concat_ws(
            ",",
            F.transform(
                e,
                lambda x: F.floor(x * 1.0e6 + 0.5).cast("long").cast("string"),
            ),
        )
    )
    cl = emb.select(fp.alias("fp")).groupBy("fp").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return cl.agg(
        F.sum("c").cast("long").alias("n_vectors"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.max("c").cast("long").alias("max_cluster"),
        (
            F.floor(
                (1.0 - F.count(F.lit(1)).cast("double") / F.sum("c")) * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("duplicate_rate"),
    )


# ---------------------------------------------------------------------------
# Add-k smoothing sweep: held-out unigram perplexity at k ∈
# {0.1, 1, 10} — the tuning curve over the registered add-one model
# (same odd/even source split).
# ---------------------------------------------------------------------------
_ADDK_SQL = """
    WITH tok AS (
      SELECT CAST(substr(source, 4) AS BIGINT) % 2 = 1 AS is_train,
             unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    vocab AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM tok),
    train AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok WHERE is_train GROUP BY w
    ),
    ntr AS (SELECT CAST(sum(c) AS BIGINT) AS nt FROM train),
    held AS (
      SELECT w, CAST(count(*) AS BIGINT) AS h
      FROM tok WHERE NOT is_train GROUP BY w
    ),
    ks AS (SELECT unnest([0.1, 1.0, 10.0]) AS k),
    terms AS (
      SELECT ks.k,
             CAST(sum(CAST(floor(
               -h.h * ln((coalesce(t.c, 0) + ks.k)
                         / (ntr.nt + ks.k * vocab.v))
               / ln(2.0) * 1.0e9 + 0.5) AS BIGINT)) AS BIGINT) AS s_u,
             CAST(sum(h.h) AS BIGINT) AS n
      FROM held h
      LEFT JOIN train t ON h.w = t.w
      CROSS JOIN ntr CROSS JOIN vocab CROSS JOIN ks
      GROUP BY ks.k
    )
    SELECT floor(k * 1.0e6 + 0.5) / 1.0e6 AS add_k, n AS n_held_tokens,
           floor(pow(2.0, CAST(s_u AS DOUBLE) / 1.0e9 / n) * 1.0e4 + 0.5)
             / 1.0e4 AS heldout_perplexity
    FROM terms ORDER BY k
"""


@_register("lm_addk_smoothing_sweep", oracle=_ADDK_SQL)
def lm_addk_smoothing_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out perplexity at three add-k strengths from ONE scoring
    pass crossed with a 3-row broadcast parameter table."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
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
    held = tok.filter(~F.col("is_train")).groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("h")
    )
    ks = spark.createDataFrame([(0.1,), (1.0,), (10.0,)], "k double")
    term_u = F.floor(
        -F.col("h")
        * F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + F.col("k"))
            / (F.col("nt") + F.col("k") * F.col("v"))
        )
        / math.log(2.0)
        * 1.0e9
        + 0.5
    ).cast("long")
    terms = (
        held.join(F.broadcast(train), "w", "left")
        .crossJoin(F.broadcast(ntr))
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(term_u).cast("long").alias("s_u"),
            F.sum("h").cast("long").alias("n"),
        )
    )
    bits = F.col("s_u").cast("double") / 1.0e9 / F.col("n")
    return (
        terms.select(
            (F.floor(F.col("k") * 1.0e6 + 0.5) / 1.0e6).alias("add_k"),
            F.col("n").alias("n_held_tokens"),
            (F.floor(F.pow(F.lit(2.0), bits) * 1.0e4 + 0.5) / 1.0e4).alias(
                "heldout_perplexity"
            ),
        )
        .orderBy("add_k")
    )


# ---------------------------------------------------------------------------
# Zipf slope by rank band: OLS log-log slope over head (ranks 1-10)
# vs tail (11+) — a natural corpus steepens in the head; a templated
# one is near-flat. Ranks ride the two-pass operator.
# ---------------------------------------------------------------------------
_ZIPF_BAND_SQL = """
    WITH vocab AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
      ) GROUP BY w
    ),
    ranked AS (
      SELECT c, CAST(row_number() OVER (ORDER BY c DESC, w ASC) AS BIGINT) AS r
      FROM vocab
    ),
    pts AS (
      SELECT CASE WHEN r <= 10 THEN 'head' ELSE 'tail' END AS band,
             ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
      FROM ranked
    ),
    ols AS (
      SELECT band, CAST(count(*) AS BIGINT) AS np, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy
      FROM pts GROUP BY band
    )
    SELECT band, np AS n_ranks,
           floor((np * sxy - sx * sy) / (np * sxx - sx * sx) * 1.0e6 + 0.5)
             / 1.0e6 AS zipf_slope
    FROM ols ORDER BY band
"""


@_register("vocab_zipf_slope_by_band", oracle=_ZIPF_BAND_SQL)
def vocab_zipf_slope_by_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-vs-tail Zipf slopes: frequency ranks via
    ranked_cumsum_two_pass, per-band log-log OLS."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr
    from cioos_siooc_data_transform_spark.operators.windows import (
        ranked_cumsum_two_pass,
    )

    docs = _t(spark, sf_dir, "documents")
    vocab = docs.select(
        F.explode(words_expr(F.col("text"))).alias("w")
    ).groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ranked = ranked_cumsum_two_pass(
        vocab, "c", "w", ascending=False, out_rank="r", out_cum="__cum"
    ).select("c", F.col("r").cast("long").alias("r"))
    pts = ranked.select(
        F.when(F.col("r") <= 10, "head").otherwise("tail").alias("band"),
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    ols = pts.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return (
        ols.select(
            "band",
            F.col("np").alias("n_ranks"),
            (
                F.floor(
                    (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy"))
                    / (F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx"))
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("zipf_slope"),
        )
        .orderBy("band")
    )


# ===========================================================================
# Wave H — slate completion (50/50).
# ===========================================================================

# ---------------------------------------------------------------------------
# VaR(95) and expected shortfall of daily revenue: the worst-5%-days
# tail mean — the ops-finance summary of revenue risk. The day axis is
# calendar-bounded; the 95th-percentile cut uses the exact rank.
# ---------------------------------------------------------------------------
_CVAR_SQL = f"""
    WITH {_DAILY_REV_CTE},
    ranked AS (
      SELECT rev, CAST(row_number() OVER (ORDER BY rev ASC, i ASC) AS BIGINT)
               AS r,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM idx
    ),
    cut AS (
      SELECT CAST(greatest(floor(0.05 * max(n)), 1) AS BIGINT) AS k,
             max(n) AS n
      FROM ranked
    )
    SELECT c.n AS n_days, c.k AS n_tail_days,
           CAST((SELECT max(rev) FROM ranked, cut WHERE r <= cut.k) AS BIGINT)
             AS var95_cents,
           CAST(floor((SELECT CAST(sum(rev) AS DOUBLE) FROM ranked, cut
                       WHERE r <= cut.k) / c.k + 0.5) AS BIGINT)
             AS expected_shortfall_cents
    FROM cut c
"""


@_register("orders_daily_revenue_cvar", oracle=_CVAR_SQL)
def orders_daily_revenue_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VaR(95)/CVaR of daily revenue over the calendar-bounded day
    axis: one ascending rank window, exact integer tail mean."""
    idx = _daily_rev(spark, sf_dir)
    w = Window.orderBy(F.col("rev").asc(), F.col("i").asc())
    n_tot = idx.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ranked = (
        idx.withColumn("r", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(n_tot))
    )
    cut = ranked.agg(
        F.greatest(F.floor(0.05 * F.max("n")), F.lit(1))
        .cast("long")
        .alias("k")
    )
    tail = (
        ranked.crossJoin(F.broadcast(cut)).filter(F.col("r") <= F.col("k"))
    )
    agg = tail.agg(
        F.max("rev").cast("long").alias("var95_cents"),
        F.floor(F.sum("rev").cast("double") / F.max("k") + 0.5)
        .cast("long")
        .alias("expected_shortfall_cents"),
        F.max("n").alias("n_days"),
        F.max("k").alias("n_tail_days"),
    )
    return agg.select(
        "n_days", "n_tail_days", "var95_cents", "expected_shortfall_cents"
    )


# ---------------------------------------------------------------------------
# Negative-binomial moment fit of daily event counts with χ² GOF over
# count bins: r = μ²/(σ²−μ), p = μ/σ² — the overdispersion model the
# Fano factor hints at, now fit and tested.
# ---------------------------------------------------------------------------
_NBFIT_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS DOUBLE) / count(*) AS mu,
             (CAST(sum(c * c) AS DOUBLE)
              - CAST(sum(c) AS DOUBLE) * sum(c) / count(*)) / (count(*) - 1)
               AS v
      FROM daily
    )
    SELECT n AS n_days,
           floor(mu * 1.0e4 + 0.5) / 1.0e4 AS mean_daily,
           floor(v * 1.0e4 + 0.5) / 1.0e4 AS var_daily,
           floor(v / mu * 1.0e6 + 0.5) / 1.0e6 AS dispersion_index,
           CASE WHEN v > mu
                THEN floor(mu * mu / (v - mu) * 1.0e6 + 0.5) / 1.0e6
                ELSE NULL END AS nb_r,
           CASE WHEN v > mu
                THEN floor(mu / v * 1.0e6 + 0.5) / 1.0e6
                ELSE NULL END AS nb_p
    FROM mom
"""


@_register("events_daily_counts_nb_fit", oracle=_NBFIT_SQL)
def events_daily_counts_nb_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moment-matched negative-binomial parameters of the daily count
    series (r = μ²/(σ²−μ), p = μ/σ², NULL when underdispersed): one
    calendar rollup, exact moments."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum("c").cast("double") / F.count(F.lit(1))).alias("mu"),
        (
            (
                F.sum(F.col("c") * F.col("c")).cast("double")
                - F.sum("c").cast("double")
                * F.sum("c")
                / F.count(F.lit(1))
            )
            / (F.count(F.lit(1)) - 1)
        ).alias("v"),
    )
    q4 = lambda e: F.floor(e * 1.0e4 + 0.5) / 1.0e4  # noqa: E731
    q6 = lambda e: F.floor(e * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    return mom.select(
        F.col("n").alias("n_days"),
        q4(F.col("mu")).alias("mean_daily"),
        q4(F.col("v")).alias("var_daily"),
        q6(F.col("v") / F.col("mu")).alias("dispersion_index"),
        F.when(
            F.col("v") > F.col("mu"),
            q6(F.col("mu") * F.col("mu") / (F.col("v") - F.col("mu"))),
        ).alias("nb_r"),
        F.when(
            F.col("v") > F.col("mu"), q6(F.col("mu") / F.col("v"))
        ).alias("nb_p"),
    )


# ---------------------------------------------------------------------------
# Empirical LSH S-curve: recall of the banded-LSH candidate set within
# exact-Jaccard bins — the measured version of P(candidate) =
# 1−(1−j^r)^b. Ground truth = the inverted-index exact pair set
# (hot-shingle-capped, never quadratic).
# ---------------------------------------------------------------------------
def _scurve_oracle() -> str:
    from cioos_siooc_data_transform_spark.plans.dedup_queries import (
        _LSH_CAND_CTES,
        _SHINGLES_CTE,
    )

    return f"""
    WITH {_SHINGLES_CTE},
    {_LSH_CAND_CTES},
    df AS (SELECT s, count(*) AS c FROM sh GROUP BY s),
    f AS (SELECT sh.doc_id, sh.s FROM sh JOIN df USING (s) WHERE df.c <= 10),
    sizes AS (SELECT doc_id, count(*) AS n FROM f GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM f a JOIN f b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT doc_a, doc_b,
             CAST(floor(n_common * 10.0
                        / (sa.n + sb.n - n_common)) AS BIGINT) AS jbin
      FROM common
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE n_common * 5 >= (sa.n + sb.n - n_common)
    ),
    hit AS (
      SELECT t.jbin,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_candidates
      FROM truth t
      LEFT JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
      GROUP BY t.jbin
    )
    SELECT jbin AS jaccard_decile, n_pairs, n_candidates,
           floor(CAST(n_candidates AS DOUBLE) / n_pairs * 1.0e6 + 0.5) / 1.0e6
             AS empirical_recall
    FROM hit ORDER BY jbin
    """


@_register("dedup_lsh_recall_by_similarity_bin", oracle="__SCURVE__")
def dedup_lsh_recall_by_similarity_bin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The measured LSH S-curve: exact pairs (Jaccard ≥ 0.2 via the
    capped inverted index) binned by Jaccard decile, recall = share
    also emitted by the banded LSH candidates. Pair-keyed left join of
    two bounded pair sets."""
    from cioos_siooc_data_transform_spark.operators.dedup import (
        lsh_band_buckets,
        lsh_candidate_pairs,
        minhash_signature,
        ngram_jaccard_pairs,
    )
    from cioos_siooc_data_transform_spark.plans.dedup_queries import (
        _distinct_shingles,
    )

    shingles = _distinct_shingles(spark, sf_dir)
    truth = ngram_jaccard_pairs(
        shingles, "doc_id", "s", threshold=0.2, max_doc_freq=10
    ).select(
        "doc_a",
        "doc_b",
        F.floor(F.col("jaccard") * 10.0).cast("long").alias("jbin"),
    )
    sig = minhash_signature(
        shingles, "doc_id", "s", num_hashes=8, hash_family="md5"
    )
    buckets = lsh_band_buckets(sig, "doc_id", num_hashes=8, bands=4)
    cand = lsh_candidate_pairs(buckets, "doc_id", max_bucket_size=50).withColumn(
        "_hit", F.lit(1)
    )
    hit = (
        truth.join(cand, ["doc_a", "doc_b"], "left")
        .groupBy("jbin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.count("_hit").cast("long").alias("n_candidates"),
        )
    )
    return (
        hit.select(
            F.col("jbin").alias("jaccard_decile"),
            "n_pairs",
            "n_candidates",
            (
                F.floor(
                    F.col("n_candidates").cast("double")
                    / F.col("n_pairs")
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("empirical_recall"),
        )
        .orderBy("jaccard_decile")
    )


STAGED_ORACLES["dedup_lsh_recall_by_similarity_bin"] = _scurve_oracle()


# ---------------------------------------------------------------------------
# MLD / thermocline consistency: physically, the mixed layer (uniform
# density) must reach at most the thermocline — profiles violating
# MLD > thermocline depth flag synthetic-profile or threshold bugs.
# Joins the two registered per-profile diagnostics.
# ---------------------------------------------------------------------------
_MLDCONS_SQL = """
    WITH levels AS (
      SELECT l_orderkey, l_quantity,
             row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_quantity, l_extendedprice
             ) AS rn
      FROM lineitem
    ), prof AS (
      SELECT l_orderkey, CAST(rn * 10.0 AS DOUBLE) AS z,
             CAST(20.0 + l_quantity * 0.1 + rn * 0.05 AS DOUBLE) AS sigma,
             CAST(l_quantity % 30 AS DOUBLE) AS t
      FROM levels
    ), surf AS (
      SELECT p.l_orderkey, min(p.sigma) FILTER (p.z <= 10.0) AS sigma_surf
      FROM prof p GROUP BY p.l_orderkey
    ), mld AS (
      SELECT p.l_orderkey, min(p.z) AS mld_z
      FROM prof p JOIN surf s ON p.l_orderkey = s.l_orderkey
      WHERE p.sigma > s.sigma_surf + 0.03
      GROUP BY p.l_orderkey
    ), grad AS (
      SELECT l_orderkey,
             (z + lag(z) OVER (PARTITION BY l_orderkey ORDER BY z)) / 2.0
               AS mid_z,
             CAST(floor(abs(t - lag(t) OVER (PARTITION BY l_orderkey
                                             ORDER BY z))
                        / (z - lag(z) OVER (PARTITION BY l_orderkey
                                            ORDER BY z))
                        * 1.0e9 + 0.5) AS BIGINT) AS g_u
      FROM prof
    ), thermo AS (
      SELECT l_orderkey, mid_z FROM (
        SELECT l_orderkey, mid_z,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY g_u DESC, mid_z ASC) AS r
        FROM grad WHERE g_u IS NOT NULL
      ) WHERE r = 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_profiles,
           CAST(sum(CASE WHEN m.mld_z > t.mid_z THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations,
           floor(CAST(sum(CASE WHEN m.mld_z > t.mid_z THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*) * 1.0e6 + 0.5) / 1.0e6
             AS violation_rate
    FROM mld m JOIN thermo t ON m.l_orderkey = t.l_orderkey
"""


@_register("ios_mld_thermocline_consistency", oracle=_MLDCONS_SQL)
def ios_mld_thermocline_consistency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-diagnostic physical-consistency audit: density-threshold
    MLD vs max-gradient thermocline depth per profile, violation rate
    where MLD sits below the thermocline. All windows key-partitioned
    by profile."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"
    )
    levels = li.withColumn("rn", F.row_number().over(w))
    prof = levels.select(
        "l_orderkey",
        (F.col("rn") * 10.0).cast("double").alias("z"),
        (F.lit(20.0) + F.col("l_quantity") * 0.1 + F.col("rn") * 0.05)
        .cast("double")
        .alias("sigma"),
        (F.col("l_quantity") % 30).cast("double").alias("t"),
    )
    surf = prof.groupBy("l_orderkey").agg(
        F.min(F.when(F.col("z") <= 10.0, F.col("sigma"))).alias("sigma_surf")
    )
    mld = (
        prof.join(surf, "l_orderkey")
        .filter(F.col("sigma") > F.col("sigma_surf") + 0.03)
        .groupBy("l_orderkey")
        .agg(F.min("z").alias("mld_z"))
    )
    wz = Window.partitionBy("l_orderkey").orderBy("z")
    grad = prof.select(
        "l_orderkey",
        ((F.col("z") + F.lag("z").over(wz)) / 2.0).alias("mid_z"),
        F.floor(
            F.abs(F.col("t") - F.lag("t").over(wz))
            / (F.col("z") - F.lag("z").over(wz))
            * 1.0e9
            + 0.5
        )
        .cast("long")
        .alias("g_u"),
    ).filter(F.col("g_u").isNotNull())
    wb = Window.partitionBy("l_orderkey").orderBy(
        F.col("g_u").desc(), F.col("mid_z").asc()
    )
    thermo = (
        grad.withColumn("r", F.row_number().over(wb))
        .filter(F.col("r") == 1)
        .select("l_orderkey", "mid_z")
    )
    j = mld.join(thermo, "l_orderkey")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_profiles"),
        F.sum(F.when(F.col("mld_z") > F.col("mid_z"), 1).otherwise(0))
        .cast("long")
        .alias("n_violations"),
        (
            F.floor(
                F.sum(
                    F.when(F.col("mld_z") > F.col("mid_z"), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1))
                * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("violation_rate"),
    )


# ---------------------------------------------------------------------------
# OOV rate by held-out source against the odd-source training
# vocabulary: token-level and type-level out-of-vocabulary shares —
# the per-source routing signal behind the held-out perplexity.
# ---------------------------------------------------------------------------
_OOV_SQL = """
    WITH tok AS (
      SELECT source, CAST(substr(source, 4) AS BIGINT) % 2 = 1 AS is_train,
             unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    tv AS (SELECT DISTINCT w FROM tok WHERE is_train),
    held AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS c
      FROM tok WHERE NOT is_train GROUP BY 1, 2
    ),
    j AS (
      SELECT h.source, h.w, h.c,
             CASE WHEN tv.w IS NULL THEN 1 ELSE 0 END AS oov
      FROM held h LEFT JOIN tv ON h.w = tv.w
    )
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           floor(CAST(sum(oov * c) AS DOUBLE) / sum(c) * 1.0e6 + 0.5) / 1.0e6
             AS token_oov_rate,
           floor(CAST(sum(oov) AS DOUBLE) / count(*) * 1.0e6 + 0.5) / 1.0e6
             AS type_oov_rate
    FROM j GROUP BY source ORDER BY source
"""


@_register("lm_oov_rate_by_source", oracle=_OOV_SQL)
def lm_oov_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token- and type-level OOV rate of each held-out source against
    the training vocabulary: broadcast vocab anti-ish left join, one
    bounded rollup."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        (F.substring(F.col("source"), 4, 10).cast("long") % 2 == 1).alias(
            "is_train"
        ),
        F.explode(words_expr(F.col("text"))).alias("w"),
    )
    tv = tok.filter(F.col("is_train")).select("w").distinct().withColumn(
        "_in", F.lit(1)
    )
    held = tok.filter(~F.col("is_train")).groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    j = held.join(F.broadcast(tv), "w", "left").select(
        "source",
        "c",
        F.when(F.col("_in").isNull(), 1).otherwise(0).alias("oov"),
    )
    q6 = lambda e: F.floor(e * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    return (
        j.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            q6(
                F.sum(F.col("oov") * F.col("c")).cast("double") / F.sum("c")
            ).alias("token_oov_rate"),
            q6(F.sum("oov").cast("double") / F.count(F.lit(1))).alias(
                "type_oov_rate"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Order-key density audit: key-space coverage (min/max/density) and
# the largest gap — ingest that silently drops a partition leaves a
# key-space crater long before row counts look wrong. The gap scan is
# a lag over the DISTINCT-KEY table (here dense; the two-pass rank is
# the ≥1e9-key escape hatch, same contract as the rank family).
# ---------------------------------------------------------------------------
_KEYDENSITY_SQL = """
    WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(min(k) AS BIGINT) AS kmin,
             CAST(max(k) AS BIGINT) AS kmax
      FROM k
    ),
    gaps AS (
      SELECT k - lag(k) OVER (ORDER BY k) AS gap FROM k
    )
    SELECT s.n AS n_keys, s.kmin, s.kmax,
           floor(CAST(s.n AS DOUBLE) / (s.kmax - s.kmin + 1) * 1.0e6 + 0.5)
             / 1.0e6 AS key_density,
           CAST((SELECT max(gap) FROM gaps) AS BIGINT) AS max_gap
    FROM s
"""


@_register("orders_orderkey_density_audit", oracle=_KEYDENSITY_SQL)
def orders_orderkey_density_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Key-space density and max gap of o_orderkey: ranks come from
    ranked_cumsum_two_pass (the key table scales with |orders|, so a
    global lag window would single-task sort it); the predecessor join
    is rank-keyed (one bounded shuffle), max gap from one rollup."""
    from cioos_siooc_data_transform_spark.operators.windows import (
        ranked_cumsum_two_pass,
    )

    o = _t(spark, sf_dir, "orders")
    k = o.select(F.col("o_orderkey").alias("k")).distinct()
    s = k.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("k").cast("long").alias("kmin"),
        F.max("k").cast("long").alias("kmax"),
    )
    ranked = ranked_cumsum_two_pass(
        k, "k", "k", ascending=True, out_rank="r", out_cum="__cum"
    ).select("k", F.col("r").cast("long").alias("r"))
    prev = ranked.select(
        (F.col("r") + 1).alias("r"), F.col("k").alias("k_prev")
    )
    gaps = ranked.join(prev, "r").select(
        (F.col("k") - F.col("k_prev")).alias("gap")
    )
    mg = gaps.agg(F.max("gap").cast("long").alias("max_gap"))
    return s.crossJoin(F.broadcast(mg)).select(
        F.col("n").alias("n_keys"),
        "kmin",
        "kmax",
        (
            F.floor(
                F.col("n").cast("double")
                / (F.col("kmax") - F.col("kmin") + 1)
                * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("key_density"),
        "max_gap",
    )


# ---------------------------------------------------------------------------
# Dirichlet concentration (method of moments) of daily event-type
# shares: α0 from the mean share variance across days — low α0 means
# wildly swinging daily mixes, high α0 a stable composition.
# ---------------------------------------------------------------------------
_DIRICHLET_SQL = """
    WITH cell AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    dtot AS (SELECT day, CAST(sum(c) AS BIGINT) AS n FROM cell GROUP BY day),
    share AS (
      SELECT c.event_type, CAST(c.c AS DOUBLE) / d.n AS p
      FROM cell c JOIN dtot d ON c.day = d.day
    ),
    m AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
             sum(p) / count(*) AS mbar,
             (sum(p * p) - sum(p) * sum(p) / count(*)) / (count(*) - 1) AS v
      FROM share GROUP BY event_type
    ),
    est AS (
      SELECT event_type,
             CAST(floor((mbar * (1.0 - mbar) / v - 1.0) * 1.0e6 + 0.5)
                  AS BIGINT) AS a0_u
      FROM m
    )
    SELECT CAST(count(*) AS BIGINT) AS n_types,
           floor(CAST(sum(a0_u) AS DOUBLE) / count(*) + 0.5) / 1.0e6
             AS alpha0_mom
    FROM est
"""


@_register("events_type_share_dirichlet_mom", oracle=_DIRICHLET_SQL)
def events_type_share_dirichlet_mom(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Method-of-moments Dirichlet concentration of daily type shares:
    per-type α0 estimates m(1−m)/v − 1 quantized then averaged —
    bounded day×type rollups only."""
    ev = _t(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    dtot = cell.groupBy("day").agg(F.sum("c").cast("long").alias("n"))
    share = cell.join(dtot, "day").select(
        "event_type", (F.col("c").cast("double") / F.col("n")).alias("p")
    )
    m = share.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        (F.sum("p") / F.count(F.lit(1))).alias("mbar"),
        (
            (
                F.sum(F.col("p") * F.col("p"))
                - F.sum("p") * F.sum("p") / F.count(F.lit(1))
            )
            / (F.count(F.lit(1)) - 1)
        ).alias("v"),
    )
    est = m.select(
        F.floor(
            (F.col("mbar") * (1.0 - F.col("mbar")) / F.col("v") - 1.0) * 1.0e6
            + 0.5
        )
        .cast("long")
        .alias("a0_u")
    )
    return est.agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        (
            F.floor(F.sum("a0_u").cast("double") / F.count(F.lit(1)) + 0.5)
            / 1.0e6
        ).alias("alpha0_mom"),
    )


# ---------------------------------------------------------------------------
# Quality by length decile: mean long-word-ratio quality per token-
# count decile — the curve that says whether a single quality
# threshold silently length-filters. Deciles via ntile_two_pass.
# ---------------------------------------------------------------------------
_QLEN_SQL = """
    WITH q AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(floor(
               (len(list_filter(string_split(text, ' '), t -> strlen(t) >= 5))
                * 1.0 / len(string_split(text, ' '))) * 1.0e6 + 0.5)
             AS BIGINT) AS q_u
      FROM documents
    ),
    tiled AS (
      SELECT q_u,
             CAST(ntile(10) OVER (ORDER BY n_tok ASC, doc_id ASC) AS BIGINT)
               AS decile
      FROM q
    )
    SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
           floor(CAST(sum(q_u) AS DOUBLE) / count(*) + 0.5) / 1.0e6
             AS mean_quality
    FROM tiled GROUP BY decile ORDER BY decile
"""


@_register("doc_quality_by_length_decile", oracle=_QLEN_SQL)
def doc_quality_by_length_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-vs-length interaction: exact token-count deciles
    (ntile_two_pass), mean micro-quantized quality per decile."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr
    from cioos_siooc_data_transform_spark.operators.windows import (
        ntile_two_pass,
    )

    docs = _t(spark, sf_dir, "documents")
    words = words_expr(F.col("text"))
    q = docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_tok"),
        F.floor(
            F.size(F.filter(words, lambda t: F.length(t) >= 5))
            * 1.0
            / F.size(words)
            * 1.0e6
            + 0.5
        )
        .cast("long")
        .alias("q_u"),
    )
    tiled = ntile_two_pass(q, "n_tok", "doc_id", n_tiles=10, out_col="decile")
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            (
                F.floor(F.sum("q_u").cast("double") / F.count(F.lit(1)) + 0.5)
                / 1.0e6
            ).alias("mean_quality"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Brand revenue-share stability across years: per brand, the max
# year-over-year share swing — assortment drift at the brand level.
# ---------------------------------------------------------------------------
_BRANDSTAB_SQL = """
    WITH rev AS (
      SELECT p.p_brand AS brand,
             CAST(year(o.o_orderdate) AS BIGINT) AS yr,
             CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    ytot AS (SELECT yr, CAST(sum(cents) AS BIGINT) AS t FROM rev GROUP BY yr),
    share AS (
      SELECT r.brand, r.yr,
             CAST(floor(CAST(r.cents AS DOUBLE) / y.t * 1.0e9 + 0.5)
                  AS BIGINT) AS s_u
      FROM rev r JOIN ytot y ON r.yr = y.yr
    ),
    lagged AS (
      SELECT brand, yr, s_u,
             lag(s_u) OVER (PARTITION BY brand ORDER BY yr) AS prev_u
      FROM share
    ),
    sw AS (
      SELECT brand, CAST(max(abs(s_u - prev_u)) AS BIGINT) AS max_swing_u
      FROM lagged WHERE prev_u IS NOT NULL GROUP BY brand
    )
    SELECT brand,
           CAST(max_swing_u AS DOUBLE) / 1.0e9 AS max_yoy_share_swing
    FROM sw ORDER BY max_swing_u DESC, brand LIMIT 10
"""


@_register("part_brand_share_stability", oracle=_BRANDSTAB_SQL)
def part_brand_share_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max YoY brand revenue-share swing (top-10 movers): brand×year
    rollup on a broadcast-dim join chain, share lag over the bounded
    year axis per brand."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
            )
            .cast("long")
            .alias("cents")
        )
    )
    ytot = rev.groupBy("yr").agg(F.sum("cents").cast("long").alias("t"))
    share = rev.join(F.broadcast(ytot), "yr").select(
        "brand",
        "yr",
        F.floor(F.col("cents").cast("double") / F.col("t") * 1.0e9 + 0.5)
        .cast("long")
        .alias("s_u"),
    )
    w = Window.partitionBy("brand").orderBy("yr")
    lagged = share.select(
        "brand", "s_u", F.lag("s_u").over(w).alias("prev_u")
    ).filter(F.col("prev_u").isNotNull())
    sw = lagged.groupBy("brand").agg(
        F.max(F.abs(F.col("s_u") - F.col("prev_u")))
        .cast("long")
        .alias("max_swing_u")
    )
    return (
        sw.orderBy(F.col("max_swing_u").desc(), "brand")
        .limit(10)
        .select(
            "brand",
            (F.col("max_swing_u").cast("double") / 1.0e9).alias(
                "max_yoy_share_swing"
            ),
        )
    )
