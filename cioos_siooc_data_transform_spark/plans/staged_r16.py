"""STAGED round-16 queries — NOT registered (round-16 runway seed).

Same contract as staged_r5..r15: LOCAL registry, strict-harness pytest
coverage in tests/test_staged_r16.py, idempotent ``activate()``.
Activation order: staged_r10 (round 10) -> ... -> staged_r15 (round 15)
-> this module (round 16). Budget: <= 50 fresh names at activation.

Content:

- Wave A — inequality decomposition + classical two-sample tests over
  the TPC-H tables (Theil within/between, one-way ANOVA, the
  Epps–Singleton characteristic-function distance, Brunner–Munzel via
  the established midrank machinery, Kendall's W concordance, a
  Clauset-style tail log-likelihood-ratio model comparison, and the
  cross-table scaling-consistency audit).
- Wave B — events time-series texture: rescaled-range Hurst, Parkinson
  range volatility, order-2 Markov entropy rate, hour-of-week profile
  drift, Fano-factor scale curve, co-bursting overlap, activity decay
  half-life, Rayleigh circular-uniformity by type, permutation entropy.
- Wave C — co-purchase graph: 3-hop BFS frontier profile, degree-pair
  mutual information, degree-stratified closure, edge-weight disparity.
- Wave D — dedup/similarity/embedding audits: within-component length
  spread, MinHash-vs-SimHash method agreement, the AMS F2 sketch,
  participation-ratio effective rank, distance-concentration relative
  contrast, reciprocal-rank fusion, JL distortion sweep, MinHash
  jackknife variance, label projection overlap, dedup effective sample
  size.
- Wave E — text/LM: log-odds-ratio with informative Dirichlet prior
  (Monroe et al. 2008), interpolated Kneser–Ney bigram, held-out
  unigram perplexity, BM25 parameter sweep, rank-band vocabulary
  overlap, per-language Heaps' law, self-repetition curve, char/token
  entropy ratio.
- Wave F — oceanographic profile integrals on the shared synthetic
  profile substrate: potential-energy anomaly, T-S census, heat
  content.
- Wave G — pipeline ops: curriculum quality buckets, two-proportion
  power audit, weekly value-Gini trend (grouped two-pass ranks),
  truncation-loss sweep, multimodal metadata consistency, lexicon
  polarity scoring, per-quantity-decile price quantiles, langid
  confusability margin, sourcing-depth price spread.

Scale notes (the 100 TB contract): every rank in this module comes from
the two-pass range-bucket operators (operators/windows.py) or a window
PARTITIONED by a bounded key; every pair-generating join is a
bucket/block equi-join; broadcast sides are constant-size (threshold
tables, lexicons, per-group stat rows). Detector run at seed time:
see tests/test_staged_r16.py and the ACTIVATION NOTE below.

ACTIVATION NOTE (round 16, pre-audited at seed time via
plan_guards.find_unpartitioned_windows): queries listed in
tests/test_staged_r16.py::EXPECTED_BOUNDED_WINDOW_QUERIES carry a
bounded unpartitioned window (calendar-day/week rollups, bounded
alphabets, TakeOrdered results) — add them to
tests/test_plans.py::_ALLOWED_UNPARTITIONED_WINDOWS with those
justifications in the activation commit.
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
    """Round-16 activation (idempotent)."""
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
# Wave A — inequality decomposition + classical tests.
# ===========================================================================

# ---------------------------------------------------------------------------
# Theil-T decomposition of line revenue by return flag: T_total =
# T_within + T_between (Theil 1967). Per-row entropy terms (x/mu)ln(x/mu)
# are floor-quantized to 1e-9 integer units BEFORE the sum (both
# engines sum identical integers — the repo-wide addition-order rule);
# mu enters as the exact integer ratio S/n so the per-row argument
# x*n/S is reproducible bit-for-bit.
# ---------------------------------------------------------------------------
_THEIL_SQL = """
    WITH rows_ AS (
      SELECT l_returnflag AS g,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS x
      FROM lineitem WHERE l_extendedprice > 0
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
      FROM rows_
    ),
    grp AS (
      SELECT g, CAST(count(*) AS BIGINT) AS ng, CAST(sum(x) AS BIGINT) AS sg
      FROM rows_ GROUP BY g
    ),
    term_tot AS (
      SELECT CAST(sum(CAST(floor(
               (CAST(r.x AS DOUBLE) * t.n / t.s)
               * ln(CAST(r.x AS DOUBLE) * t.n / t.s) * 1.0e9 + 0.5)
             AS BIGINT)) AS BIGINT) AS tt_u, max(t.n) AS n
      FROM rows_ r CROSS JOIN tot t
    ),
    term_grp AS (
      SELECT r.g,
             CAST(sum(CAST(floor(
               (CAST(r.x AS DOUBLE) * g2.ng / g2.sg)
               * ln(CAST(r.x AS DOUBLE) * g2.ng / g2.sg) * 1.0e9 + 0.5)
             AS BIGINT)) AS BIGINT) AS tg_u
      FROM rows_ r JOIN grp g2 ON r.g = g2.g
      GROUP BY r.g
    ),
    within_terms AS (
      SELECT CAST(floor(
               (CAST(g2.sg AS DOUBLE) / t.s)
               * (CAST(tg.tg_u AS DOUBLE) / 1.0e9 / g2.ng) * 1.0e9 + 0.5)
             AS BIGINT) AS w_u,
             CAST(floor(
               (CAST(g2.sg AS DOUBLE) / t.s)
               * ln((CAST(g2.sg AS DOUBLE) / g2.ng)
                    / (CAST(t.s AS DOUBLE) / t.n)) * 1.0e9 + 0.5)
             AS BIGINT) AS b_u
      FROM grp g2 JOIN term_grp tg ON g2.g = tg.g CROSS JOIN tot t
    )
    SELECT t.n AS n_rows,
           floor(CAST(tt.tt_u AS DOUBLE) / t.n / 1.0e9 * 1.0e6 + 0.5) / 1.0e6
             AS theil_total,
           floor(CAST((SELECT sum(w_u) FROM within_terms) AS DOUBLE)
                 / 1.0e9 * 1.0e6 + 0.5) / 1.0e6 AS theil_within,
           floor(CAST((SELECT sum(b_u) FROM within_terms) AS DOUBLE)
                 / 1.0e9 * 1.0e6 + 0.5) / 1.0e6 AS theil_between
    FROM tot t CROSS JOIN term_tot tt
"""


@_register("lineitem_theil_decomposition", oracle=_THEIL_SQL)
def lineitem_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality of line revenue decomposed into within- and
    between-returnflag components. Two map-side-combinable aggregates
    (global + per-flag exact integer sums broadcast back as 1-row /
    3-row dimensions) and one per-row projection — no window, no
    key-scaled shuffle. Per-row entropy terms quantize to 1e-9 integer
    units before summation (addition-order-proof)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    rows = li.select(
        F.col("l_returnflag").alias("g"),
        F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long").alias("x"),
    )
    tot = rows.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    grp = rows.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("x").cast("long").alias("sg"),
    )
    xd = F.col("x").cast("double")
    arg_tot = xd * F.col("n") / F.col("s")
    term_tot = (
        rows.crossJoin(F.broadcast(tot))
        .select(
            F.floor(arg_tot * F.log(arg_tot) * 1.0e9 + 0.5)
            .cast("long")
            .alias("t_u"),
            "n",
        )
        .agg(F.sum("t_u").cast("long").alias("tt_u"), F.max("n").alias("n"))
    )
    arg_g = xd * F.col("ng") / F.col("sg")
    term_grp = (
        rows.join(F.broadcast(grp), "g")
        .select(
            "g",
            F.floor(arg_g * F.log(arg_g) * 1.0e9 + 0.5)
            .cast("long")
            .alias("t_u"),
        )
        .groupBy("g")
        .agg(F.sum("t_u").cast("long").alias("tg_u"))
    )
    sgd = F.col("sg").cast("double")
    wt = (
        grp.join(term_grp, "g")
        .crossJoin(F.broadcast(tot))
        .select(
            F.floor(
                (sgd / F.col("s"))
                * (F.col("tg_u").cast("double") / 1.0e9 / F.col("ng"))
                * 1.0e9
                + 0.5
            )
            .cast("long")
            .alias("w_u"),
            F.floor(
                (sgd / F.col("s"))
                * F.log(
                    (sgd / F.col("ng"))
                    / (F.col("s").cast("double") / F.col("n"))
                )
                * 1.0e9
                + 0.5
            )
            .cast("long")
            .alias("b_u"),
        )
        .agg(
            F.sum("w_u").cast("long").alias("sw_u"),
            F.sum("b_u").cast("long").alias("sb_u"),
        )
    )
    q6 = lambda c: F.floor(c * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    return term_tot.crossJoin(F.broadcast(wt)).select(
        F.col("n").alias("n_rows"),
        q6(F.col("tt_u").cast("double") / F.col("n") / 1.0e9).alias(
            "theil_total"
        ),
        q6(F.col("sw_u").cast("double") / 1.0e9).alias("theil_within"),
        q6(F.col("sb_u").cast("double") / 1.0e9).alias("theil_between"),
    )


# ---------------------------------------------------------------------------
# One-way ANOVA of line revenue across tax brackets: SS terms are EXACT
# integer sums (cents and cents^2 in DECIMAL(38,0) / HUGEINT), so F and
# eta^2 are single rounded expressions over identical integers.
# ---------------------------------------------------------------------------
_TAX_ANOVA_SQL = """
    WITH rows_ AS (
      SELECT CAST(floor(l_tax * 100.0 + 0.5) AS BIGINT) AS bracket,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS x
      FROM lineitem
    ),
    grp AS (
      SELECT bracket, CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(x) AS HUGEINT) AS sg,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS qg
      FROM rows_ GROUP BY bracket
    ),
    tot AS (
      SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
             CAST(sum(sg) AS HUGEINT) AS s, CAST(sum(qg) AS HUGEINT) AS q,
             CAST(sum(CAST(floor(CAST(sg AS DOUBLE) * sg / ng + 0.5)
                  AS HUGEINT)) AS HUGEINT) AS sbs
      FROM grp
    )
    SELECT n, k,
           floor((CAST(sbs AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                 / (CAST(q AS DOUBLE) - CAST(sbs AS DOUBLE))
                 * (n - k) / (k - 1) * 1.0e6 + 0.5) / 1.0e6 AS f_stat,
           floor((CAST(sbs AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                 / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                 * 1.0e9 + 0.5) / 1.0e9 AS eta_squared
    FROM tot
"""


@_register("lineitem_tax_anova", oracle=_TAX_ANOVA_SQL)
def lineitem_tax_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of line revenue across the 9 tax brackets. One
    map-side-combinable group-by over a bounded alphabet; the
    between-group sum-of-squares term sum(sg^2/ng) is floor-quantized
    PER GROUP to an integer before the cross-group sum (order-proof),
    everything else is exact decimal arithmetic until the final F and
    eta^2 expressions."""
    li = _t(spark, sf_dir, "lineitem")
    rows = li.select(
        F.floor(F.col("l_tax") * 100.0 + 0.5).cast("long").alias("bracket"),
        F.floor(F.col("l_extendedprice") * 100.0 + 0.5)
        .cast("long")
        .alias("x"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    grp = rows.groupBy("bracket").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("x").cast("decimal(38,0)").alias("sg"),
        F.sum(dec("x") * dec("x")).cast("decimal(38,0)").alias("qg"),
    )
    tot = grp.agg(
        F.sum("ng").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("sg").cast("decimal(38,0)").alias("s"),
        F.sum("qg").cast("decimal(38,0)").alias("q"),
        F.sum(
            F.floor(
                F.col("sg").cast("double")
                * F.col("sg").cast("double")
                / F.col("ng")
                + 0.5
            ).cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("sbs"),
    )
    sd = F.col("s").cast("double")
    qd = F.col("q").cast("double")
    sbsd = F.col("sbs").cast("double")
    ssb = sbsd - sd * sd / F.col("n")
    ssw = qd - sbsd
    sst = qd - sd * sd / F.col("n")
    return tot.select(
        "n",
        "k",
        (
            F.floor(
                ssb / ssw * (F.col("n") - F.col("k")) / (F.col("k") - 1) * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("f_stat"),
        (F.floor(ssb / sst * 1.0e9 + 0.5) / 1.0e9).alias("eta_squared"),
    )


# ---------------------------------------------------------------------------
# Epps–Singleton characteristic-function distance between two customer
# segments' account balances (Epps & Singleton 1986, the unweighted CF
# coordinates): g(t) = [cos(t x'), sin(t x')] at two fixed frequencies,
# x' standardized by the POOLED mean/stddev (exact integer sums). The
# full ES test inverts the 4x4 empirical covariance; this audit reports
# the four CF-coordinate gaps and the unweighted quadratic distance —
# the monitoring quantity (per-row cos/sin terms quantized at 1e-9).
# ---------------------------------------------------------------------------
_EPPS_SQL = """
    WITH rows_ AS (
      SELECT c_mktsegment AS seg,
             CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS x
      FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    ),
    pool AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS HUGEINT) AS s,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
      FROM rows_
    ),
    std AS (
      SELECT CAST(s AS DOUBLE) / n AS mu,
             sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1))
               AS sd
      FROM pool
    ),
    terms AS (
      SELECT seg,
             CAST(floor(cos(0.4 * (x - mu) / sd) * 1.0e9 + 0.5) AS BIGINT) AS c1,
             CAST(floor(sin(0.4 * (x - mu) / sd) * 1.0e9 + 0.5) AS BIGINT) AS s1,
             CAST(floor(cos(0.8 * (x - mu) / sd) * 1.0e9 + 0.5) AS BIGINT) AS c2,
             CAST(floor(sin(0.8 * (x - mu) / sd) * 1.0e9 + 0.5) AS BIGINT) AS s2
      FROM rows_ CROSS JOIN std
    ),
    g AS (
      SELECT seg, CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(c1) AS BIGINT) AS c1, CAST(sum(s1) AS BIGINT) AS s1,
             CAST(sum(c2) AS BIGINT) AS c2, CAST(sum(s2) AS BIGINT) AS s2
      FROM terms GROUP BY seg
    ),
    d AS (
      SELECT max(ng) FILTER (seg = 'BUILDING') AS na,
             max(ng) FILTER (seg = 'MACHINERY') AS nb,
             (max(CAST(c1 AS DOUBLE) / ng) FILTER (seg = 'BUILDING')
              - max(CAST(c1 AS DOUBLE) / ng) FILTER (seg = 'MACHINERY')) / 1.0e9 AS d1,
             (max(CAST(s1 AS DOUBLE) / ng) FILTER (seg = 'BUILDING')
              - max(CAST(s1 AS DOUBLE) / ng) FILTER (seg = 'MACHINERY')) / 1.0e9 AS d2,
             (max(CAST(c2 AS DOUBLE) / ng) FILTER (seg = 'BUILDING')
              - max(CAST(c2 AS DOUBLE) / ng) FILTER (seg = 'MACHINERY')) / 1.0e9 AS d3,
             (max(CAST(s2 AS DOUBLE) / ng) FILTER (seg = 'BUILDING')
              - max(CAST(s2 AS DOUBLE) / ng) FILTER (seg = 'MACHINERY')) / 1.0e9 AS d4
      FROM g
    )
    SELECT na, nb,
           floor(d1 * 1.0e6 + 0.5) / 1.0e6 AS d_cos1,
           floor(d2 * 1.0e6 + 0.5) / 1.0e6 AS d_sin1,
           floor(d3 * 1.0e6 + 0.5) / 1.0e6 AS d_cos2,
           floor(d4 * 1.0e6 + 0.5) / 1.0e6 AS d_sin2,
           floor(CAST(na AS DOUBLE) * nb / (na + nb)
                 * (d1*d1 + d2*d2 + d3*d3 + d4*d4) * 1.0e6 + 0.5) / 1.0e6
             AS w_unweighted
    FROM d
"""


@_register("customer_acctbal_epps_singleton", oracle=_EPPS_SQL)
def customer_acctbal_epps_singleton(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Epps–Singleton characteristic-function coordinates for two
    segments: per-row cos/sin at two pooled-standardized frequencies,
    quantized at 1e-9 and integer-summed per segment (one bounded
    group-by; the pooled moments are a 1-row broadcast). Detects
    distribution differences CDF tests miss when means/variances agree."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    rows = cust.select(
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") * 100.0 + 0.5).cast("long").alias("x"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    pool = rows.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s"),
        F.sum(dec("x") * dec("x")).cast("decimal(38,0)").alias("q"),
    ).select(
        (F.col("s").cast("double") / F.col("n")).alias("mu"),
        F.sqrt(
            (
                F.col("q").cast("double")
                - F.col("s").cast("double")
                * F.col("s").cast("double")
                / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("sd"),
    )
    z = (F.col("x") - F.col("mu")) / F.col("sd")
    qt = lambda e: F.floor(e * 1.0e9 + 0.5).cast("long")  # noqa: E731
    terms = rows.crossJoin(F.broadcast(pool)).select(
        "seg",
        qt(F.cos(0.4 * z)).alias("c1"),
        qt(F.sin(0.4 * z)).alias("s1"),
        qt(F.cos(0.8 * z)).alias("c2"),
        qt(F.sin(0.8 * z)).alias("s2"),
    )
    g = terms.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("c1").cast("long").alias("c1"),
        F.sum("s1").cast("long").alias("s1"),
        F.sum("c2").cast("long").alias("c2"),
        F.sum("s2").cast("long").alias("s2"),
    )
    pick = lambda col, seg: F.max(  # noqa: E731
        F.when(F.col("seg") == seg, F.col(col).cast("double") / F.col("ng"))
    )
    d = g.agg(
        F.max(F.when(F.col("seg") == "BUILDING", F.col("ng"))).alias("na"),
        F.max(F.when(F.col("seg") == "MACHINERY", F.col("ng"))).alias("nb"),
        ((pick("c1", "BUILDING") - pick("c1", "MACHINERY")) / 1.0e9).alias("d1"),
        ((pick("s1", "BUILDING") - pick("s1", "MACHINERY")) / 1.0e9).alias("d2"),
        ((pick("c2", "BUILDING") - pick("c2", "MACHINERY")) / 1.0e9).alias("d3"),
        ((pick("s2", "BUILDING") - pick("s2", "MACHINERY")) / 1.0e9).alias("d4"),
    )
    q6 = lambda e: F.floor(e * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    quad = (
        F.col("d1") * F.col("d1")
        + F.col("d2") * F.col("d2")
        + F.col("d3") * F.col("d3")
        + F.col("d4") * F.col("d4")
    )
    return d.select(
        "na",
        "nb",
        q6(F.col("d1")).alias("d_cos1"),
        q6(F.col("d2")).alias("d_sin1"),
        q6(F.col("d3")).alias("d_cos2"),
        q6(F.col("d4")).alias("d_sin2"),
        q6(na * nb / (na + nb) * quad).alias("w_unweighted"),
    )


# ---------------------------------------------------------------------------
# Brunner–Munzel rank test (Brunner & Munzel 2000) for two customer
# segments, the heteroskedastic-robust alternative to Mann–Whitney.
# Midranks come from the SAME machinery as the registered Kruskal–
# Wallis / Mann–Whitney: distinct-value count tables + the weighted
# two-pass running count (no key-scaled window anywhere); the grouped
# form reuses ranked_cumsum_two_pass(group_cols=...). Doubled midranks
# 2R = 2·cum − c + 1 stay exact integers; the per-row variance
# deviations quantize at 1e-6 before the group sums.
# ---------------------------------------------------------------------------
_BM_SQL = """
    WITH rows_ AS (
      SELECT c_mktsegment AS seg,
             CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS vq
      FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    ),
    cpool AS (SELECT vq, CAST(count(*) AS BIGINT) AS c FROM rows_ GROUP BY vq),
    mpool AS (
      SELECT vq, 2 * sum(c) OVER (ORDER BY vq) - c + 1 AS r2c FROM cpool
    ),
    cgrp AS (
      SELECT seg, vq, CAST(count(*) AS BIGINT) AS c FROM rows_ GROUP BY 1, 2
    ),
    mgrp AS (
      SELECT seg, vq,
             2 * sum(c) OVER (PARTITION BY seg ORDER BY vq) - c + 1 AS r2w
      FROM cgrp
    ),
    j AS (
      SELECT r.seg, mp.r2c, mg.r2w
      FROM rows_ r
      JOIN mpool mp ON r.vq = mp.vq
      JOIN mgrp mg ON r.seg = mg.seg AND r.vq = mg.vq
    ),
    gsum AS (
      SELECT seg, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r2c) AS BIGINT) AS sr2c
      FROM j GROUP BY seg
    ),
    dev AS (
      SELECT j.seg,
             CAST(sum(CAST(floor(
               ((j.r2c - j.r2w - CAST(g.sr2c AS DOUBLE) / g.n + (g.n + 1))
                / 2.0) *
               ((j.r2c - j.r2w - CAST(g.sr2c AS DOUBLE) / g.n + (g.n + 1))
                / 2.0) * 1.0e6 + 0.5) AS BIGINT)) AS BIGINT) AS ssd_u,
             max(g.n) AS n, max(g.sr2c) AS sr2c
      FROM j JOIN gsum g ON j.seg = g.seg
      GROUP BY j.seg
    ),
    s AS (
      SELECT max(n) FILTER (seg = 'BUILDING') AS nx,
             max(n) FILTER (seg = 'MACHINERY') AS ny,
             max(CAST(sr2c AS DOUBLE)) FILTER (seg = 'BUILDING') AS srx,
             max(CAST(sr2c AS DOUBLE)) FILTER (seg = 'MACHINERY') AS sry,
             max(CAST(ssd_u AS DOUBLE) / 1.0e6) FILTER (seg = 'BUILDING') AS qx,
             max(CAST(ssd_u AS DOUBLE) / 1.0e6) FILTER (seg = 'MACHINERY') AS qy
      FROM dev
    )
    SELECT nx, ny,
           floor(((sry / (2.0 * ny) - srx / (2.0 * nx)) / (nx + ny) + 0.5)
                 * 1.0e6 + 0.5) / 1.0e6 AS p_hat,
           floor(nx * ny * (sry / (2.0 * ny) - srx / (2.0 * nx))
                 / ((nx + ny)
                    * sqrt(nx * (qx / (nx - 1)) + ny * (qy / (ny - 1))))
                 * 1.0e6 + 0.5) / 1.0e6 AS bm_stat
    FROM s
"""


@_register("customer_acctbal_brunner_munzel", oracle=_BM_SQL)
def customer_acctbal_brunner_munzel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Brunner–Munzel statistic via scale-safe midranks: combined
    midranks from the weighted two-pass running count over the
    distinct-value table, within-segment midranks from the SAME
    operator with group_cols — both bounded-bucket shuffles. Per-row
    squared rank deviations quantize at 1e-6 before the per-segment
    integer sums (order-proof); the statistic assembles from six
    broadcast scalars (scipy.stats.brunnermunzel's W formulation)."""
    from cioos_siooc_data_transform_spark.operators.windows import (
        ranked_cumsum_two_pass,
    )

    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    rows = cust.select(
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") * 100.0 + 0.5).cast("long").alias("vq"),
    )
    cpool = rows.groupBy("vq").agg(F.count(F.lit(1)).cast("long").alias("c"))
    mpool = ranked_cumsum_two_pass(
        cpool, "vq", "vq", weight_col="c", ascending=True,
        out_rank="__rn", out_cum="cum",
    ).select("vq", (2 * F.col("cum") - F.col("c") + 1).alias("r2c"))
    cgrp = rows.groupBy("seg", "vq").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    mgrp = ranked_cumsum_two_pass(
        cgrp, "vq", "vq", weight_col="c", group_cols=["seg"], ascending=True,
        out_rank="__rn", out_cum="cum",
    ).select("seg", "vq", (2 * F.col("cum") - F.col("c") + 1).alias("r2w"))
    j = (
        rows.join(mpool, "vq")
        .join(mgrp, ["seg", "vq"])
        .select("seg", "r2c", "r2w")
    )
    gsum = j.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r2c").cast("long").alias("sr2c"),
    )
    d2 = (
        F.col("r2c")
        - F.col("r2w")
        - F.col("sr2c").cast("double") / F.col("n")
        + (F.col("n") + 1)
    ) / 2.0
    dev = (
        j.join(F.broadcast(gsum), "seg")
        .select(
            "seg",
            F.floor(d2 * d2 * 1.0e6 + 0.5).cast("long").alias("sd_u"),
            "n",
            "sr2c",
        )
        .groupBy("seg")
        .agg(
            F.sum("sd_u").cast("long").alias("ssd_u"),
            F.max("n").alias("n"),
            F.max("sr2c").alias("sr2c"),
        )
    )
    pick = lambda col, seg: F.max(  # noqa: E731
        F.when(F.col("seg") == seg, F.col(col))
    )
    s = dev.agg(
        pick("n", "BUILDING").alias("nx"),
        pick("n", "MACHINERY").alias("ny"),
        pick("sr2c", "BUILDING").cast("double").alias("srx"),
        pick("sr2c", "MACHINERY").cast("double").alias("sry"),
        (pick("ssd_u", "BUILDING").cast("double") / 1.0e6).alias("qx"),
        (pick("ssd_u", "MACHINERY").cast("double") / 1.0e6).alias("qy"),
    )
    nx, ny = F.col("nx"), F.col("ny")
    mdiff = F.col("sry") / (2.0 * ny) - F.col("srx") / (2.0 * nx)
    q6 = lambda e: F.floor(e * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    return s.select(
        "nx",
        "ny",
        q6(mdiff / (nx + ny) + 0.5).alias("p_hat"),
        q6(
            nx
            * ny
            * mdiff
            / (
                (nx + ny)
                * F.sqrt(
                    nx * (F.col("qx") / (nx - 1))
                    + ny * (F.col("qy") / (ny - 1))
                )
            )
        ).alias("bm_stat"),
    )


# ---------------------------------------------------------------------------
# Kendall's W concordance of brand price rankings across size bins: do
# the 5 size classes agree on which brands are expensive? Ranks are a
# window PARTITIONED by the 5-row bin axis over the 25-row brand
# alphabet (both bounded); doubled deviations 2R_j − m(k+1) keep S
# exact, so W = 3·S4 / (m²(k³−k)) is one division.
# ---------------------------------------------------------------------------
_KENDALL_W_SQL = """
    WITH cell AS (
      SELECT CAST(floor((p_size - 1) / 10.0) AS BIGINT) AS bin, p_brand,
             CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS sg
      FROM part GROUP BY 1, 2
    ),
    ranked AS (
      SELECT bin, p_brand,
             CAST(row_number() OVER (
               PARTITION BY bin
               ORDER BY CAST(floor(CAST(sg AS DOUBLE) * 1.0e6 / ng + 0.5)
                             AS BIGINT), p_brand
             ) AS BIGINT) AS r
      FROM cell
    ),
    rj AS (
      SELECT p_brand, CAST(sum(r) AS BIGINT) AS rsum,
             CAST(count(*) AS BIGINT) AS m
      FROM ranked GROUP BY p_brand
    ),
    kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM rj),
    s AS (
      SELECT kk.k, max(rj.m) AS m,
             CAST(sum((2 * rsum - rj.m * (kk.k + 1))
                      * (2 * rsum - rj.m * (kk.k + 1))) AS BIGINT) AS s4
      FROM rj CROSS JOIN kk GROUP BY kk.k
    )
    SELECT k AS n_brands, m AS n_bins,
           floor(3.0 * s4 / (CAST(m AS DOUBLE) * m * (CAST(k AS DOUBLE)*k*k - k))
                 * 1.0e6 + 0.5) / 1.0e6 AS kendall_w
    FROM s
"""


@_register("part_brand_kendall_w", oracle=_KENDALL_W_SQL)
def part_brand_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance over brand mean retail
    price (integer-quantized mean cents, brand tiebreak) ranked within
    each of 5 size bins. Every window runs over bounded alphabets (5
    bins × 25 brands); sums exact to the last division."""
    part = _t(spark, sf_dir, "part")
    cell = part.groupBy(
        F.floor((F.col("p_size") - 1) / 10.0).cast("long").alias("bin"),
        "p_brand",
    ).agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum(F.floor(F.col("p_retailprice") * 100.0 + 0.5).cast("long"))
        .cast("long")
        .alias("sg"),
    )
    mq = F.floor(F.col("sg").cast("double") * 1.0e6 / F.col("ng") + 0.5).cast(
        "long"
    )
    w = Window.partitionBy("bin").orderBy(mq.asc(), F.col("p_brand").asc())
    ranked = cell.select(
        "bin", "p_brand", F.row_number().over(w).cast("long").alias("r")
    )
    rj = ranked.groupBy("p_brand").agg(
        F.sum("r").cast("long").alias("rsum"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    kk = rj.agg(F.count(F.lit(1)).cast("long").alias("k"))
    rj2 = rj.crossJoin(F.broadcast(kk))
    s = rj2.agg(
        F.max("k").alias("k"),
        F.max("m").alias("m"),
        F.sum(
            (2 * F.col("rsum") - F.col("m") * (F.col("k") + 1))
            * (2 * F.col("rsum") - F.col("m") * (F.col("k") + 1))
        )
        .cast("long")
        .alias("s4"),
    )
    kd, md = F.col("k").cast("double"), F.col("m").cast("double")
    return s.select(
        F.col("k").alias("n_brands"),
        F.col("m").alias("n_bins"),
        (
            F.floor(3.0 * F.col("s4") / (md * md * (kd * kd * kd - kd)) * 1.0e6 + 0.5)
            / 1.0e6
        ).alias("kendall_w"),
    )


# ---------------------------------------------------------------------------
# Clauset-style tail model comparison (Clauset, Shalizi & Newman 2009
# §5; Vuong 1989 normalization): above mu+sigma, is the order-value
# tail better described by a Pareto or a shifted exponential? Both MLEs
# are closed-form; the per-row log-likelihood-ratio terms quantize at
# 1e-9 before the sum and the Vuong z normalizes by their stddev.
# ---------------------------------------------------------------------------
_TAIL_LLR_SQL = """
    WITH rows_ AS (
      SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS x
      FROM orders
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS HUGEINT) AS s,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
      FROM rows_
    ),
    thr AS (
      SELECT CAST(s AS DOUBLE) / n
             + sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1))
               AS t
      FROM mom
    ),
    tail AS (SELECT CAST(x AS DOUBLE) AS x, t FROM rows_ CROSS JOIN thr WHERE x > t),
    fit AS (
      SELECT CAST(count(*) AS BIGINT) AS m, max(t) AS t,
             CAST(sum(CAST(floor(ln(x / t) * 1.0e9 + 0.5) AS BIGINT))
                  AS BIGINT) AS slog_u,
             CAST(sum(CAST(floor((x - t) * 1.0e2 + 0.5) AS BIGINT))
                  AS BIGINT) AS sexc_c
      FROM tail
    ),
    params AS (
      SELECT m, t,
             m / (CAST(slog_u AS DOUBLE) / 1.0e9) AS alpha,
             m / (CAST(sexc_c AS DOUBLE) / 1.0e2) AS lam
      FROM fit
    ),
    llr AS (
      SELECT CAST(floor(
               (ln(p.alpha) + p.alpha * ln(p.t) - (p.alpha + 1) * ln(tl.x)
                - ln(p.lam) + p.lam * (tl.x - p.t)) * 1.0e9 + 0.5)
             AS BIGINT) AS r_u
      FROM tail tl CROSS JOIN params p
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(r_u) AS HUGEINT) AS sr,
             CAST(sum(CAST(r_u AS HUGEINT) * r_u) AS HUGEINT) AS qr
      FROM llr
    )
    SELECT p.m AS n_tail,
           floor(p.alpha * 1.0e6 + 0.5) / 1.0e6 AS pareto_alpha,
           floor(p.lam * 1.0e12 + 0.5) / 1.0e12 AS exp_lambda,
           floor(CAST(a.sr AS DOUBLE) / 1.0e9 * 1.0e6 + 0.5) / 1.0e6
             AS llr_pareto_minus_exp,
           floor(CAST(a.sr AS DOUBLE) / 1.0e9
                 / (sqrt(CAST(a.m AS DOUBLE)) *
                    sqrt((CAST(a.qr AS DOUBLE) / 1.0e18
                          - (CAST(a.sr AS DOUBLE) / 1.0e9) *
                            (CAST(a.sr AS DOUBLE) / 1.0e9) / a.m) / a.m))
                 * 1.0e6 + 0.5) / 1.0e6 AS vuong_z
    FROM params p CROSS JOIN agg a
"""


@_register("orders_tail_pareto_vs_exp_llr", oracle=_TAIL_LLR_SQL)
def orders_tail_pareto_vs_exp_llr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tail model comparison: three map-side-combinable aggregate
    passes (pooled moments → threshold; tail sums → closed-form MLEs;
    per-row LLR terms) each broadcast back as a 1-row dimension — no
    window, no sort, no collect. Positive Vuong z favors Pareto."""
    orders = _t(spark, sf_dir, "orders")
    rows = orders.select(
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("x")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    mom = rows.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s"),
        F.sum(dec("x") * dec("x")).cast("decimal(38,0)").alias("q"),
    )
    thr = mom.select(
        (
            F.col("s").cast("double") / F.col("n")
            + F.sqrt(
                (
                    F.col("q").cast("double")
                    - F.col("s").cast("double")
                    * F.col("s").cast("double")
                    / F.col("n")
                )
                / (F.col("n") - 1)
            )
        ).alias("t")
    )
    tail = (
        rows.crossJoin(F.broadcast(thr))
        .filter(F.col("x") > F.col("t"))
        .select(F.col("x").cast("double").alias("x"), "t")
    )
    fit = tail.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.max("t").alias("t"),
        F.sum(
            F.floor(F.log(F.col("x") / F.col("t")) * 1.0e9 + 0.5).cast("long")
        )
        .cast("long")
        .alias("slog_u"),
        F.sum(
            F.floor((F.col("x") - F.col("t")) * 1.0e2 + 0.5).cast("long")
        )
        .cast("long")
        .alias("sexc_c"),
    )
    params = fit.select(
        "m",
        "t",
        (F.col("m") / (F.col("slog_u").cast("double") / 1.0e9)).alias("alpha"),
        (F.col("m") / (F.col("sexc_c").cast("double") / 1.0e2)).alias("lam"),
    )
    r_u = F.floor(
        (
            F.log(F.col("alpha"))
            + F.col("alpha") * F.log(F.col("t"))
            - (F.col("alpha") + 1) * F.log(F.col("x"))
            - F.log(F.col("lam"))
            + F.col("lam") * (F.col("x") - F.col("t"))
        )
        * 1.0e9
        + 0.5
    ).cast("long")
    llr = (
        tail.select("x").crossJoin(F.broadcast(params)).select(r_u.alias("r_u"))
    )
    agg = llr.agg(
        F.count(F.lit(1)).cast("long").alias("ma"),
        F.sum("r_u").cast("decimal(38,0)").alias("sr"),
        F.sum(dec("r_u") * dec("r_u")).cast("decimal(38,0)").alias("qr"),
    )
    srd = F.col("sr").cast("double") / 1.0e9
    qrd = F.col("qr").cast("double") / 1.0e18
    md = F.col("ma").cast("double")
    q6 = lambda e: F.floor(e * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    return params.crossJoin(F.broadcast(agg)).select(
        F.col("m").alias("n_tail"),
        q6(F.col("alpha")).alias("pareto_alpha"),
        (F.floor(F.col("lam") * 1.0e12 + 0.5) / 1.0e12).alias("exp_lambda"),
        q6(srd).alias("llr_pareto_minus_exp"),
        q6(
            srd / (F.sqrt(md) * F.sqrt((qrd - srd * srd / md) / md))
        ).alias("vuong_z"),
    )


# ---------------------------------------------------------------------------
# Cross-table scaling-consistency audit: TPC-H's generator fixes the
# row-count ratios between tables; a broken ingest or a dropped
# partition shows up as a ratio drift long before any per-row check
# fires. One count per table union-aggregated into a single row — six
# scans, zero joins, zero windows.
# ---------------------------------------------------------------------------
_RATIO_SQL = """
    WITH c AS (
      SELECT 'lineitem' AS t, CAST(count(*) AS BIGINT) AS n FROM lineitem
      UNION ALL SELECT 'orders', count(*) FROM orders
      UNION ALL SELECT 'customer', count(*) FROM customer
      UNION ALL SELECT 'supplier', count(*) FROM supplier
      UNION ALL SELECT 'part', count(*) FROM part
      UNION ALL SELECT 'nation', count(*) FROM nation
    ),
    p AS (
      SELECT max(n) FILTER (t = 'lineitem') AS n_lineitem,
             max(n) FILTER (t = 'orders') AS n_orders,
             max(n) FILTER (t = 'customer') AS n_customer,
             max(n) FILTER (t = 'supplier') AS n_supplier,
             max(n) FILTER (t = 'part') AS n_part,
             max(n) FILTER (t = 'nation') AS n_nation
      FROM c
    )
    SELECT n_lineitem, n_orders, n_customer, n_supplier, n_part, n_nation,
           floor(CAST(n_lineitem AS DOUBLE) / n_orders * 1.0e6 + 0.5) / 1.0e6
             AS lines_per_order,
           floor(CAST(n_orders AS DOUBLE) / n_customer * 1.0e6 + 0.5) / 1.0e6
             AS orders_per_customer,
           floor(CAST(n_customer AS DOUBLE) / n_supplier * 1.0e6 + 0.5) / 1.0e6
             AS customers_per_supplier
    FROM p
"""


@_register("tpch_table_ratio_profile", oracle=_RATIO_SQL)
def tpch_table_ratio_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scaling-ratio audit: per-table counts union-aggregated into one
    row (conditional max — no cross-join chain), ratios quantized once."""
    counts = None
    for t in ["lineitem", "orders", "customer", "supplier", "part", "nation"]:
        c = _t(spark, sf_dir, t).agg(
            F.lit(t).alias("t"), F.count(F.lit(1)).cast("long").alias("n")
        )
        counts = c if counts is None else counts.unionAll(c)
    pick = lambda t: F.max(F.when(F.col("t") == t, F.col("n")))  # noqa: E731
    p = counts.agg(
        pick("lineitem").alias("n_lineitem"),
        pick("orders").alias("n_orders"),
        pick("customer").alias("n_customer"),
        pick("supplier").alias("n_supplier"),
        pick("part").alias("n_part"),
        pick("nation").alias("n_nation"),
    )
    r6 = lambda a, b: (  # noqa: E731
        F.floor(F.col(a).cast("double") / F.col(b) * 1.0e6 + 0.5) / 1.0e6
    )
    return p.select(
        "n_lineitem", "n_orders", "n_customer", "n_supplier", "n_part",
        "n_nation",
        r6("n_lineitem", "n_orders").alias("lines_per_order"),
        r6("n_orders", "n_customer").alias("orders_per_customer"),
        r6("n_customer", "n_supplier").alias("customers_per_supplier"),
    )


# ===========================================================================
# Wave B — events time-series texture. Shared substrate: the per-day /
# per-hour count rollups (calendar-bounded axes — the allowlisted
# window class) and per-type trig sums (bounded alphabet).
# ===========================================================================

# ---------------------------------------------------------------------------
# Rescaled-range (Hurst) analysis of the daily event-count series
# (Hurst 1951; Mandelbrot & Wallis 1969): split the day axis into full
# blocks of m ∈ {5,10,15,30} days, per block R = range of cumulative
# mean-deviations and S = population stddev, H = OLS slope of
# log(mean R/S) on log(m). H≈0.5 is memoryless; H>0.5 long-range
# dependent. All block windows are ≤30 rows (calendar-bounded).
# ---------------------------------------------------------------------------
_HURST_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT CAST(date_diff('day', (SELECT min(day) FROM daily), day)
                  AS BIGINT) AS i, c
      FROM daily
    ),
    sizes AS (SELECT unnest([5, 10, 15, 30]) AS m),
    blk AS (
      SELECT s.m, CAST(floor(i.i / s.m) AS BIGINT) AS b, i.i, i.c
      FROM idx i CROSS JOIN sizes s
    ),
    bstat AS (
      SELECT m, b, CAST(count(*) AS BIGINT) AS nb,
             CAST(sum(c) AS BIGINT) AS sc,
             CAST(sum(c * c) AS BIGINT) AS qc
      FROM blk GROUP BY m, b
    ),
    dev AS (
      SELECT k.m, k.b,
             sum(k.c) OVER (PARTITION BY k.m, k.b ORDER BY k.i)
               - (row_number() OVER (PARTITION BY k.m, k.b ORDER BY k.i))
                 * (CAST(st.sc AS DOUBLE) / st.nb) AS y
      FROM blk k JOIN bstat st ON k.m = st.m AND k.b = st.b
      WHERE st.nb = st.m
    ),
    rs AS (
      SELECT d.m, d.b,
             CAST(floor((max(d.y) - min(d.y))
               / sqrt((CAST(max(st.qc) AS DOUBLE)
                       - CAST(max(st.sc) AS DOUBLE) * max(st.sc) / max(st.nb))
                      / max(st.nb))
               * 1.0e9 + 0.5) AS BIGINT) AS rs_u
      FROM dev d JOIN bstat st ON d.m = st.m AND d.b = st.b
      GROUP BY d.m, d.b
      HAVING (CAST(max(st.qc) AS DOUBLE)
              - CAST(max(st.sc) AS DOUBLE) * max(st.sc) / max(st.nb)) > 0
    ),
    pts AS (
      SELECT ln(CAST(m AS DOUBLE)) AS x,
             ln(CAST(sum(rs_u) AS DOUBLE) / count(*) / 1.0e9) AS y
      FROM rs GROUP BY m
    ),
    ols AS (
      SELECT CAST(count(*) AS BIGINT) AS np, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy
      FROM pts
    )
    SELECT np AS n_sizes,
           floor((np * sxy - sx * sy) / (np * sxx - sx * sx) * 1.0e6 + 0.5)
             / 1.0e6 AS hurst_h
    FROM ols
"""


@_register("events_daily_counts_hurst_rs", oracle=_HURST_SQL)
def events_daily_counts_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R/S Hurst exponent of the daily count series. The only windows
    run over the ≤|days| calendar rollup partitioned by (m, block);
    per-block R/S quantizes at 1e-9 before the per-size mean; the OLS
    runs over the 4-row size table."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    mn = daily.agg(F.min("day").alias("d0"))
    idx = daily.crossJoin(F.broadcast(mn)).select(
        F.datediff(F.col("day"), F.col("d0")).cast("long").alias("i"), "c"
    )
    sizes = spark.createDataFrame([(5,), (10,), (15,), (30,)], "m int").select(
        F.col("m").cast("long").alias("m")
    )
    blk = idx.crossJoin(F.broadcast(sizes)).select(
        "m", F.floor(F.col("i") / F.col("m")).cast("long").alias("b"), "i", "c"
    )
    bstat = blk.groupBy("m", "b").agg(
        F.count(F.lit(1)).cast("long").alias("nb"),
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("qc"),
    )
    w = Window.partitionBy("m", "b").orderBy("i")
    ws = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dev = (
        blk.join(bstat, ["m", "b"])
        .filter(F.col("nb") == F.col("m"))
        .select(
            "m",
            "b",
            "i",
            (
                F.sum("c").over(ws)
                - F.row_number().over(w)
                * (F.col("sc").cast("double") / F.col("nb"))
            ).alias("y"),
        )
    )
    var = (
        F.max("qc").cast("double")
        - F.max("sc").cast("double") * F.max("sc") / F.max("nb")
    ) / F.max("nb")
    rs = (
        dev.join(bstat, ["m", "b"])
        .groupBy("m", "b")
        .agg(
            F.floor(
                (F.max("y") - F.min("y"))
                / F.sqrt(
                    (
                        F.max("qc").cast("double")
                        - F.max("sc").cast("double")
                        * F.max("sc")
                        / F.max("nb")
                    )
                    / F.max("nb")
                )
                * 1.0e9
                + 0.5
            )
            .cast("long")
            .alias("rs_u"),
            (
                F.max("qc").cast("double")
                - F.max("sc").cast("double") * F.max("sc") / F.max("nb")
            ).alias("v"),
        )
        .filter(F.col("v") > 0)
    )
    pts = rs.groupBy("m").agg(
        F.log(
            F.sum("rs_u").cast("double") / F.count(F.lit(1)) / 1.0e9
        ).alias("y")
    ).select(F.log(F.col("m").cast("double")).alias("x"), "y")
    ols = pts.agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return ols.select(
        F.col("np").alias("n_sizes"),
        (
            F.floor(
                (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("hurst_h"),
    )


# ---------------------------------------------------------------------------
# Parkinson range volatility (Parkinson 1980) of the per-day value
# envelope: sigma_P^2 = mean(ln(H/L)^2) / (4 ln 2). Daily H/L are exact
# micro-unit integers; per-day log-range terms quantize at 1e-9.
# ---------------------------------------------------------------------------
_PARKINSON_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(max(CAST(floor(value * 1.0e6 + 0.5) AS BIGINT)) AS BIGINT) AS h,
             CAST(min(CAST(floor(value * 1.0e6 + 0.5) AS BIGINT)) AS BIGINT) AS l
      FROM events GROUP BY 1
    ),
    terms AS (
      SELECT CAST(floor(ln(CAST(h AS DOUBLE) / l) * ln(CAST(h AS DOUBLE) / l)
                        * 1.0e9 + 0.5) AS BIGINT) AS t_u
      FROM daily WHERE l > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           floor(sqrt(CAST(sum(t_u) AS DOUBLE) / 1.0e9 / count(*)
                      / (4.0 * ln(2.0))) * 1.0e6 + 0.5) / 1.0e6
             AS parkinson_sigma
    FROM terms
"""


@_register("events_parkinson_volatility", oracle=_PARKINSON_SQL)
def events_parkinson_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parkinson high/low range volatility over the daily value
    envelope: one calendar-bounded group-by, per-day terms quantized
    before the final mean — no window at all."""
    ev = _t(spark, sf_dir, "events")
    vq = F.floor(F.col("value") * 1.0e6 + 0.5).cast("long")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.max(vq).cast("long").alias("h"), F.min(vq).cast("long").alias("l")
    )
    lr = F.log(F.col("h").cast("double") / F.col("l"))
    terms = daily.filter(F.col("l") > 0).select(
        F.floor(lr * lr * 1.0e9 + 0.5).cast("long").alias("t_u")
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        (
            F.floor(
                F.sqrt(
                    F.sum("t_u").cast("double")
                    / 1.0e9
                    / F.count(F.lit(1))
                    / (4.0 * math.log(2.0))
                )
                * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("parkinson_sigma"),
    )


# ---------------------------------------------------------------------------
# Order-2 vs order-1 Markov entropy rate of per-user event-type
# sequences: H_k = -(1/N) Σ n(ctx,c) ln(n(ctx,c)/n(ctx)). The gap
# H1 − H2 is the "memory" the order-1 registered model misses.
# Sequence windows partition by user (key-partitioned, bounded per
# user); counts are exact; per-context terms quantize at 1e-9.
# ---------------------------------------------------------------------------
_MARKOV2_SQL = """
    WITH seq AS (
      SELECT user_id, event_type AS c,
             lag(event_type, 1) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS p1,
             lag(event_type, 2) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS p2
      FROM events
    ),
    tri AS (
      SELECT p2, p1, c, CAST(count(*) AS BIGINT) AS n3
      FROM seq WHERE p2 IS NOT NULL GROUP BY 1, 2, 3
    ),
    ctx2 AS (
      SELECT p2, p1, CAST(sum(n3) AS BIGINT) AS n2 FROM tri GROUP BY 1, 2
    ),
    h2t AS (
      SELECT CAST(sum(CAST(floor(-CAST(t.n3 AS DOUBLE)
                     * ln(CAST(t.n3 AS DOUBLE) / c2.n2) * 1.0e9 + 0.5)
                   AS BIGINT)) AS BIGINT) AS s_u,
             CAST(sum(t.n3) AS BIGINT) AS n
      FROM tri t JOIN ctx2 c2 ON t.p2 = c2.p2 AND t.p1 = c2.p1
    ),
    pair AS (
      SELECT p1, c, CAST(count(*) AS BIGINT) AS n2p
      FROM seq WHERE p1 IS NOT NULL GROUP BY 1, 2
    ),
    ctx1 AS (SELECT p1, CAST(sum(n2p) AS BIGINT) AS n1 FROM pair GROUP BY 1),
    h1t AS (
      SELECT CAST(sum(CAST(floor(-CAST(p.n2p AS DOUBLE)
                     * ln(CAST(p.n2p AS DOUBLE) / c1.n1) * 1.0e9 + 0.5)
                   AS BIGINT)) AS BIGINT) AS s_u,
             CAST(sum(p.n2p) AS BIGINT) AS n
      FROM pair p JOIN ctx1 c1 ON p.p1 = c1.p1
    )
    SELECT h1t.n AS n_pairs, h2t.n AS n_triples,
           floor(CAST(h1t.s_u AS DOUBLE) / 1.0e9 / h1t.n * 1.0e6 + 0.5) / 1.0e6
             AS h1_rate,
           floor(CAST(h2t.s_u AS DOUBLE) / 1.0e9 / h2t.n * 1.0e6 + 0.5) / 1.0e6
             AS h2_rate,
           floor((CAST(h1t.s_u AS DOUBLE) / 1.0e9 / h1t.n
                  - CAST(h2t.s_u AS DOUBLE) / 1.0e9 / h2t.n) * 1.0e6 + 0.5)
             / 1.0e6 AS memory_gain
    FROM h1t CROSS JOIN h2t
"""


@_register("events_markov2_entropy_rate", oracle=_MARKOV2_SQL)
def events_markov2_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-1 vs order-2 Markov conditional entropy of event-type
    sequences. Lag windows partition by user_id (key-partitioned);
    context/transition tables are bounded by the 5-symbol alphabet
    (≤5³ rows); per-transition entropy terms quantize at 1e-9."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("c"),
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    )
    tri = (
        seq.filter(F.col("p2").isNotNull())
        .groupBy("p2", "p1", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("n3"))
    )
    ctx2 = tri.groupBy("p2", "p1").agg(F.sum("n3").cast("long").alias("n2"))
    t_u = lambda n, d: F.floor(  # noqa: E731
        -F.col(n).cast("double")
        * F.log(F.col(n).cast("double") / F.col(d))
        * 1.0e9
        + 0.5
    ).cast("long")
    h2t = (
        tri.join(ctx2, ["p2", "p1"])
        .agg(
            F.sum(t_u("n3", "n2")).cast("long").alias("s2_u"),
            F.sum("n3").cast("long").alias("n3tot"),
        )
    )
    pair = (
        seq.filter(F.col("p1").isNotNull())
        .groupBy("p1", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("n2p"))
    )
    ctx1 = pair.groupBy("p1").agg(F.sum("n2p").cast("long").alias("n1"))
    h1t = pair.join(ctx1, "p1").agg(
        F.sum(t_u("n2p", "n1")).cast("long").alias("s1_u"),
        F.sum("n2p").cast("long").alias("n2tot"),
    )
    h1 = F.col("s1_u").cast("double") / 1.0e9 / F.col("n2tot")
    h2 = F.col("s2_u").cast("double") / 1.0e9 / F.col("n3tot")
    q6 = lambda e: F.floor(e * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    return h1t.crossJoin(F.broadcast(h2t)).select(
        F.col("n2tot").alias("n_pairs"),
        F.col("n3tot").alias("n_triples"),
        q6(h1).alias("h1_rate"),
        q6(h2).alias("h2_rate"),
        q6(h1 - h2).alias("memory_gain"),
    )


# ---------------------------------------------------------------------------
# Hour-of-week profile drift: cosine similarity and L1 distance between
# the first-fortnight and rest hour-of-week count profiles (168-row
# bounded axis; exact integer dot products in DECIMAL).
# ---------------------------------------------------------------------------
_HOW_DRIFT_SQL = """
    WITH lim AS (
      SELECT CAST(min(ts) AS TIMESTAMP) + INTERVAL 14 DAY AS cut FROM events
    ),
    prof AS (
      SELECT (CAST(dayofweek(ts) AS BIGINT) * 24
              + CAST(hour(ts) AS BIGINT)) AS how,
             CAST(sum(CASE WHEN ts < cut THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN ts >= cut THEN 1 ELSE 0 END) AS BIGINT) AS b
      FROM events CROSS JOIN lim GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb
      FROM prof
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_cells,
             CAST(sum(CAST(a AS HUGEINT) * b) AS HUGEINT) AS ab,
             CAST(sum(CAST(a AS HUGEINT) * a) AS HUGEINT) AS aa,
             CAST(sum(CAST(b AS HUGEINT) * b) AS HUGEINT) AS bb,
             max(t.sa) AS sa, max(t.sb) AS sb,
             CAST(sum(abs(CAST(a AS HUGEINT) * t.sb
                          - CAST(b AS HUGEINT) * t.sa)) AS HUGEINT) AS l1x
      FROM prof CROSS JOIN tot t
    )
    SELECT n_cells,
           floor(CAST(ab AS DOUBLE) / (sqrt(CAST(aa AS DOUBLE))
                 * sqrt(CAST(bb AS DOUBLE))) * 1.0e6 + 0.5) / 1.0e6
             AS cosine_sim,
           floor(CAST(l1x AS DOUBLE) / (CAST(sa AS DOUBLE) * sb) * 0.5e6 + 0.5)
             / 1.0e6 AS total_variation
    FROM s
"""


@_register("events_hourweek_profile_drift", oracle=_HOW_DRIFT_SQL)
def events_hourweek_profile_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hour-of-week profile drift between the first fortnight and the
    rest: one bounded 168-cell rollup; cosine from exact integer dot
    products; total variation from the cross-multiplied integer L1 (no
    per-cell division — |a·Sb − b·Sa| stays integer)."""
    ev = _t(spark, sf_dir, "events")
    lim = ev.agg(
        (F.min("ts") + F.expr("INTERVAL 14 DAY")).alias("cut")
    )
    how = (
        F.dayofweek(F.col("ts")).cast("long") * 24
        + F.hour(F.col("ts")).cast("long")
    )
    prof = (
        ev.crossJoin(F.broadcast(lim))
        .groupBy(how.alias("how"))
        .agg(
            F.sum(F.when(F.col("ts") < F.col("cut"), 1).otherwise(0))
            .cast("long")
            .alias("a"),
            F.sum(F.when(F.col("ts") >= F.col("cut"), 1).otherwise(0))
            .cast("long")
            .alias("b"),
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    tot = prof.agg(
        F.sum("a").cast("long").alias("ta"),
        F.sum("b").cast("long").alias("tb"),
    )
    prof2 = prof.crossJoin(F.broadcast(tot)).withColumn(
        "l1c",
        F.abs(
            dec("a") * F.col("tb").cast("decimal(38,0)")
            - dec("b") * F.col("ta").cast("decimal(38,0)")
        ),
    )
    s = prof2.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum(dec("a") * dec("b")).cast("decimal(38,0)").alias("ab"),
        F.sum(dec("a") * dec("a")).cast("decimal(38,0)").alias("aa"),
        F.sum(dec("b") * dec("b")).cast("decimal(38,0)").alias("bb"),
        F.max("ta").cast("long").alias("sa"),
        F.max("tb").cast("long").alias("sb"),
        F.sum("l1c").cast("decimal(38,0)").alias("l1x"),
    )
    return s.select(
        "n_cells",
        (
            F.floor(
                F.col("ab").cast("double")
                / (
                    F.sqrt(F.col("aa").cast("double"))
                    * F.sqrt(F.col("bb").cast("double"))
                )
                * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("cosine_sim"),
        (
            F.floor(
                F.col("l1x").cast("double")
                / (F.col("sa").cast("double") * F.col("sb"))
                * 0.5e6
                + 0.5
            )
            / 1.0e6
        ).alias("total_variation"),
    )


# ---------------------------------------------------------------------------
# Fano-factor scale curve: the variance-to-mean ratio of window counts
# at 1 h / 6 h / 24 h — overdispersion that grows with window size is
# the burst-clustering signature a single-scale Fano factor misses.
# ---------------------------------------------------------------------------
_FANO_SQL = """
    WITH sizes AS (SELECT unnest([1, 6, 24]) AS wh),
    win AS (
      SELECT s.wh,
             CAST(floor(epoch(ts) / (s.wh * 3600)) AS BIGINT) AS w
      FROM events CROSS JOIN sizes s
    ),
    cnt AS (
      SELECT wh, w, CAST(count(*) AS BIGINT) AS c FROM win GROUP BY 1, 2
    ),
    s AS (
      SELECT wh, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS sc,
             CAST(sum(c * c) AS HUGEINT) AS qc
      FROM cnt GROUP BY wh
    )
    SELECT wh AS window_hours, n AS n_windows,
           floor((CAST(qc AS DOUBLE) - CAST(sc AS DOUBLE) * sc / n) / (n - 1)
                 / (CAST(sc AS DOUBLE) / n) * 1.0e6 + 0.5) / 1.0e6
             AS fano_factor
    FROM s ORDER BY wh
"""


@_register("events_fano_factor_scale_curve", oracle=_FANO_SQL)
def events_fano_factor_scale_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fano factor at three window scales from one pass: events
    cross-join the 3-row broadcast size table, counts roll up per
    (scale, window) — calendar-bounded — and the ratio assembles from
    exact integer moments."""
    ev = _t(spark, sf_dir, "events")
    sizes = spark.createDataFrame([(1,), (6,), (24,)], "wh int").select(
        F.col("wh").cast("long").alias("wh")
    )
    win = ev.crossJoin(F.broadcast(sizes)).select(
        "wh",
        F.floor(
            F.unix_timestamp(F.col("ts")) / (F.col("wh") * 3600)
        )
        .cast("long")
        .alias("w"),
    )
    cnt = win.groupBy("wh", "w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = cnt.groupBy("wh").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("sc"),
        F.sum(dec("c") * dec("c")).cast("decimal(38,0)").alias("qc"),
    )
    scd = F.col("sc").cast("double")
    return (
        s.select(
            F.col("wh").alias("window_hours"),
            F.col("n").alias("n_windows"),
            (
                F.floor(
                    (F.col("qc").cast("double") - scd * scd / F.col("n"))
                    / (F.col("n") - 1)
                    / (scd / F.col("n"))
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("fano_factor"),
        )
        .orderBy("window_hours")
    )


# ---------------------------------------------------------------------------
# Co-bursting overlap: for each type, the "burst hours" (hourly count
# above mean + 2·stddev of that type's hourly series); per type-pair,
# the Jaccard of the burst-hour sets. Every relation is bounded:
# |hours| ≈ 720 calendar cells × 5 types; the pair join is hour-keyed.
# ---------------------------------------------------------------------------
_BURST_SQL = """
    WITH hr AS (
      SELECT event_type AS t, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    st AS (
      SELECT t, CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS sc,
             CAST(sum(c * c) AS HUGEINT) AS qc
      FROM hr GROUP BY t
    ),
    burst AS (
      SELECT hr.t, hr.h
      FROM hr JOIN st ON hr.t = st.t
      WHERE st.n > 1 AND CAST(hr.c AS DOUBLE)
            > CAST(st.sc AS DOUBLE) / st.n
              + 2.0 * sqrt((CAST(st.qc AS DOUBLE)
                            - CAST(st.sc AS DOUBLE) * st.sc / st.n)
                           / (st.n - 1))
    ),
    bs AS (SELECT t, CAST(count(*) AS BIGINT) AS nb FROM burst GROUP BY t),
    inter AS (
      SELECT a.t AS type_a, b.t AS type_b, CAST(count(*) AS BIGINT) AS ni
      FROM burst a JOIN burst b ON a.h = b.h AND a.t < b.t
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, sa.nb AS bursts_a, sb.nb AS bursts_b, i.ni
             AS n_common,
           floor(CAST(i.ni AS DOUBLE) / (sa.nb + sb.nb - i.ni) * 1.0e6 + 0.5)
             / 1.0e6 AS burst_jaccard
    FROM inter i
    JOIN bs sa ON i.type_a = sa.t
    JOIN bs sb ON i.type_b = sb.t
    ORDER BY type_a, type_b
"""


@_register("events_type_burst_overlap", oracle=_BURST_SQL)
def events_type_burst_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which event types burst TOGETHER: per-type burst hours (count >
    mean + 2σ over the calendar-bounded hourly rollup) pair-joined on
    the hour key — never all-pairs over rows, only over the tiny burst
    sets; Jaccard from exact counts."""
    ev = _t(spark, sf_dir, "events")
    hr = ev.groupBy(
        F.col("event_type").alias("t"),
        F.date_trunc("hour", F.col("ts")).alias("h"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    st = hr.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("sc"),
        F.sum(dec("c") * dec("c")).cast("decimal(38,0)").alias("qc"),
    )
    scd = F.col("sc").cast("double")
    thr = scd / F.col("n") + 2.0 * F.sqrt(
        (F.col("qc").cast("double") - scd * scd / F.col("n"))
        / (F.col("n") - 1)
    )
    burst = (
        hr.join(F.broadcast(st), "t")
        .filter((F.col("n") > 1) & (F.col("c").cast("double") > thr))
        .select("t", "h")
    )
    bs = burst.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("nb"))
    a = burst.select(F.col("t").alias("type_a"), "h")
    b = burst.select(F.col("t").alias("type_b"), "h")
    inter = (
        a.join(b, "h")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("ni"))
    )
    sa = bs.select(F.col("t").alias("type_a"), F.col("nb").alias("bursts_a"))
    sb = bs.select(F.col("t").alias("type_b"), F.col("nb").alias("bursts_b"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "bursts_a",
            "bursts_b",
            F.col("ni").alias("n_common"),
            (
                F.floor(
                    F.col("ni").cast("double")
                    / (F.col("bursts_a") + F.col("bursts_b") - F.col("ni"))
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("burst_jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# Activity decay half-life: per-user events bucketed by days since the
# user's first event; the aggregate count-by-age curve fit log-linearly
# (OLS over the ≤30-row age axis) gives the engagement half-life.
# ---------------------------------------------------------------------------
_HALFLIFE_SQL = """
    WITH first_seen AS (
      SELECT user_id, CAST(min(date_trunc('day', ts)) AS TIMESTAMP) AS d0
      FROM events GROUP BY user_id
    ),
    aged AS (
      SELECT CAST(date_diff('day', f.d0,
                            CAST(date_trunc('day', e.ts) AS TIMESTAMP))
                  AS BIGINT) AS age
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
    ),
    curve AS (
      SELECT age, CAST(count(*) AS BIGINT) AS c FROM aged GROUP BY age
    ),
    pts AS (
      SELECT CAST(age AS DOUBLE) AS x, ln(CAST(c AS DOUBLE)) AS y
      FROM curve WHERE c > 0
    ),
    ols AS (
      SELECT CAST(count(*) AS BIGINT) AS np, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy
      FROM pts
    )
    SELECT np AS n_ages,
           floor((np * sxy - sx * sy) / (np * sxx - sx * sx) * 1.0e6 + 0.5)
             / 1.0e6 AS decay_slope,
           floor(-ln(2.0) / ((np * sxy - sx * sy) / (np * sxx - sx * sx))
                 * 1.0e6 + 0.5) / 1.0e6 AS halflife_days
    FROM ols
"""


@_register("events_activity_decay_halflife", oracle=_HALFLIFE_SQL)
def events_activity_decay_halflife(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Engagement half-life: age = days since the user's first event
    (one groupBy + one user-keyed join), the count-by-age curve is a
    ≤|days| rollup, and the log-linear OLS runs over that bounded
    axis. halflife = −ln2/slope."""
    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts"))).alias("d0")
    )
    aged = ev.join(first_seen, "user_id").select(
        F.datediff(F.date_trunc("day", F.col("ts")), F.col("d0"))
        .cast("long")
        .alias("age")
    )
    curve = aged.groupBy("age").agg(F.count(F.lit(1)).cast("long").alias("c"))
    pts = curve.filter(F.col("c") > 0).select(
        F.col("age").cast("double").alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    ols = pts.agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    q6 = lambda e: F.floor(e * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    return ols.select(
        F.col("np").alias("n_ages"),
        q6(slope).alias("decay_slope"),
        q6(-math.log(2.0) / slope).alias("halflife_days"),
    )


# ---------------------------------------------------------------------------
# Rayleigh circular-uniformity test per event type: hour-angle
# θ = 2π·(seconds-into-day)/86400, mean resultant R̄, z = n·R̄².
# Per-row cos/sin quantize at 1e-9 into per-type integer sums
# (bounded alphabet group-by; no window).
# ---------------------------------------------------------------------------
@_register("events_rayleigh_by_type", oracle="__RAYLEIGH__")
def events_rayleigh_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rayleigh test of time-of-day uniformity per type: per-row trig
    terms quantized at 1e-9, exact integer vector sums per type, z =
    n·R̄² in one rounded expression."""
    ev = _t(spark, sf_dir, "events")
    sec = F.unix_timestamp(F.col("ts")) - F.unix_timestamp(
        F.date_trunc("day", F.col("ts"))
    )
    theta = 2.0 * math.pi * sec / 86400.0
    qt = lambda e: F.floor(e * 1.0e9 + 0.5).cast("long")  # noqa: E731
    terms = ev.select(
        "event_type", qt(F.cos(theta)).alias("cq"), qt(F.sin(theta)).alias("sq")
    )
    g = terms.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cq").cast("long").alias("sc"),
        F.sum("sq").cast("long").alias("ss"),
    )
    scd, ssd = F.col("sc").cast("double"), F.col("ss").cast("double")
    return (
        g.select(
            "event_type",
            "n",
            (
                F.floor(
                    F.sqrt(scd * scd + ssd * ssd) / 1.0e9 / F.col("n") * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("rbar"),
            (
                F.floor(
                    (scd * scd + ssd * ssd) / (1.0e18 * F.col("n")) * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("rayleigh_z"),
        )
        .orderBy("event_type")
    )


STAGED_ORACLES["events_rayleigh_by_type"] = """
    WITH terms AS (
      SELECT event_type,
             CAST(floor(cos(2 * pi() * (CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT))
                            / 86400.0) * 1.0e9 + 0.5) AS BIGINT) AS cq,
             CAST(floor(sin(2 * pi() * (CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT))
                            / 86400.0) * 1.0e9 + 0.5) AS BIGINT) AS sq
      FROM events
    ),
    g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cq) AS BIGINT) AS sc, CAST(sum(sq) AS BIGINT) AS ss
      FROM terms GROUP BY event_type
    )
    SELECT event_type, n,
           floor(sqrt(CAST(sc AS DOUBLE) * sc + CAST(ss AS DOUBLE) * ss)
                 / 1.0e9 / n * 1.0e6 + 0.5) / 1.0e6 AS rbar,
           floor((CAST(sc AS DOUBLE) * sc + CAST(ss AS DOUBLE) * ss)
                 / (1.0e18 * n) * 1.0e6 + 0.5) / 1.0e6 AS rayleigh_z
    FROM g ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Permutation entropy (Bandt & Pompe 2002) of the daily count series at
# embedding dimension 3: each consecutive triple maps to one of 6
# ordinal patterns (ties broken by position, the standard convention),
# H = −Σ p ln p over pattern frequencies, normalized by ln 6.
# ---------------------------------------------------------------------------
_PERMENT_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    tri AS (
      SELECT c AS a,
             lead(c, 1) OVER (ORDER BY day) AS b,
             lead(c, 2) OVER (ORDER BY day) AS d
      FROM daily
    ),
    pat AS (
      SELECT (CASE WHEN a <= b THEN 1 ELSE 0 END) * 4
             + (CASE WHEN b <= d THEN 1 ELSE 0 END) * 2
             + (CASE WHEN a <= d THEN 1 ELSE 0 END) AS p
      FROM tri WHERE d IS NOT NULL
    ),
    freq AS (SELECT p, CAST(count(*) AS BIGINT) AS np FROM pat GROUP BY p),
    tot AS (SELECT CAST(sum(np) AS BIGINT) AS n FROM freq),
    h AS (
      SELECT CAST(sum(CAST(floor(-CAST(np AS DOUBLE) / t.n
                     * ln(CAST(np AS DOUBLE) / t.n) * 1.0e9 + 0.5)
                   AS BIGINT)) AS BIGINT) AS h_u,
             max(t.n) AS n, CAST(count(*) AS BIGINT) AS k
      FROM freq CROSS JOIN tot t
    )
    SELECT n AS n_triples, k AS n_patterns,
           floor(CAST(h_u AS DOUBLE) / 1.0e9 * 1.0e6 + 0.5) / 1.0e6
             AS perm_entropy,
           floor(CAST(h_u AS DOUBLE) / 1.0e9 / ln(6.0) * 1.0e6 + 0.5) / 1.0e6
             AS normalized
    FROM h
"""


@_register("events_permutation_entropy_daily", oracle=_PERMENT_SQL)
def events_permutation_entropy_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bandt–Pompe permutation entropy of the daily count series: the
    lead window runs over the ≤|days| calendar rollup; the 3-bit
    comparison code distinguishes all 6 valid orderings; per-pattern
    entropy terms quantize at 1e-9."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = Window.orderBy("day")
    tri = daily.select(
        F.col("c").alias("a"),
        F.lead("c", 1).over(w).alias("b"),
        F.lead("c", 2).over(w).alias("d"),
    )
    pat = tri.filter(F.col("d").isNotNull()).select(
        (
            F.when(F.col("a") <= F.col("b"), 1).otherwise(0) * 4
            + F.when(F.col("b") <= F.col("d"), 1).otherwise(0) * 2
            + F.when(F.col("a") <= F.col("d"), 1).otherwise(0)
        ).alias("p")
    )
    freq = pat.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("np"))
    tot = freq.agg(F.sum("np").cast("long").alias("n"))
    h = freq.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.floor(
                -F.col("np").cast("double")
                / F.col("n")
                * F.log(F.col("np").cast("double") / F.col("n"))
                * 1.0e9
                + 0.5
            ).cast("long")
        )
        .cast("long")
        .alias("h_u"),
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    q6 = lambda e: F.floor(e * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    return h.select(
        F.col("n").alias("n_triples"),
        F.col("k").alias("n_patterns"),
        q6(F.col("h_u").cast("double") / 1.0e9).alias("perm_entropy"),
        q6(F.col("h_u").cast("double") / 1.0e9 / math.log(6.0)).alias(
            "normalized"
        ),
    )


# ===========================================================================
# Wave C — co-purchase graph texture (shared substrate:
# staged_r8._copurchase_edges / _EDGES_SQL — support>=2 part pairs).
# ===========================================================================

def _edges_sql() -> str:
    from cioos_siooc_data_transform_spark.plans.staged_r8 import _EDGES_SQL

    return _EDGES_SQL


# ---------------------------------------------------------------------------
# 3-hop BFS frontier profile from the max-degree hub: |N1|, |N2\...|,
# |N3\...| — the reachability texture a 2-hop profile (registered
# graph_two_hop_reach_profile) can't see. The hub is a TakeOrdered
# limit=1 seed (bounded); each hop is a key equi-join + distinct.
# ---------------------------------------------------------------------------
def _bfs_oracle() -> str:
    return f"""
    WITH e AS ({_edges_sql()}),
    adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY u),
    hub AS (SELECT u FROM deg ORDER BY d DESC, u ASC LIMIT 1),
    n1 AS (SELECT DISTINCT adj.v FROM adj JOIN hub ON adj.u = hub.u),
    n2 AS (
      SELECT DISTINCT adj.v FROM adj JOIN n1 ON adj.u = n1.v
      WHERE adj.v NOT IN (SELECT v FROM n1)
        AND adj.v NOT IN (SELECT u FROM hub)
    ),
    n3 AS (
      SELECT DISTINCT adj.v FROM adj JOIN n2 ON adj.u = n2.v
      WHERE adj.v NOT IN (SELECT v FROM n1)
        AND adj.v NOT IN (SELECT v FROM n2)
        AND adj.v NOT IN (SELECT u FROM hub)
    ),
    nv AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
    SELECT (SELECT max(u) FROM hub) AS hub_node,
           (SELECT CAST(count(*) AS BIGINT) FROM n1) AS frontier_1,
           (SELECT CAST(count(*) AS BIGINT) FROM n2) AS frontier_2,
           (SELECT CAST(count(*) AS BIGINT) FROM n3) AS frontier_3,
           floor(((SELECT count(*) FROM n1) + (SELECT count(*) FROM n2)
                  + (SELECT count(*) FROM n3) + 1.0)
                 / (SELECT n_nodes FROM nv) * 1.0e6 + 0.5) / 1.0e6
             AS reach_3hop_share
    """


@_register("graph_hub_bfs_3hop", oracle="__BFS__")
def graph_hub_bfs_3hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop BFS from the max-degree hub: three frontier expansions,
    each a key equi-join + distinct + left-anti against the visited
    set (all shuffles keyed on node id — no all-pairs anywhere); the
    seed is a 1-row TakeOrdered broadcast."""
    from cioos_siooc_data_transform_spark.plans.staged_r8 import (
        _copurchase_edges,
    )

    e = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    adj = (
        e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    hub = deg.orderBy(F.col("d").desc(), F.col("u").asc()).limit(1).select("u")
    n1 = (
        adj.join(F.broadcast(hub), "u").select("v").distinct()
        .localCheckpoint(eager=False)
    )
    visited1 = hub.select(F.col("u").alias("v")).unionAll(n1)
    n2 = (
        adj.join(n1.select(F.col("v").alias("u")), "u")
        .select("v")
        .distinct()
        .join(visited1, "v", "left_anti")
        .localCheckpoint(eager=False)
    )
    visited2 = visited1.unionAll(n2)
    n3 = (
        adj.join(n2.select(F.col("v").alias("u")), "u")
        .select("v")
        .distinct()
        .join(visited2, "v", "left_anti")
    )
    nv = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    c = lambda df, name: df.agg(  # noqa: E731
        F.count(F.lit(1)).cast("long").alias(name)
    )
    out = (
        hub.select(F.col("u").alias("hub_node"))
        .crossJoin(F.broadcast(c(n1, "frontier_1")))
        .crossJoin(F.broadcast(c(n2, "frontier_2")))
        .crossJoin(F.broadcast(c(n3, "frontier_3")))
        .crossJoin(F.broadcast(nv))
    )
    return out.select(
        "hub_node",
        "frontier_1",
        "frontier_2",
        "frontier_3",
        (
            F.floor(
                (
                    F.col("frontier_1")
                    + F.col("frontier_2")
                    + F.col("frontier_3")
                    + F.lit(1.0)
                )
                / F.col("n_nodes")
                * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("reach_3hop_share"),
    )


STAGED_ORACLES["graph_hub_bfs_3hop"] = _bfs_oracle()


# ---------------------------------------------------------------------------
# Mutual information of edge-endpoint degree classes (log2 bins): the
# nonlinear companion to the registered degree assortativity — MI > 0
# with r ≈ 0 means degree mixing that a correlation can't see.
# Bin alphabet is ≤ log2(max_degree) (bounded), joint table ≤ that².
# ---------------------------------------------------------------------------
def _deg_mi_oracle() -> str:
    return f"""
    WITH e AS ({_edges_sql()}),
    adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY u),
    ends AS (
      SELECT CAST(floor(ln(da.d) / ln(2.0)) AS BIGINT) AS ba,
             CAST(floor(ln(db.d) / ln(2.0)) AS BIGINT) AS bb
      FROM adj j JOIN deg da ON j.u = da.u JOIN deg db ON j.v = db.u
    ),
    joint AS (
      SELECT ba, bb, CAST(count(*) AS BIGINT) AS nab FROM ends GROUP BY 1, 2
    ),
    ma AS (SELECT ba, CAST(sum(nab) AS BIGINT) AS na FROM joint GROUP BY ba),
    mb AS (SELECT bb, CAST(sum(nab) AS BIGINT) AS nb FROM joint GROUP BY bb),
    tot AS (SELECT CAST(sum(nab) AS BIGINT) AS n FROM joint),
    mi AS (
      SELECT CAST(sum(CAST(floor(CAST(j.nab AS DOUBLE) / t.n
                     * ln(CAST(j.nab AS DOUBLE) * t.n
                          / (CAST(ma.na AS DOUBLE) * mb.nb)) * 1.0e9 + 0.5)
                   AS BIGINT)) AS BIGINT) AS mi_u,
             max(t.n) AS n, CAST(count(*) AS BIGINT) AS n_cells
      FROM joint j
      JOIN ma ON j.ba = ma.ba JOIN mb ON j.bb = mb.bb CROSS JOIN tot t
    )
    SELECT n AS n_edge_ends, n_cells,
           floor(CAST(mi_u AS DOUBLE) / 1.0e9 * 1.0e6 + 0.5) / 1.0e6
             AS degree_mi_nats
    FROM mi
    """


@_register("graph_degree_mutual_information", oracle="__DEGMI__")
def graph_degree_mutual_information(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MI of edge-endpoint log2-degree classes: two node-keyed joins to
    attach degrees, a bounded-bin joint rollup, per-cell MI terms
    quantized at 1e-9."""
    from cioos_siooc_data_transform_spark.plans.staged_r8 import (
        _copurchase_edges,
    )

    e = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    adj = (
        e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    binf = lambda c: F.floor(  # noqa: E731
        F.log(F.col(c).cast("double")) / math.log(2.0)
    ).cast("long")
    da = deg.select(F.col("u"), binf("d").alias("ba"))
    db = deg.select(F.col("u").alias("v"), binf("d").alias("bb"))
    ends = adj.join(da, "u").join(db, "v").select("ba", "bb")
    joint = ends.groupBy("ba", "bb").agg(
        F.count(F.lit(1)).cast("long").alias("nab")
    )
    ma = joint.groupBy("ba").agg(F.sum("nab").cast("long").alias("na"))
    mb = joint.groupBy("bb").agg(F.sum("nab").cast("long").alias("nb"))
    tot = joint.agg(F.sum("nab").cast("long").alias("n"))
    mi = (
        joint.join(F.broadcast(ma), "ba")
        .join(F.broadcast(mb), "bb")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.floor(
                    F.col("nab").cast("double")
                    / F.col("n")
                    * F.log(
                        F.col("nab").cast("double")
                        * F.col("n")
                        / (F.col("na").cast("double") * F.col("nb"))
                    )
                    * 1.0e9
                    + 0.5
                ).cast("long")
            )
            .cast("long")
            .alias("mi_u"),
            F.max("n").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
        )
    )
    return mi.select(
        F.col("n").alias("n_edge_ends"),
        "n_cells",
        (F.floor(F.col("mi_u").cast("double") / 1.0e9 * 1.0e6 + 0.5) / 1.0e6)
        .alias("degree_mi_nats"),
    )


STAGED_ORACLES["graph_degree_mutual_information"] = _deg_mi_oracle()


# ---------------------------------------------------------------------------
# Degree-stratified closure curve: mean local clustering coefficient by
# log2-degree bin — hierarchical networks show cc(k) ~ k^-1, flat
# curves mean no hierarchy. Reuses the compact-forward triangle shape
# (ordered two-hop equi-join, never all-pairs).
# ---------------------------------------------------------------------------
def _closure_oracle() -> str:
    return f"""
    WITH e AS ({_edges_sql()}),
    tri AS (
      SELECT e1.a, e1.b, e2.c
      FROM e e1
      JOIN (SELECT a AS b2a, b AS c FROM e) e2 ON e1.b = e2.b2a
      JOIN (SELECT a AS a3, b AS b3 FROM e) e3
        ON e1.a = e3.a3 AND e2.c = e3.b3
    ),
    tri_per_v AS (
      SELECT v, CAST(count(*) AS BIGINT) AS n_tri FROM (
        SELECT a AS v FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY v
    ),
    deg AS (
      SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT a AS v FROM e UNION ALL SELECT b FROM e
      ) GROUP BY v
    ),
    loc AS (
      SELECT CAST(floor(ln(d.d) / ln(2.0)) AS BIGINT) AS bin,
             CAST(floor(CAST(coalesce(t.n_tri, 0) AS DOUBLE) * 2.0e9
                        / (d.d * (d.d - 1)) + 0.5) AS BIGINT) AS cc_n
      FROM deg d LEFT JOIN tri_per_v t ON d.v = t.v
      WHERE d.d >= 2
    )
    SELECT bin AS degree_bin, CAST(count(*) AS BIGINT) AS n_nodes,
           floor(CAST(sum(cc_n) AS DOUBLE) / count(*) / 1.0e9 * 1.0e6 + 0.5)
             / 1.0e6 AS mean_local_cc
    FROM loc GROUP BY bin ORDER BY bin
    """


@_register("graph_closure_by_degree_bin", oracle="__CLOSURE__")
def graph_closure_by_degree_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean local clustering coefficient stratified by log2-degree bin:
    ordered two-hop triangle join (compact-forward), per-node cc
    quantized at 1e-9, bounded-bin rollup."""
    from cioos_siooc_data_transform_spark.plans.staged_r8 import (
        _copurchase_edges,
    )

    e = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    e2 = e.select(F.col("a").alias("b2a"), F.col("b").alias("c"))
    e3 = e.select(F.col("a").alias("a3"), F.col("b").alias("b3"))
    tri = e.join(e2, e.b == e2.b2a).join(
        e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("b3"))
    )
    tri_v = (
        tri.select(F.col("a").alias("v"))
        .unionAll(tri.select(F.col("b").alias("v")))
        .unionAll(tri.select(F.col("c").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    loc = (
        deg.join(tri_v, "v", "left")
        .filter(F.col("d") >= 2)
        .select(
            F.floor(F.log(F.col("d").cast("double")) / math.log(2.0))
            .cast("long")
            .alias("bin"),
            F.floor(
                F.coalesce(F.col("n_tri"), F.lit(0)).cast("double")
                * 2.0e9
                / (F.col("d") * (F.col("d") - 1))
                + 0.5
            )
            .cast("long")
            .alias("cc_n"),
        )
    )
    return (
        loc.groupBy(F.col("bin").alias("degree_bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            (
                F.floor(
                    F.sum("cc_n").cast("double")
                    / F.count(F.lit(1))
                    / 1.0e9
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("mean_local_cc"),
        )
        .orderBy("degree_bin")
    )


STAGED_ORACLES["graph_closure_by_degree_bin"] = _closure_oracle()


# ---------------------------------------------------------------------------
# Edge-weight disparity (Barthélemy et al. 2005): per node, Y_i =
# Σ_j (w_ij / s_i)² over co-purchase SUPPORT weights. Y ≈ 1/k_i means
# even spread; Y → 1 means one dominant partner. Profile by degree bin.
# ---------------------------------------------------------------------------
_WEDGES_SQL = """
      SELECT pa AS a, pb AS b, support AS w FROM (
        SELECT x.l_partkey AS pa, y.l_partkey AS pb,
               count(*) AS support
        FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) x
        JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) y
          ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        GROUP BY 1, 2
      ) WHERE support >= 2
"""


def _disparity_oracle() -> str:
    return f"""
    WITH e AS ({_WEDGES_SQL}),
    adj AS (
      SELECT a AS u, CAST(w AS BIGINT) AS w FROM e
      UNION ALL SELECT b, CAST(w AS BIGINT) FROM e
    ),
    node AS (
      SELECT u, CAST(count(*) AS BIGINT) AS k, CAST(sum(w) AS BIGINT) AS s,
             CAST(sum(CAST(w AS HUGEINT) * w) AS HUGEINT) AS q
      FROM adj GROUP BY u
    ),
    y AS (
      SELECT CAST(floor(ln(k) / ln(2.0)) AS BIGINT) AS bin,
             CAST(floor(CAST(q AS DOUBLE) / (CAST(s AS DOUBLE) * s) * 1.0e9
                        + 0.5) AS BIGINT) AS y_n,
             k
      FROM node WHERE k >= 2
    )
    SELECT bin AS degree_bin, CAST(count(*) AS BIGINT) AS n_nodes,
           floor(CAST(sum(y_n) AS DOUBLE) / count(*) / 1.0e9 * 1.0e6 + 0.5)
             / 1.0e6 AS mean_disparity,
           floor(CAST(sum(CAST(floor(1.0e9 / k + 0.5) AS BIGINT)) AS DOUBLE)
                 / count(*) / 1.0e9 * 1.0e6 + 0.5) / 1.0e6
             AS even_spread_baseline
    FROM y GROUP BY bin ORDER BY bin
    """


@_register("graph_edge_weight_disparity", oracle="__DISP__")
def graph_edge_weight_disparity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Barthélemy weight disparity Y_i per node over support weights,
    profiled by log2-degree bin against the 1/k even-spread baseline.
    Per-node Y quantizes at 1e-9; one node-keyed rollup."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("k0"), F.col("l_partkey").alias("pa"))
    b = items.select(F.col("l_orderkey").alias("k0"), F.col("l_partkey").alias("pb"))
    e = (
        a.join(b, "k0")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .filter(F.col("w") >= 2)
    )
    adj = (
        e.select(F.col("pa").alias("u"), "w")
        .unionAll(e.select(F.col("pb").alias("u"), "w"))
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    node = adj.groupBy("u").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("w").cast("long").alias("s"),
        F.sum(dec("w") * dec("w")).cast("decimal(38,0)").alias("q"),
    )
    y = node.filter(F.col("k") >= 2).select(
        F.floor(F.log(F.col("k").cast("double")) / math.log(2.0))
        .cast("long")
        .alias("bin"),
        F.floor(
            F.col("q").cast("double")
            / (F.col("s").cast("double") * F.col("s"))
            * 1.0e9
            + 0.5
        )
        .cast("long")
        .alias("y_n"),
        "k",
    )
    return (
        y.groupBy(F.col("bin").alias("degree_bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            (
                F.floor(
                    F.sum("y_n").cast("double")
                    / F.count(F.lit(1))
                    / 1.0e9
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("mean_disparity"),
            (
                F.floor(
                    F.sum(F.floor(1.0e9 / F.col("k") + 0.5).cast("long"))
                    .cast("double")
                    / F.count(F.lit(1))
                    / 1.0e9
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("even_spread_baseline"),
        )
        .orderBy("degree_bin")
    )


STAGED_ORACLES["graph_edge_weight_disparity"] = _disparity_oracle()


# ===========================================================================
# Wave D — dedup / similarity / embedding audits.
# ===========================================================================

# ---------------------------------------------------------------------------
# Within-component document-length spread: exact near-dup clusters
# should be length-homogeneous; a cluster mixing 20-token and 90-token
# docs usually means boilerplate contamination, not duplication. Rides
# the existing confirmed-pair component labeling (>=0.5 Jaccard over
# LSH candidates — reference shape: dedup_component_size_histogram).
# ---------------------------------------------------------------------------
def _comp_spread_oracle() -> str:
    from cioos_siooc_data_transform_spark.plans.dedup_queries import (
        CONFIRMED_COMPONENT_CTES,
        _LSH_CAND_CTES,
        _SHINGLES_CTE,
    )

    return f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_LSH_CAND_CTES},
    {CONFIRMED_COMPONENT_CTES},
    lens AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ),
    cl AS (
      SELECT c.component, CAST(count(*) AS BIGINT) AS size,
             CAST(max(l.n_tok) - min(l.n_tok) AS BIGINT) AS spread,
             CAST(sum(l.n_tok) AS BIGINT) AS st
      FROM comp c JOIN lens l ON c.node = l.doc_id
      GROUP BY c.component
    )
    SELECT CAST(count(*) AS BIGINT) AS n_components,
           floor(CAST(sum(size) AS DOUBLE) / count(*) * 1.0e6 + 0.5) / 1.0e6
             AS mean_size,
           floor(CAST(sum(spread) AS DOUBLE) / count(*) * 1.0e6 + 0.5) / 1.0e6
             AS mean_spread,
           CAST(max(spread) AS BIGINT) AS max_spread,
           floor(CAST(sum(CASE WHEN spread = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) * 1.0e6 + 0.5) / 1.0e6 AS homogeneous_share
    FROM cl
    """


@_register("dedup_component_length_spread", oracle="__COMPSPREAD__")
def dedup_component_length_spread(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Length-homogeneity audit of near-dup components: the pointer-
    jumping component operator over confirmed pairs, one doc-keyed join
    to token lengths, one bounded rollup."""
    from cioos_siooc_data_transform_spark.operators.dedup import (
        connected_components,
        jaccard_for_pairs,
        lsh_band_buckets,
        lsh_candidate_pairs,
        minhash_signature,
        words_expr,
    )
    from cioos_siooc_data_transform_spark.plans.dedup_queries import (
        _distinct_shingles,
    )

    shingles = _distinct_shingles(spark, sf_dir)
    sig = minhash_signature(
        shingles, "doc_id", "s", num_hashes=8, hash_family="md5"
    )
    buckets = lsh_band_buckets(sig, "doc_id", num_hashes=8, bands=4)
    cand = lsh_candidate_pairs(buckets, "doc_id", max_bucket_size=50)
    pairs = jaccard_for_pairs(cand, shingles, "doc_id", "s").filter(
        F.col("jaccard") >= 0.5
    )
    comp = connected_components(pairs)
    docs = _t(spark, sf_dir, "documents")
    lens = docs.select(
        "doc_id", F.size(words_expr(F.col("text"))).cast("long").alias("n_tok")
    )
    cl = (
        comp.join(lens, "doc_id")
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("long").alias("size"),
            (F.max("n_tok") - F.min("n_tok")).cast("long").alias("spread"),
        )
    )
    q6 = lambda e: F.floor(e * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    return cl.agg(
        F.count(F.lit(1)).cast("long").alias("n_components"),
        q6(F.sum("size").cast("double") / F.count(F.lit(1))).alias("mean_size"),
        q6(F.sum("spread").cast("double") / F.count(F.lit(1))).alias(
            "mean_spread"
        ),
        F.max("spread").cast("long").alias("max_spread"),
        q6(
            F.sum(F.when(F.col("spread") == 0, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("homogeneous_share"),
    )


STAGED_ORACLES["dedup_component_length_spread"] = _comp_spread_oracle()


# ---------------------------------------------------------------------------
# Method-agreement audit: MinHash-LSH-confirmed pairs (>=0.3 Jaccard)
# vs SimHash pairs (Hamming<=3) — the overlap tells you whether the two
# near-dup definitions see the same duplication, and the set asymmetry
# which one to trust for recall. Both pair generators are the existing
# bucketed shapes (never quadratic); the comparison is a pair-keyed
# full outer join over two SMALL pair sets.
# ---------------------------------------------------------------------------
def _agreement_oracle() -> str:
    from cioos_siooc_data_transform_spark.plans.dedup_queries import (
        _LSH_CAND_CTES,
        _SHINGLES_CTE,
    )

    return f"""
    WITH {_SHINGLES_CTE},
    {_LSH_CAND_CTES},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_common
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
      GROUP BY 1, 2
    ),
    mh AS (
      SELECT doc_a, doc_b FROM (
        SELECT c.doc_a, c.doc_b,
               round(coalesce(n_common, 0)
                     / (sa.n + sb.n - coalesce(n_common, 0)), 6) AS j
        FROM cand c
        JOIN sizes sa ON c.doc_a = sa.doc_id
        JOIN sizes sb ON c.doc_b = sb.doc_id
        LEFT JOIN common ON common.doc_a = c.doc_a AND common.doc_b = c.doc_b
      ) WHERE j >= 0.3
    ),
    w2 AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    tok AS (SELECT DISTINCT doc_id, unnest(words) AS t FROM w2),
    val AS (
      SELECT doc_id,
             ((instr('0123456789abcdef', substr(md5(t), 1, 1)) - 1) * 4096 +
              (instr('0123456789abcdef', substr(md5(t), 2, 1)) - 1) * 256 +
              (instr('0123456789abcdef', substr(md5(t), 3, 1)) - 1) * 16 +
              (instr('0123456789abcdef', substr(md5(t), 4, 1)) - 1)) AS v
      FROM tok
    ),
    sums AS (
      SELECT doc_id,
             {", ".join(
                 f"sum(CASE WHEN (v >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
                 for b in range(16)
             )}
      FROM val GROUP BY doc_id
    ),
    shh AS (
      SELECT doc_id,
             CAST({" + ".join(
                 f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)"
                 for b in range(16)
             )} AS BIGINT) AS simhash
      FROM sums
    ),
    blocked AS (SELECT doc_id, simhash, simhash >> 8 AS block FROM shh),
    sp AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM blocked a JOIN blocked b
        ON a.block = b.block AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ),
    u AS (
      SELECT coalesce(mh.doc_a, sp.doc_a) AS doc_a,
             CASE WHEN mh.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_mh,
             CASE WHEN sp.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_sp
      FROM mh FULL OUTER JOIN sp
        ON mh.doc_a = sp.doc_a AND mh.doc_b = sp.doc_b
    )
    SELECT CAST(sum(in_mh) AS BIGINT) AS n_minhash_pairs,
           CAST(sum(in_sp) AS BIGINT) AS n_simhash_pairs,
           CAST(sum(in_mh * in_sp) AS BIGINT) AS n_both,
           floor(CAST(sum(in_mh * in_sp) AS DOUBLE)
                 / (sum(in_mh) + sum(in_sp) - sum(in_mh * in_sp))
                 * 1.0e6 + 0.5) / 1.0e6 AS pair_set_jaccard
    FROM u
    """


@_register("dedup_method_agreement", oracle="__AGREE__")
def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do MinHash-LSH (Jaccard>=0.3) and SimHash (Hamming<=3) flag the
    same pairs? Both candidate generators are the registered bucketed
    shapes; the audit is one full-outer join on the pair key plus one
    scalar rollup."""
    from cioos_siooc_data_transform_spark.operators.dedup import (
        jaccard_for_pairs,
        lsh_band_buckets,
        lsh_candidate_pairs,
        minhash_signature,
        simhash,
        words_expr,
    )
    from cioos_siooc_data_transform_spark.plans.dedup_queries import (
        _distinct_shingles,
    )

    shingles = _distinct_shingles(spark, sf_dir)
    sig = minhash_signature(
        shingles, "doc_id", "s", num_hashes=8, hash_family="md5"
    )
    buckets = lsh_band_buckets(sig, "doc_id", num_hashes=8, bands=4)
    cand = lsh_candidate_pairs(buckets, "doc_id", max_bucket_size=50)
    mh = (
        jaccard_for_pairs(cand, shingles, "doc_id", "s")
        .filter(F.col("jaccard") >= 0.3)
        .select("doc_a", "doc_b")
    )
    docs = _t(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id",
        F.explode(F.array_distinct(words_expr(F.col("text")))).alias("t"),
    )
    sh = simhash(tokens, "doc_id", "t", bits=16).withColumn(
        "block", F.shiftright(F.col("simhash"), 8)
    )
    a = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "block"
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "block"
    )
    sp = (
        a.join(b, "block")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))) <= 3
        )
        .select("doc_a", "doc_b")
    )
    mh2 = mh.withColumn("in_mh", F.lit(1))
    sp2 = sp.withColumn("in_sp", F.lit(1))
    u = mh2.join(sp2, ["doc_a", "doc_b"], "full_outer").select(
        F.coalesce(F.col("in_mh"), F.lit(0)).alias("in_mh"),
        F.coalesce(F.col("in_sp"), F.lit(0)).alias("in_sp"),
    )
    both = F.sum(F.col("in_mh") * F.col("in_sp")).cast("long")
    return u.agg(
        F.sum("in_mh").cast("long").alias("n_minhash_pairs"),
        F.sum("in_sp").cast("long").alias("n_simhash_pairs"),
        both.alias("n_both"),
        (
            F.floor(
                both.cast("double")
                / (
                    F.sum("in_mh").cast("long")
                    + F.sum("in_sp").cast("long")
                    - both
                )
                * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("pair_set_jaccard"),
    )


STAGED_ORACLES["dedup_method_agreement"] = _agreement_oracle()


# ---------------------------------------------------------------------------
# AMS F2 sketch (Alon, Matias & Szegedy 1996): the second frequency
# moment of the token stream (self-join size / repeat rate) estimated
# by 8 hash-sign estimators X_r = (Σ_t c_t·s_r(t))², vs the exact
# F2 = Σ c². Signs derive from md5 parity (engine-portable).
# ---------------------------------------------------------------------------
_AMS_R = 8
_AMS_SQL = f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS t FROM documents
    ),
    freq AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY t),
    exact AS (
      SELECT CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS f2,
             CAST(count(*) AS BIGINT) AS vocab
      FROM freq
    ),
    est AS (
      SELECT {", ".join(
          "CAST(sum(CASE WHEN (instr('0123456789abcdef', "
          f"substr(md5(t || '#ams{r}'), 1, 1)) - 1) % 2 = 0 "
          "THEN c ELSE -c END) AS BIGINT) AS " + f"z{r}"
          for r in range(_AMS_R)
      )}
      FROM freq
    )
    SELECT e.vocab, CAST(e.f2 AS BIGINT) AS exact_f2,
           CAST(floor(({" + ".join(
               f"CAST(z{r} AS DOUBLE) * z{r}" for r in range(_AMS_R)
           )}) / {_AMS_R}.0 + 0.5) AS BIGINT) AS ams_estimate,
           floor(abs(({" + ".join(
               f"CAST(z{r} AS DOUBLE) * z{r}" for r in range(_AMS_R)
           )}) / {_AMS_R}.0 - CAST(e.f2 AS DOUBLE))
                 / CAST(e.f2 AS DOUBLE) * 1.0e6 + 0.5) / 1.0e6 AS rel_error
    FROM exact e CROSS JOIN est
"""


@_register("sketch_ams_f2_estimate", oracle=_AMS_SQL)
def sketch_ams_f2_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-moment sketch over token frequencies: 8 sign-sum
    estimators in ONE map-side-combinable aggregate (each ±c_t sign is
    an md5-parity column expression), mean-of-squares vs the exact F2.
    The sketch state is 8 longs — the mergeable-at-any-scale shape."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(F.explode(words_expr(F.col("text"))).alias("t"))
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("c"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    exact = freq.agg(
        F.sum(dec("c") * dec("c")).cast("decimal(38,0)").alias("f2"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    sign = lambda r: F.when(  # noqa: E731
        (
            F.instr(
                F.lit("0123456789abcdef"),
                F.substring(F.md5(F.concat(F.col("t"), F.lit(f"#ams{r}"))), 1, 1),
            )
            - 1
        )
        % 2
        == 0,
        F.col("c"),
    ).otherwise(-F.col("c"))
    est = freq.agg(
        *[
            F.sum(sign(r)).cast("long").alias(f"z{r}")
            for r in range(_AMS_R)
        ]
    )
    mean_sq = (
        sum(
            F.col(f"z{r}").cast("double") * F.col(f"z{r}")
            for r in range(_AMS_R)
        )
        / float(_AMS_R)
    )
    f2d = F.col("f2").cast("double")
    return exact.crossJoin(F.broadcast(est)).select(
        "vocab",
        F.col("f2").cast("long").alias("exact_f2"),
        F.floor(mean_sq + 0.5).cast("long").alias("ams_estimate"),
        (
            F.floor(F.abs(mean_sq - f2d) / f2d * 1.0e6 + 0.5) / 1.0e6
        ).alias("rel_error"),
    )


# ---------------------------------------------------------------------------
# Participation ratio (effective rank) of the embedding cloud:
# PR = tr(S)² / ||S||_F² over the scatter matrix S = n·Σxxᵀ − (Σx)(Σx)ᵀ,
# computed WITHOUT any eigendecomposition — trace and Frobenius norm
# come from exact integer moment sums (micro-unit quantization), the
# dim-pair rollup is a bounded 64×64 cell table.
# ---------------------------------------------------------------------------
_PR_SQL = """
    WITH v AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 1.0e6 + 0.5) AS BIGINT)) AS q
      FROM embeddings
    ),
    el AS (
      SELECT vec_id, unnest(range(64)) AS d, unnest(q) AS x FROM v
    ),
    pair AS (
      SELECT a.d AS da, b.d AS db,
             CAST(sum(CAST(a.x AS HUGEINT) * b.x) AS HUGEINT) AS sxy
      FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.d <= b.d
      GROUP BY 1, 2
    ),
    mu AS (
      SELECT d, CAST(sum(x) AS HUGEINT) AS sx, CAST(count(*) AS BIGINT) AS n
      FROM el GROUP BY d
    ),
    cell AS (
      SELECT p.da, p.db,
             (CAST(ma.n AS DOUBLE) * p.sxy - CAST(ma.sx AS DOUBLE) * mb.sx)
               / (CAST(ma.n AS DOUBLE) * ma.n) / 1.0e12 AS c_real
      FROM pair p JOIN mu ma ON p.da = ma.d JOIN mu mb ON p.db = mb.d
    ),
    agg AS (
      SELECT CAST(sum(CASE WHEN da = db
                      THEN CAST(floor(c_real * 1.0e9 + 0.5) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS tr_u,
             CAST(sum(CASE WHEN da = db THEN 1 ELSE 2 END
                      * CAST(floor(c_real * c_real * 1.0e12 + 0.5) AS BIGINT))
                  AS BIGINT) AS fro_u
      FROM cell
    )
    SELECT floor(CAST(tr_u AS DOUBLE) / 1.0e9 * (CAST(tr_u AS DOUBLE) / 1.0e9)
                 / (CAST(fro_u AS DOUBLE) / 1.0e12) * 1.0e6 + 0.5) / 1.0e6
             AS participation_ratio,
           floor(CAST(tr_u AS DOUBLE) / 1.0e9 * (CAST(tr_u AS DOUBLE) / 1.0e9)
                 / (CAST(fro_u AS DOUBLE) / 1.0e12) / 64.0 * 1.0e6 + 0.5) / 1.0e6
             AS effective_rank_share
    FROM agg
"""


@_register("embedding_participation_ratio", oracle=_PR_SQL)
def embedding_participation_ratio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Effective rank of the embedding covariance without any
    eigensolve: tr(S)²/||S||²_F. The dim-pair join is vec_id-keyed
    (constant 64·65/2 cells output), moment sums are exact HUGEINT/
    decimal, and the two norm terms quantize per cell before the
    64×64-bounded rollup."""
    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    q = F.transform(e, lambda x: F.floor(x * 1.0e6 + 0.5).cast("long"))
    v = emb.select("vec_id", q.alias("q"))
    el = v.select("vec_id", F.posexplode("q").alias("d", "x"))
    a = el.select("vec_id", F.col("d").alias("da"), F.col("x").alias("xa"))
    b = el.select("vec_id", F.col("d").alias("db"), F.col("x").alias("xb"))
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    pair = (
        a.join(b, "vec_id")
        .filter(F.col("da") <= F.col("db"))
        .groupBy("da", "db")
        .agg(F.sum(dec("xa") * dec("xb")).cast("decimal(38,0)").alias("sxy"))
    )
    mu = el.groupBy("d").agg(
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    ma = mu.select(F.col("d").alias("da"), F.col("sx").alias("sxa"), "n")
    mb = mu.select(F.col("d").alias("db"), F.col("sx").alias("sxb"))
    cell = (
        pair.join(F.broadcast(ma), "da")
        .join(F.broadcast(mb), "db")
        .select(
            "da",
            "db",
            (
                (
                    F.col("n").cast("double") * F.col("sxy").cast("double")
                    - F.col("sxa").cast("double") * F.col("sxb").cast("double")
                )
                / (F.col("n").cast("double") * F.col("n"))
                / 1.0e12
            ).alias("c_real"),
        )
    )
    agg = cell.agg(
        F.sum(
            F.when(
                F.col("da") == F.col("db"),
                F.floor(F.col("c_real") * 1.0e9 + 0.5).cast("long"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("tr_u"),
        F.sum(
            F.when(F.col("da") == F.col("db"), 1).otherwise(2)
            * F.floor(
                F.col("c_real") * F.col("c_real") * 1.0e12 + 0.5
            ).cast("long")
        )
        .cast("long")
        .alias("fro_u"),
    )
    tr = F.col("tr_u").cast("double") / 1.0e9
    fro2 = F.col("fro_u").cast("double") / 1.0e12
    q6 = lambda expr: F.floor(expr * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    return agg.select(
        q6(tr * tr / fro2).alias("participation_ratio"),
        q6(tr * tr / fro2 / 64.0).alias("effective_rank_share"),
    )


# ---------------------------------------------------------------------------
# Distance-concentration relative contrast (Beyer et al. 1999): per
# query, RC = mean distance / nearest distance. RC → 1 as dimensionality
# concentrates distances — the audit that says whether nearest-neighbor
# search is even meaningful in this space. Exact integer squared-L2.
# ---------------------------------------------------------------------------
_RC_SQL = """
    WITH v AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 1.0e6 + 0.5) AS BIGINT)) AS q
      FROM embeddings
    ),
    qs AS (SELECT vec_id AS query_id, q AS qv FROM v WHERE vec_id < 8),
    d AS (
      SELECT qs.query_id,
             list_aggregate(list_transform(range(64),
               i -> CAST(qs.qv[i + 1] - v.q[i + 1] AS DOUBLE)
                    * (qs.qv[i + 1] - v.q[i + 1])), 'sum') AS d2
      FROM qs, v WHERE v.vec_id != qs.query_id
    ),
    s AS (
      SELECT query_id, CAST(count(*) AS BIGINT) AS n,
             min(d2) AS dmin, sum(d2) AS dsum
      FROM d GROUP BY query_id
    )
    SELECT query_id,
           floor(sqrt(dsum / n) / 1.0e6 * 1.0e4 + 0.5) / 1.0e4 AS mean_dist,
           floor(sqrt(dmin) / 1.0e6 * 1.0e4 + 0.5) / 1.0e4 AS min_dist,
           floor(sqrt(dsum / n) / sqrt(dmin) * 1.0e4 + 0.5) / 1.0e4
             AS relative_contrast
    FROM s ORDER BY query_id
"""


@_register("similarity_relative_contrast", oracle=_RC_SQL)
def similarity_relative_contrast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative contrast per query over exact integer squared-L2: the
    8-query broadcast streams against the corpus (the intended ANN
    audit shape), per-query min/mean distances in one rollup."""
    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    q = F.transform(e, lambda x: F.floor(x * 1.0e6 + 0.5).cast("long"))
    v = emb.select("vec_id", q.alias("q"))
    qs = v.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("qv"),
            F.col("q"),
            lambda a, b: (a - b).cast("double") * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    d = (
        F.broadcast(qs)
        .join(v, F.col("vec_id") != F.col("query_id"))
        .select("query_id", d2.alias("d2"))
    )
    s = d.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("d2").alias("dmin"),
        F.sum("d2").alias("dsum"),
    )
    q4 = lambda expr: F.floor(expr * 1.0e4 + 0.5) / 1.0e4  # noqa: E731
    return (
        s.select(
            "query_id",
            q4(F.sqrt(F.col("dsum") / F.col("n")) / 1.0e6).alias("mean_dist"),
            q4(F.sqrt(F.col("dmin")) / 1.0e6).alias("min_dist"),
            q4(
                F.sqrt(F.col("dsum") / F.col("n")) / F.sqrt(F.col("dmin"))
            ).alias("relative_contrast"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion (Cormack et al. 2009) of the exact-cosine
# ranking with the int8-quantized ranking: RRF(d) = Σ 1/(60 + rank_m(d))
# — the standard zero-tuning way to combine retrieval channels; the
# audit shows how much a cheap quantized channel perturbs the fused
# top-k. Rankings partition by query (5-query broadcast baseline shape,
# same contract as the registered brute-force top-k).
# ---------------------------------------------------------------------------
_RRF_SQL = """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> greatest(-127, least(127,
                      CAST(floor(x * 64.0 + 0.5) AS BIGINT)))) AS q8
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, ev AS qv, q8 AS q8q FROM v WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.qv, v.ev), 4) AS cs,
             CAST(list_aggregate(list_transform(range(64),
               i -> CAST(q.q8q[i + 1] * v.q8[i + 1] AS DOUBLE)), 'sum')
               AS BIGINT) AS dot8
      FROM q, v WHERE v.vec_id != q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, neighbor_id ASC) AS ra,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY dot8 DESC, neighbor_id ASC) AS rb
      FROM scored
    ),
    fused AS (
      SELECT query_id, neighbor_id, ra AS rank_exact, rb AS rank_int8,
             CAST(floor((1.0 / (60 + ra) + 1.0 / (60 + rb)) * 1.0e9 + 0.5)
                  AS BIGINT) AS rrf_u
      FROM ranked
    )
    SELECT query_id, neighbor_id,
           CAST(rank_exact AS BIGINT) AS rank_exact,
           CAST(rank_int8 AS BIGINT) AS rank_int8,
           CAST(rrf_u AS DOUBLE) / 1.0e9 AS rrf_score
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_u DESC, neighbor_id ASC) AS rf
      FROM fused
    ) WHERE rf <= 5
    ORDER BY query_id, rrf_score DESC, neighbor_id
"""


@_register("similarity_rrf_fusion_topk", oracle=_RRF_SQL)
def similarity_rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF fusion of exact-cosine and int8-dot rankings per query: one
    broadcast-query scoring pass computes BOTH channel scores, two
    query-partitioned rank windows, fused score quantized at 1e-9
    before the final per-query top-5."""
    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    q8 = F.transform(
        e,
        lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.floor(x * 64.0 + 0.5).cast("long")),
        ),
    )
    v = emb.select("vec_id", e.alias("ev"), q8.alias("q8"))
    q = v.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("ev").alias("qv"),
        F.col("q8").alias("q8q"),
    )
    cos = F.round(
        F.aggregate(
            F.zip_with(F.col("qv"), F.col("ev"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (
            F.sqrt(
                F.aggregate(
                    F.transform(F.col("qv"), lambda a: a * a),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )
            * F.sqrt(
                F.aggregate(
                    F.transform(F.col("ev"), lambda a: a * a),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )
        ),
        4,
    )
    dot8 = F.aggregate(
        F.zip_with(
            F.col("q8q"), F.col("q8"), lambda a, b: (a * b).cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ).cast("long")
    scored = (
        F.broadcast(q)
        .join(v, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos.alias("cs"),
            dot8.alias("dot8"),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("cs").desc(), F.col("neighbor_id").asc()
    )
    wb = Window.partitionBy("query_id").orderBy(
        F.col("dot8").desc(), F.col("neighbor_id").asc()
    )
    ranked = scored.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wb).alias("rb"),
    )
    fused = ranked.select(
        "query_id",
        "neighbor_id",
        F.col("ra").cast("long").alias("rank_exact"),
        F.col("rb").cast("long").alias("rank_int8"),
        F.floor(
            (1.0 / (60 + F.col("ra")) + 1.0 / (60 + F.col("rb"))) * 1.0e9
            + 0.5
        )
        .cast("long")
        .alias("rrf_u"),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("rrf_u").desc(), F.col("neighbor_id").asc()
    )
    return (
        fused.withColumn("rf", F.row_number().over(wf))
        .filter(F.col("rf") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            "rank_exact",
            "rank_int8",
            (F.col("rrf_u").cast("double") / 1.0e9).alias("rrf_score"),
        )
        .orderBy("query_id", F.col("rrf_score").desc(), "neighbor_id")
    )


# ---------------------------------------------------------------------------
# JL distortion sweep: pairwise-distance distortion of the seed-11
# Gaussian projection bank at k = 8 / 16 / 32 output dims, measured
# over the 8-query × corpus pair sample. ratio = ||P(x−y)||/(√k·σ_unit)
# vs ||x−y||; the per-pair ratio quantizes at 1e-6 before the per-k
# mean/max rollup.
# ---------------------------------------------------------------------------
from cioos_siooc_data_transform_spark.operators.dedup import (  # noqa: E402
    random_hyperplanes as _rh16,
)

_JL16_ROWS = [
    [int(round(v * 10000.0)) for v in row]
    for row in _rh16(32, 64, seed=11)
]


def _jl16_proj_sql(k: int) -> str:
    rows = _JL16_ROWS[:k]
    terms = " + ".join(
        "pow(list_aggregate(list_transform(range(64), i -> CAST(d[i + 1] AS DOUBLE) * ("
        + "[" + ", ".join(str(h) for h in row) + "][i + 1]"
        + ")), 'sum') / 1.0e4, 2)"
        for row in rows
    )
    return f"sqrt(({terms}) / {k}.0)"


def _jl16_oracle() -> str:
    selects = []
    for k in (8, 16, 32):
        selects.append(f"""
    SELECT {k} AS k_dims, CAST(count(*) AS BIGINT) AS n_pairs,
           floor(CAST(sum(CAST(floor({_jl16_proj_sql(k)}
                 / sqrt(list_aggregate(list_transform(range(64),
                     i -> CAST(d[i + 1] AS DOUBLE) * d[i + 1]), 'sum'))
                 * 1.0e6 + 0.5) AS BIGINT)) AS DOUBLE) / count(*) + 0.5) / 1.0e6
             AS mean_ratio,
           floor(CAST(max(CAST(floor({_jl16_proj_sql(k)}
                 / sqrt(list_aggregate(list_transform(range(64),
                     i -> CAST(d[i + 1] AS DOUBLE) * d[i + 1]), 'sum'))
                 * 1.0e6 + 0.5) AS BIGINT)) AS DOUBLE)) / 1.0e6 AS max_ratio
    FROM pd""")
    union = "\n    UNION ALL\n".join(selects)
    return f"""
    WITH v AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 1.0e6 + 0.5) AS BIGINT)) AS q
      FROM embeddings
    ),
    qs AS (SELECT vec_id AS query_id, q AS qv FROM v WHERE vec_id < 8),
    pd AS (
      SELECT list_transform(range(64),
               i -> qs.qv[i + 1] - v.q[i + 1]) AS d
      FROM qs, v WHERE v.vec_id > qs.query_id
    )
    {union}
    ORDER BY k_dims
    """


@_register("embedding_jl_distortion_sweep", oracle="__JL16__")
def embedding_jl_distortion_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """JL distance-distortion curve at 3 projection widths over the
    broadcast 8-query pair sample: difference vectors project through
    the fixed seed-11 bank (column expressions — zero shuffle beyond
    the 3-row rollup); per-pair distortion ratios quantize at 1e-6."""
    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    q = F.transform(e, lambda x: F.floor(x * 1.0e6 + 0.5).cast("long"))
    v = emb.select("vec_id", q.alias("q"))
    qs = v.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qv")
    )
    pd = (
        F.broadcast(qs)
        .join(v, F.col("vec_id") > F.col("query_id"))
        .select(
            F.zip_with(
                F.col("qv"), F.col("q"), lambda a, b: a - b
            ).alias("d")
        )
    )
    orig = F.sqrt(
        F.aggregate(
            F.transform(F.col("d"), lambda x: x.cast("double") * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    out = None
    for k in (8, 16, 32):
        terms = []
        for row in _JL16_ROWS[:k]:
            h = F.array(*[F.lit(float(c)) for c in row])
            dot = (
                F.aggregate(
                    F.zip_with(
                        F.col("d"), h, lambda a, b: a.cast("double") * b
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / 1.0e4
            )
            terms.append(F.pow(dot, 2))
        proj = F.sqrt(sum(terms) / float(k))
        ratio_u = F.floor(proj / orig * 1.0e6 + 0.5).cast("long")
        agg = pd.select(ratio_u.alias("r_u")).agg(
            F.lit(k).cast("int").alias("k_dims"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            (
                F.floor(
                    F.sum("r_u").cast("double") / F.count(F.lit(1)) + 0.5
                )
                / 1.0e6
            ).alias("mean_ratio"),
            (F.floor(F.max("r_u").cast("double")) / 1.0e6).alias("max_ratio"),
        )
        out = agg if out is None else out.unionAll(agg)
    return out.orderBy("k_dims")


STAGED_ORACLES["embedding_jl_distortion_sweep"] = _jl16_oracle()


# ---------------------------------------------------------------------------
# MinHash split-half (jackknife) stability: per LSH candidate pair,
# the Jaccard estimate from hashes 1-4 vs hashes 5-8 — the spread
# between half-signatures is the cheap variance readout that says
# whether 8 hashes are enough at the chosen threshold.
# ---------------------------------------------------------------------------
def _jack_oracle() -> str:
    from cioos_siooc_data_transform_spark.plans.dedup_queries import (
        _LSH_CAND_CTES,
        _SHINGLES_CTE,
    )

    m_a = " + ".join(f"(sa.h{k} = sb.h{k})::int" for k in range(1, 5))
    m_b = " + ".join(f"(sa.h{k} = sb.h{k})::int" for k in range(5, 9))
    return f"""
    WITH {_SHINGLES_CTE},
    {_LSH_CAND_CTES},
    est AS (
      SELECT c.doc_a, c.doc_b,
             CAST({m_a} AS BIGINT) AS ma, CAST({m_b} AS BIGINT) AS mb
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.doc_a
      JOIN sig sb ON sb.doc_id = c.doc_b
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           floor(CAST(sum(abs(ma - mb)) AS DOUBLE) / 4.0 / count(*) * 1.0e6
                 + 0.5) / 1.0e6 AS mean_half_gap,
           floor(CAST(sum(CASE WHEN (ma >= 2) != (mb >= 2) THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*) * 1.0e6 + 0.5) / 1.0e6
             AS threshold_flip_rate
    FROM est
"""


@_register("dedup_minhash_jackknife", oracle="__JACK__")
def dedup_minhash_jackknife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-half MinHash stability over LSH candidates: the mean
    |half-estimate gap| and the rate at which a 0.5-threshold decision
    FLIPS between halves — pure column arithmetic over the existing
    signature join, one scalar rollup."""
    from cioos_siooc_data_transform_spark.operators.dedup import (
        lsh_band_buckets,
        lsh_candidate_pairs,
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
    cand = lsh_candidate_pairs(buckets, "doc_id", max_bucket_size=50)
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{k}").alias(f"a{k}") for k in range(1, 9)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{k}").alias(f"b{k}") for k in range(1, 9)],
    )
    ma = sum(
        F.when(F.col(f"a{k}") == F.col(f"b{k}"), 1).otherwise(0)
        for k in range(1, 5)
    ).cast("long")
    mb = sum(
        F.when(F.col(f"a{k}") == F.col(f"b{k}"), 1).otherwise(0)
        for k in range(5, 9)
    ).cast("long")
    est = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(ma.alias("ma"), mb.alias("mb"))
    )
    q6 = lambda e2: F.floor(e2 * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    return est.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        q6(
            F.sum(F.abs(F.col("ma") - F.col("mb"))).cast("double")
            / 4.0
            / F.count(F.lit(1))
        ).alias("mean_half_gap"),
        q6(
            F.sum(
                F.when(
                    (F.col("ma") >= 2) != (F.col("mb") >= 2), 1
                ).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("threshold_flip_rate"),
    )


STAGED_ORACLES["dedup_minhash_jackknife"] = _jack_oracle()


# ---------------------------------------------------------------------------
# Label projection separation: project every embedding onto the exact
# INTEGER centroid-difference axis of labels 0 and 1 (w_d = S1_d·n0 −
# S0_d·n1 — scaling cancels in Cohen's d), then the standardized mean
# gap of the two projected clouds. The supervised twin of the
# registered label-margin audit: separation along ONE axis, not to
# centroids.
# ---------------------------------------------------------------------------
_PROJ_SQL = """
    WITH v AS (
      SELECT vec_id, label,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 1.0e6 + 0.5) AS BIGINT)) AS q
      FROM embeddings
    ),
    el AS (
      SELECT vec_id, label, unnest(range(64)) AS d, unnest(q) AS x FROM v
    ),
    cstat AS (
      SELECT d,
             CAST(sum(CASE WHEN label = 0 THEN x ELSE 0 END) AS BIGINT) AS s0,
             CAST(sum(CASE WHEN label = 1 THEN x ELSE 0 END) AS BIGINT) AS s1,
             CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      FROM el WHERE label IN (0, 1) GROUP BY d
    ),
    axis AS (
      SELECT d, CAST(s1 AS HUGEINT) * max(n0) OVER ()
                - CAST(s0 AS HUGEINT) * max(n1) OVER () AS w
      FROM cstat
    ),
    t AS (
      SELECT e.vec_id, e.label,
             sum(CAST(e.x AS DOUBLE) * a.w) / 1.0e18 AS tproj
      FROM el e JOIN axis a ON e.d = a.d
      WHERE e.label IN (0, 1)
      GROUP BY e.vec_id, e.label
    ),
    g AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n, sum(tproj) AS st,
             sum(tproj * tproj) AS qt
      FROM t GROUP BY label
    ),
    s AS (
      SELECT max(n) FILTER (label = 0) AS n0,
             max(n) FILTER (label = 1) AS n1,
             max(st / n) FILTER (label = 0) AS m0,
             max(st / n) FILTER (label = 1) AS m1,
             max((qt - st * st / n) / (n - 1)) FILTER (label = 0) AS v0,
             max((qt - st * st / n) / (n - 1)) FILTER (label = 1) AS v1
      FROM g
    )
    SELECT n0, n1,
           floor((m1 - m0) / sqrt((v0 + v1) / 2.0) * 1.0e6 + 0.5) / 1.0e6
             AS cohens_d
    FROM s
"""


@_register("embedding_label_projection_gap", oracle=_PROJ_SQL)
def embedding_label_projection_gap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cohen's d of labels 0/1 projected on their exact integer
    centroid-difference axis: one dim rollup builds the 64-row
    broadcast axis, one vec-keyed rollup projects, a 2-row group
    assembles the standardized gap."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("label").isin(0, 1))
    e = F.col("embedding").cast("array<double>")
    q = F.transform(e, lambda x: F.floor(x * 1.0e6 + 0.5).cast("long"))
    el = emb.select("vec_id", "label", F.posexplode(q).alias("d", "x"))
    cstat = el.groupBy("d").agg(
        F.sum(F.when(F.col("label") == 0, F.col("x")).otherwise(0))
        .cast("long")
        .alias("s0"),
        F.sum(F.when(F.col("label") == 1, F.col("x")).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(F.col("label") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
    )
    nn = cstat.agg(
        F.max("n0").cast("long").alias("tn0"),
        F.max("n1").cast("long").alias("tn1"),
    )
    axis = cstat.crossJoin(F.broadcast(nn)).select(
        "d",
        (
            F.col("s1").cast("decimal(38,0)")
            * F.col("tn0").cast("decimal(19,0)")
            - F.col("s0").cast("decimal(38,0)")
            * F.col("tn1").cast("decimal(19,0)")
        ).alias("w"),
    )
    t = (
        el.join(F.broadcast(axis), "d")
        .groupBy("vec_id", "label")
        .agg(
            (
                F.sum(F.col("x").cast("double") * F.col("w").cast("double"))
                / 1.0e18
            ).alias("tproj")
        )
    )
    g = t.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("tproj").alias("st"),
        F.sum(F.col("tproj") * F.col("tproj")).alias("qt"),
    )
    pick = lambda expr, lab: F.max(  # noqa: E731
        F.when(F.col("label") == lab, expr)
    )
    s = g.agg(
        pick(F.col("n"), 0).alias("n0"),
        pick(F.col("n"), 1).alias("n1"),
        pick(F.col("st") / F.col("n"), 0).alias("m0"),
        pick(F.col("st") / F.col("n"), 1).alias("m1"),
        pick(
            (F.col("qt") - F.col("st") * F.col("st") / F.col("n"))
            / (F.col("n") - 1),
            0,
        ).alias("v0"),
        pick(
            (F.col("qt") - F.col("st") * F.col("st") / F.col("n"))
            / (F.col("n") - 1),
            1,
        ).alias("v1"),
    )
    return s.select(
        "n0",
        "n1",
        (
            F.floor(
                (F.col("m1") - F.col("m0"))
                / F.sqrt((F.col("v0") + F.col("v1")) / 2.0)
                * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("cohens_d"),
    )


# ---------------------------------------------------------------------------
# Effective sample size under soft dedup: with per-doc weight 1/c
# (c = exact-dup cluster size), ESS = (Σw)²/Σw² = n_clusters² / Σ(1/c)
# — the number that says what a weighted-keep policy is actually worth
# vs keep-one-per-cluster. Exact md5 clustering; 1/c quantized 1e-9.
# ---------------------------------------------------------------------------
_ESS_SQL = """
    WITH cl AS (
      SELECT md5(text) AS fp, CAST(count(*) AS BIGINT) AS c,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
      FROM documents GROUP BY md5(text)
    ),
    s AS (
      SELECT CAST(sum(c) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_clusters,
             CAST(sum(CAST(floor(1.0e9 / c + 0.5) AS BIGINT)) AS BIGINT)
               AS inv_u,
             CAST(sum(toks) AS BIGINT) AS total_tokens,
             CAST(sum(CAST(floor(CAST(toks AS DOUBLE) / c + 0.5) AS BIGINT))
                  AS BIGINT) AS kept_tokens
      FROM cl
    )
    SELECT n_docs, n_clusters,
           floor(CAST(n_clusters AS DOUBLE) * n_clusters
                 / (CAST(inv_u AS DOUBLE) / 1.0e9) * 1.0e6 + 0.5) / 1.0e6
             AS effective_sample_size,
           floor(CAST(n_clusters AS DOUBLE) / n_docs * 1.0e6 + 0.5) / 1.0e6
             AS keep_one_ratio,
           total_tokens, kept_tokens
    FROM s
"""


@_register("dedup_effective_sample_size", oracle=_ESS_SQL)
def dedup_effective_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ESS of the corpus under 1/cluster-size soft-dedup weights vs the
    keep-one ratio, plus the token yield of mean-per-cluster keeping.
    One digest group-by (the exact-dedup shape), one scalar rollup."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr

    docs = _t(spark, sf_dir, "documents")
    cl = docs.groupBy(F.md5(F.col("text")).alias("fp")).agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum(F.size(words_expr(F.col("text"))).cast("long"))
        .cast("long")
        .alias("toks"),
    )
    s = cl.agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.sum(F.floor(1.0e9 / F.col("c") + 0.5).cast("long"))
        .cast("long")
        .alias("inv_u"),
        F.sum("toks").cast("long").alias("total_tokens"),
        F.sum(
            F.floor(F.col("toks").cast("double") / F.col("c") + 0.5).cast(
                "long"
            )
        )
        .cast("long")
        .alias("kept_tokens"),
    )
    q6 = lambda e2: F.floor(e2 * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    return s.select(
        "n_docs",
        "n_clusters",
        q6(
            F.col("n_clusters").cast("double")
            * F.col("n_clusters")
            / (F.col("inv_u").cast("double") / 1.0e9)
        ).alias("effective_sample_size"),
        q6(F.col("n_clusters").cast("double") / F.col("n_docs")).alias(
            "keep_one_ratio"
        ),
        "total_tokens",
        "kept_tokens",
    )


# ===========================================================================
# Wave E — text / language-model analytics.
# ===========================================================================

# ---------------------------------------------------------------------------
# Log-odds ratio with informative Dirichlet prior (Monroe, Colaresi &
# Quinn 2008, "Fightin' Words"): which words distinguish English docs
# from the rest, shrunk toward the corpus prior. z_w = δ_w/√var —
# per-word algebra over three bounded frequency tables, top-10 by
# quantized |z| with a word tiebreak.
# ---------------------------------------------------------------------------
_LOGODDS_SQL = """
    WITH tok AS (
      SELECT CASE WHEN lang = 'en' THEN 'a' ELSE 'b' END AS grp,
             unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    cnt AS (
      SELECT w,
             CAST(sum(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ya,
             CAST(sum(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS yb
      FROM tok GROUP BY w
    ),
    tot AS (
      SELECT CAST(sum(ya) AS BIGINT) AS na, CAST(sum(yb) AS BIGINT) AS nb,
             CAST(sum(ya + yb) AS BIGINT) AS n0
      FROM cnt
    ),
    z AS (
      SELECT w,
             CAST(floor((
               ln((ya + 100.0 * (ya + yb) / n0)
                  / (na + 100.0 - ya - 100.0 * (ya + yb) / n0))
               - ln((yb + 100.0 * (ya + yb) / n0)
                    / (nb + 100.0 - yb - 100.0 * (ya + yb) / n0))
             ) / sqrt(1.0 / (ya + 100.0 * (ya + yb) / n0)
                      + 1.0 / (yb + 100.0 * (ya + yb) / n0))
             * 1.0e6 + 0.5) AS BIGINT) AS z_u
      FROM cnt CROSS JOIN tot
    )
    SELECT w AS word, CAST(z_u AS DOUBLE) / 1.0e6 AS log_odds_z
    FROM z ORDER BY abs(z_u) DESC, w LIMIT 10
"""


@_register("text_log_odds_dirichlet", oracle=_LOGODDS_SQL)
def text_log_odds_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fightin'-Words z-scores (α0=100 informative Dirichlet prior)
    for English-vs-rest word usage: one vocab rollup + a 1-row totals
    broadcast, z quantized at 1e-6, deterministic top-10."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        F.when(F.col("lang") == "en", "a").otherwise("b").alias("grp"),
        F.explode(words_expr(F.col("text"))).alias("w"),
    )
    cnt = tok.groupBy("w").agg(
        F.sum(F.when(F.col("grp") == "a", 1).otherwise(0))
        .cast("long")
        .alias("ya"),
        F.sum(F.when(F.col("grp") == "b", 1).otherwise(0))
        .cast("long")
        .alias("yb"),
    )
    tot = cnt.agg(
        F.sum("ya").cast("long").alias("na"),
        F.sum("yb").cast("long").alias("nb"),
        F.sum(F.col("ya") + F.col("yb")).cast("long").alias("n0"),
    )
    prior = 100.0 * (F.col("ya") + F.col("yb")) / F.col("n0")
    da = F.log(
        (F.col("ya") + prior) / (F.col("na") + 100.0 - F.col("ya") - prior)
    )
    db = F.log(
        (F.col("yb") + prior) / (F.col("nb") + 100.0 - F.col("yb") - prior)
    )
    var = 1.0 / (F.col("ya") + prior) + 1.0 / (F.col("yb") + prior)
    z_u = F.floor((da - db) / F.sqrt(var) * 1.0e6 + 0.5).cast("long")
    z = cnt.crossJoin(F.broadcast(tot)).select(
        F.col("w").alias("word"), z_u.alias("z_u")
    )
    return (
        z.orderBy(F.abs(F.col("z_u")).desc(), "word")
        .limit(10)
        .select("word", (F.col("z_u").cast("double") / 1.0e6).alias("log_odds_z"))
    )


# ---------------------------------------------------------------------------
# Interpolated Kneser–Ney bigram cross-entropy (Kneser & Ney 1995;
# Chen & Goodman 1999, D=0.75): P(w|v) = max(c(vw)−D,0)/c(v·) +
# D·N1+(v·)/c(v·) · N1+(·w)/N1+(··). The corpus-level bits/bigram —
# all five count tables are vocab-bounded rollups; per-bigram terms
# quantize at 1e-9 weighted by occurrence count.
# ---------------------------------------------------------------------------
_KN_SQL = """
    WITH w2 AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    bg AS (
      SELECT words[i] AS v, words[i + 1] AS w
      FROM w2, unnest(generate_series(1, len(words) - 1)) AS u(i)
    ),
    cvw AS (SELECT v, w, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2),
    cv AS (SELECT v, CAST(sum(c) AS BIGINT) AS cv,
                  CAST(count(*) AS BIGINT) AS n1fwd
           FROM cvw GROUP BY v),
    cont AS (SELECT w, CAST(count(*) AS BIGINT) AS n1bwd FROM cvw GROUP BY w),
    totc AS (SELECT CAST(count(*) AS BIGINT) AS n1all FROM cvw),
    terms AS (
      SELECT CAST(sum(CAST(floor(
               -x.c * ln(
                 (greatest(CAST(x.c AS DOUBLE) - 0.75, 0.0) / cv.cv)
                 + 0.75 * cv.n1fwd / cv.cv
                   * (CAST(ct.n1bwd AS DOUBLE) / t.n1all)
               ) / ln(2.0) * 1.0e9 + 0.5) AS BIGINT)) AS BIGINT) AS s_u,
             CAST(sum(x.c) AS BIGINT) AS n
      FROM cvw x
      JOIN cv ON x.v = cv.v
      JOIN cont ct ON x.w = ct.w
      CROSS JOIN totc t
    )
    SELECT n AS n_bigrams,
           floor(CAST(s_u AS DOUBLE) / 1.0e9 / n * 1.0e6 + 0.5) / 1.0e6
             AS kn_bits_per_bigram,
           floor(pow(2.0, CAST(s_u AS DOUBLE) / 1.0e9 / n) * 1.0e4 + 0.5)
             / 1.0e4 AS kn_perplexity
    FROM terms
"""


@_register("lm_kneser_ney_bigram", oracle=_KN_SQL)
def lm_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram model scored on its own corpus
    (training cross-entropy): bigram/context/continuation tables are
    three vocab-bounded group-bys, the model is pure column algebra,
    per-bigram -c·log2 P terms quantize at 1e-9."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr

    docs = _t(spark, sf_dir, "documents")
    words = words_expr(F.col("text"))
    bg = docs.select(
        F.explode(
            F.zip_with(
                F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
                F.slice(
                    words, 2, F.greatest(F.size(words) - 1, F.lit(0))
                ),
                lambda a, b: F.struct(a.alias("v"), b.alias("w")),
            )
        ).alias("p")
    ).select(F.col("p.v").alias("v"), F.col("p.w").alias("w"))
    cvw = bg.groupBy("v", "w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    cv = cvw.groupBy("v").agg(
        F.sum("c").cast("long").alias("cv"),
        F.count(F.lit(1)).cast("long").alias("n1fwd"),
    )
    cont = cvw.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("n1bwd"))
    totc = cvw.agg(F.count(F.lit(1)).cast("long").alias("n1all"))
    p = (
        F.greatest(F.col("c").cast("double") - 0.75, F.lit(0.0)) / F.col("cv")
        + 0.75
        * F.col("n1fwd")
        / F.col("cv")
        * (F.col("n1bwd").cast("double") / F.col("n1all"))
    )
    term_u = F.floor(
        -F.col("c") * F.log(p) / math.log(2.0) * 1.0e9 + 0.5
    ).cast("long")
    terms = (
        cvw.join(F.broadcast(cv), "v")
        .join(F.broadcast(cont), "w")
        .crossJoin(F.broadcast(totc))
        .agg(
            F.sum(term_u).cast("long").alias("s_u"),
            F.sum("c").cast("long").alias("n"),
        )
    )
    bits = F.col("s_u").cast("double") / 1.0e9 / F.col("n")
    return terms.select(
        F.col("n").alias("n_bigrams"),
        (F.floor(bits * 1.0e6 + 0.5) / 1.0e6).alias("kn_bits_per_bigram"),
        (F.floor(F.pow(F.lit(2.0), bits) * 1.0e4 + 0.5) / 1.0e4).alias(
            "kn_perplexity"
        ),
    )


# ---------------------------------------------------------------------------
# Held-out unigram perplexity: train on odd-numbered sources, evaluate
# add-one-smoothed unigram cross-entropy on the even-numbered held-out
# half. V = full-corpus vocabulary (deterministic smoothing support).
# ---------------------------------------------------------------------------
_HELDOUT_SQL = """
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
    terms AS (
      SELECT CAST(sum(CAST(floor(
               -h.h * ln((coalesce(t.c, 0) + 1.0) / (ntr.nt + vocab.v))
               / ln(2.0) * 1.0e9 + 0.5) AS BIGINT)) AS BIGINT) AS s_u,
             CAST(sum(h.h) AS BIGINT) AS n
      FROM held h
      LEFT JOIN train t ON h.w = t.w
      CROSS JOIN ntr CROSS JOIN vocab
    )
    SELECT n AS n_held_tokens,
           floor(CAST(s_u AS DOUBLE) / 1.0e9 / n * 1.0e6 + 0.5) / 1.0e6
             AS bits_per_token,
           floor(pow(2.0, CAST(s_u AS DOUBLE) / 1.0e9 / n) * 1.0e4 + 0.5)
             / 1.0e4 AS heldout_perplexity
    FROM terms
"""


@_register("lm_unigram_heldout_perplexity", oracle=_HELDOUT_SQL)
def lm_unigram_heldout_perplexity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Add-one unigram model trained on odd sources, perplexity on even
    sources: two vocab rollups + a broadcast join, per-word terms
    weighted by held-out count and quantized at 1e-9."""
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
    term_u = F.floor(
        -F.col("h")
        * F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
            / (F.col("nt") + F.col("v"))
        )
        / math.log(2.0)
        * 1.0e9
        + 0.5
    ).cast("long")
    terms = (
        held.join(F.broadcast(train), "w", "left")
        .crossJoin(F.broadcast(ntr))
        .crossJoin(F.broadcast(vocab))
        .agg(
            F.sum(term_u).cast("long").alias("s_u"),
            F.sum("h").cast("long").alias("n"),
        )
    )
    bits = F.col("s_u").cast("double") / 1.0e9 / F.col("n")
    return terms.select(
        F.col("n").alias("n_held_tokens"),
        (F.floor(bits * 1.0e6 + 0.5) / 1.0e6).alias("bits_per_token"),
        (F.floor(F.pow(F.lit(2.0), bits) * 1.0e4 + 0.5) / 1.0e4).alias(
            "heldout_perplexity"
        ),
    )


# ---------------------------------------------------------------------------
# BM25 parameter sweep: retrieval-score statistics for the fixed query
# {scan, join, stream} at k1 ∈ {0.9, 1.2, 1.8} (b = 0.75) — the tuning
# curve next to the registered single-point text_bm25_topk. Same
# bounded shape, swept against a 3-row broadcast parameter table.
# ---------------------------------------------------------------------------
_BM25S_TERMS = ("scan", "join", "stream")
_BM25S_SQL = f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      FROM documents
    ), corpus AS (
      SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n,
             CAST(sum(dl) AS BIGINT) AS sdl
      FROM (SELECT doc_id, any_value(dl) AS dl FROM tok GROUP BY 1)
    ), tf AS (
      SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf,
             any_value(dl) AS dl
      FROM tok
      WHERE t IN ({", ".join(f"'{w}'" for w in _BM25S_TERMS)})
      GROUP BY 1, 2
    ), df AS (
      SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), ks AS (SELECT unnest([0.9, 1.2, 1.8]) AS k1),
    scored AS (
      SELECT ks.k1, tf.doc_id,
             CAST(floor(
               ln((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5e0)
                  / (CAST(df AS DOUBLE) + 0.5e0) + 1.0e0)
               * (CAST(tf AS DOUBLE) * (ks.k1 + 1.0e0))
               / (CAST(tf AS DOUBLE) + ks.k1
                  * (1.0e0 - 0.75e0
                     + 0.75e0 * CAST(dl AS DOUBLE)
                       * CAST(n AS DOUBLE) / CAST(sdl AS DOUBLE)))
               * 1.0e9 + 0.5) AS BIGINT) AS s_nano
      FROM tf JOIN df ON df.t = tf.t CROSS JOIN corpus CROSS JOIN ks
    ), total AS (
      SELECT k1, doc_id, CAST(sum(s_nano) AS BIGINT) AS sn
      FROM scored GROUP BY 1, 2
    )
    SELECT floor(k1 * 1.0e6 + 0.5) / 1.0e6 AS k1,
           CAST(count(*) AS BIGINT) AS n_matched,
           floor(CAST(sum(sn) AS DOUBLE) / count(*) / 1.0e9 * 1.0e6 + 0.5)
             / 1.0e6 AS mean_score,
           floor(CAST(max(sn) AS DOUBLE) / 1.0e9 * 1.0e6 + 0.5) / 1.0e6
             AS max_score
    FROM total GROUP BY k1 ORDER BY k1
"""


@_register("text_bm25_parameter_sweep", oracle=_BM25S_SQL)
def text_bm25_parameter_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 k1 sweep over one tokenize pass: the per-(k1, doc) scores
    come from crossing the term-frequency table with a 3-row broadcast
    parameter table — the sweep costs 3× the (tiny, query-term-
    filtered) posting list, not 3 corpus scans."""
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    base = docs.select(
        "doc_id", words.alias("w"), F.size(words).cast("long").alias("dl")
    )
    tok = base.select(
        "doc_id", F.explode("w").alias("t"), "dl"
    ).filter(F.col("t").isin(*_BM25S_TERMS))
    corpus = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dl").cast("long").alias("sdl"),
    )
    tf = tok.groupBy("doc_id", "t").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.first("dl").alias("dl"),
    )
    dfc = tf.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("df"))
    ks = spark.createDataFrame(
        [(0.9,), (1.2,), (1.8,)], "k1 double"
    )
    idf = F.log(
        (F.col("n").cast("double") - F.col("df").cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
        + 1.0
    )
    s_nano = F.floor(
        idf
        * (F.col("tf").cast("double") * (F.col("k1") + 1.0))
        / (
            F.col("tf").cast("double")
            + F.col("k1")
            * (
                1.0
                - 0.75
                + 0.75
                * F.col("dl").cast("double")
                * F.col("n").cast("double")
                / F.col("sdl").cast("double")
            )
        )
        * 1.0e9
        + 0.5
    ).cast("long")
    scored = (
        tf.join(F.broadcast(dfc), "t")
        .crossJoin(F.broadcast(corpus))
        .crossJoin(F.broadcast(ks))
        .select("k1", "doc_id", s_nano.alias("s_nano"))
    )
    total = scored.groupBy("k1", "doc_id").agg(
        F.sum("s_nano").cast("long").alias("sn")
    )
    return (
        total.groupBy(
            (F.floor(F.col("k1") * 1.0e6 + 0.5) / 1.0e6).alias("k1")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            (
                F.floor(
                    F.sum("sn").cast("double")
                    / F.count(F.lit(1))
                    / 1.0e9
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("mean_score"),
            (
                F.floor(F.max("sn").cast("double") / 1.0e9 * 1.0e6 + 0.5)
                / 1.0e6
            ).alias("max_score"),
        )
        .orderBy("k1")
    )


# ---------------------------------------------------------------------------
# Vocabulary overlap by frequency-rank band: head terms are shared
# across sources, tail terms are source-specific — this measures where
# the crossover sits. Global vocab ranks come from the two-pass
# range-bucket operator (no key-scaled window even at web-corpus
# vocabulary sizes).
# ---------------------------------------------------------------------------
_RANKBAND_SQL = """
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w),
    ranked AS (
      SELECT w, CAST(row_number() OVER (ORDER BY c DESC, w ASC) AS BIGINT) AS r
      FROM vocab
    ),
    banded AS (
      SELECT w, CASE WHEN r <= 10 THEN 'head'
                     WHEN r <= 25 THEN 'mid' ELSE 'tail' END AS band
      FROM ranked
    ),
    presence AS (SELECT DISTINCT w, source FROM tok),
    cover AS (
      SELECT b.band, b.w, CAST(count(*) AS BIGINT) AS n_src
      FROM banded b JOIN presence p ON b.w = p.w
      GROUP BY 1, 2
    ),
    ns AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS s FROM tok)
    SELECT band, CAST(count(*) AS BIGINT) AS n_words,
           floor(CAST(sum(n_src) AS DOUBLE) / count(*) / max(ns.s) * 1.0e6
                 + 0.5) / 1.0e6 AS mean_coverage,
           floor(CAST(sum(CASE WHEN n_src = ns.s THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) * 1.0e6 + 0.5) / 1.0e6 AS universal_share
    FROM cover CROSS JOIN ns GROUP BY band ORDER BY band
"""


@_register("source_vocab_overlap_by_rank_band", oracle=_RANKBAND_SQL)
def source_vocab_overlap_by_rank_band(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-band source coverage of the vocabulary: global frequency
    ranks via ranked_cumsum_two_pass (range-bucketed — scale-safe at
    any vocab size), presence joined word-keyed, 3-row band rollup."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr
    from cioos_siooc_data_transform_spark.operators.windows import (
        ranked_cumsum_two_pass,
    )

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(words_expr(F.col("text"))).alias("w"))
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ranked = ranked_cumsum_two_pass(
        vocab, "c", "w", out_rank="r", out_cum="__cum", ascending=False
    )
    banded = ranked.select(
        "w",
        F.when(F.col("r") <= 10, "head")
        .when(F.col("r") <= 25, "mid")
        .otherwise("tail")
        .alias("band"),
    )
    presence = tok.distinct()
    cover = (
        banded.join(presence, "w")
        .groupBy("band", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("n_src"))
    )
    ns = tok.agg(F.countDistinct("source").cast("long").alias("s"))
    return (
        cover.crossJoin(F.broadcast(ns))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            (
                F.floor(
                    F.sum("n_src").cast("double")
                    / F.count(F.lit(1))
                    / F.max("s")
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("mean_coverage"),
            (
                F.floor(
                    F.sum(
                        F.when(F.col("n_src") == F.col("s"), 1).otherwise(0)
                    ).cast("double")
                    / F.count(F.lit(1))
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("universal_share"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# Heaps' law per language: V(N) ≈ K·N^β fit in log-log space PER
# LANGUAGE — the grouped twin of the registered corpus-level fit,
# riding the grouped two-pass running sums (group_cols=['lang']).
# ---------------------------------------------------------------------------
_HEAPS_LANG_SQL = """
    WITH tok AS (
      SELECT lang, doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    first_seen AS (
      SELECT lang, t, CAST(min(doc_id) AS BIGINT) AS fd FROM tok GROUP BY 1, 2
    ),
    per_doc AS (
      SELECT lang, doc_id, CAST(count(*) AS BIGINT) AS n_tok
      FROM tok GROUP BY 1, 2
    ),
    new_vocab AS (
      SELECT lang, fd AS doc_id, CAST(count(*) AS BIGINT) AS n_new
      FROM first_seen GROUP BY 1, 2
    ),
    joined AS (
      SELECT p.lang, p.doc_id, p.n_tok, coalesce(v.n_new, 0) AS n_new
      FROM per_doc p LEFT JOIN new_vocab v
        ON p.lang = v.lang AND p.doc_id = v.doc_id
    ),
    cum AS (
      SELECT lang,
             CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id)
                  AS BIGINT) AS n_cum,
             CAST(sum(n_new) OVER (PARTITION BY lang ORDER BY doc_id)
                  AS BIGINT) AS v_cum
      FROM joined
    ),
    pts AS (
      SELECT lang, ln(CAST(n_cum AS DOUBLE)) AS x,
             ln(CAST(v_cum AS DOUBLE)) AS y
      FROM cum WHERE v_cum > 0
    ),
    ols AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS np, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy
      FROM pts GROUP BY lang
    )
    SELECT lang, np AS n_docs,
           floor((np * sxy - sx * sy) / (np * sxx - sx * sx) * 1.0e6 + 0.5)
             / 1.0e6 AS heaps_beta
    FROM ols ORDER BY lang
"""


@_register("text_heaps_law_by_lang", oracle=_HEAPS_LANG_SQL)
def text_heaps_law_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Heaps' β: first-seen trick per language, BOTH
    running sums from grouped ranked_cumsum_two_pass calls
    (group_cols=['lang'] — bounded bucket windows even when one
    language dominates the corpus), per-language OLS in log-log."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr
    from cioos_siooc_data_transform_spark.operators.windows import (
        ranked_cumsum_two_pass,
    )

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", "doc_id", F.explode(words_expr(F.col("text"))).alias("t")
    )
    first_seen = tok.groupBy("lang", "t").agg(
        F.min("doc_id").cast("long").alias("fd")
    )
    per_doc = tok.groupBy("lang", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok")
    )
    new_vocab = first_seen.groupBy(
        "lang", F.col("fd").alias("doc_id")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_new"))
    joined = per_doc.join(new_vocab, ["lang", "doc_id"], "left").select(
        "lang",
        "doc_id",
        "n_tok",
        F.coalesce(F.col("n_new"), F.lit(0)).cast("long").alias("n_new"),
    )
    c1 = ranked_cumsum_two_pass(
        joined, "doc_id", "doc_id",
        weight_col="n_tok", group_cols=["lang"], ascending=True,
        out_rank="__r1", out_cum="n_cum",
    ).select("lang", "doc_id", "n_new", F.col("n_cum").cast("long").alias("n_cum"))
    c2 = ranked_cumsum_two_pass(
        c1, "doc_id", "doc_id",
        weight_col="n_new", group_cols=["lang"], ascending=True,
        out_rank="__r2", out_cum="v_cum",
    ).select("lang", "n_cum", F.col("v_cum").cast("long").alias("v_cum"))
    pts = c2.filter(F.col("v_cum") > 0).select(
        "lang",
        F.log(F.col("n_cum").cast("double")).alias("x"),
        F.log(F.col("v_cum").cast("double")).alias("y"),
    )
    ols = pts.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return (
        ols.select(
            "lang",
            F.col("np").alias("n_docs"),
            (
                F.floor(
                    (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy"))
                    / (
                        F.col("np") * F.col("sxx")
                        - F.col("sx") * F.col("sx")
                    )
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("heaps_beta"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Self-repetition curve: fraction of token positions repeating a token
# from the previous d ∈ {8, 16} positions — the memorization/loop
# texture of generated text. Entirely row-local (zero shuffle before
# the 2-row rollup).
# ---------------------------------------------------------------------------
def _selfrep_sql() -> str:
    selects = []
    for d in (8, 16):
        selects.append(f"""
    SELECT {d} AS distance, CAST(count(*) AS BIGINT) AS n_docs,
           floor(CAST(sum(CAST(floor(
             len(list_filter(generate_series({d} + 1, len(words)),
                 i -> list_contains(words[i - {d}:i - 1], words[i])))
             * 1.0e6 / (len(words) - {d}) + 0.5) AS BIGINT)) AS DOUBLE)
             / count(*) + 0.5) / 1.0e6 AS mean_repetition_rate
    FROM w2 WHERE len(words) > {d}""")
    union = "\n    UNION ALL\n".join(selects)
    return f"""
    WITH w2 AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    {union}
    ORDER BY distance
    """


@_register("text_self_repetition_curve", oracle="__SELFREP__")
def text_self_repetition_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed self-repetition at lookback 8 and 16: per-position
    membership checks fold over the token array row-locally; per-doc
    rates quantize at 1e-6 before the per-distance mean."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr

    docs = _t(spark, sf_dir, "documents")
    words = words_expr(F.col("text"))
    base = docs.select(words.alias("words"), F.size(words).alias("n"))
    out = None
    for d in (8, 16):
        reps = F.aggregate(
            F.sequence(F.lit(d + 1), F.col("n")),
            F.lit(0),
            lambda acc, i: acc
            + F.when(
                F.exists(
                    F.slice(F.col("words"), i - F.lit(d), d),
                    lambda t: t == F.element_at(F.col("words"), i),
                ),
                1,
            ).otherwise(0),
        )
        rate_u = F.floor(
            reps * 1.0e6 / (F.col("n") - d) + 0.5
        ).cast("long")
        agg = (
            base.filter(F.col("n") > d)
            .select(rate_u.alias("r_u"))
            .agg(
                F.lit(d).cast("int").alias("distance"),
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                (
                    F.floor(
                        F.sum("r_u").cast("double") / F.count(F.lit(1)) + 0.5
                    )
                    / 1.0e6
                ).alias("mean_repetition_rate"),
            )
        )
        out = agg if out is None else out.unionAll(agg)
    return out.orderBy("distance")


STAGED_ORACLES["text_self_repetition_curve"] = _selfrep_sql()


# ---------------------------------------------------------------------------
# Character-vs-token entropy ratio per language: H_char/H_token — a
# compression-style signal (token entropy saturates with a tiny
# vocabulary while character entropy tracks orthography).
# ---------------------------------------------------------------------------
_CHARTOK_SQL = """
    WITH tokf AS (
      SELECT lang, t, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents
      ) GROUP BY 1, 2
    ),
    tokt AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM tokf GROUP BY lang),
    htok AS (
      SELECT f.lang,
             CAST(sum(CAST(floor(-CAST(f.c AS DOUBLE) / t.n
                   * ln(CAST(f.c AS DOUBLE) / t.n) * 1.0e9 + 0.5)
                 AS BIGINT)) AS BIGINT) AS h_u,
             max(t.n) AS n
      FROM tokf f JOIN tokt t ON f.lang = t.lang GROUP BY f.lang
    ),
    chf AS (
      SELECT lang, ch, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT lang, unnest(string_split(text, '')) AS ch FROM documents
      ) WHERE ch != '' GROUP BY 1, 2
    ),
    cht AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM chf GROUP BY lang),
    hch AS (
      SELECT f.lang,
             CAST(sum(CAST(floor(-CAST(f.c AS DOUBLE) / t.n
                   * ln(CAST(f.c AS DOUBLE) / t.n) * 1.0e9 + 0.5)
                 AS BIGINT)) AS BIGINT) AS h_u,
             max(t.n) AS n
      FROM chf f JOIN cht t ON f.lang = t.lang GROUP BY f.lang
    )
    SELECT htok.lang,
           floor(CAST(htok.h_u AS DOUBLE) / 1.0e9 * 1.0e6 + 0.5) / 1.0e6
             AS token_entropy,
           floor(CAST(hch.h_u AS DOUBLE) / 1.0e9 * 1.0e6 + 0.5) / 1.0e6
             AS char_entropy,
           floor(CAST(hch.h_u AS DOUBLE) / CAST(htok.h_u AS DOUBLE) * 1.0e6
                 + 0.5) / 1.0e6 AS char_token_ratio
    FROM htok JOIN hch ON htok.lang = hch.lang
    ORDER BY htok.lang
"""


@_register("text_char_token_entropy_ratio", oracle=_CHARTOK_SQL)
def text_char_token_entropy_ratio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shannon entropy of the character stream vs the token stream per
    language: two bounded-alphabet rollups, per-symbol terms quantized
    at 1e-9."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr

    docs = _t(spark, sf_dir, "documents")

    def _h(sym_df, key):
        f = sym_df.groupBy("lang", key).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        t = f.groupBy("lang").agg(F.sum("c").cast("long").alias("n"))
        return (
            f.join(F.broadcast(t), "lang")
            .groupBy("lang")
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
                .alias("h_u")
            )
        )

    htok = _h(
        docs.select("lang", F.explode(words_expr(F.col("text"))).alias("t")),
        "t",
    ).select("lang", F.col("h_u").alias("ht_u"))
    hch = _h(
        docs.select(
            "lang", F.explode(F.split(F.col("text"), "")).alias("ch")
        ).filter(F.col("ch") != ""),
        "ch",
    ).select("lang", F.col("h_u").alias("hc_u"))
    q6 = lambda e: F.floor(e * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    return (
        htok.join(hch, "lang")
        .select(
            "lang",
            q6(F.col("ht_u").cast("double") / 1.0e9).alias("token_entropy"),
            q6(F.col("hc_u").cast("double") / 1.0e9).alias("char_entropy"),
            q6(F.col("hc_u").cast("double") / F.col("ht_u")).alias(
                "char_token_ratio"
            ),
        )
        .orderBy("lang")
    )


# ===========================================================================
# Wave F — oceanographic profile integrals on the shared synthetic
# profile substrate (the gsw_nsquared_profile convention: level rn per
# orderkey, depth = rn·10 m, sigma = 20 + qty·0.1 + rn·0.05;
# T = qty mod 30 degC, S = 30 + discount·50 PSU where T/S are needed).
# Reference parity anchors: Simpson & Hunter 1974 (potential-energy
# anomaly), the standard 0-100 m ocean heat content integral.
# ===========================================================================

# ---------------------------------------------------------------------------
# Potential-energy anomaly φ = (g/H)·Σ (ρ̄ − ρ(z))·z·Δz — the
# stratification energy (J/m³) a mixing event must supply; the water-
# column summary built on the same N² substrate.
# ---------------------------------------------------------------------------
_PEA_SQL = """
    WITH levels AS (
      SELECT l_orderkey, l_quantity,
             row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_quantity, l_extendedprice
             ) AS rn
      FROM lineitem
    ), prof AS (
      SELECT l_orderkey,
             CAST(rn * 10.0 AS DOUBLE) AS z,
             CAST(1000.0 + 20.0 + l_quantity * 0.1 + rn * 0.05 AS DOUBLE)
               AS rho
      FROM levels
    ), pstat AS (
      SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_levels,
             max(z) AS h, avg(rho) AS rho_bar
      FROM prof GROUP BY l_orderkey
    ), terms AS (
      SELECT p.l_orderkey, s.n_levels,
             CAST(floor((s.rho_bar - p.rho) * p.z * 10.0 * 1.0e6 + 0.5)
                  AS BIGINT) AS t_u,
             s.h
      FROM prof p JOIN pstat s ON p.l_orderkey = s.l_orderkey
    )
    SELECT l_orderkey, max(n_levels) AS n_levels,
           floor(9.80665 / max(h) * CAST(sum(t_u) AS DOUBLE) / 1.0e6 * 1.0e6
                 + 0.5) / 1.0e6 AS phi_j_per_m3
    FROM terms GROUP BY l_orderkey
"""


@_register("ios_potential_energy_anomaly", oracle=_PEA_SQL)
def ios_potential_energy_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson–Hunter potential-energy anomaly per profile: level
    numbering is the key-partitioned profile window, the column mean is
    one grouped aggregate broadcast back, per-level terms quantize at
    1e-6 before the profile sum."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"
    )
    levels = li.withColumn("rn", F.row_number().over(w))
    prof = levels.select(
        "l_orderkey",
        (F.col("rn") * 10.0).cast("double").alias("z"),
        (F.lit(1000.0 + 20.0) + F.col("l_quantity") * 0.1 + F.col("rn") * 0.05)
        .cast("double")
        .alias("rho"),
    )
    pstat = prof.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_levels"),
        F.max("z").alias("h"),
        F.avg("rho").alias("rho_bar"),
    )
    terms = prof.join(pstat, "l_orderkey").select(
        "l_orderkey",
        "n_levels",
        F.floor(
            (F.col("rho_bar") - F.col("rho")) * F.col("z") * 10.0 * 1.0e6
            + 0.5
        )
        .cast("long")
        .alias("t_u"),
        "h",
    )
    return terms.groupBy("l_orderkey").agg(
        F.max("n_levels").alias("n_levels"),
        (
            F.floor(
                F.lit(9.80665)
                / F.max("h")
                * F.sum("t_u").cast("double")
                / 1.0e6
                * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("phi_j_per_m3"),
    )


# ---------------------------------------------------------------------------
# T-S water-mass census: every observation classified into named T-S
# classes (the T-S diagram turned into a bounded rollup), with counts
# and share — the first chart an oceanographer draws from a cruise.
# ---------------------------------------------------------------------------
_WATERMASS_SQL = """
    WITH obs AS (
      SELECT CAST(l_quantity % 30 AS DOUBLE) AS t,
             CAST(30.0 + l_discount * 50 AS DOUBLE) AS s
      FROM lineitem
    ),
    classed AS (
      SELECT CASE
               WHEN t < 4 AND s >= 34 THEN 'deep'
               WHEN t < 10 AND s < 33 THEN 'subpolar_fresh'
               WHEN t < 10 THEN 'intermediate'
               WHEN t < 20 AND s >= 34 THEN 'central'
               WHEN t >= 20 AND s < 33 THEN 'tropical_fresh'
               ELSE 'surface'
             END AS water_mass,
             t, s
      FROM obs
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM obs)
    SELECT water_mass, CAST(count(*) AS BIGINT) AS n_obs,
           floor(CAST(count(*) AS DOUBLE) / max(tot.n) * 1.0e6 + 0.5) / 1.0e6
             AS share,
           floor(avg(t) * 1.0e4 + 0.5) / 1.0e4 AS mean_t,
           floor(avg(s) * 1.0e4 + 0.5) / 1.0e4 AS mean_s
    FROM classed CROSS JOIN tot
    GROUP BY water_mass ORDER BY water_mass
"""


@_register("ios_ts_watermass_census", oracle=_WATERMASS_SQL)
def ios_ts_watermass_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-mass census over the T-S plane: one bounded-alphabet
    rollup (6 named classes), shares against a 1-row broadcast total."""
    li = _t(spark, sf_dir, "lineitem")
    obs = li.select(
        (F.col("l_quantity") % 30).cast("double").alias("t"),
        (F.lit(30.0) + F.col("l_discount") * 50).cast("double").alias("s"),
    )
    wm = (
        F.when((F.col("t") < 4) & (F.col("s") >= 34), "deep")
        .when((F.col("t") < 10) & (F.col("s") < 33), "subpolar_fresh")
        .when(F.col("t") < 10, "intermediate")
        .when((F.col("t") < 20) & (F.col("s") >= 34), "central")
        .when((F.col("t") >= 20) & (F.col("s") < 33), "tropical_fresh")
        .otherwise("surface")
    )
    classed = obs.select(wm.alias("water_mass"), "t", "s")
    tot = obs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    q4 = lambda e: F.floor(e * 1.0e4 + 0.5) / 1.0e4  # noqa: E731
    return (
        classed.crossJoin(F.broadcast(tot))
        .groupBy("water_mass")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            (
                F.floor(
                    F.count(F.lit(1)).cast("double") / F.max("n") * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("share"),
            q4(F.avg("t")).alias("mean_t"),
            q4(F.avg("s")).alias("mean_s"),
        )
        .orderBy("water_mass")
    )


# ---------------------------------------------------------------------------
# Upper-column heat content per profile: OHC = ρ0·cp0·Σ T_i·Δz over
# the top 100 m (10 uniform levels), reported in MJ/m².
# ---------------------------------------------------------------------------
_OHC_SQL = """
    WITH levels AS (
      SELECT l_orderkey, l_quantity,
             row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_quantity, l_extendedprice
             ) AS rn
      FROM lineitem
    ), prof AS (
      SELECT l_orderkey,
             CAST(l_quantity % 30 AS DOUBLE) AS t
      FROM levels WHERE rn * 10.0 <= 100.0
    )
    SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_levels,
           floor(CAST(1025.0 AS DOUBLE) * 3991.86795711963e0 / 1.0e6
                 * CAST(sum(CAST(floor(t * 10.0 * 1.0e6 + 0.5) AS BIGINT))
                        AS DOUBLE) / 1.0e6 * 1.0e4 + 0.5) / 1.0e4
             AS ohc_mj_per_m2
    FROM prof GROUP BY l_orderkey
"""


@_register("ios_profile_heat_content", oracle=_OHC_SQL)
def ios_profile_heat_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """0-100 m heat content per profile (ρ0 = 1025, cp0 = TEOS-10's
    3991.86795711963 J/(kg·K)): per-level T·Δz terms quantize at 1e-6
    before the profile sum."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"
    )
    levels = li.withColumn("rn", F.row_number().over(w))
    prof = levels.filter(F.col("rn") * 10.0 <= 100.0).select(
        "l_orderkey", (F.col("l_quantity") % 30).cast("double").alias("t")
    )
    return prof.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_levels"),
        (
            F.floor(
                F.lit(1025.0 * 3991.86795711963 / 1.0e6)
                * F.sum(
                    F.floor(F.col("t") * 10.0 * 1.0e6 + 0.5).cast("long")
                ).cast("double")
                / 1.0e6
                * 1.0e4
                + 0.5
            )
            / 1.0e4
        ).alias("ohc_mj_per_m2"),
    )


# ===========================================================================
# Wave G — training-pipeline ops & audits.
# ===========================================================================

# ---------------------------------------------------------------------------
# Curriculum buckets: documents ordered by quality score into 4 stages
# (easy→hard curriculum), token budget and mean quality per stage.
# The global ordering is ntile_two_pass — no single-task sort at any
# corpus size.
# ---------------------------------------------------------------------------
_CURRICULUM_SQL = """
    WITH q AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(floor(
               (len(list_filter(string_split(text, ' '), t -> strlen(t) >= 5))
                * 1.0 / len(string_split(text, ' ')))
               * 1.0e6 + 0.5) AS BIGINT) AS q_u
      FROM documents
    ),
    tiled AS (
      SELECT doc_id, n_tok, q_u,
             CAST(ntile(4) OVER (ORDER BY q_u ASC, doc_id ASC) AS BIGINT)
               AS stage
      FROM q
    )
    SELECT stage, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS stage_tokens,
           floor(CAST(sum(q_u) AS DOUBLE) / count(*) + 0.5) / 1.0e6
             AS mean_quality
    FROM tiled GROUP BY stage ORDER BY stage
"""


@_register("pack_curriculum_quality_buckets", oracle=_CURRICULUM_SQL)
def pack_curriculum_quality_buckets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """4-stage quality curriculum: the long-word-ratio quality proxy
    quantized to integer micro-units, global ntile from ntile_two_pass
    (range-bucketed — the scale-safe ORDER BY), per-stage token budget."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr
    from cioos_siooc_data_transform_spark.operators.windows import (
        ntile_two_pass,
    )

    docs = _t(spark, sf_dir, "documents")
    words = words_expr(F.col("text"))
    long_ratio = F.size(
        F.filter(words, lambda t: F.length(t) >= 5)
    ) * 1.0 / F.size(words)
    q = docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_tok"),
        F.floor(long_ratio * 1.0e6 + 0.5).cast("long").alias("q_u"),
    )
    tiled = ntile_two_pass(q, "q_u", "doc_id", n_tiles=4, out_col="stage")
    return (
        tiled.groupBy("stage")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("stage_tokens"),
            (
                F.floor(F.sum("q_u").cast("double") / F.count(F.lit(1)) + 0.5)
                / 1.0e6
            ).alias("mean_quality"),
        )
        .orderBy("stage")
    )


# ---------------------------------------------------------------------------
# Two-proportion power audit: is the URGENT-vs-LOW order-fulfilment
# comparison POWERED at the current sample sizes? Closed-form normal
# approximation (z_{0.975} = 1.959964, z_{0.80} = 0.841621) — the
# pre-experiment sanity check run straight from the warehouse.
# ---------------------------------------------------------------------------
_POWER_SQL = """
    WITH g AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'a' ELSE 'b' END
               AS grp,
             CAST(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS BIGINT)
               AS conv
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    s AS (
      SELECT max(n) FILTER (grp = 'a') AS n1,
             max(n) FILTER (grp = 'b') AS n2,
             max(c) FILTER (grp = 'a') AS c1,
             max(c) FILTER (grp = 'b') AS c2
      FROM (
        SELECT grp, CAST(count(*) AS BIGINT) AS n, CAST(sum(conv) AS BIGINT) AS c
        FROM g GROUP BY grp
      )
    )
    SELECT n1, n2,
           floor(CAST(c1 AS DOUBLE) / n1 * 1.0e6 + 0.5) / 1.0e6 AS p1,
           floor(CAST(c2 AS DOUBLE) / n2 * 1.0e6 + 0.5) / 1.0e6 AS p2,
           floor(abs(CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2)
                 * 1.0e6 + 0.5) / 1.0e6 AS observed_diff,
           floor((1.959964 + 0.841621)
                 * sqrt((CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
                        * (1.0 - CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
                        * (1.0 / n1 + 1.0 / n2)) * 1.0e6 + 0.5) / 1.0e6
             AS mde_80,
           CAST(abs(CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2)
                >= (1.959964 + 0.841621)
                   * sqrt((CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
                          * (1.0 - CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
                          * (1.0 / n1 + 1.0 / n2)) AS BOOLEAN) AS is_powered
    FROM s
"""


@_register("sample_two_proportion_power", oracle=_POWER_SQL)
def sample_two_proportion_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect at 80% power / 5% alpha for the
    URGENT-vs-LOW fulfilment-rate comparison: one bounded group-by,
    closed-form normal approximation, exact integer counts."""
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    g = orders.select(
        F.when(F.col("o_orderpriority") == "1-URGENT", "a")
        .otherwise("b")
        .alias("grp"),
        F.when(F.col("o_orderstatus") == "F", 1)
        .otherwise(0)
        .cast("long")
        .alias("conv"),
    )
    gg = g.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("c"),
    )
    pick = lambda col, grp: F.max(  # noqa: E731
        F.when(F.col("grp") == grp, F.col(col))
    )
    s = gg.agg(
        pick("n", "a").alias("n1"),
        pick("n", "b").alias("n2"),
        pick("c", "a").alias("c1"),
        pick("c", "b").alias("c2"),
    )
    p1 = F.col("c1").cast("double") / F.col("n1")
    p2 = F.col("c2").cast("double") / F.col("n2")
    pbar = (F.col("c1") + F.col("c2")).cast("double") / (
        F.col("n1") + F.col("n2")
    )
    mde = (1.959964 + 0.841621) * F.sqrt(
        pbar * (1.0 - pbar) * (1.0 / F.col("n1") + 1.0 / F.col("n2"))
    )
    q6 = lambda e: F.floor(e * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    return s.select(
        "n1",
        "n2",
        q6(p1).alias("p1"),
        q6(p2).alias("p2"),
        q6(F.abs(p1 - p2)).alias("observed_diff"),
        q6(mde).alias("mde_80"),
        (F.abs(p1 - p2) >= mde).alias("is_powered"),
    )


# ---------------------------------------------------------------------------
# Weekly value-Gini: per ISO week, the Gini of per-user event value —
# concentration drift week over week. Ranks come from the GROUPED
# two-pass operator (group_cols=['wk']), the form that splits a hot
# week across bounded bucket windows.
# ---------------------------------------------------------------------------
_WGINI_SQL = """
    WITH rev AS (
      SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk, user_id,
             CAST(sum(CAST(floor(value * 1.0e6 + 0.5) AS BIGINT)) AS BIGINT)
               AS vq
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT wk, vq,
             CAST(row_number() OVER (PARTITION BY wk ORDER BY vq, user_id)
                  AS BIGINT) AS i
      FROM rev
    ),
    s AS (
      SELECT wk, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(vq) AS HUGEINT) AS total,
             CAST(sum(CAST(i AS HUGEINT) * vq) AS HUGEINT) AS weighted
      FROM ranked GROUP BY wk
    )
    SELECT wk AS week_start, n AS n_users,
           floor((2.0 * CAST(weighted AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE))
                  - (CAST(n AS DOUBLE) + 1.0) / n) * 1.0e6 + 0.5) / 1.0e6
             AS gini
    FROM s ORDER BY wk
"""


@_register("events_weekly_value_gini", oracle=_WGINI_SQL)
def events_weekly_value_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly Gini of per-user value: grouped ranked_cumsum_two_pass
    ranks within each week (hot weeks split across bounded bucket
    windows), exact integer weighted sums, one division per week."""
    from cioos_siooc_data_transform_spark.operators.windows import (
        ranked_cumsum_two_pass,
    )

    ev = _t(spark, sf_dir, "events")
    rev = ev.groupBy(
        F.date_trunc("week", F.col("ts")).alias("wk"), "user_id"
    ).agg(
        F.sum(F.floor(F.col("value") * 1.0e6 + 0.5).cast("long"))
        .cast("long")
        .alias("vq")
    )
    ranked = ranked_cumsum_two_pass(
        rev, "vq", "user_id", group_cols=["wk"], ascending=True,
        out_rank="i", out_cum="__cum",
    ).select("wk", "vq", F.col("i").cast("long").alias("i"))
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    s = ranked.groupBy("wk").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("vq").cast("decimal(38,0)").alias("total"),
        F.sum(dec("i") * dec("vq")).cast("decimal(38,0)").alias("weighted"),
    )
    nd = F.col("n").cast("double")
    return (
        s.select(
            F.col("wk").alias("week_start"),
            F.col("n").alias("n_users"),
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
            ).alias("gini"),
        )
        .orderBy("week_start")
    )


# ---------------------------------------------------------------------------
# Truncation-loss sweep: token loss when packing documents into
# fixed chunks that DROP the final partial chunk, at chunk sizes
# 32/64/128 — the size-selection curve next to the registered
# single-size truncation audit.
# ---------------------------------------------------------------------------
_TRUNC_SQL = """
    WITH lens AS (
      SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents
    ),
    sizes AS (SELECT unnest([32, 64, 128]) AS c),
    s AS (
      SELECT c, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n) AS BIGINT) AS total_tokens,
             CAST(sum(CAST(floor(n / c) AS BIGINT) * c) AS BIGINT)
               AS kept_tokens,
             CAST(sum(CASE WHEN n < c THEN 1 ELSE 0 END) AS BIGINT)
               AS fully_dropped_docs
      FROM lens CROSS JOIN sizes GROUP BY c
    )
    SELECT c AS chunk_tokens, n_docs, total_tokens, kept_tokens,
           fully_dropped_docs,
           floor((1.0 - CAST(kept_tokens AS DOUBLE) / total_tokens) * 1.0e6
                 + 0.5) / 1.0e6 AS loss_rate
    FROM s ORDER BY c
"""


@_register("pack_truncation_loss_sweep", oracle=_TRUNC_SQL)
def pack_truncation_loss_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-chunks-only packing loss at three chunk sizes from one
    length projection crossed with a 3-row broadcast size table."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr

    docs = _t(spark, sf_dir, "documents")
    lens = docs.select(F.size(words_expr(F.col("text"))).cast("long").alias("n"))
    sizes = spark.createDataFrame([(32,), (64,), (128,)], "c int").select(
        F.col("c").cast("long").alias("c")
    )
    s = (
        lens.crossJoin(F.broadcast(sizes))
        .groupBy("c")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n").cast("long").alias("total_tokens"),
            F.sum(F.floor(F.col("n") / F.col("c")).cast("long") * F.col("c"))
            .cast("long")
            .alias("kept_tokens"),
            F.sum(F.when(F.col("n") < F.col("c"), 1).otherwise(0))
            .cast("long")
            .alias("fully_dropped_docs"),
        )
    )
    return (
        s.select(
            F.col("c").alias("chunk_tokens"),
            "n_docs",
            "total_tokens",
            "kept_tokens",
            "fully_dropped_docs",
            (
                F.floor(
                    (
                        1.0
                        - F.col("kept_tokens").cast("double")
                        / F.col("total_tokens")
                    )
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            ).alias("loss_rate"),
        )
        .orderBy("chunk_tokens")
    )


# ---------------------------------------------------------------------------
# Multimodal metadata consistency: the fake-decoder contract says
# width = bytes%64+16, height = bytes%48+16 — a corrupted payload or a
# drifted decoder breaks the relation. The audit recomputes the
# expected dims from payload size and counts mismatches per source
# (here 0 by construction — the shape is the product; in production
# the decode side comes from the codec).
# ---------------------------------------------------------------------------
_MMC_SQL = """
    WITH media AS (
      SELECT doc_id, source, CAST(strlen(text) AS BIGINT) AS n_bytes,
             CAST((strlen(text) % 64) + 16 AS BIGINT) AS width,
             CAST((strlen(text) % 48) + 16 AS BIGINT) AS height
      FROM documents
    ),
    checked AS (
      SELECT source,
             CAST(CASE WHEN width = (n_bytes % 64) + 16
                        AND height = (n_bytes % 48) + 16
                   THEN 0 ELSE 1 END AS BIGINT) AS bad,
             CAST(width * height AS BIGINT) AS n_pixels
      FROM media
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_media,
           CAST(sum(bad) AS BIGINT) AS n_inconsistent,
           CAST(sum(n_pixels) AS BIGINT) AS total_pixels,
           CAST(floor(CAST(sum(n_pixels) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS mean_pixels
    FROM checked GROUP BY source ORDER BY source
"""


@_register("multimodal_metadata_consistency", oracle=_MMC_SQL)
def multimodal_metadata_consistency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Payload-vs-metadata consistency per source over the binary
    payload substrate: recomputed dims compared against the decoder's
    metadata columns, one bounded rollup."""
    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        "source",
        F.octet_length("text").cast("long").alias("n_bytes"),
        ((F.octet_length("text") % 64) + 16).cast("long").alias("width"),
        ((F.octet_length("text") % 48) + 16).cast("long").alias("height"),
    )
    checked = media.select(
        "source",
        F.when(
            (F.col("width") == (F.col("n_bytes") % 64) + 16)
            & (F.col("height") == (F.col("n_bytes") % 48) + 16),
            0,
        )
        .otherwise(1)
        .cast("long")
        .alias("bad"),
        (F.col("width") * F.col("height")).cast("long").alias("n_pixels"),
    )
    return (
        checked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_media"),
            F.sum("bad").cast("long").alias("n_inconsistent"),
            F.sum("n_pixels").cast("long").alias("total_pixels"),
            F.floor(
                F.sum("n_pixels").cast("double") / F.count(F.lit(1)) + 0.5
            ).alias("mean_pixels"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Lexicon polarity by source: broadcast positive/negative word lists
# (rule-based weak labeling — the cheap first-pass label a training
# pipeline bootstraps from), polarity = (p − n)/(p + n).
# ---------------------------------------------------------------------------
_POS_WORDS = ("fast", "small")
_NEG_WORDS = ("slow", "big", "error")
_POLARITY_SQL = f"""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    s AS (
      SELECT source,
             CAST(sum(CASE WHEN t IN ({", ".join(f"'{w}'" for w in _POS_WORDS)})
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             CAST(sum(CASE WHEN t IN ({", ".join(f"'{w}'" for w in _NEG_WORDS)})
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
      FROM tok GROUP BY source
    )
    SELECT source, n_pos, n_neg,
           CASE WHEN n_pos + n_neg = 0 THEN NULL
                ELSE floor(CAST(n_pos - n_neg AS DOUBLE) / (n_pos + n_neg)
                           * 1.0e6 + 0.5) / 1.0e6
           END AS polarity
    FROM s ORDER BY source
"""


@_register("doc_lexicon_polarity_by_source", oracle=_POLARITY_SQL)
def doc_lexicon_polarity_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weak-label polarity per source from broadcast lexicon literals:
    one tokenize pass, conditional sums, one bounded rollup."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(words_expr(F.col("text"))).alias("t"))
    s = tok.groupBy("source").agg(
        F.sum(F.when(F.col("t").isin(*_POS_WORDS), 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
        F.sum(F.when(F.col("t").isin(*_NEG_WORDS), 1).otherwise(0))
        .cast("long")
        .alias("n_neg"),
    )
    return (
        s.select(
            "source",
            "n_pos",
            "n_neg",
            F.when(
                (F.col("n_pos") + F.col("n_neg")) == 0, F.lit(None)
            )
            .otherwise(
                F.floor(
                    (F.col("n_pos") - F.col("n_neg")).cast("double")
                    / (F.col("n_pos") + F.col("n_neg"))
                    * 1.0e6
                    + 0.5
                )
                / 1.0e6
            )
            .alias("polarity"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Price statistics by quantity decile: deciles of l_quantity via
# ntile_two_pass over a unique composite row key, then exact integer
# price stats per decile — the binned-trend audit (does unit economics
# shift with order size?).
# ---------------------------------------------------------------------------
_QTY_DECILE_SQL = """
    WITH rows_ AS (
      SELECT CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS qq,
             l_orderkey * 10 + l_linenumber AS rk,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS price_c
      FROM lineitem
    ),
    tiled AS (
      SELECT price_c,
             CAST(ntile(10) OVER (ORDER BY qq ASC, rk ASC) AS BIGINT)
               AS decile
      FROM rows_
    )
    SELECT decile, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(price_c) AS BIGINT) AS min_price_cents,
           CAST(max(price_c) AS BIGINT) AS max_price_cents,
           CAST(floor(CAST(sum(price_c) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
             AS mean_price_cents
    FROM tiled GROUP BY decile ORDER BY decile
"""


@_register("lineitem_price_by_qty_decile", oracle=_QTY_DECILE_SQL)
def lineitem_price_by_qty_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity deciles (ntile_two_pass over integer centi-units
    with a unique composite tiebreak) and integer price stats per
    decile."""
    from cioos_siooc_data_transform_spark.operators.windows import (
        ntile_two_pass,
    )

    li = _t(spark, sf_dir, "lineitem")
    rows = li.select(
        F.floor(F.col("l_quantity") * 100.0 + 0.5).cast("long").alias("qq"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("long")
        .alias("rk"),
        F.floor(F.col("l_extendedprice") * 100.0 + 0.5)
        .cast("long")
        .alias("price_c"),
    )
    tiled = ntile_two_pass(rows, "qq", "rk", n_tiles=10, out_col="decile")
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("price_c").cast("long").alias("min_price_cents"),
            F.max("price_c").cast("long").alias("max_price_cents"),
            F.floor(
                F.sum("price_c").cast("double") / F.count(F.lit(1)) + 0.5
            ).alias("mean_price_cents"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Language-ID confusability margin by source: hits against the four
# broadcast stopword lists (the registered text_langid scoring), margin
# = top1 − top2 hit counts; low-margin docs are the routing risk.
# ---------------------------------------------------------------------------
def _margin_oracle() -> str:
    from cioos_siooc_data_transform_spark.operators.text import LANG_STOPWORDS

    def lst(lang):
        return "[" + ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang]) + "]"

    return f"""
    WITH w AS (
      SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS dw
      FROM documents
    ),
    h AS (
      SELECT doc_id, source,
             [CAST(len(list_intersect(dw, {lst("en")})) AS BIGINT),
              CAST(len(list_intersect(dw, {lst("es")})) AS BIGINT),
              CAST(len(list_intersect(dw, {lst("fr")})) AS BIGINT),
              CAST(len(list_intersect(dw, {lst("de")})) AS BIGINT)] AS hits
      FROM w
    ),
    m AS (
      SELECT source,
             list_sort(hits)[4] - list_sort(hits)[3] AS margin
      FROM h
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           floor(CAST(sum(margin) AS DOUBLE) / count(*) * 1.0e6 + 0.5) / 1.0e6
             AS mean_margin,
           floor(CAST(sum(CASE WHEN margin = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) * 1.0e6 + 0.5) / 1.0e6 AS ambiguous_share
    FROM m GROUP BY source ORDER BY source
    """


@_register("doc_langid_margin_by_source", oracle="__MARGIN__")
def doc_langid_margin_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit margin (top1 − top2 of the 4 language scores) per
    source: row-local intersections against broadcast literals, sorted
    4-element array — margin 0 means the router is guessing."""
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr
    from cioos_siooc_data_transform_spark.operators.text import LANG_STOPWORDS

    docs = _t(spark, sf_dir, "documents")
    dw = F.array_distinct(words_expr(F.col("text")))
    hits = F.array(
        *[
            F.size(
                F.array_intersect(
                    dw, F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
                )
            ).cast("long")
            for lang in ("en", "es", "fr", "de")
        ]
    )
    srt = F.array_sort(hits)
    m = docs.select(
        "source",
        (F.element_at(srt, 4) - F.element_at(srt, 3)).alias("margin"),
    )
    q6 = lambda e: F.floor(e * 1.0e6 + 0.5) / 1.0e6  # noqa: E731
    return (
        m.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            q6(F.sum("margin").cast("double") / F.count(F.lit(1))).alias(
                "mean_margin"
            ),
            q6(
                F.sum(F.when(F.col("margin") == 0, 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("ambiguous_share"),
        )
        .orderBy("source")
    )


STAGED_ORACLES["doc_langid_margin_by_source"] = _margin_oracle()


# ---------------------------------------------------------------------------
# Sourcing-depth price spread: parts grouped by how many distinct
# suppliers ship them; deeper sourcing should compress the price
# spread — the multi-sourcing audit.
# ---------------------------------------------------------------------------
_SOURCING_SQL = """
    WITH per_part AS (
      SELECT l_partkey,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
             CAST(max(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                  - min(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS spread_c
      FROM lineitem GROUP BY l_partkey
    )
    SELECT n_supp AS sourcing_depth, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(floor(CAST(sum(spread_c) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
             AS mean_spread_cents,
           CAST(max(spread_c) AS BIGINT) AS max_spread_cents
    FROM per_part GROUP BY n_supp ORDER BY n_supp
"""


@_register("part_sourcing_depth_price_spread", oracle=_SOURCING_SQL)
def part_sourcing_depth_price_spread(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Price spread per sourcing depth: one part-keyed rollup (distinct
    suppliers + integer price spread), one bounded depth rollup."""
    li = _t(spark, sf_dir, "lineitem")
    pc = F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
    per_part = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").cast("long").alias("n_supp"),
        (F.max(pc) - F.min(pc)).cast("long").alias("spread_c"),
    )
    return (
        per_part.groupBy(F.col("n_supp").alias("sourcing_depth"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.floor(
                F.sum("spread_c").cast("double") / F.count(F.lit(1)) + 0.5
            ).alias("mean_spread_cents"),
            F.max("spread_c").cast("long").alias("max_spread_cents"),
        )
        .orderBy("sourcing_depth")
    )
