"""STAGED round-12 queries — NOT registered (round-12 runway seed).

Same contract as staged_r5..r11: LOCAL registry, strict-harness pytest
coverage in tests/test_staged_r12.py, idempotent ``activate()``.
Activation order: staged_r8 (round 8) -> ... -> staged_r11 (round 11)
-> this module (round 12). Budget: len(STAGED_QUERIES) +
len(STAGED_REPLACEMENTS) <= 50 fresh names at activation.

Content so far:
- Wave A — GSW CT-derivative tranche via symbolic differentiation of
  the ct_from_pt polynomial (functions/symdiff.py): CT first/second
  derivatives, pt first derivatives (implicit inverse), entropy first
  derivatives wrt (SA, CT) by the chain rule.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.plans.staged_r11 import _stage_sql_cte
from cioos_siooc_data_transform_spark.session import read_table as _t

STAGED_QUERIES: dict[str, Callable[..., Any]] = {}
STAGED_ORACLES: dict[str, str] = {}
#: name -> (fn, oracle) for queries REPLACING a live registry entry.
STAGED_REPLACEMENTS: dict[str, tuple[Callable[..., Any], str]] = {}


def _register(name: str, oracle: str):
    def deco(fn):
        STAGED_QUERIES[name] = fn
        STAGED_ORACLES[name] = oracle
        return fn

    return deco


def activate() -> int:
    """Round-12 activation (idempotent): new names register once;
    replacements overwrite unconditionally."""
    from cioos_siooc_data_transform_spark.plans.registry import ORACLES, QUERIES

    n = 0
    for name, fn in STAGED_QUERIES.items():
        if name not in QUERIES:
            QUERIES[name] = fn
            ORACLES[name] = STAGED_ORACLES[name]
            n += 1
    for name, (fn, oracle) in STAGED_REPLACEMENTS.items():
        if QUERIES.get(name) is not fn:
            QUERIES[name] = fn
            ORACLES[name] = oracle
            n += 1
    return n


# ===========================================================================
# Wave A — GSW CT-derivative tranche (symbolic differentiation of the
# ct_from_pt polynomial; FD-pinned in tests). Inputs are the standard
# (SA = s·SSO/35, pt = t) synthetic grid; p-derivative surfaces use the
# entropy chain at p = 0. All per-row whole-stage-codegen expressions.
# ===========================================================================
def _ctd_inner() -> str:
    from cioos_siooc_data_transform_spark.plans.staged_r5 import (
        _IN_SQL,
        _SA_SQL,
    )

    return f"""
      SELECT l_orderkey, l_linenumber, {_SA_SQL} AS sa, t AS pt
      FROM ({_IN_SQL})
    """


def _ctd_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cioos_siooc_data_transform_spark.plans.staged_r5 import (
        _SA_SQL,
        _inputs,
    )

    return _inputs(spark, sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        F.expr(_SA_SQL).alias("sa"),
        F.col("t").alias("pt"),
    )


def _ct_first_oracle() -> str:
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_derivative_sql,
    )

    return f"""
    SELECT l_orderkey, l_linenumber,
           floor({ct_derivative_sql("sa", "pt", 1, 0)} * 1.0e9 + 0.5) / 1.0e9
             AS ct_sa,
           floor({ct_derivative_sql("sa", "pt", 0, 1)} * 1.0e9 + 0.5) / 1.0e9
             AS ct_pt
    FROM ({_ctd_inner()})
    """


@_register("gsw_ct_first_derivatives", oracle="__WAVE_A12A__")
def gsw_ct_first_derivatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """∂CT/∂SA and ∂CT/∂pt of the conservative-temperature polynomial
    (GSW twin: gsw_CT_first_derivatives) — the Jacobian every
    (SA, pt) <-> (SA, CT) coordinate change uses — as SYMBOLIC
    derivatives of the shipped ct_from_pt fit (functions/symdiff.py;
    FD-pinned in tests/test_oceanography_checkvalues.py). One shared
    literal tree per column, zero shuffle."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_derivative_sql,
    )

    df = _ctd_inputs(spark, sf_dir)
    return df.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.floor(F.expr(ct_derivative_sql("sa", "pt", 1, 0)) * 1.0e9 + 0.5)
            / 1.0e9
        ).alias("ct_sa"),
        (
            F.floor(F.expr(ct_derivative_sql("sa", "pt", 0, 1)) * 1.0e9 + 0.5)
            / 1.0e9
        ).alias("ct_pt"),
    )


STAGED_ORACLES["gsw_ct_first_derivatives"] = _ct_first_oracle()


def _ct_second_oracle() -> str:
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_derivative_sql,
    )

    return f"""
    SELECT l_orderkey, l_linenumber,
           floor({ct_derivative_sql("sa", "pt", 2, 0)} * 1.0e12 + 0.5)
             / 1.0e12 AS ct_sa_sa,
           floor({ct_derivative_sql("sa", "pt", 1, 1)} * 1.0e12 + 0.5)
             / 1.0e12 AS ct_sa_pt,
           floor({ct_derivative_sql("sa", "pt", 0, 2)} * 1.0e12 + 0.5)
             / 1.0e12 AS ct_pt_pt
    FROM ({_ctd_inner()})
    """


@_register("gsw_ct_second_derivatives", oracle="__WAVE_A12B__")
def gsw_ct_second_derivatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second derivatives CT_SA_SA, CT_SA_pt, CT_pt_pt (GSW twin:
    gsw_CT_second_derivatives) — the curvature of the CT(SA, pt)
    surface that second-order water-mass transformations consume —
    by differentiating the symbolic first derivatives AGAIN (the
    differentiator composes). FD-pinned; per-row math only."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_derivative_sql,
    )

    df = _ctd_inputs(spark, sf_dir)
    return df.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.floor(F.expr(ct_derivative_sql("sa", "pt", 2, 0)) * 1.0e12 + 0.5)
            / 1.0e12
        ).alias("ct_sa_sa"),
        (
            F.floor(F.expr(ct_derivative_sql("sa", "pt", 1, 1)) * 1.0e12 + 0.5)
            / 1.0e12
        ).alias("ct_sa_pt"),
        (
            F.floor(F.expr(ct_derivative_sql("sa", "pt", 0, 2)) * 1.0e12 + 0.5)
            / 1.0e12
        ).alias("ct_pt_pt"),
    )


STAGED_ORACLES["gsw_ct_second_derivatives"] = _ct_second_oracle()


def _pt_first_oracle() -> str:
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_derivative_sql,
    )

    ct_sa = ct_derivative_sql("sa", "pt", 1, 0)
    ct_pt = ct_derivative_sql("sa", "pt", 0, 1)
    return f"""
    SELECT l_orderkey, l_linenumber,
           floor((-({ct_sa}) / ({ct_pt})) * 1.0e9 + 0.5) / 1.0e9 AS pt_sa,
           floor((1.0e0 / ({ct_pt})) * 1.0e9 + 0.5) / 1.0e9 AS pt_ct
    FROM ({_ctd_inner()})
    """


@_register("gsw_pt_first_derivatives", oracle="__WAVE_A12C__")
def gsw_pt_first_derivatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """∂pt/∂SA at constant CT and ∂pt/∂CT (GSW twin:
    gsw_pt_first_derivatives) via the implicit inverse of the CT
    surface: pt_CT = 1/CT_pt and pt_SA = −CT_SA/CT_pt, both from the
    symbolic Jacobian — no Newton iteration needed for the DERIVATIVES
    even though pt(SA, CT) itself requires one. Evaluated on the
    (SA, pt) grid, i.e. at CT = ct_from_pt(SA, pt) (the roundtrip
    contract of the inversion family)."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_derivative_sql,
    )

    df = _ctd_inputs(spark, sf_dir)
    ct_sa = F.expr(ct_derivative_sql("sa", "pt", 1, 0))
    ct_pt = F.expr(ct_derivative_sql("sa", "pt", 0, 1))
    return df.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(-ct_sa / ct_pt * 1.0e9 + 0.5) / 1.0e9).alias("pt_sa"),
        (F.floor(F.lit(1.0) / ct_pt * 1.0e9 + 0.5) / 1.0e9).alias("pt_ct"),
    )


STAGED_ORACLES["gsw_pt_first_derivatives"] = _pt_first_oracle()


def _eta_first_oracle() -> str:
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_derivative_sql,
        entropy_sa_derivative_sql,
        entropy_t_derivative_sql,
    )

    eta_t = entropy_t_derivative_sql("sa", "pt", "0.0e0")
    eta_sa = entropy_sa_derivative_sql("sa", "pt", "0.0e0")
    ct_sa = ct_derivative_sql("sa", "pt", 1, 0)
    ct_pt = ct_derivative_sql("sa", "pt", 0, 1)
    return f"""
    SELECT l_orderkey, l_linenumber,
           floor((({eta_sa}) - ({eta_t}) * ({ct_sa}) / ({ct_pt}))
                 * 1.0e9 + 0.5) / 1.0e9 AS eta_sa_at_ct,
           floor((({eta_t}) / ({ct_pt})) * 1.0e9 + 0.5) / 1.0e9 AS eta_ct
    FROM ({_ctd_inner()})
    """


@_register("gsw_entropy_first_derivatives", oracle="__WAVE_A12D__")
def gsw_entropy_first_derivatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """∂η/∂SA at constant CT and ∂η/∂CT (GSW twin:
    gsw_entropy_first_derivatives) by the chain rule through the CT
    Jacobian: η_CT = η_pt/CT_pt and η_SA|CT = η_SA|pt −
    η_pt·CT_SA/CT_pt, every factor a symbolic derivative of a shipped
    polynomial (entropy at p = 0, ct_from_pt) — the composition that
    closes the (SA, CT) thermodynamic gradient surface without any
    hand-derived table. FD-pinned via its factors; zero shuffle."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_derivative_sql,
        entropy_sa_derivative_sql,
        entropy_t_derivative_sql,
    )

    df = _ctd_inputs(spark, sf_dir)
    eta_t = F.expr(entropy_t_derivative_sql("sa", "pt", "0.0e0"))
    eta_sa = F.expr(entropy_sa_derivative_sql("sa", "pt", "0.0e0"))
    ct_sa = F.expr(ct_derivative_sql("sa", "pt", 1, 0))
    ct_pt = F.expr(ct_derivative_sql("sa", "pt", 0, 1))
    return df.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.floor((eta_sa - eta_t * ct_sa / ct_pt) * 1.0e9 + 0.5) / 1.0e9
        ).alias("eta_sa_at_ct"),
        (F.floor(eta_t / ct_pt * 1.0e9 + 0.5) / 1.0e9).alias("eta_ct"),
    )


STAGED_ORACLES["gsw_entropy_first_derivatives"] = _eta_first_oracle()


# ===========================================================================
# Wave B — robust trend / spectrum / variance-components statistics.
# ===========================================================================
@_register(
    "orders_theil_sen_trend",
    oracle="""
    WITH m AS (
      SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS ym,
             CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ),
    p AS (
      SELECT CAST(floor(CAST(b.rev - a.rev AS DOUBLE)
                        / CAST(b.ym - a.ym AS DOUBLE) + 0.5) AS BIGINT)
               AS slope
      FROM m a JOIN m b ON a.ym < b.ym
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(quantile_cont(slope * 2, 0.5) AS BIGINT) AS med2
      FROM p
    ),
    nm AS (SELECT CAST(count(*) AS BIGINT) AS n_months FROM m)
    SELECT n_months, n_pairs,
           floor(CAST(med2 AS DOUBLE) / 2.0e0 / 100.0e0 * 1.0e2 + 0.5)
             / 1.0e2 AS theil_sen_dollars_per_month
    FROM s, nm
    """,
)
def orders_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen slope of monthly revenue: the median of all pairwise
    month-to-month slopes — the robust trend estimator with a 29.3%
    breakdown point, immune to the holiday spikes that drag OLS.
    Pairwise slopes run over the calendar-bounded month table (~3e3
    pairs per decade — quadratic in MONTHS, not rows); each slope is
    floored to integer cents/month so the doubled-integer median is
    exact on both engines."""
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("ym")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long"))
        .cast("long")
        .alias("rev")
    )
    a = m.select(F.col("ym").alias("ym_a"), F.col("rev").alias("rev_a"))
    b = m.select(F.col("ym").alias("ym_b"), F.col("rev").alias("rev_b"))
    p = a.join(b, F.col("ym_a") < F.col("ym_b")).select(
        F.floor(
            (F.col("rev_b") - F.col("rev_a")).cast("double")
            / (F.col("ym_b") - F.col("ym_a")).cast("double")
            + 0.5
        )
        .cast("long")
        .alias("slope")
    )
    s = p.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr("CAST(percentile(slope * 2, 0.5) AS BIGINT)").alias("med2"),
    )
    nm = m.agg(F.count(F.lit(1)).cast("long").alias("n_months"))
    return nm.crossJoin(F.broadcast(s)).select(
        "n_months",
        "n_pairs",
        (
            F.floor(
                F.col("med2").cast("double") / 2.0 / 100.0 * 1.0e2 + 0.5
            )
            / 1.0e2
        ).alias("theil_sen_dollars_per_month"),
    )


@_register(
    "events_spectral_flatness",
    oracle="""
    WITH d AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400
               - (SELECT min(CAST(floor(epoch(ts)) AS BIGINT) // 86400)
                  FROM events) AS k,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n_days FROM d),
    fr AS (SELECT unnest(generate_series(1, 10)) AS f),
    terms AS (
      SELECT f,
             CAST(floor(n * cos(2.0e0 * 3.141592653589793e0 * f * k / n_days)
                        * 1.0e6 + 0.5) AS HUGEINT) AS cu,
             CAST(floor(n * sin(2.0e0 * 3.141592653589793e0 * f * k / n_days)
                        * 1.0e6 + 0.5) AS HUGEINT) AS su
      FROM d, fr, nn
    ),
    pw AS (
      SELECT f,
             (CAST(sum(cu) AS DOUBLE) / 1.0e6)
               * (CAST(sum(cu) AS DOUBLE) / 1.0e6)
             + (CAST(sum(su) AS DOUBLE) / 1.0e6)
               * (CAST(sum(su) AS DOUBLE) / 1.0e6) AS p
      FROM terms GROUP BY f
    ),
    agg AS (
      SELECT CAST(sum(CAST(floor(ln(p) * 1.0e9 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1.0e9 / count(*) AS mean_ln,
             CAST(sum(CAST(floor(p * 1.0e3 + 0.5) AS HUGEINT)) AS DOUBLE)
               / 1.0e3 / count(*) AS mean_p,
             CAST(count(*) AS BIGINT) AS n_freqs
      FROM pw
    ),
    top AS (
      SELECT f AS dominant_freq FROM pw ORDER BY p DESC, f LIMIT 1
    )
    SELECT n_freqs, CAST(dominant_freq AS BIGINT) AS dominant_freq,
           floor(exp(mean_ln) / mean_p * 1.0e6 + 0.5) / 1.0e6
             AS spectral_flatness
    FROM agg, top
    """,
)
def events_spectral_flatness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral flatness (Wiener entropy) of the daily event-count
    series over the first 10 Fourier frequencies: geometric-mean power
    over arithmetic-mean power — near 1 means white (no periodic
    structure), near 0 means the energy concentrates in one line (the
    dominant frequency, also reported). The single-bin DFT queries pin
    one frequency each; flatness summarizes the whole low band. Per-day
    trig terms quantize to 1e-6 integer units before the per-frequency
    exact sums; day table is calendar-bounded."""
    ev = _t(spark, sf_dir, "events")
    day = F.floor(F.col("ts").cast("long") / 86400).cast("long")
    d0 = ev.agg(F.min(day).alias("k0"))
    d = (
        ev.crossJoin(F.broadcast(d0))
        .groupBy((day - F.col("k0")).alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    nn = d.agg(F.count(F.lit(1)).cast("double").alias("n_days"))
    fr = spark.range(1, 11).select(F.col("id").alias("f"))
    pi = 3.141592653589793
    ang = F.lit(2.0 * pi) * F.col("f") * F.col("k") / F.col("n_days")
    terms = (
        d.crossJoin(F.broadcast(fr))
        .crossJoin(F.broadcast(nn))
        .select(
            "f",
            F.floor(F.col("n") * F.cos(ang) * 1.0e6 + 0.5)
            .cast("decimal(38,0)")
            .alias("cu"),
            F.floor(F.col("n") * F.sin(ang) * 1.0e6 + 0.5)
            .cast("decimal(38,0)")
            .alias("su"),
        )
    )
    pw = terms.groupBy("f").agg(
        (
            (F.sum("cu").cast("double") / 1.0e6)
            * (F.sum("cu").cast("double") / 1.0e6)
            + (F.sum("su").cast("double") / 1.0e6)
            * (F.sum("su").cast("double") / 1.0e6)
        ).alias("p")
    )
    agg = pw.agg(
        (
            F.sum(F.floor(F.log("p") * 1.0e9 + 0.5).cast("long"))
            .cast("double")
            / 1.0e9
            / F.count(F.lit(1))
        ).alias("mean_ln"),
        (
            F.sum(F.floor(F.col("p") * 1.0e3 + 0.5).cast("decimal(38,0)"))
            .cast("double")
            / 1.0e3
            / F.count(F.lit(1))
        ).alias("mean_p"),
        F.count(F.lit(1)).cast("long").alias("n_freqs"),
    )
    top = pw.orderBy(F.col("p").desc(), "f").limit(1).select(
        F.col("f").cast("long").alias("dominant_freq")
    )
    return agg.crossJoin(F.broadcast(top)).select(
        "n_freqs",
        "dominant_freq",
        (
            F.floor(F.exp(F.col("mean_ln")) / F.col("mean_p") * 1.0e6 + 0.5)
            / 1.0e6
        ).alias("spectral_flatness"),
    )


@_register(
    "customer_spend_intraclass_corr",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS cust,
             CAST(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                  AS HUGEINT) AS y
      FROM orders
    ),
    per AS (
      SELECT cust, CAST(count(*) AS HUGEINT) AS n, sum(y) AS s,
             sum(y * y) AS ss
      FROM o GROUP BY cust HAVING count(*) >= 2
    ),
    a AS (
      SELECT CAST(count(*) AS DOUBLE) AS k, CAST(sum(n) AS DOUBLE) AS nn,
             CAST(sum(s) AS DOUBLE) AS st,
             sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
               AS s2n,
             CAST(sum(ss) AS DOUBLE) AS sst,
             sum(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS sn2
      FROM per
    ),
    f AS (
      SELECT k, nn,
             (s2n - st * st / nn) / (k - 1.0e0) AS msb,
             (sst - s2n) / (nn - k) AS msw,
             (nn - sn2 / nn) / (k - 1.0e0) AS n0
      FROM a
    )
    SELECT CAST(k AS BIGINT) AS n_customers, CAST(nn AS BIGINT) AS n_orders,
           floor(msw / 1.0e4 + 0.5) / 1.0e0 AS ms_within_dollars2,
           floor((msb - msw) / (msb + (n0 - 1.0e0) * msw) * 1.0e6 + 0.5)
             / 1.0e6 AS icc
    FROM f
    """,
)
def customer_spend_intraclass_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intraclass correlation of order values within customers (one-way
    random-effects ANOVA, unbalanced-design n0 correction): ICC =
    (MSB − MSW)/(MSB + (n0−1)·MSW) — how much of spend variance is a
    stable customer trait vs per-order noise, the number that says
    whether customer-level spend features carry signal. Repeat
    customers only (singletons have no within variance); every sum
    exact HUGEINT/decimal, the unbalanced n0 = (N − Σn²/N)/(k−1)
    computed from the same aggregates."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5)
        .cast("decimal(38,0)")
        .alias("y"),
    )
    per = (
        o.groupBy("cust")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum("y").alias("s"),
            F.sum(F.col("y") * F.col("y")).alias("ss"),
        )
        .filter(F.col("n") >= 2)
    )
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    a = per.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("n").cast("double").alias("nn"),
        F.sum("s").cast("double").alias("st"),
        F.sum(sd * sd / nd).alias("s2n"),
        F.sum("ss").cast("double").alias("sst"),
        F.sum(nd * nd).alias("sn2"),
    )
    k = F.col("k")
    nn = F.col("nn")
    msb = (F.col("s2n") - F.col("st") * F.col("st") / nn) / (k - F.lit(1.0))
    msw = (F.col("sst") - F.col("s2n")) / (nn - k)
    n0 = (nn - F.col("sn2") / nn) / (k - F.lit(1.0))
    return a.select(
        k.cast("long").alias("n_customers"),
        nn.cast("long").alias("n_orders"),
        (F.floor(msw / 1.0e4 + 0.5) / 1.0).alias("ms_within_dollars2"),
        (
            F.floor(
                (msb - msw) / (msb + (n0 - F.lit(1.0)) * msw) * 1.0e6 + 0.5
            )
            / 1.0e6
        ).alias("icc"),
    )
