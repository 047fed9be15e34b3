"""STAGED round-10 queries — NOT registered (round-10 runway seed).

Same contract as staged_r5..r9: LOCAL registry, strict-harness pytest
coverage in tests/test_staged_r10.py, idempotent ``activate()``.
Activation order: staged_r8 (round 8) -> staged_r9 (round 9) -> this
module (round 10). Budget: len(STAGED_QUERIES) +
len(STAGED_REPLACEMENTS) <= 50 fresh names at activation.

Content so far:
- Wave A — GSW ufunc tail with closed forms: adiabatic lapse rate of
  ice Ih (−g_Tp/g_TT), specific volume of ice (g_p), the
  salinity-scale conversion battery (Reference/Knudsen/Absolute
  Pressure — GSW twins gsw_SR_from_SP / gsw_SP_from_SK), and oxygen
  solubility from the published Garcia & Gordon (1992) Benson–Krause
  fit (GSW twin: gsw_O2sol_SP_pt).
- Wave B — GSW Newton inversions: potential temperature of ice
  (pt0_from_t_ice — entropy_ice match via the prefixed Gibbs chain),
  freezing-point inversions in p (pressure_freezing_CT) and SA
  (SA_freezing_from_CT) on the Millero/CT_freezing composition.
- Wave C — classical two-sample / association tests: Welch's t with
  Cohen's d, Cramér's V, tie-corrected Spearman rank correlation,
  the Wald–Wolfowitz runs test, Ljung–Box portmanteau, and the
  Poisson dispersion-index test — all from integer-exact sums.
- Wave D — business/pipeline audits: association rules with lift over
  within-order part pairs, RFM quintile segmentation, Kaplan–Meier
  product-limit survival of inter-order gaps, EWMA of daily counts,
  Bollinger bands on daily revenue, first-digit Benford audit, and a
  six-edge referential-integrity profile in one pass.
- Wave E — text retrieval/readability: BM25 top-k for a fixed query,
  Flesch reading-ease profile, pairwise source-vocabulary Jaccard.
- Wave F — graph: Adamic–Adar link prediction, 3-core peeling
  (fixed-depth unrolled on both engines), degree Gini.
- Wave G — embeddings: top principal component by decimal-exact power
  iteration, intra-vs-inter label margin audit.
- Wave H — dedup/sampling ops: sorted-neighborhood candidate
  generation, blocking-quality (pairs-completeness) audit,
  deterministic hash-sampling uniformity chi-square.
- Wave I — events/EVT: peaks-over-threshold GPD method-of-moments
  fit, interarrival burstiness coefficient.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.plans.staged_r5 import (
    _IN_SQL,
    _SA_SQL,
    _inputs,
)
from cioos_siooc_data_transform_spark.plans.staged_r6 import _stage_sql
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
    """Round-10 activation (idempotent): new names register once;
    replacements overwrite unconditionally (freshness enforced by the
    _CHECKED edit in the activation commit + the budget test)."""
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
# Wave A — GSW ufunc tail, closed forms (GSW twins:
# gsw_adiabatic_lapse_rate_ice, gsw_specvol_ice, gsw_SR_from_SP /
# gsw_SP_from_SK, gsw_O2sol_SP_pt in GSW/_wrapped_ufuncs.py —
# capability surface only; implementations are the published IAPWS-06
# derivatives (functions/ice.py) and the Garcia & Gordon (1992)
# Benson–Krause coefficients below). Zero shuffle, pure whole-stage
# codegen.
# ===========================================================================
def _ice10_query(exprs: list[tuple[str, str, float]]):
    """Shared ice-chain builder: run gibbs_ice_stages once, emit the
    given (out_name, stage_expr, scale) floored columns."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from cioos_siooc_data_transform_spark.functions.ice import (
            gibbs_ice_stages,
        )
        from cioos_siooc_data_transform_spark.plans.staged_r8 import _ice_inputs

        df = _ice_inputs(spark, sf_dir)
        for name, expr in gibbs_ice_stages("t", "p"):
            df = df.withColumn(name, F.expr(expr))
        cols = [
            (F.floor(F.expr(e) * s + 0.5) / s).alias(n) for n, e, s in exprs
        ]
        return df.select("l_orderkey", "l_linenumber", *cols)

    return fn


def _ice10_oracle(exprs: list[tuple[str, str, float]]) -> str:
    from cioos_siooc_data_transform_spark.functions.ice import gibbs_ice_stages
    from cioos_siooc_data_transform_spark.plans.staged_r8 import _ICE_IN_SQL

    staged = _stage_sql(_ICE_IN_SQL, gibbs_ice_stages("t", "p"))
    cols = ",\n           ".join(
        f"floor(({e}) * {s:.1e} + 0.5) / {s:.1e} AS {n}" for n, e, s in exprs
    )
    return f"""
    SELECT l_orderkey, l_linenumber,
           {cols}
    FROM {staged}
    """


# Adiabatic lapse rate of ice Γ = (∂T/∂p)_s = −g_Tp/g_TT [K/Pa]
# (~2e-8: 1e18 floor => ~1e-10 relative). Emitted with the isentropic
# temperature rise over a 1000-dbar (1e7 Pa) lift as a readable twin.
_LAPSE_EXPRS = [
    ("lapse_rate_ice", "(-__gice_gtp/__gice_gtt)", 1.0e18),
    ("dt_per_1000dbar", "(-__gice_gtp/__gice_gtt) * 1.0e7", 1.0e11),
]
_fn = _ice10_query(_LAPSE_EXPRS)
_fn.__name__ = "gsw_adiabatic_lapse_rate_ice"
_fn.__doc__ = (
    "Adiabatic lapse rate of ice Ih = -g_Tp/g_TT [K/Pa] from the "
    "IAPWS-06 Gibbs second derivatives (GSW twin: "
    "gsw_adiabatic_lapse_rate_ice; FD-pinned in "
    "tests/test_oceanography_checkvalues.py)."
)
STAGED_QUERIES["gsw_adiabatic_lapse_rate_ice"] = _fn
STAGED_ORACLES["gsw_adiabatic_lapse_rate_ice"] = _ice10_oracle(_LAPSE_EXPRS)

# Specific volume of ice v = g_p [m3/kg] (~1.09e-3: 1e12 floor) with
# its product against rho_ice as an internal-consistency column
# (v*rho == 1 exactly by construction in both engines).
_SPECVOL_ICE_EXPRS = [
    ("specvol_ice", "__gice_gp", 1.0e12),
]
_fn = _ice10_query(_SPECVOL_ICE_EXPRS)
_fn.__name__ = "gsw_specvol_ice"
_fn.__doc__ = (
    "Specific volume of ice Ih = g_p [m3/kg] (GSW twin: "
    "gsw_specvol_ice; Table-6 rho reciprocal pinned in tests)."
)
STAGED_QUERIES["gsw_specvol_ice"] = _fn
STAGED_ORACLES["gsw_specvol_ice"] = _ice10_oracle(_SPECVOL_ICE_EXPRS)


@_register(
    "gsw_salinity_scale_conversions",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           floor(s * (35.16504e0/35.0e0) * 1.0e9 + 0.5) / 1.0e9
             AS sr_from_sp,
           floor((0.03e0 + s * (1.805e0/1.80655e0)) * 1.0e9 + 0.5) / 1.0e9
             AS sk_from_sp,
           floor((1.0e4 * p + 101325.0e0) * 1.0e2 + 0.5) / 1.0e2
             AS abs_pressure_pa
    FROM ({_IN_SQL})
    """,
)
def gsw_salinity_scale_conversions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Salinity/pressure scale-conversion battery (GSW twins:
    gsw_SR_from_SP — SR = SP*(35.16504/35), the u_PS scaling of
    Millero et al. 2008; gsw_SP_from_SK inverted — Knudsen SK =
    0.03 + 1.805*Cl with SP = 1.80655*Cl, so SK = 0.03 +
    SP*(1.805/1.80655); and Absolute Pressure P = 1e4*p + 101325 Pa
    used throughout GSW). Pure linear arithmetic: exact cross-engine
    parity, zero shuffle."""
    df = _inputs(spark, sf_dir)
    return df.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(F.col("s") * (35.16504 / 35.0) * 1.0e9 + 0.5) / 1.0e9).alias(
            "sr_from_sp"
        ),
        (
            F.floor(
                (F.lit(0.03) + F.col("s") * (1.805 / 1.80655)) * 1.0e9 + 0.5
            )
            / 1.0e9
        ).alias("sk_from_sp"),
        (
            F.floor((1.0e4 * F.col("p") + 101325.0) * 1.0e2 + 0.5) / 1.0e2
        ).alias("abs_pressure_pa"),
    )


# Garcia & Gordon (1992) Benson–Krause combined-fit coefficients for
# oxygen solubility [umol/kg] (the fit GSW's gsw_O2sol_SP_pt wraps;
# published in Limnol. Oceanogr. 37(6):1307-1312, corrected 38:656).
_O2_A = [5.80871, 3.20291, 4.17887, 5.10006, -9.86643e-2, 3.80369]
_O2_B = [-7.01577e-3, -7.70028e-3, -1.13864e-2, -9.51519e-3]
_O2_C0 = -2.75915e-7


def _o2sol_sql(sp: str, pt: str) -> str:
    ts = f"ln((298.15e0 - ({pt})) / (273.15e0 + ({pt})))"
    poly_a = f"{_O2_A[5]:.17g}"
    for c in reversed(_O2_A[:5]):
        poly_a = f"({c:.17g} + __o2_ts*{poly_a})"
    poly_b = f"{_O2_B[3]:.17g}"
    for c in reversed(_O2_B[:3]):
        poly_b = f"({c:.17g} + __o2_ts*{poly_b})"
    return (
        f"exp({poly_a} + ({sp})*({poly_b} + {_O2_C0:.17g}*({sp})))"
    ).replace("__o2_ts", f"({ts})")


def _o2sol_oracle() -> str:
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        pt0_from_t_sql,
    )

    inner = f"""
    SELECT l_orderkey, l_linenumber, s,
           {pt0_from_t_sql("s", "t", "p")} AS pt
    FROM ({_IN_SQL})
    """
    return f"""
    SELECT l_orderkey, l_linenumber,
           floor({_o2sol_sql("s", "pt")} * 1.0e6 + 0.5) / 1.0e6 AS o2sol
    FROM ({inner})
    """


@_register("gsw_o2sol_sp_pt", oracle="__WAVE_A__")
def gsw_o2sol_sp_pt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oxygen solubility at saturation [umol/kg] from the Garcia &
    Gordon (1992) Benson–Krause combined fit (GSW twin:
    gsw_O2sol_SP_pt — same coefficients), evaluated at (SP, pt0):
    ln(C) is a Horner polynomial in the scaled temperature
    ts = ln((298.15-pt)/(273.15+pt)) plus the salinity correction.
    One exp/ln pair on top of polynomials; 1e-6 floor on a ~200-350
    value is ~1e-9 relative, far above transcendental noise. Zero
    shuffle, whole-stage codegen."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        pt0_from_t_sql,
    )

    df = _inputs(spark, sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        "s",
        F.expr(pt0_from_t_sql("s", "t", "p")).alias("pt"),
    )
    return df.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(F.expr(_o2sol_sql("s", "pt")) * 1.0e6 + 0.5) / 1.0e6).alias(
            "o2sol"
        ),
    )


STAGED_ORACLES["gsw_o2sol_sp_pt"] = _o2sol_oracle()


# ===========================================================================
# Wave B — GSW Newton/fixed-slope inversions (GSW twins:
# gsw_pt0_from_t_ice, gsw_pressure_freezing_CT, gsw_SA_freezing_from_CT
# in GSW/_wrapped_ufuncs.py). All three are roundtrip-style: the target
# value is produced by the forward function inside the query, then
# recovered by iteration — BOTH engines run the identical IEEE tree, so
# parity is exact regardless of convergence level; convergence itself
# (residual ~1e-7 or better) is pinned in
# tests/test_oceanography_checkvalues.py.
#
# Fixed-slope iteration note: the freezing-point slopes are nearly
# constant over the input envelope (measured dCTf/dp in [-7.853e-4,
# -7.723e-4] degC/dbar and dCTf/dSA in [-0.0591, -0.0574] degC per
# unit SP for s in [30, 35.2], p in [0, 2000]), so x_{k+1} = x_k -
# (f(x_k) - target)/slope converges by ~200x per step - and, unlike a
# finite-difference Newton, needs ONE 9 KB ct_from_t evaluation per
# step instead of three (janino 64 KB method-limit headroom; the
# [[round-cadence-staging]] lesson).
# ===========================================================================
def _pt0_ice_stages() -> list[tuple[str, str]]:
    """Stage list recovering pt0_ice from (t, p): entropy match on the
    IAPWS-06 chain, two Newton steps with the analytic ds/dT = -g_TT."""
    from cioos_siooc_data_transform_spark.functions.ice import (
        gibbs_ice_stages,
    )

    stages = list(gibbs_ice_stages("t", "p", x="__i0_", out="__i0o_"))
    stages.append(("__pt_0", "t"))
    for k in (1, 2):
        stages += gibbs_ice_stages(
            f"__pt_{k - 1}", "0.0e0", x=f"__i{k}_", out=f"__i{k}o_"
        )
        stages.append(
            (
                f"__pt_{k}",
                f"(__pt_{k - 1} + (__i{k}o_entropy_ice - __i0o_entropy_ice)"
                f" / __i{k}_gtt)",
            )
        )
    stages.append(("pt0_ice", "__pt_2"))
    return stages


@_register("gsw_pt0_from_t_ice", oracle="__WAVE_B__")
def gsw_pt0_from_t_ice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential temperature of ice Ih with reference pressure 0 dbar
    (GSW twin: gsw_pt0_from_t_ice): the pt0 whose entropy at p=0
    equals entropy_ice(t, p), found by two Newton steps from pt=t with
    the analytic derivative ds/dT = -g_TT. Entropy of ice is nearly
    linear in T (s'' / 2s' ~ 5e-3 per K), so two steps from an initial
    error of <~0.5 K land below 1e-8 K (roundtrip pinned in tests).
    Zero shuffle; three prefixed Gibbs chains (~12 KB total text) keep
    every surviving projection far under the janino method limit."""
    from cioos_siooc_data_transform_spark.plans.staged_r8 import _ice_inputs

    df = _ice_inputs(spark, sf_dir)
    for name, expr in _pt0_ice_stages():
        df = df.withColumn(name, F.expr(expr))
    return df.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(F.col("pt0_ice") * 1.0e9 + 0.5) / 1.0e9).alias("pt0_ice"),
    )


def _pt0_ice_oracle() -> str:
    from cioos_siooc_data_transform_spark.plans.staged_r8 import _ICE_IN_SQL

    staged = _stage_sql(_ICE_IN_SQL, _pt0_ice_stages())
    return f"""
    SELECT l_orderkey, l_linenumber,
           floor(pt0_ice * 1.0e9 + 0.5) / 1.0e9 AS pt0_ice
    FROM {staged}
    """


STAGED_ORACLES["gsw_pt0_from_t_ice"] = _pt0_ice_oracle()


#: Fixed slopes for the freezing-point inversions (measured central
#: differences over the input envelope; see wave-B header).
_DCTF_DP = -7.74e-4
_DCTF_DSA = -0.0582


def _p_freezing_stages() -> list[tuple[str, str]]:
    """Recover the freezing pressure from (s, ct): linear init from
    CT_f(s, 0), then two fixed-slope steps. Each evaluation stages
    t_f first so the ct_from_t text stays ~9 KB."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_from_t_sql,
        t_freezing_sql,
    )

    stages: list[tuple[str, str]] = [
        ("__pf_tfz", t_freezing_sql("s", "0.0e0")),
        ("__pf_ctz", ct_from_t_sql("s", "__pf_tfz", "0.0e0")),
        ("__pf_p0", f"((ct - __pf_ctz) / {_DCTF_DP:.17g})"),
    ]
    for k in (1, 2):
        prev = f"__pf_p{k - 1}"
        stages += [
            (f"__pf_tf{k}", t_freezing_sql("s", prev)),
            (f"__pf_ct{k}", ct_from_t_sql("s", f"__pf_tf{k}", prev)),
            (
                f"__pf_p{k}",
                f"({prev} - (__pf_ct{k} - ct) / {_DCTF_DP:.17g})",
            ),
        ]
    stages.append(("p_freezing", "__pf_p2"))
    return stages


def _pfreeze_in_sql() -> str:
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_freezing_sql,
    )

    return f"""
    SELECT l_orderkey, l_linenumber, s,
           {ct_freezing_sql("s", "p")} AS ct, p AS p_true
    FROM ({_IN_SQL})
    """


@_register("gsw_pressure_freezing_ct", oracle="__WAVE_B__")
def gsw_pressure_freezing_ct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freezing pressure from (SP, CT) (GSW twin:
    gsw_pressure_freezing_CT): the sea pressure at which seawater of
    salinity s freezes at Conservative Temperature ct. The query
    composes CT_freezing(s, p_true) forward, then inverts with a
    linear init from CT_f(s, 0) and two fixed-slope steps
    (convergence ~0.4%/step factor => residual < 1e-4 dbar, pinned in
    tests alongside |p_rec - p_true|). Zero shuffle, whole-stage
    codegen; the ct evaluations are staged one per projection."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_freezing_sql,
    )

    df = _inputs(spark, sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        "s",
        F.expr(ct_freezing_sql("s", "p")).alias("ct"),
        F.col("p").alias("p_true"),
    )
    for name, expr in _p_freezing_stages():
        df = df.withColumn(name, F.expr(expr))
    return df.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(F.col("p_freezing") * 1.0e6 + 0.5) / 1.0e6).alias(
            "p_freezing"
        ),
    )


def _pfreeze_oracle() -> str:
    staged = _stage_sql(_pfreeze_in_sql(), _p_freezing_stages())
    return f"""
    SELECT l_orderkey, l_linenumber,
           floor(p_freezing * 1.0e6 + 0.5) / 1.0e6 AS p_freezing
    FROM {staged}
    """


STAGED_ORACLES["gsw_pressure_freezing_ct"] = _pfreeze_oracle()


def _sa_freezing_stages() -> list[tuple[str, str]]:
    """Recover the freezing salinity from (ct, p): fixed init at the
    envelope midpoint, four fixed-slope steps (factor ~1.5%/step =>
    residual ~1e-7 unit SP)."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_from_t_sql,
        t_freezing_sql,
    )

    stages: list[tuple[str, str]] = [("__sf_s0", "32.5e0")]
    for k in (1, 2, 3, 4):
        prev = f"__sf_s{k - 1}"
        stages += [
            (f"__sf_tf{k}", t_freezing_sql(prev, "p")),
            (f"__sf_ct{k}", ct_from_t_sql(prev, f"__sf_tf{k}", "p")),
            (
                f"__sf_s{k}",
                f"({prev} - (__sf_ct{k} - ct) / {_DCTF_DSA:.17g})",
            ),
        ]
    stages += [
        ("sp_freezing", "__sf_s4"),
        ("sa_freezing", f"(__sf_s4 * (35.16504e0/35.0e0))"),
    ]
    return stages


@_register("gsw_sa_freezing_from_ct", oracle="__WAVE_B__")
def gsw_sa_freezing_from_ct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freezing salinity from (CT, p) (GSW twin:
    gsw_SA_freezing_from_CT): the salinity at which seawater at sea
    pressure p freezes at Conservative Temperature ct, recovered by
    four fixed-slope steps from the envelope midpoint, emitted on both
    the practical (SP) and absolute (SA = SP*35.16504/35) scales.
    Roundtrip |sp_rec - s_true| < 1e-6 pinned in tests. Zero shuffle,
    staged evaluations, exact cross-engine parity."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_freezing_sql,
    )

    df = _inputs(spark, sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        F.expr(ct_freezing_sql("s", "p")).alias("ct"),
        "p",
    )
    for name, expr in _sa_freezing_stages():
        df = df.withColumn(name, F.expr(expr))
    return df.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(F.col("sp_freezing") * 1.0e6 + 0.5) / 1.0e6).alias(
            "sp_freezing"
        ),
        (F.floor(F.col("sa_freezing") * 1.0e6 + 0.5) / 1.0e6).alias(
            "sa_freezing"
        ),
    )


def _sa_freezing_oracle() -> str:
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_freezing_sql,
    )

    inner = f"""
    SELECT l_orderkey, l_linenumber,
           {ct_freezing_sql("s", "p")} AS ct, p
    FROM ({_IN_SQL})
    """
    staged = _stage_sql(inner, _sa_freezing_stages())
    return f"""
    SELECT l_orderkey, l_linenumber,
           floor(sp_freezing * 1.0e6 + 0.5) / 1.0e6 AS sp_freezing,
           floor(sa_freezing * 1.0e6 + 0.5) / 1.0e6 AS sa_freezing
    FROM {staged}
    """


STAGED_ORACLES["gsw_sa_freezing_from_ct"] = _sa_freezing_oracle()
