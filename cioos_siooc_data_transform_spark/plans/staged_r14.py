"""STAGED round-14 queries — NOT registered (round-14 runway seed).

Same contract as staged_r5..r13: LOCAL registry, strict-harness pytest
coverage in tests/test_staged_r14.py, idempotent ``activate()``.
Activation order: staged_r9 (round 9) -> ... -> staged_r13 (round 13)
-> this module (round 14). Budget: <= 50 fresh names at activation.

Content so far (wave A, 8 of the 50-name budget) — the GSW ice-melt /
frazil mass-budget tranche, now that every ingredient ships (75-term
staged enthalpy + analytic first derivatives, IAPWS-06 ice chain,
freezing polynomial + symdiff derivatives, the full seawater Gibbs):

- melting_ice_SA_CT_ratio (non-equilibrium, explicit ice temperature),
- melting_ice_into_seawater under the complete-melt envelope,
- frazil_ratios_adiabatic (the three dSA/dCT/dP ratios in one pass),
- potential enthalpy of ice from pt0 + its Newton inverse,
- latentheat_melting recomputed from the EXACT Gibbs chemical
  potential (cross-anchor against the registered polynomial form),
- sigma0 and the rho/specvol_alpha_beta tuple surfaces (75-term).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.plans.staged_r11 import _stage_sql_cte
from cioos_siooc_data_transform_spark.plans.staged_r13 import (
    _ctf_deriv_sql,
    _q6,
    _q9,
    _q12,
)
from cioos_siooc_data_transform_spark.session import read_table as _t

STAGED_QUERIES: dict[str, Callable[..., Any]] = {}
STAGED_ORACLES: dict[str, str] = {}


def activate() -> int:
    """Round-14 activation (idempotent)."""
    from cioos_siooc_data_transform_spark.plans.registry import ORACLES, QUERIES

    n = 0
    for name, fn in STAGED_QUERIES.items():
        if name not in QUERIES:
            QUERIES[name] = fn
            ORACLES[name] = STAGED_ORACLES[name]
            n += 1
    return n


# ---------------------------------------------------------------------------
# Shared melt-grid inputs: warm seawater (CT far above freezing, so the
# melting queries sit inside their validity envelope), sub-zero ice
# temperatures below the pure-water freezing point at every p, and a
# small ice mass fraction (complete melt guaranteed — verified by the
# ct_final > ct_freezing pin in tests).
# ---------------------------------------------------------------------------
_MELT_IN_SQL = """
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity % 30 AS DOUBLE) AS t,
           CAST(30.0 + l_discount * 50 AS DOUBLE) AS s,
           CAST(l_linenumber * 100.0 AS DOUBLE) AS p,
           -CAST(l_quantity % 20 AS DOUBLE) - 1.5 AS t_ih,
           (CAST(l_quantity % 5 AS DOUBLE) + 1.0) / 100.0 AS w_ih
    FROM lineitem
"""


def _melt_in_sql() -> str:
    from cioos_siooc_data_transform_spark.plans.staged_r5 import _SA_SQL

    return f"""
      SELECT *, {_SA_SQL} AS sa
      FROM ({_MELT_IN_SQL})
    """


def _melt_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cioos_siooc_data_transform_spark.plans.staged_r5 import _SA_SQL

    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity") % 30).cast("double").alias("t"),
        (F.lit(30.0) + F.col("l_discount") * 50).cast("double").alias("s"),
        (F.col("l_linenumber") * 100.0).cast("double").alias("p"),
        (-(F.col("l_quantity") % 20).cast("double") - 1.5).alias("t_ih"),
        (((F.col("l_quantity") % 5).cast("double") + 1.0) / 100.0).alias(
            "w_ih"
        ),
    )
    return base.withColumn("sa", F.expr(_SA_SQL))


def _melt_query(name: str, stages_fn, outs):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = _melt_inputs(spark, sf_dir)
        for sname, expr in stages_fn():
            df = df.withColumn(sname, F.expr(expr))
        return df.select(
            "l_orderkey",
            "l_linenumber",
            *[F.expr(e).alias(c) for c, e in outs],
        )

    staged = _stage_sql_cte(_melt_in_sql(), stages_fn())
    sel = ",\n           ".join(f"{e} AS {c}" for c, e in outs)
    STAGED_QUERIES[name] = fn
    STAGED_ORACLES[name] = f"""
    SELECT l_orderkey, l_linenumber,
           {sel}
    FROM ({staged})
    """
    return fn


# ---------------------------------------------------------------------------
# melting_ice_SA_CT_ratio — non-equilibrium form (GSW twin:
# gsw_melting_ice_SA_CT_ratio / _poly): the ratio of SA to CT changes
# when ice at its OWN temperature t_Ih melts into seawater at (SA, CT):
# ratio = SA·h_CT / (h − h_Ih(t_Ih) − SA·h_SA), all enthalpy pieces
# the staged 75-term forms (McDougall, Barker & Feistel 2013). The
# envelope (CT ≥ 0 °C > CT_f, t_Ih ≤ −1.5 °C < t_f(0, p)) keeps both
# reference validity guards satisfied by construction.
# ---------------------------------------------------------------------------
def _melt_ratio_stages():
    from cioos_siooc_data_transform_spark.functions.ice import (
        gibbs_ice_stages,
    )
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_from_t_sql,
        enthalpy_first_derivatives_stages,
        enthalpy_stages,
    )

    stages = [("__mr_ct", ct_from_t_sql("s", "t", "p"))]
    stages += enthalpy_stages("sa", "__mr_ct", "p", x="__mr_h_")
    stages += enthalpy_first_derivatives_stages(
        "sa", "__mr_ct", "p", x="__mr_d_"
    )
    stages += gibbs_ice_stages("t_ih", "p", x="__mr_gi_", out="__mr_")
    return stages


_melt_query(
    "gsw_melting_ice_sa_ct_ratio",
    _melt_ratio_stages,
    [
        (
            "sa_ct_ratio",
            _q9("(sa*h_ct / (__mr_h_out - __mr_enthalpy_ice - sa*h_sa))"),
        ),
    ],
)


# ---------------------------------------------------------------------------
# melting_ice_into_seawater — complete-melt envelope (GSW twin:
# gsw_melting_ice_into_seawater): bulk conservative mixing
# sa_f = (1−w)·SA, h_f = (1−w)·h + w·h_Ih, then CT_final from the
# staged Newton CT←enthalpy inversion. The reference routes through
# gsw_frazil_properties to decide whether ice REMAINS; with warm
# seawater and w_Ih ≤ 6 % all ice melts (ct_final > CT_freezing pinned
# in tests), where frazil_properties reduces to exactly this mixing.
# ---------------------------------------------------------------------------
def _melt_into_stages():
    from cioos_siooc_data_transform_spark.functions.ice import (
        gibbs_ice_stages,
    )
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_from_enthalpy_stages,
        ct_from_t_sql,
        enthalpy_stages,
    )

    stages = [("__mi_ct", ct_from_t_sql("s", "t", "p"))]
    stages += enthalpy_stages("sa", "__mi_ct", "p", x="__mi_h_")
    stages += gibbs_ice_stages("t_ih", "p", x="__mi_gi_", out="__mi_")
    stages += [
        ("__mi_sab", "((1.0e0 - w_ih)*sa)"),
        (
            "__mi_hb",
            "((1.0e0 - w_ih)*__mi_h_out + w_ih*__mi_enthalpy_ice)",
        ),
    ]
    stages += ct_from_enthalpy_stages("__mi_hb", "__mi_sab", "p")
    return stages


_melt_query(
    "gsw_melting_ice_into_seawater",
    _melt_into_stages,
    [
        ("sa_final", _q9("__mi_sab")),
        ("ct_final", _q9("ct_from_enthalpy")),
    ],
)


# ---------------------------------------------------------------------------
# frazil_ratios_adiabatic — the three ratios dSA/dCT, dSA/dP, dCT/dP
# (pressure in Pa) of a seawater + frazil-ice mixture under adiabatic
# pressure change (GSW twin: gsw_frazil_ratios_adiabatic / _poly;
# McDougall, Barker & Feistel 2013 eqns): every ingredient is a staged
# surface this package already anchors — the freezing polynomial + its
# symdiff derivatives, the Millero t_f line + its symdiff derivatives,
# the 75-term enthalpy + analytic first derivatives, and the IAPWS-06
# ice chain (cp, enthalpy, lapse −g_Tp/g_TT).
# ---------------------------------------------------------------------------
_TF_SENTINELS = ("__TFSA__", "__TFP__")
_TF_DERIV_TEMPLATES: dict[str, str] = {}


def _tf_deriv_sql(s: str, p: str, var: int) -> str:
    """∂t_freezing/∂SA (var=0; the Millero line is written in practical
    salinity, so the chain 1/uPS applies) or ∂/∂p (var=1, K/dbar)."""
    key = str(var)
    if key not in _TF_DERIV_TEMPLATES:
        from cioos_siooc_data_transform_spark.functions.symdiff import (
            diff_sql,
        )
        from cioos_siooc_data_transform_spark.functions.teos10 import (
            t_freezing_sql,
        )

        s_, p_ = _TF_SENTINELS
        expr = t_freezing_sql(s_, p_)
        _TF_DERIV_TEMPLATES[key] = diff_sql(expr, _TF_SENTINELS[var])
    s_, p_ = _TF_SENTINELS
    return (
        _TF_DERIV_TEMPLATES[key]
        .replace(s_, f"({s})")
        .replace(p_, f"({p})")
    )


def _frazil_stages():
    from cioos_siooc_data_transform_spark.functions.ice import (
        gibbs_ice_stages,
    )
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        GSW_SSO,
        _lit,
        ct_freezing_poly_sql,
        enthalpy_first_derivatives_stages,
        enthalpy_stages,
        t_freezing_sql,
    )

    ups = _lit(GSW_SSO / 35.0)
    stages = [
        ("__fz_ctf", ct_freezing_poly_sql("sa", "p", "0.0e0")),
        ("__fz_tf", t_freezing_sql("s", "p")),
        # freezing-line first derivatives; the SA derivatives chain
        # through sp = SA/uPS for the Millero line.
        ("__fz_ctf_sa", _ctf_deriv_sql("sa", "p", 0)),
        ("__fz_ctf_p", _ctf_deriv_sql("sa", "p", 1)),
        ("__fz_tf_sa", f"({_tf_deriv_sql('s', 'p', 0)}/{ups})"),
        ("__fz_tf_p", _tf_deriv_sql("s", "p", 1)),
    ]
    stages += enthalpy_stages("sa", "__fz_ctf", "p", x="__fz_h_")
    stages += enthalpy_first_derivatives_stages(
        "sa", "__fz_ctf", "p", x="__fz_d_"
    )
    stages += gibbs_ice_stages("__fz_tf", "p", x="__fz_gi_", out="__fz_")
    stages += [
        ("__fz_gamma", "(-__fz_gi_gtp/__fz_gi_gtt)"),
        ("__fz_wcp", "(__fz_cp_ice*w_ih/(1.0e0 - w_ih))"),
        # tf_p / ctf_p below are per-dbar on both sides of the ratio,
        # while gamma is per-Pa: convert tf_p to per-Pa (1e-4) to match
        # the reference's Pa-based ratios throughout.
        ("__fz_part", "((1.0e-4*__fz_tf_p - __fz_gamma)/(1.0e-4*__fz_ctf_p))"),
        ("__fz_b1", "(h_ct + __fz_wcp*__fz_part)"),
        (
            "__fz_b2",
            "(__fz_h_out - __fz_enthalpy_ice"
            " - sa*(h_sa + __fz_wcp*(__fz_tf_sa - __fz_part*__fz_ctf_sa)))",
        ),
        (
            "__fz_rb3",
            "(1.0e0/(__fz_h_out - __fz_enthalpy_ice"
            " - sa*(h_sa + h_ct*__fz_ctf_sa + __fz_wcp*__fz_tf_sa)))",
        ),
    ]
    return stages


_melt_query(
    "gsw_frazil_ratios_adiabatic",
    _frazil_stages,
    [
        ("dsa_dct_frazil", _q9("(sa*__fz_b1/__fz_b2)")),
        # per-Pa pressure ratios are tiny — emit ×1e9 / ×1e12.
        (
            "dsa_dp_frazil_e9",
            _q9("(1.0e9*sa*(1.0e-4*__fz_ctf_p)*__fz_b1*__fz_rb3)"),
        ),
        (
            "dct_dp_frazil_e9",
            _q9("(1.0e9*(1.0e-4*__fz_ctf_p)*__fz_b2*__fz_rb3)"),
        ),
    ],
)


# ---------------------------------------------------------------------------
# Potential enthalpy of ice from pt0_ice and its inverse (GSW twins:
# gsw_pot_enthalpy_from_pt_ice, gsw_pt_from_pot_enthalpy_ice):
# h_pot_Ih = h_Ih(pt0, 0) via the IAPWS-06 chain at zero sea pressure;
# the inverse is two Newton steps with the exact derivative
# dh/dpt = cp_Ih(pt, 0), seeded from a linear estimate around the
# pure-water anchor (−333.4 kJ/kg at 0 °C, cp_Ih ≈ 2.1 kJ/(kg·K)).
# ---------------------------------------------------------------------------
def _pot_h_ice_stages():
    from cioos_siooc_data_transform_spark.functions.ice import (
        gibbs_ice_stages,
    )

    return gibbs_ice_stages("t_ih", "0.0e0", x="__ph_gi_", out="__ph_")


_melt_query(
    "gsw_pot_enthalpy_from_pt_ice",
    _pot_h_ice_stages,
    [("pot_enthalpy_ice", _q6("__ph_enthalpy_ice"))],
)


def _pt_from_pot_h_stages():
    from cioos_siooc_data_transform_spark.functions.ice import (
        gibbs_ice_stages,
    )

    # Roundtrip construction: target h from the forward chain at the
    # grid's own pt0 = t_ih, then invert.
    stages = list(
        gibbs_ice_stages("t_ih", "0.0e0", x="__pi_gi_", out="__pi_t_")
    )
    stages += [
        ("__pi_h", "__pi_t_enthalpy_ice"),
        ("__pi_pt0", "((__pi_h + 333426.0e0)/2096.0e0)"),
    ]
    for i in range(2):
        cur = f"__pi_pt{i}"
        chain = gibbs_ice_stages(cur, "0.0e0", x=f"__pi_g{i}_", out=f"__pi_o{i}_")
        stages += chain
        stages += [
            (
                f"__pi_pt{i + 1}",
                f"({cur} - (__pi_o{i}_enthalpy_ice - __pi_h)"
                f"/__pi_o{i}_cp_ice)",
            ),
        ]
    stages.append(("pt_from_pot_enthalpy_ice", "__pi_pt2"))
    return stages


_melt_query(
    "gsw_pt_from_pot_enthalpy_ice",
    _pt_from_pot_h_stages,
    [("pt_ice", _q9("pt_from_pot_enthalpy_ice"))],
)


# ---------------------------------------------------------------------------
# latentheat_melting from the EXACT Gibbs chemical potential (the
# reference's own construction: L = 1000·(µ_W − T·∂µ_W/∂T) − h_Ih at
# the freezing line; gsw_latentheat_melting in the C toolbox). The
# registered polynomial-form latentheat_melting (staged_r8) anchors the
# pure-water limit; this twin recomputes it from gibbs_sw_sql +
# t_deriv_chem_potential_water_sql and must agree to ~1 J/kg (tests).
# ---------------------------------------------------------------------------
def _latentheat_exact_stages():
    from cioos_siooc_data_transform_spark.functions.ice import (
        gibbs_ice_stages,
    )
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        gibbs_sw_sql,
        t_deriv_chem_potential_water_sql,
        t_freezing_sql,
    )

    stages = [("__lh_tf", t_freezing_sql("s", "p"))]
    stages += [
        ("__lh_g", gibbs_sw_sql("sa", "__lh_tf", "p")),
        ("__lh_gsa", gibbs_sw_sql("sa", "__lh_tf", "p", dsa=1)),
        ("__lh_mu", "(1.0e-3*(__lh_g - sa*__lh_gsa))"),
        (
            "__lh_dmu",
            t_deriv_chem_potential_water_sql("sa", "__lh_tf", "p"),
        ),
    ]
    stages += gibbs_ice_stages("__lh_tf", "p", x="__lh_gi_", out="__lh_")
    stages += [
        (
            "latentheat",
            "(1000.0e0*(__lh_mu - (273.15e0 + __lh_tf)*__lh_dmu)"
            " - __lh_enthalpy_ice)",
        ),
    ]
    return stages


_melt_query(
    "gsw_latentheat_melting_exact",
    _latentheat_exact_stages,
    [("latentheat", _q6("latentheat"))],
)


# ---------------------------------------------------------------------------
# sigma0 and the rho/specvol_alpha_beta tuple surfaces (GSW twins:
# gsw_sigma0, gsw_rho_alpha_beta, gsw_specvol_alpha_beta) — the
# 75-term polynomial pieces already anchored individually, exposed in
# the reference's tuple shapes.
# ---------------------------------------------------------------------------
def _sigma0_stages():
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_from_t_sql,
        specvol_sql,
    )

    return [
        ("__s0_ct", ct_from_t_sql("s", "t", "p")),
        ("__s0_v", specvol_sql("sa", "__s0_ct", "0.0e0")),
    ]


_melt_query(
    "gsw_sigma0",
    _sigma0_stages,
    [("sigma0", _q6("(1.0e0/__s0_v - 1000.0e0)"))],
)


def _rho_alpha_beta_stages():
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        GSW_OFFSET,
        GSW_SFAC,
        _lit,
        ct_from_t_sql,
        specvol_deriv_poly_sql,
        specvol_sql,
    )

    # specvol_deriv_poly_sql works in the fit coordinates
    # xs = sqrt(sfac·SA + offset), ys = CT/40, z = p/1e4.
    return [
        ("__rab_ct", ct_from_t_sql("s", "t", "p")),
        ("__rab_xs", f"sqrt({_lit(GSW_SFAC)}*sa + {_lit(GSW_OFFSET)})"),
        ("__rab_ys", "(__rab_ct*0.025e0)"),
        ("__rab_z", "(p*1.0e-4)"),
        ("__rab_v", specvol_sql("sa", "__rab_ct", "p")),
        (
            "__rab_vct",
            specvol_deriv_poly_sql("__rab_xs", "__rab_ys", "__rab_z", dys=1),
        ),
        (
            "__rab_vsa",
            specvol_deriv_poly_sql("__rab_xs", "__rab_ys", "__rab_z", dxs=1),
        ),
    ]


def _rab_outs():
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        GSW_SFAC,
        _lit,
    )

    # v_CT = 0.025·v_ys, v_SA = (sfac/2xs)·v_xs in physical units.
    alpha = "(0.025e0*__rab_vct/__rab_v)"
    beta = (
        f"(-({_lit(GSW_SFAC)}/(2.0e0*__rab_xs))*__rab_vsa/__rab_v)"
    )
    return [
        ("rho", _q6("(1.0e0/__rab_v)")),
        ("specvol_e6", _q6("(1.0e6*__rab_v)")),
        ("alpha", _q12(alpha)),
        ("beta", _q12(beta)),
    ]


_melt_query(
    "gsw_rho_specvol_alpha_beta",
    _rho_alpha_beta_stages,
    _rab_outs(),
)
