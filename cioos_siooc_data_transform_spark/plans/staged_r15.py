"""STAGED round-15 queries — NOT registered (round-15 runway seed).

Same contract as staged_r5..r14: LOCAL registry, strict-harness pytest
coverage in tests/test_staged_r15.py, idempotent ``activate()``.
Activation order: staged_r9 (round 9) -> ... -> staged_r14 (round 14)
-> this module (round 15). Budget: <= 50 fresh names at activation.

Content so far:

- Wave A — the GSW ledger's 'planned' tail (tools/gsw_ufunc_ledger.py):
  the pt <-> potential-enthalpy-of-ice polynomial pair (published
  TEOS-10 fit coefficients; one table serves the forward poly, the
  Newton inverse, and — chained with the freezing line — the
  frazil/pot-enthalpy-freezing _poly family), the pot-enthalpy-at-
  freezing polynomial + its symdiff first derivatives, the EXACT
  CT_freezing first derivatives, the SA-from-freezing-t polynomial
  inversion, exact-h twins of the melting/frazil ratio surfaces, and
  second derivatives of pt(SA, entropy) via a second symdiff pass.
- Wave B — queueing/forecast/robust-stat battery over events/orders.
- Wave C — LLM-pipeline audits: isotropy, split contamination,
  packing wastage, shard mixing entropy.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.plans.staged_r11 import _stage_sql_cte
from cioos_siooc_data_transform_spark.plans.staged_r13 import _q6, _q9, _q12
from cioos_siooc_data_transform_spark.session import read_table as _t

STAGED_QUERIES: dict[str, Callable[..., Any]] = {}
STAGED_ORACLES: dict[str, str] = {}


def activate() -> int:
    """Round-15 activation (idempotent)."""
    from cioos_siooc_data_transform_spark.plans.registry import ORACLES, QUERIES

    n = 0
    for name, fn in STAGED_QUERIES.items():
        if name not in QUERIES:
            QUERIES[name] = fn
            ORACLES[name] = STAGED_ORACLES[name]
            n += 1
    return n


# ===========================================================================
# Wave A — GSW ledger tail.
# ===========================================================================

# ---------------------------------------------------------------------------
# The pt0_ice <-> potential-enthalpy-of-ice polynomial pair (GSW twins:
# gsw_pt_from_pot_enthalpy_ice_poly — the primary published fit, pt as
# a degree-7 polynomial in h_pot — and gsw_pot_enthalpy_from_pt_ice_poly,
# which GSW itself computes by Newton-inverting that fit from a second
# published degree-7 initial-estimate polynomial). Coefficients are the
# published TEOS-10 fit constants (reference parity anchor:
# GSW-Python src/c_gsw/gsw_oceanographic_toolbox.c:6594,6601 — fit
# error <= 6e-3 J/kg over pt0 in [-100, 2] degC); the Newton derivative
# is the SYMBOLIC q'(h) (functions/symdiff.py), not a hand-coded table.
# ---------------------------------------------------------------------------
_PT_FROM_POTH_Q = [
    2.533588268773218e2, 2.594351081876611e-3, 1.765077810213815e-8,
    7.768070564290540e-14, 2.034842254277530e-19, 3.220014531712841e-25,
    2.845172809636068e-31, 1.094005878892950e-37,
]
_POTH_FROM_PT_P = [
    -3.333601570157700e5, 2.096693916810367e3, 3.687110754043292,
    4.559401565980682e-4, -2.516011957758120e-6, -1.040364574632784e-8,
    -1.701786588412454e-10, -7.667191301635057e-13,
]


def _horner(coeffs: list[float], var: str) -> str:
    expr = f"{coeffs[-1]:.16e}"
    for c in reversed(coeffs[:-1]):
        expr = f"({c:.16e} + {var}*{expr})"
    return expr


_PTQ_SENTINEL = "__PTQH__"
_PTQ_DERIV_TEMPLATE: list[str] = []


def _pt_from_poth_poly_sql(h: str) -> str:
    return _horner(_PT_FROM_POTH_Q, f"({h})")


def _pt_from_poth_poly_deriv_sql(h: str) -> str:
    if not _PTQ_DERIV_TEMPLATE:
        from cioos_siooc_data_transform_spark.functions.symdiff import (
            diff_sql,
        )

        _PTQ_DERIV_TEMPLATE.append(
            diff_sql(_pt_from_poth_poly_sql(_PTQ_SENTINEL), _PTQ_SENTINEL)
        )
    return _PTQ_DERIV_TEMPLATE[0].replace(_PTQ_SENTINEL, f"({h})")


def _poth_poly_pair_stages() -> list[tuple[str, str]]:
    """h0 from the published initial-estimate polynomial, two Newton
    steps pt(h) = pt0 with the symbolic q'(h) (GSW runs a five-step
    modified Newton to cover pt0 down to -100 degC; over this grid's
    [-39.5, -0.5] envelope two plain steps land the residual below the
    1e-9 output floor, and BOTH engines evaluate the one shared
    tree)."""
    stages = [("__php_h0", _horner(_POTH_FROM_PT_P, "t"))]
    cur = "__php_h0"
    for i in range(2):
        stages += [
            (
                f"__php_r{i}",
                f"({_pt_from_poth_poly_sql(cur)} - t)",
            ),
            (
                f"__php_d{i}",
                _pt_from_poth_poly_deriv_sql(cur),
            ),
            (f"__php_h{i + 1}", f"({cur} - __php_r{i}/__php_d{i})"),
        ]
        cur = f"__php_h{i + 1}"
    stages += [
        ("pot_h_poly", cur),
        ("pt_roundtrip", _pt_from_poth_poly_sql(cur)),
    ]
    return stages


def _ice15_query(name: str, stages_fn, outs):
    """Ice-grid builder registering into THIS slate's dicts."""
    from cioos_siooc_data_transform_spark.plans.staged_r8 import (
        _ICE_IN_SQL,
        _ice_inputs,
    )

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = _ice_inputs(spark, sf_dir)
        for sname, expr in stages_fn():
            df = df.withColumn(sname, F.expr(expr))
        return df.select(
            "l_orderkey",
            "l_linenumber",
            *[F.expr(e).alias(c) for c, e in outs],
        )

    staged = _stage_sql_cte(_ICE_IN_SQL, stages_fn())
    sel = ",\n           ".join(f"{e} AS {c}" for c, e in outs)
    STAGED_QUERIES[name] = fn
    STAGED_ORACLES[name] = f"""
    SELECT l_orderkey, l_linenumber,
           {sel}
    FROM ({staged})
    """
    return fn


_ice15_query(
    "gsw_pot_enthalpy_ice_poly_pair",
    _poth_poly_pair_stages,
    [
        # h_pot ~ -3.4e5 J/kg: 1e-6 floor keeps ~12 significant digits.
        ("pot_h_poly", _q6("pot_h_poly")),
        # the roundtrip pt pins the forward fit (== grid t to ~1e-11).
        ("pt_roundtrip", _q9("pt_roundtrip")),
    ],
)


# ---------------------------------------------------------------------------
# Potential enthalpy of ice at the freezing point — POLYNOMIAL form
# (GSW twins: gsw_pot_enthalpy_ice_freezing_poly and its
# first derivatives gsw_pot_enthalpy_ice_freezing_first_derivatives_poly):
# the published direct fit h_pot_f(SA, p) (reference parity anchor:
# gsw_oceanographic_toolbox.c gsw_pot_enthalpy_ice_freezing_poly), with
# BOTH first derivatives minted by the symbolic differentiator — the
# d/dSA chain passes through x = sqrt(SA/100) mechanically.
# ---------------------------------------------------------------------------
_PIF_C = [
    -3.333548730778702e5, -1.249490228128056e4, 0.891189273859881e4,
    -2.405994758887321e4, 3.217945710496395e4, -2.374817375023954e4,
    0.651630522289954e4, -2.034535061416256e4, -0.252580687014574e4,
    0.021290274388826e4, 0.315423710959628e3, -0.239518382138314e3,
    0.379377450285737e3, 0.822414256564615e3, -1.781443326566310e3,
    -0.160245473297112e3, -1.923856387576336e3, 2.522158744711316e3,
    0.268604113069031e3, 0.967023925992424e3, -1.052684746354551e3,
    -0.184147500983788e3, -0.263384562367307e3,
]
_PIF_SENTINELS = ("__PIFSA__", "__PIFP__")
_PIF_TEMPLATES: dict[int, str] = {}


def _pot_h_ice_freezing_poly_sql(sa: str, p: str) -> str:
    c = [f"{v:.16e}" for v in _PIF_C]
    sa_r = f"(({sa})*1.0e-2)"
    x = f"sqrt({sa_r})"
    p_r = f"(({p})*1.0e-4)"
    return (
        f"({c[0]} + {sa_r}*({c[1]} + {x}*({c[2]} + {x}*({c[3]} + {x}*({c[4]}"
        f" + {x}*({c[5]} + {c[6]}*{x})))))"
        f" + {p_r}*({c[7]} + {p_r}*({c[8]} + {c[9]}*{p_r}))"
        f" + {sa_r}*{p_r}*({c[10]} + {p_r}*({c[12]} + {p_r}*({c[15]}"
        f" + {c[21]}*{sa_r})) + {sa_r}*({c[13]} + {c[17]}*{p_r}"
        f" + {c[19]}*{sa_r}) + {x}*({c[11]} + {p_r}*({c[14]}"
        f" + {c[18]}*{p_r}) + {sa_r}*({c[16]} + {c[20]}*{p_r}"
        f" + {c[22]}*{sa_r}))))"
    )


def _pif_deriv_sql(sa: str, p: str, var: int) -> str:
    if var not in _PIF_TEMPLATES:
        from cioos_siooc_data_transform_spark.functions.symdiff import (
            diff_sql,
        )

        sa_, p_ = _PIF_SENTINELS
        _PIF_TEMPLATES[var] = diff_sql(
            _pot_h_ice_freezing_poly_sql(sa_, p_), _PIF_SENTINELS[var]
        )
    sa_, p_ = _PIF_SENTINELS
    return _PIF_TEMPLATES[var].replace(sa_, f"({sa})").replace(p_, f"({p})")


def _freeze15_query(name: str, stages_fn, outs):
    """Freeze-grid builder registering into THIS slate's dicts."""
    from cioos_siooc_data_transform_spark.plans.staged_r13 import (
        _freeze_in_sql,
        _freeze_inputs,
    )

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = _freeze_inputs(spark, sf_dir)
        for sname, expr in stages_fn():
            df = df.withColumn(sname, F.expr(expr))
        return df.select(
            "l_orderkey",
            "l_linenumber",
            *[F.expr(e).alias(c) for c, e in outs],
        )

    staged = _stage_sql_cte(_freeze_in_sql(), stages_fn())
    sel = ",\n           ".join(f"{e} AS {c}" for c, e in outs)
    STAGED_QUERIES[name] = fn
    STAGED_ORACLES[name] = f"""
    SELECT l_orderkey, l_linenumber,
           {sel}
    FROM ({staged})
    """
    return fn


def _pif_poly_stages() -> list[tuple[str, str]]:
    return [
        ("__pif_h", _pot_h_ice_freezing_poly_sql("sa", "p")),
        ("__pif_h_sa", _pif_deriv_sql("sa", "p", 0)),
        ("__pif_h_p", _pif_deriv_sql("sa", "p", 1)),
    ]


_freeze15_query(
    "gsw_pot_enthalpy_ice_freezing_poly",
    _pif_poly_stages,
    [
        ("pot_h_if_poly", _q6("__pif_h")),
        ("pot_h_if_poly_sa", _q6("__pif_h_sa")),
        ("pot_h_if_poly_p", _q6("__pif_h_p")),
    ],
)


# ---------------------------------------------------------------------------
# Exact CT_freezing machinery, shared by three wave-A queries: the
# Millero freezing line t_f(SA, p) + its symdiff derivatives, the
# CT-derivative triple evaluated AT t_f (staged_r14's entropy-chain
# stages — the same pieces the registered wrt-t-exact query anchors),
# the exact-Gibbs enthalpy readoffs h / h_SA / h_CT at (SA, t_f, p)
# (reusing the chain's own polished pt0), and the IAPWS-06 ice chain at
# (t_f, p). Catalyst prunes whatever a consumer doesn't select.
# ---------------------------------------------------------------------------
_CT_T_EXPR = "(__cdt_ct_pt*__cdt_eta_t/__cdt_eta0_t)"
_CT_P_EXPR = "(__cdt_ct_pt*__cdt_eta_p/__cdt_eta0_t)"
_CT_SA_EXPR = (
    "(__cdt_ct_sa + __cdt_ct_pt"
    "*(__cdt_eta_sa - __cdt_eta0_sa)/__cdt_eta0_t)"
)


def _ctf_exact_stages() -> list[tuple[str, str]]:
    from cioos_siooc_data_transform_spark.functions.ice import (
        gibbs_ice_stages,
    )
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        GSW_CP0,
        GSW_SSO,
        _lit,
        ct_from_pt_sql,
        gibbs_sw_sql,
        t_freezing_sql,
    )
    from cioos_siooc_data_transform_spark.plans.staged_r14 import (
        _ct_derivs_wrt_t_stages,
        _tf_deriv_sql,
    )

    ups = _lit(GSW_SSO / 35.0)
    stages = [
        ("__cfx_tf", t_freezing_sql("s", "p")),
        ("__cfx_tf_sa", f"({_tf_deriv_sql('s', 'p', 0)}/{ups})"),
        ("__cfx_tf_p", _tf_deriv_sql("s", "p", 1)),
    ]
    stages += _ct_derivs_wrt_t_stages(t_col="__cfx_tf")
    stages += [
        # CTf from the chain's own POLISHED pt0 (not the 1.5-step
        # McDougall-Wotherspoon shortcut ct_from_t_sql uses): the value
        # and its chain-rule derivatives then live on the same implicit
        # surface, which is what makes the FD pin in
        # tests/test_staged_r15.py tight (~1e-9) instead of inheriting
        # the ~1e-5-K pt0 shortcut error's SA/p variation.
        ("__cfx_ctf", ct_from_pt_sql("sa", "__cdt_pt0")),
        # chain rule: CTf(SA, p) = CT(SA, t_f(SA, p), p)
        (
            "__cfx_ctf_sa",
            f"({_CT_SA_EXPR} + {_CT_T_EXPR}*__cfx_tf_sa)",
        ),
        (
            "__cfx_ctf_p",
            f"({_CT_P_EXPR} + {_CT_T_EXPR}*__cfx_tf_p)",
        ),
        # exact-Gibbs enthalpy readoffs at (sa, t_f, p); __cdt_pt0 is
        # the chain's polished pt0 at t_f, reused.
        (
            "__cfx_tr",
            "((273.15e0 + __cfx_tf)/(273.15e0 + __cdt_pt0))",
        ),
        ("__cfx_g", gibbs_sw_sql("sa", "__cfx_tf", "p")),
        ("__cfx_gt", gibbs_sw_sql("sa", "__cfx_tf", "p", dt=1)),
        ("__cfx_h", "(__cfx_g - (273.15e0 + __cfx_tf)*__cfx_gt)"),
        ("__cfx_gsa", gibbs_sw_sql("sa", "__cfx_tf", "p", dsa=1)),
        ("__cfx_gsa0", gibbs_sw_sql("sa", "__cdt_pt0", "0.0e0", dsa=1)),
        ("__cfx_hct", f"({_lit(GSW_CP0)}*__cfx_tr)"),
        ("__cfx_hsa", "(__cfx_gsa - __cfx_tr*__cfx_gsa0)"),
    ]
    stages += gibbs_ice_stages("__cfx_tf", "p", x="__cfxi_", out="__cfx_")
    return stages


_freeze15_query(
    "gsw_ct_freezing_first_derivatives",
    _ctf_exact_stages,
    [
        # GSW twin: gsw_CT_freezing_first_derivatives (the EXACT
        # family; the _poly twin is already registered via r13's
        # gsw_ct_freezing_derivs_poly). K per (g/kg), and K/Pa x 1e8.
        ("ctf", _q9("__cfx_ctf")),
        ("ctf_sa", _q9("__cfx_ctf_sa")),
        ("ctf_p_e8", _q9("(1.0e8*(1.0e-4*__cfx_ctf_p))")),
    ],
)


_freeze15_query(
    "gsw_melting_equilibrium_ratios_exact",
    _ctf_exact_stages,
    [
        # GSW twins: gsw_melting_ice_equilibrium_SA_CT_ratio AND
        # gsw_melting_seaice_equilibrium_SA_CT_ratio — at equilibrium
        # (both phases at the freezing point) the brine fraction
        # vanishes and the two ufuncs compute the SAME ratio
        # SA*h_CT/(h - h_Ih - SA*h_SA) (McDougall, Barker & Feistel
        # 2013, eqn 29); the poly twins are r13's
        # gsw_melting_ice_equilibrium_ratio. All pieces EXACT Gibbs.
        (
            "equilibrium_sa_ct_ratio",
            _q9(
                "(sa*__cfx_hct"
                "/(__cfx_h - __cfx_enthalpy_ice - sa*__cfx_hsa))"
            ),
        ),
    ],
)


def _frazil_exact_stages() -> list[tuple[str, str]]:
    """EXACT-freezing-surface twin of staged_r14's frazil ratios (GSW
    twin: gsw_frazil_ratios_adiabatic; the shipped r14 query carries
    the _poly freezing surface): the CTf value/derivative triple and
    the h/h_SA/h_CT readoffs all come from the exact-Gibbs chain above;
    only the mixture algebra (McDougall, Barker & Feistel 2013 eqns
    same as r14) differs from the shared stages."""
    stages = _ctf_exact_stages()
    stages += [
        ("__fxz_gamma", "(-__cfxi_gtp/__cfxi_gtt)"),
        ("__fxz_wcp", "(__cfx_cp_ice*w_ih/(1.0e0 - w_ih))"),
        (
            "__fxz_part",
            "((1.0e-4*__cfx_tf_p - __fxz_gamma)/(1.0e-4*__cfx_ctf_p))",
        ),
        ("__fxz_b1", "(__cfx_hct + __fxz_wcp*__fxz_part)"),
        (
            "__fxz_b2",
            "(__cfx_h - __cfx_enthalpy_ice"
            " - sa*(__cfx_hsa + __fxz_wcp*(__cfx_tf_sa"
            " - __fxz_part*__cfx_ctf_sa)))",
        ),
        (
            "__fxz_rb3",
            "(1.0e0/(__cfx_h - __cfx_enthalpy_ice"
            " - sa*(__cfx_hsa + __cfx_hct*__cfx_ctf_sa"
            " + __fxz_wcp*__cfx_tf_sa)))",
        ),
    ]
    return stages


def _melt15_query(name: str, stages_fn, outs):
    """Melt-grid builder registering into THIS slate's dicts."""
    from cioos_siooc_data_transform_spark.plans.staged_r14 import (
        _melt_in_sql,
        _melt_inputs,
    )

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


_melt15_query(
    "gsw_frazil_ratios_adiabatic_exact",
    _frazil_exact_stages,
    [
        ("dsa_dct_frazil", _q9("(sa*__fxz_b1/__fxz_b2)")),
        (
            "dsa_dp_frazil_e9",
            _q9("(1.0e9*sa*(1.0e-4*__cfx_ctf_p)*__fxz_b1*__fxz_rb3)"),
        ),
        (
            "dct_dp_frazil_e9",
            _q9("(1.0e9*(1.0e-4*__cfx_ctf_p)*__fxz_b2*__fxz_rb3)"),
        ),
    ],
)


# ---------------------------------------------------------------------------
# SA from the freezing temperature, polynomial family (GSW twin:
# gsw_SA_freezing_from_t_poly): solve ctf_poly(SA, p) =
# CT(SA/uPS, t, p) for SA by Newton — the same equation GSW's routine
# iterates. The grid feeds t = t_f(SA_grid, p) (the Millero line), so
# the root is the roundtrip SA to within the poly-vs-Millero mK
# difference; the ctf_poly SA-derivative is the symdiff template
# (staged_r13's _ctf_deriv_sql) and the small dCT/dSA term uses a
# central difference — one shared literal tree on both engines.
# ---------------------------------------------------------------------------
def _sa_freezing_from_t_poly_stages() -> list[tuple[str, str]]:
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        GSW_SSO,
        _lit,
        ct_freezing_poly_sql,
        ct_from_t_sql,
        t_freezing_sql,
    )
    from cioos_siooc_data_transform_spark.plans.staged_r13 import (
        _ctf_deriv_sql,
    )

    ups = _lit(GSW_SSO / 35.0)
    eps = "1.0e-3"
    stages: list[tuple[str, str]] = [
        ("__sfp_t", t_freezing_sql("s", "p")),
        ("__sfp_s0", "s"),
    ]
    for i in range(3):
        cur = f"__sfp_s{i}"
        sa_cur = f"({cur}*{ups})"
        stages += [
            (
                f"__sfp_f{i}",
                f"({ct_freezing_poly_sql(sa_cur, 'p', '0.0e0')}"
                f" - {ct_from_t_sql(cur, '__sfp_t', 'p')})",
            ),
            (
                f"__sfp_d{i}",
                f"({_ctf_deriv_sql(sa_cur, 'p', 0)}*{ups}"
                f" - ({ct_from_t_sql(f'({cur} + {eps})', '__sfp_t', 'p')}"
                f" - {ct_from_t_sql(f'({cur} - {eps})', '__sfp_t', 'p')})"
                f"/(2.0e0*{eps}))",
            ),
            (f"__sfp_s{i + 1}", f"({cur} - __sfp_f{i}/__sfp_d{i})"),
        ]
    stages.append(("sa_freezing_from_t_poly", f"(__sfp_s3*{ups})"))
    return stages


_freeze15_query(
    "gsw_sa_freezing_from_t_poly",
    _sa_freezing_from_t_poly_stages,
    [("sa_freezing_from_t_poly", _q9("sa_freezing_from_t_poly"))],
)


# ---------------------------------------------------------------------------
# frazil_properties_potential — POLYNOMIAL form (GSW twin:
# gsw_frazil_properties_potential_poly): same equilibrium solve as the
# r14 exact-potential query, but with BOTH thermodynamic surfaces the
# direct published polynomials the reference itself substitutes in its
# _poly path (reference gsw_oceanographic_toolbox.c:3423 —
# h_pot_ihf = gsw_pot_enthalpy_ice_freezing_poly(sa, p)):
#   h_pot_bulk = (1−w)·cp0·CTf_poly(SA_f, p) + w·h_pot_if_poly(SA_f, p),
#   w = 1 − SA_bulk/SA_f.
# Because both surfaces are closed-form polynomials, the Newton slope
# is the SYMBOLIC residual derivative (no fixed-slope approximation):
#   d/dSA_f [ (SA_b/SA_f)·cp0·CTf + (1−SA_b/SA_f)·h_if ]
# with every piece a symdiff template. Roundtrip construction: the
# bulk state is mixed from the grid's own (SA, p, w_ih), so the solve
# recovers SA_f = SA and w = w_ih (pinned in tests).
# ---------------------------------------------------------------------------
def _frazil_potential_poly_stages() -> list[tuple[str, str]]:
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        GSW_CP0,
        _lit,
        ct_freezing_poly_sql,
    )
    from cioos_siooc_data_transform_spark.plans.staged_r13 import (
        _ctf_deriv_sql,
    )

    cp0 = _lit(GSW_CP0)
    stages = [
        ("__fpp_ctf0", ct_freezing_poly_sql("sa", "p", "0.0e0")),
        ("__fpp_hif0", _pot_h_ice_freezing_poly_sql("sa", "p")),
        ("__fpp_sabulk", "((1.0e0 - w_ih)*sa)"),
        (
            "__fpp_hbulk",
            f"((1.0e0 - w_ih)*{cp0}*__fpp_ctf0 + w_ih*__fpp_hif0)",
        ),
        ("__fpp_s0", "(__fpp_sabulk/0.95e0)"),
    ]
    for k in (1, 2, 3):
        prev = "__fpp_s0" if k == 1 else f"__fpp_s{k - 1}"
        x = f"__fpp_i{k}_"
        stages += [
            (f"{x}ctf", ct_freezing_poly_sql(prev, "p", "0.0e0")),
            (f"{x}hif", _pot_h_ice_freezing_poly_sql(prev, "p")),
            (f"{x}ctf_sa", _ctf_deriv_sql(prev, "p", 0)),
            (f"{x}hif_sa", _pif_deriv_sql(prev, "p", 0)),
            (f"{x}wf", f"(__fpp_sabulk/{prev})"),
            (
                f"{x}res",
                f"(__fpp_hbulk - {x}wf*{cp0}*{x}ctf"
                f" - (1.0e0 - {x}wf)*{x}hif)",
            ),
            # d(res)/dSA_f: the weight derivative is +SA_b/SA_f², and
            # the surfaces differentiate symbolically.
            (
                f"{x}dres",
                f"({x}wf/{prev}*{cp0}*{x}ctf"
                f" - {x}wf*{cp0}*{x}ctf_sa"
                f" - {x}wf/{prev}*{x}hif"
                f" - (1.0e0 - {x}wf)*{x}hif_sa)",
            ),
            (f"__fpp_s{k}", f"({prev} - {x}res/{x}dres)"),
        ]
    stages += [
        ("__fpp_saf", "__fpp_s3"),
        ("__fpp_ctf", ct_freezing_poly_sql("__fpp_s3", "p", "0.0e0")),
        ("__fpp_w", "(1.0e0 - __fpp_sabulk/__fpp_s3)"),
    ]
    return stages


_melt15_query(
    "gsw_frazil_properties_potential_poly",
    _frazil_potential_poly_stages,
    [
        ("sa_final", _q9("__fpp_saf")),
        ("ct_final", _q9("__fpp_ctf")),
        ("w_ih_final", _q9("__fpp_w")),
    ],
)


# ---------------------------------------------------------------------------
# melting_seaice_SA_CT_ratio — EXACT-enthalpy form (GSW twin: the
# unsuffixed gsw_melting_seaice_SA_CT_ratio; the r14 query with the
# 75-term h maps to _poly): same mixture algebra as r14's
# _seaice_common_stages (brine salinity via the fixed-slope Newton on
# the Millero line, exact-Gibbs brine enthalpy), with the SEAWATER
# h / h_SA / h_CT replaced by the exact-Gibbs readoffs at (SA, t, p)
# (h = g − T·g_T, h_CT = cp0·(T0+t)/(T0+pt0), h_SA = g_SA −
# (T0+t)/(T0+pt0)·g_SA(pt0, 0)).
# ---------------------------------------------------------------------------
def _seaice_ratio_exact_stages() -> list[tuple[str, str]]:
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        GSW_CP0,
        _lit,
        gibbs_sw_sql,
        pt0_from_t_sql,
    )
    from cioos_siooc_data_transform_spark.plans.staged_r14 import (
        _seaice_common_stages,
    )

    stages = list(_seaice_common_stages())
    stages += [
        ("__sx_pt0", pt0_from_t_sql("s", "t", "p")),
        ("__sx_tr", "((273.15e0 + t)/(273.15e0 + __sx_pt0))"),
        ("__sx_g", gibbs_sw_sql("sa", "t", "p")),
        ("__sx_gt", gibbs_sw_sql("sa", "t", "p", dt=1)),
        ("__sx_h", "(__sx_g - (273.15e0 + t)*__sx_gt)"),
        ("__sx_gsa", gibbs_sw_sql("sa", "t", "p", dsa=1)),
        ("__sx_gsa0", gibbs_sw_sql("sa", "__sx_pt0", "0.0e0", dsa=1)),
        ("__sx_hct", f"({_lit(GSW_CP0)}*__sx_tr)"),
        ("__sx_hsa", "(__sx_gsa - __sx_tr*__sx_gsa0)"),
    ]
    return stages


def _seaice15_query(name: str, stages_fn, outs):
    """Sea-ice-grid builder registering into THIS slate's dicts."""
    from cioos_siooc_data_transform_spark.plans.staged_r14 import (
        _seaice_in_sql,
        _seaice_inputs,
    )

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = _seaice_inputs(spark, sf_dir)
        for sname, expr in stages_fn():
            df = df.withColumn(sname, F.expr(expr))
        return df.select(
            "l_orderkey",
            "l_linenumber",
            *[F.expr(e).alias(c) for c, e in outs],
        )

    staged = _stage_sql_cte(_seaice_in_sql(), stages_fn())
    sel = ",\n           ".join(f"{e} AS {c}" for c, e in outs)
    STAGED_QUERIES[name] = fn
    STAGED_ORACLES[name] = f"""
    SELECT l_orderkey, l_linenumber,
           {sel}
    FROM ({staged})
    """
    return fn


_seaice15_query(
    "gsw_melting_seaice_sa_ct_ratio_exact",
    _seaice_ratio_exact_stages,
    [
        (
            "seaice_sa_ct_ratio_exact",
            _q9(
                "(__sx_hct*(sa - sa_si)"
                " / (__sx_h - __si_enthalpy_ice - (sa - sa_si)*__sx_hsa"
                "    - sa_si*(__si_hbrine - __si_enthalpy_ice)/__si_sabr))"
            ),
        ),
    ],
)


# ---------------------------------------------------------------------------
# pt_second_derivatives (GSW twin: gsw_pt_second_derivatives): the
# second derivatives of pt(SA, CT) by the implicit-function theorem on
# the forward CT(SA, pt) surface — differentiating pt_CT = 1/CT_pt and
# pt_SA = −CT_SA/CT_pt ALONG the level set (d/dx|_CT carries the
# pt-motion term pt_x):
#   pt_CT_CT = −CT_ptpt / CT_pt³,
#   pt_SA_CT = −(CT_SApt + CT_ptpt·pt_SA) / CT_pt²,
#   pt_SA_SA = −[(CT_SASA + CT_SApt·pt_SA)
#               + pt_SA·(CT_SApt + CT_ptpt·pt_SA)] / CT_pt.
# All five forward derivatives are the one symdiff template family the
# r12 first/second-derivative queries already anchor; evaluated on the
# (SA, pt) grid at CT = ct_from_pt(SA, pt) (the inversion family's
# roundtrip contract). FD-pinned against the r12 pt_first_derivatives
# ratios in tests.
# ---------------------------------------------------------------------------
def _pt_second_stages() -> list[tuple[str, str]]:
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_derivative_sql,
    )

    return [
        ("__pts_csa", ct_derivative_sql("sa", "pt", 1, 0)),
        ("__pts_cpt", ct_derivative_sql("sa", "pt", 0, 1)),
        ("__pts_css", ct_derivative_sql("sa", "pt", 2, 0)),
        ("__pts_cst", ct_derivative_sql("sa", "pt", 1, 1)),
        ("__pts_ctt", ct_derivative_sql("sa", "pt", 0, 2)),
        ("__pts_ptsa", "(-__pts_csa/__pts_cpt)"),
        (
            "pt_ct_ct",
            "(-__pts_ctt/(__pts_cpt*__pts_cpt*__pts_cpt))",
        ),
        (
            "pt_sa_ct",
            "(-(__pts_cst + __pts_ctt*__pts_ptsa)"
            "/(__pts_cpt*__pts_cpt))",
        ),
        (
            "pt_sa_sa",
            "(-((__pts_css + __pts_cst*__pts_ptsa)"
            " + __pts_ptsa*(__pts_cst + __pts_ctt*__pts_ptsa))"
            "/__pts_cpt)",
        ),
    ]


def _ctd15_query(name: str, stages_fn, outs):
    """(SA, pt)-grid builder registering into THIS slate's dicts."""
    from cioos_siooc_data_transform_spark.plans.staged_r12 import (
        _ctd_inner,
        _ctd_inputs,
    )

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = _ctd_inputs(spark, sf_dir)
        for sname, expr in stages_fn():
            df = df.withColumn(sname, F.expr(expr))
        return df.select(
            "l_orderkey",
            "l_linenumber",
            *[F.expr(e).alias(c) for c, e in outs],
        )

    staged = _stage_sql_cte(_ctd_inner(), stages_fn())
    sel = ",\n           ".join(f"{e} AS {c}" for c, e in outs)
    STAGED_QUERIES[name] = fn
    STAGED_ORACLES[name] = f"""
    SELECT l_orderkey, l_linenumber,
           {sel}
    FROM ({staged})
    """
    return fn


_ctd15_query(
    "gsw_pt_second_derivatives",
    _pt_second_stages,
    [
        # magnitudes: pt_SA_SA ~1e-4, pt_SA_CT ~1e-3, pt_CT_CT ~1e-3;
        # x1e6 + 1e-6 floor keeps ~9 significant digits — well above
        # the cross-engine last-ulp band (a x1e12 emission flipped a
        # 1e-14-relative floor boundary).
        ("pt_sa_sa_e6", _q6("(1.0e6*pt_sa_sa)")),
        ("pt_sa_ct_e6", _q6("(1.0e6*pt_sa_ct)")),
        ("pt_ct_ct_e6", _q6("(1.0e6*pt_ct_ct)")),
    ],
)


# ---------------------------------------------------------------------------
# frazil_properties — IN-SITU-enthalpy form (GSW twin:
# gsw_frazil_properties, the family head): the equilibrium solve on
# the heat balance written in in-situ enthalpies,
#   h_bulk = (1−w)·h(SA_f, CTf(SA_f), p) + w·h_Ih(t_f(SA_f), p),
# where h at the freezing point is the EXACT Gibbs readoff
# g − T·g_T evaluated at (SA_f, t_f, p) (no pt0 needed for h itself)
# and h_Ih is the IAPWS-06 chain — the same surfaces the reference
# composes (gsw_oceanographic_toolbox.c gsw_frazil_properties:
# gsw_enthalpy_ct_exact + gsw_enthalpy_ice). Fixed-slope Newton from a
# central difference at the initial guess (the r14 potential-form
# recipe); ROUNDTRIP construction — the bulk state is mixed from the
# grid's own (SA, w_ih), so the solve recovers them (pinned in tests).
# ---------------------------------------------------------------------------
def _frazil_insitu_stages() -> list[tuple[str, str]]:
    from cioos_siooc_data_transform_spark.functions.ice import (
        gibbs_ice_stages,
    )
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        GSW_SSO,
        _lit,
        gibbs_sw_sql,
        t_freezing_sql,
    )

    ups = _lit(GSW_SSO / 35.0)

    def h_at_freezing(sa_col: str, x: str) -> list[tuple[str, str]]:
        """tf, exact seawater h and IAPWS ice h at the freezing line of
        sa_col (h = g − T·g_T needs no pt0)."""
        st = [(f"{x}tf", t_freezing_sql(f"(({sa_col})/{ups})", "p"))]
        st += [
            (f"{x}g", gibbs_sw_sql(sa_col, f"{x}tf", "p")),
            (f"{x}gt", gibbs_sw_sql(sa_col, f"{x}tf", "p", dt=1)),
            (f"{x}h", f"({x}g - (273.15e0 + {x}tf)*{x}gt)"),
        ]
        st += gibbs_ice_stages(f"{x}tf", "p", x=f"{x}i_", out=f"{x}o_")
        return st

    def residual_at(sa_col: str, x: str) -> list[tuple[str, str]]:
        st = h_at_freezing(sa_col, x)
        st.append(
            (
                f"{x}res",
                f"(__fi_hbulk - (__fi_sabulk/({sa_col}))*{x}h"
                f" - (1.0e0 - __fi_sabulk/({sa_col}))*{x}o_enthalpy_ice)",
            )
        )
        return st

    stages = h_at_freezing("sa", "__fi_b_")
    stages += [
        ("__fi_sabulk", "((1.0e0 - w_ih)*sa)"),
        (
            "__fi_hbulk",
            "((1.0e0 - w_ih)*__fi_b_h + w_ih*__fi_b_o_enthalpy_ice)",
        ),
        ("__fi_s0", "(__fi_sabulk/0.95e0)"),
    ]
    stages += residual_at("(__fi_s0*1.01e0)", "__fi_dhi_")
    stages += residual_at("(__fi_s0*0.99e0)", "__fi_dlo_")
    stages.append(
        ("__fi_slope", "((__fi_dhi_res - __fi_dlo_res)/(0.02e0*__fi_s0))")
    )
    for k in (1, 2, 3):
        prev = "__fi_s0" if k == 1 else f"__fi_s{k - 1}"
        x = f"__fi_i{k}_"
        stages += residual_at(prev, x)
        stages.append((f"__fi_s{k}", f"({prev} - {x}res/__fi_slope)"))
    stages += h_at_freezing("__fi_s3", "__fi_f_")
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_from_t_sql,
    )

    stages += [
        ("__fi_saf", "__fi_s3"),
        (
            "__fi_ctf",
            ct_from_t_sql(f"(__fi_s3/{ups})", "__fi_f_tf", "p"),
        ),
        ("__fi_w", "(1.0e0 - __fi_sabulk/__fi_s3)"),
    ]
    return stages


_melt15_query(
    "gsw_frazil_properties",
    _frazil_insitu_stages,
    [
        ("sa_final", _q9("__fi_saf")),
        ("ct_final", _q9("__fi_ctf")),
        ("w_ih_final", _q9("__fi_w")),
    ],
)


# ---------------------------------------------------------------------------
# enthalpy_second_derivatives_CT_exact — the FULL tuple (GSW twin:
# gsw_enthalpy_second_derivatives_CT_exact; r14's
# gsw_enthalpy_ct_ct_exact ships the h_CT_CT member alone): the
# McDougall (2003) identities in Gibbs readoffs at the two states
# (SA, t, p) and (SA, pt0, 0) —
#   part_b = (ratio·g_SAT0/g_TT0 − g_SAT/g_TT)/(T0+pt0),
#   h_SA_CT = cp0·part_b − (g_SA0/cp0)·h_CT_CT,
#   h_SA_SA = g_SASA − ratio·g_SASA0 + ratio·g_SAT0²/g_TT0
#             − g_SAT²/g_TT − 2·g_SA0·part_b + (g_SA0/cp0)²·h_CT_CT,
# every readoff a symdiff template of the one published Gibbs table
# (reference composes hand-differentiated tables the same way:
# gsw_oceanographic_toolbox.c gsw_enthalpy_second_derivatives_ct_exact;
# its small-SA guard is unreachable on this SA >= 30 envelope). On the
# grid CT is the forward conversion of t, so t(CT) = t and pt0 is the
# direct inversion. Cross-pinned against the analytic-polynomial
# h second derivatives (r12) in tests.
# ---------------------------------------------------------------------------
def _h_second_ct_exact_stages() -> list[tuple[str, str]]:
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        GSW_CP0,
        _lit,
        gibbs_sw_sql,
        pt0_from_t_sql,
    )

    cp0 = _lit(GSW_CP0)
    return [
        ("__hsd_pt0", pt0_from_t_sql("s", "t", "p")),
        ("__hsd_rpt0", "(1.0e0/(273.15e0 + __hsd_pt0))"),
        ("__hsd_ratio", "((273.15e0 + t)*__hsd_rpt0)"),
        ("__hsd_gtt0", gibbs_sw_sql("sa", "__hsd_pt0", "0.0e0", dt=2)),
        ("__hsd_gtt", gibbs_sw_sql("sa", "t", "p", dt=2)),
        (
            "h_ct_ct",
            f"({cp0}*{cp0}*(__hsd_ratio/__hsd_gtt0 - 1.0e0/__hsd_gtt)"
            "*__hsd_rpt0*__hsd_rpt0)",
        ),
        ("__hsd_gsat0", gibbs_sw_sql("sa", "__hsd_pt0", "0.0e0", dsa=1, dt=1)),
        ("__hsd_gsat", gibbs_sw_sql("sa", "t", "p", dsa=1, dt=1)),
        ("__hsd_gsa0", gibbs_sw_sql("sa", "__hsd_pt0", "0.0e0", dsa=1)),
        ("__hsd_gsasa0", gibbs_sw_sql("sa", "__hsd_pt0", "0.0e0", dsa=2)),
        ("__hsd_gsasa", gibbs_sw_sql("sa", "t", "p", dsa=2)),
        (
            "__hsd_partb",
            "((__hsd_ratio*__hsd_gsat0/__hsd_gtt0"
            " - __hsd_gsat/__hsd_gtt)*__hsd_rpt0)",
        ),
        ("__hsd_factor", f"(__hsd_gsa0/{cp0})"),
        (
            "h_sa_ct",
            f"({cp0}*__hsd_partb - __hsd_factor*h_ct_ct)",
        ),
        (
            "h_sa_sa",
            "(__hsd_gsasa - __hsd_ratio*__hsd_gsasa0"
            " + __hsd_ratio*__hsd_gsat0*__hsd_gsat0/__hsd_gtt0"
            " - __hsd_gsat*__hsd_gsat/__hsd_gtt"
            " - 2.0e0*__hsd_gsa0*__hsd_partb"
            " + __hsd_factor*__hsd_factor*h_ct_ct)",
        ),
    ]


def _gibbs15_query(name: str, stages_fn, outs):
    """(s, t, p, sa)-grid builder registering into THIS slate's dicts."""
    from cioos_siooc_data_transform_spark.plans.staged_r13 import (
        _freeze_in_sql,
        _freeze_inputs,
    )

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = _freeze_inputs(spark, sf_dir)
        for sname, expr in stages_fn():
            df = df.withColumn(sname, F.expr(expr))
        return df.select(
            "l_orderkey",
            "l_linenumber",
            *[F.expr(e).alias(c) for c, e in outs],
        )

    staged = _stage_sql_cte(_freeze_in_sql(), stages_fn())
    sel = ",\n           ".join(f"{e} AS {c}" for c, e in outs)
    STAGED_QUERIES[name] = fn
    STAGED_ORACLES[name] = f"""
    SELECT l_orderkey, l_linenumber,
           {sel}
    FROM ({staged})
    """
    return fn


_gibbs15_query(
    "gsw_enthalpy_second_derivatives_ct_exact",
    _h_second_ct_exact_stages,
    [
        # magnitudes: h_SA_SA ~0.1, h_SA_CT ~1, h_CT_CT ~1e-3 over the
        # envelope — x1e3/x1e3/x1e6 with a 1e-6 floor keeps ~9 digits.
        ("h_sa_sa_e3", _q6("(1.0e3*h_sa_sa)")),
        ("h_sa_ct_e3", _q6("(1.0e3*h_sa_ct)")),
        ("h_ct_ct_e6", _q6("(1.0e6*h_ct_ct)")),
    ],
)
