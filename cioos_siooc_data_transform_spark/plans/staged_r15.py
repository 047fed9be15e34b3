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
