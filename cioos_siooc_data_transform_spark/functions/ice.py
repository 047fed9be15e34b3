"""IAPWS-06 Gibbs function for hexagonal ice Ih — the GSW ice module's
thermodynamic core (GSW twins: gsw_gibbs_ice and the derived
rho_ice / cp_ice / entropy_ice / enthalpy_ice ufuncs in
GSW/_wrapped_ufuncs.py, re-exported via GSW/ice.py — reference
capability surface only; the implementation below is the PUBLISHED
IAPWS "Revised Release on the Equation of State 2006 for H2O Ice Ih"
(Feistel & Wagner 2006, J. Phys. Chem. Ref. Data 35, 1021)).

The formulation is a complex-valued Gibbs potential:

    g(T, p) = g0(p) − s0·Tt·τ
              + Tt·Re Σ_{k=1,2} r_k [ (t_k−τ)·ln(t_k−τ)
                                     + (t_k+τ)·ln(t_k+τ)
                                     − 2·t_k·ln(t_k) − τ²/t_k ]

with τ = T/Tt, t_k and r_k complex constants, and r_2 a quadratic in
(π−π0). Neither Spark nor DuckDB has complex arithmetic, so every
complex operation is expanded to REAL pairs:

    ln(x + iy)  = 0.5·ln(x² + y²)  +  i·atan2(y, x)
    (a+bi)(c+di) = (ac − bd) + i(ad + bc)
    1/(x + iy)  = (x − iy) / (x² + y²)

ln and atan2 exist and agree (to well under the 1e-6 quantization used
by the registered queries — the same argument as the live entropy
query's x²·ln(x) salinity term) in both engines. The constants that
don't depend on (T, p) — ln(t_k), 2·t_k·ln(t_k), 1/t_k — are folded to
double literals HERE with cmath, so the per-row expression tree is
pure +,*,/ plus two ln and two atan2 calls per resonance term.

Everything is emitted as named (stage, expression) pairs: the Spark
side folds them with withColumn, the oracle with nested SELECTs
(staged_r6._stage_sql), so both engines evaluate the identical IEEE
tree once per intermediate. Pure whole-stage codegen, zero shuffle,
zero Python at run time.

Check values from the IAPWS-06 release Table 6 (triple point, normal
melting point, and 100 K / 100 MPa) are pinned in
tests/test_oceanography_checkvalues.py.

Conventions follow GSW: t is in-situ temperature in °C (ITS-90), p is
SEA pressure in dbar (absolute P = 101325 Pa + 10⁴·p).
"""

from __future__ import annotations

import cmath

from cioos_siooc_data_transform_spark.functions.teos10 import _lit

#: IAPWS-06 constants.
ICE_TT = 273.16  # K, triple-point temperature
ICE_PT = 611.657  # Pa, triple-point pressure
ICE_S0 = -3327.33756492168  # J/(kg K), IAPWS-95 reference entropy const

_G0 = [
    -632020.233335886,
    0.655022213658955,
    -1.89369929326131e-8,
    3.39746123271053e-15,
    -5.56464869058991e-22,
]

_T1 = complex(3.68017112855051e-2, 5.10878114959572e-2)
_R1 = complex(44.7050716285388, 65.6876847463481)
_T2 = complex(0.337315741065416, 0.335449415919309)
_R20 = complex(-72.597457432922, -78.100842711287)
_R21 = complex(-5.57107698030123e-5, 4.64578634580806e-5)
_R22 = complex(2.34801409215913e-11, -2.85651142904972e-11)

# (T, p)-independent complex constants, folded to doubles at import:
# 2·t_k·ln(t_k) and 1/t_k for each resonance term.
_C1 = 2.0 * _T1 * cmath.log(_T1)
_C2 = 2.0 * _T2 * cmath.log(_T2)
_I1 = 1.0 / _T1
_I2 = 1.0 / _T2


def gibbs_ice_stages(
    t: str, p: str, x: str = "__gice_", out: str = ""
) -> list[tuple[str, str]]:
    """Named stages computing g and its first/second derivatives for
    ice Ih, finishing with the four GSW-surface columns:

    - ``rho_ice``      = 1/g_p                 [kg/m³]
    - ``entropy_ice``  = −g_T                  [J/(kg K)]
    - ``cp_ice``       = −T·g_TT               [J/(kg K)]
    - ``enthalpy_ice`` = g − T·g_T             [J/kg]

    plus ``gibbs_ice`` (g itself, J/kg). Intermediates carry the
    collision-resistant ``__gice_`` prefix (same rule as
    theta_rk4_stages). Pass a distinct ``x`` (and ``out`` prefix for
    the final surface columns) to evaluate the chain at several state
    points in one plan (the pt0_from_t_ice Newton inversion)."""
    tt = _lit(ICE_TT)
    stages: list[tuple[str, str]] = [
        (f"{x}tau", f"((273.15e0 + ({t})) / {tt})"),
        # π − π0 = 10⁴·p / pt  (sea-pressure dbar → Pa over pt)
        (f"{x}dpi", f"(1.0e4*({p}) / {_lit(ICE_PT)})"),
    ]
    dpi, tau = f"{x}dpi", f"{x}tau"
    # g0(p) Horner and its pressure derivative (per Pa).
    g0 = _lit(_G0[4])
    for c in reversed(_G0[:4]):
        g0 = f"({_lit(c)} + {dpi}*{g0})"
    g0p = _lit(4.0 * _G0[4])
    for k in (3, 2, 1):
        g0p = f"({_lit(k * _G0[k])} + {dpi}*{g0p})"
    stages += [
        (f"{x}g0", g0),
        (f"{x}g0p", f"({g0p} / {_lit(ICE_PT)})"),
        # r2(p) quadratic and its pressure derivative, real/imag parts.
        (
            f"{x}r2x",
            f"({_lit(_R20.real)} + {dpi}*({_lit(_R21.real)}"
            f" + {dpi}*{_lit(_R22.real)}))",
        ),
        (
            f"{x}r2y",
            f"({_lit(_R20.imag)} + {dpi}*({_lit(_R21.imag)}"
            f" + {dpi}*{_lit(_R22.imag)}))",
        ),
        (
            f"{x}r2px",
            f"(({_lit(_R21.real)} + 2.0e0*{_lit(_R22.real)}*{dpi})"
            f" / {_lit(ICE_PT)})",
        ),
        (
            f"{x}r2py",
            f"(({_lit(_R21.imag)} + 2.0e0*{_lit(_R22.imag)}*{dpi})"
            f" / {_lit(ICE_PT)})",
        ),
    ]
    # Per-resonance complex machinery, expanded to real pairs.
    for k, (tk, ck, ik) in (("1", (_T1, _C1, _I1)), ("2", (_T2, _C2, _I2))):
        txl, tyl = _lit(tk.real), _lit(tk.imag)
        ax = f"{x}a{k}x"  # Re(t_k − τ); Im is the constant t_k.imag
        bx = f"{x}b{k}x"  # Re(t_k + τ)
        qa, qb = f"{x}q{k}a", f"{x}q{k}b"  # |A|², |B|²
        am, aa = f"{x}lnm{k}a", f"{x}arg{k}a"  # ln|A|, arg(A)
        bm, ba = f"{x}lnm{k}b", f"{x}arg{k}b"
        stages += [
            (ax, f"({txl} - {tau})"),
            (bx, f"({txl} + {tau})"),
            (qa, f"({ax}*{ax} + {tyl}*{tyl})"),
            (qb, f"({bx}*{bx} + {tyl}*{tyl})"),
            (am, f"(0.5e0*ln({qa}))"),
            (aa, f"atan2({tyl}, {ax})"),
            (bm, f"(0.5e0*ln({qb}))"),
            (ba, f"atan2({tyl}, {bx})"),
            # f_k = A·lnA + B·lnB − 2t_k·ln t_k − τ²/t_k
            (
                f"{x}f{k}x",
                f"({ax}*{am} - {tyl}*{aa} + {bx}*{bm} - {tyl}*{ba}"
                f" - {_lit(ck.real)} - {tau}*{tau}*{_lit(ik.real)})",
            ),
            (
                f"{x}f{k}y",
                f"({ax}*{aa} + {tyl}*{am} + {bx}*{ba} + {tyl}*{bm}"
                f" - {_lit(ck.imag)} - {tau}*{tau}*{_lit(ik.imag)})",
            ),
            # d_k = df_k/dτ = −lnA + lnB − 2τ/t_k
            (
                f"{x}d{k}x",
                f"(-{am} + {bm} - 2.0e0*{tau}*{_lit(ik.real)})",
            ),
            (
                f"{x}d{k}y",
                f"(-{aa} + {ba} - 2.0e0*{tau}*{_lit(ik.imag)})",
            ),
            # s_k = d²f_k/dτ² = 1/A + 1/B − 2/t_k
            (
                f"{x}s{k}x",
                f"({ax}/{qa} + {bx}/{qb} - 2.0e0*{_lit(ik.real)})",
            ),
            (
                f"{x}s{k}y",
                f"(-{tyl}/{qa} - {tyl}/{qb} - 2.0e0*{_lit(ik.imag)})",
            ),
        ]

    def _re_dot(r1x: str, r1y: str, ax: str, ay: str, r2x: str, r2y: str,
                bx: str, by: str) -> str:
        """Re(r1·a + r2·b) with all operands as stage names/literals."""
        return (
            f"({r1x}*{ax} - {r1y}*{ay} + {r2x}*{bx} - {r2y}*{by})"
        )

    r1x, r1y = _lit(_R1.real), _lit(_R1.imag)
    tk = f"(273.15e0 + ({t}))"
    stages += [
        (
            f"{x}g",
            f"({x}g0 - {_lit(ICE_S0)}*{tt}*{tau} + {tt}*"
            + _re_dot(r1x, r1y, f"{x}f1x", f"{x}f1y",
                      f"{x}r2x", f"{x}r2y", f"{x}f2x", f"{x}f2y")
            + ")",
        ),
        (
            f"{x}gt",
            f"({_lit(-ICE_S0)} + "
            + _re_dot(r1x, r1y, f"{x}d1x", f"{x}d1y",
                      f"{x}r2x", f"{x}r2y", f"{x}d2x", f"{x}d2y")
            + ")",
        ),
        (
            f"{x}gtt",
            f"((1.0e0/{tt})*"
            + _re_dot(r1x, r1y, f"{x}s1x", f"{x}s1y",
                      f"{x}r2x", f"{x}r2y", f"{x}s2x", f"{x}s2y")
            + ")",
        ),
        (
            f"{x}gp",
            f"({x}g0p + {tt}*"
            + _re_dot("0.0e0", "0.0e0", "0.0e0", "0.0e0",
                      f"{x}r2px", f"{x}r2py", f"{x}f2x", f"{x}f2y")
            + ")",
        ),
    ]
    # Second derivatives in pressure (only g0 and r2 depend on P):
    # g_pp = g0'' + Tt·Re(r2''·f2) with r2'' = 2·r22/pt² constant;
    # g_Tp = Re(r2'·d2). Both cross-checked against finite differences
    # and the published Table-6 values in tests.
    g0pp = _lit(12.0 * _G0[4])
    for k in (3, 2):
        g0pp = f"({_lit(k * (k - 1) * _G0[k])} + {dpi}*{g0pp})"
    r2ppx = _lit(2.0 * _R22.real / (ICE_PT * ICE_PT))
    r2ppy = _lit(2.0 * _R22.imag / (ICE_PT * ICE_PT))
    p_abs = f"(101325.0e0 + 1.0e4*({p}))"
    stages += [
        (
            f"{x}gpp",
            f"({g0pp}/{_lit(ICE_PT * ICE_PT)} + {tt}*"
            f"({r2ppx}*{x}f2x - {r2ppy}*{x}f2y))",
        ),
        (
            f"{x}gtp",
            f"({x}r2px*{x}d2x - {x}r2py*{x}d2y)",
        ),
        (f"{out}gibbs_ice", f"{x}g"),
        (f"{out}rho_ice", f"(1.0e0/{x}gp)"),
        (f"{out}entropy_ice", f"(-{x}gt)"),
        (f"{out}cp_ice", f"(-{tk}*{x}gtt)"),
        (f"{out}enthalpy_ice", f"({x}g - {tk}*{x}gt)"),
        # isothermal compressibility κ_T = −g_pp/g_p  [1/Pa]
        (f"{out}kappa_const_t_ice", f"(-{x}gpp/{x}gp)"),
        # u = g − T·g_T − P·g_p, f = g − P·g_p (absolute P)
        (f"{out}internal_energy_ice", f"({x}g - {tk}*{x}gt - {p_abs}*{x}gp)"),
        (f"{out}helmholtz_energy_ice", f"({x}g - {p_abs}*{x}gp)"),
        # adiabatic sound speed c = g_p·sqrt(g_TT/(g_Tp² − g_TT·g_pp))
        (
            f"{out}sound_speed_ice",
            f"({x}gp*sqrt({x}gtt/({x}gtp*{x}gtp - {x}gtt*{x}gpp)))",
        ),
    ]
    return stages
