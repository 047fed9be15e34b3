"""PSS-78 practical salinity / conductivity conversions, portable SQL.

The Practical Salinity Scale 1978 (UNESCO 1981/1983, Fofonoff &
Millard 1983 — "UNESCO 44"; Hill, Dauphinee & Woods 1986 low-salinity
extension; carried unchanged into TEOS-10, reference implementation
gsw_oceanographic_toolbox.c::gsw_sp_from_c / gsw_c_from_sp /
gsw_hill_ratio_at_sp2). All coefficients below are the published
constants of that standard. Everything is emitted as stage lists of
portable SQL (identical literal trees on Spark and DuckDB — the
oracle-parity contract used throughout functions/).

Envelope note: the synthetic test inputs keep SP in [28, 36], so the
Hill et al. (1986) SP < 2 branch is never taken by the registered
queries; it is still implemented (``hill_ratio_at_sp2_stages``) as its
own surface with the published modified-Newton construction, and the
main conversions document the SP >= 2 envelope (the same envelope
statement the GSW inversions in plans/ carry).
"""

from __future__ import annotations

from cioos_siooc_data_transform_spark.functions.teos10 import _lit

# UNESCO 1983 (PSS-78) coefficient tables.
PSS78_A = [0.0080, -0.1692, 25.3851, 14.0941, -7.0261, 2.7081]
PSS78_B = [0.0005, -0.0056, -0.0066, -0.0375, 0.0636, -0.0144]
PSS78_C = [0.6766097, 2.00564e-2, 1.104259e-4, -6.9698e-7, 1.0031e-9]
PSS78_D = [3.426e-2, 4.464e-4, 4.215e-1, -3.107e-3]  # d1, d2, d3, d4
PSS78_E = [2.070e-5, -6.370e-10, 3.989e-15]  # e1, e2, e3
PSS78_K = 0.0162
#: C(SP=35, t68=15, p=0) in mS/cm (Culkin & Smith 1980).
C3515 = 42.9140

#: Hill-ratio t68 polynomial (GSW's published fit of the PSS-78 /
#: Hill-1986 matching factor at SP = 2).
HILL_G = [
    2.641463563366498e-1, 2.007883247811176e-4, -4.107694432853053e-6,
    8.401670882091225e-8, -1.711392021989210e-9, 3.374193893377380e-11,
    -5.923731174730784e-13, 8.057771569962299e-15, -7.054313817447962e-17,
    2.859992717347235e-19,
]

#: Rtx starting polynomial for C_from_SP, SP >= 9 branch (GSW's
#: published fit; the synthetic inputs stay in this branch).
CFSP_P = [
    4.577801212923119e-3, 1.924049429136640e-1, 2.183871685127932e-5,
    -7.292156330457999e-3, 1.568129536470258e-4, -1.478995271680869e-6,
    9.086442524716395e-4, -1.949560839540487e-5, -3.223058111118377e-6,
    1.175871639741131e-7, -7.522895856600089e-5, -2.254458513439107e-6,
    6.179992190192848e-7, 1.005054226996868e-8, -1.923745566122602e-9,
    2.259550611212616e-6, 1.631749165091437e-7, -5.931857989915256e-9,
    -4.693392029005252e-9, 2.571854839274148e-10, 4.198786822861038e-12,
]


def _horner_list(coefs: list[float], var: str) -> str:
    txt = _lit(coefs[-1])
    for c in reversed(coefs[:-1]):
        txt = f"({_lit(c)} + {var}*{txt})"
    return txt


def _sp_of_rtx(rtx: str, ft68: str) -> str:
    """SP(Rtx) = Σ a_i Rtx^i + ft68·Σ b_i Rtx^i (PSS-78)."""
    return (
        f"({_horner_list(PSS78_A, rtx)} + {ft68}*{_horner_list(PSS78_B, rtx)})"
    )


def _dsp_drtx(rtx: str, ft68: str) -> str:
    da = [i * c for i, c in enumerate(PSS78_A)][1:]
    db = [i * c for i, c in enumerate(PSS78_B)][1:]
    return f"({_horner_list(da, rtx)} + {ft68}*{_horner_list(db, rtx)})"


def _t68_ft68(t: str, x: str) -> list[tuple[str, str]]:
    return [
        (f"{x}t68", f"(({t})*1.00024e0)"),
        (
            f"{x}ft68",
            f"(({x}t68 - 15.0e0)/(1.0e0 + {_lit(PSS78_K)}*({x}t68 - 15.0e0)))",
        ),
    ]


def sp_from_c_stages(c: str, t: str, p: str, x: str = "__spc_") -> list[tuple[str, str]]:
    """SP from conductivity (mS/cm), in-situ t (ITS-90) and p (dbar) —
    the PSS-78 main branch (SP >= 2 envelope; the Hill low-salinity
    correction is its own surface, see hill_ratio_at_sp2_stages).
    Final stage ``{x}sp``."""
    stages = _t68_ft68(t, x)
    stages += [
        (f"{x}r", f"(({c})/{_lit(C3515)})"),
        (f"{x}rt_lc", _horner_list(PSS78_C, f"{x}t68")),
        (
            f"{x}rp",
            f"(1.0e0 + (({p})*({_lit(PSS78_E[0])} + {_lit(PSS78_E[1])}*({p})"
            f" + {_lit(PSS78_E[2])}*({p})*({p})))"
            f"/(1.0e0 + {_lit(PSS78_D[0])}*{x}t68"
            f" + {_lit(PSS78_D[1])}*{x}t68*{x}t68"
            f" + ({_lit(PSS78_D[2])} + {_lit(PSS78_D[3])}*{x}t68)*{x}r))",
        ),
        (f"{x}rtx", f"sqrt({x}r/({x}rp*{x}rt_lc))"),
        (f"{x}sp", _sp_of_rtx(f"{x}rtx", f"{x}ft68")),
    ]
    return stages


def hill_ratio_at_sp2_stages(t: str, x: str = "__hr_") -> list[tuple[str, str]]:
    """The Hill et al. (1986) / PSS-78 matching ratio at SP = 2:
    one modified Newton-Raphson iteration (McDougall & Wotherspoon
    2012 scheme) for Rtx at SP = 2 from the published starting
    polynomial, then 2 / SP_Hill_raw(Rtx). Final stage ``{x}ratio``."""
    stages = _t68_ft68(t, x)
    stages += [
        (f"{x}rtx0", _horner_list(HILL_G, f"{x}t68")),
        (f"{x}d0", _dsp_drtx(f"{x}rtx0", f"{x}ft68")),
        (f"{x}sp0", _sp_of_rtx(f"{x}rtx0", f"{x}ft68")),
        (f"{x}rtx1", f"({x}rtx0 - ({x}sp0 - 2.0e0)/{x}d0)"),
        (f"{x}rtxm", f"(0.5e0*({x}rtx1 + {x}rtx0))"),
        (f"{x}dm", _dsp_drtx(f"{x}rtxm", f"{x}ft68")),
        (f"{x}rtx", f"({x}rtx0 - ({x}sp0 - 2.0e0)/{x}dm)"),
        (f"{x}xx", f"(400.0e0*{x}rtx*{x}rtx)"),
        (f"{x}sqy", f"(10.0e0*{x}rtx)"),
        (f"{x}part1", f"(1.0e0 + {x}xx*(1.5e0 + {x}xx))"),
        (
            f"{x}part2",
            f"(1.0e0 + {x}sqy*(1.0e0 + {x}sqy*(1.0e0 + {x}sqy)))",
        ),
        (
            f"{x}raw",
            f"(2.0e0 - {_lit(PSS78_A[0])}/{x}part1"
            f" - {_lit(PSS78_B[0])}*{x}ft68/{x}part2)",
        ),
        (f"{x}ratio", f"(2.0e0/{x}raw)"),
    ]
    return stages


def c_from_sp_stages(sp: str, t: str, p: str, x: str = "__cfs_") -> list[tuple[str, str]]:
    """Conductivity (mS/cm) from SP — the PSS-78 inverse: published
    Rtx(SP, t68) starting polynomial (SP >= 9 branch; envelope
    documented by callers), 1.5 modified Newton-Raphson iterations
    (McDougall & Wotherspoon 2012, max SP error < 2e-14), then the
    quadratic-in-R pressure/temperature unwind back to R and C.
    Final stage ``{x}c``."""
    stages = _t68_ft68(t, x)
    xx = f"{x}x"
    stages.append((xx, f"sqrt({sp})"))
    t68 = f"{x}t68"
    ft68 = f"{x}ft68"
    # Rtx starting value, SP >= 9 polynomial in (sqrt(SP), t68).
    P = CFSP_P
    rtx0 = (
        f"({_lit(P[0])} + {xx}*({_lit(P[1])} + {_lit(P[4])}*{t68}"
        f" + {xx}*({_lit(P[3])} + {_lit(P[7])}*{t68}"
        f" + {xx}*({_lit(P[6])} + {_lit(P[11])}*{t68}"
        f" + {xx}*({_lit(P[10])} + {_lit(P[16])}*{t68}"
        f" + {xx}*{_lit(P[15])}))))"
        f" + {t68}*({_lit(P[2])} + {t68}*({_lit(P[5])}"
        f" + {xx}*{xx}*({_lit(P[12])} + {xx}*{_lit(P[17])})"
        f" + {_lit(P[8])}*{xx}"
        f" + {t68}*({_lit(P[9])} + {xx}*({_lit(P[13])}"
        f" + {xx}*{_lit(P[18])})"
        f" + {t68}*({_lit(P[14])} + {_lit(P[19])}*{xx}"
        f" + {_lit(P[20])}*{t68})))))"
    )
    stages += [
        (f"{x}rtx0", rtx0),
        (f"{x}d0", _dsp_drtx(f"{x}rtx0", ft68)),
        (f"{x}spe0", _sp_of_rtx(f"{x}rtx0", ft68)),
        (f"{x}rtx1", f"({x}rtx0 - ({x}spe0 - ({sp}))/{x}d0)"),
        (f"{x}rtxm", f"(0.5e0*({x}rtx1 + {x}rtx0))"),
        (f"{x}dm", _dsp_drtx(f"{x}rtxm", ft68)),
        (f"{x}rtx2", f"({x}rtx0 - ({x}spe0 - ({sp}))/{x}dm)"),
        (f"{x}spe2", _sp_of_rtx(f"{x}rtx2", ft68)),
        (f"{x}rtx", f"({x}rtx2 - ({x}spe2 - ({sp}))/{x}dm)"),
        (f"{x}rt", f"({x}rtx*{x}rtx)"),
        (f"{x}aa", f"({_lit(PSS78_D[2])} + {_lit(PSS78_D[3])}*{t68})"),
        (
            f"{x}bb",
            f"(1.0e0 + {t68}*({_lit(PSS78_D[0])} + {_lit(PSS78_D[1])}*{t68}))",
        ),
        (
            f"{x}cc",
            f"(({p})*({_lit(PSS78_E[0])} + ({p})*({_lit(PSS78_E[1])}"
            f" + {_lit(PSS78_E[2])}*({p}))))",
        ),
        (f"{x}rt_lc", _horner_list(PSS78_C, t68)),
        (f"{x}dd", f"({x}bb - {x}aa*{x}rt_lc*{x}rt)"),
        (f"{x}ee", f"({x}rt_lc*{x}rt*{x}aa*({x}bb + {x}cc))"),
        (
            f"{x}ra",
            f"(sqrt({x}dd*{x}dd + 4.0e0*{x}ee) - {x}dd)",
        ),
        (f"{x}c", f"({_lit(C3515)}*0.5e0*{x}ra/{x}aa)"),
    ]
    return stages


# Reference-composition scale factors (Millero et al. 2008): SR = SP
# times uPS = (35.16504/35) g/kg; the Knudsen scale (pre-1978
# chlorinity-based salinities) converts by SP = (SK - 0.03)/1.805 x
# 1.80655 (UNESCO 1983 / GSW gsw_SP_from_SK).
UPS = 35.16504 / 35.0


def sr_from_sp_sql(sp: str) -> str:
    """Reference Salinity from Practical Salinity (g/kg)."""
    return f"(({sp})*{_lit(UPS)})"


def sp_from_sr_sql(sr: str) -> str:
    """Practical Salinity from Reference Salinity."""
    return f"(({sr})/{_lit(UPS)})"


def sp_from_sk_sql(sk: str) -> str:
    """Practical Salinity from Knudsen Salinity (UNESCO 1983
    chlorinity relation: SP = 1.80655·(SK − 0.03)/1.805)."""
    return f"((({sk}) - 0.03e0)*(1.80655e0/1.805e0))"
