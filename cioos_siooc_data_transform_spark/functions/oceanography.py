"""Oceanographic derived-variable functions (SURVEY.md §2.10 U3).

The reference vendors GSW/TEOS-10 3.3.1 as a declared dependency but never
calls it (capability surface only — SURVEY.md U3). This module provides the
practically-used subset as pure Catalyst column expressions built from
PUBLIC published formulas (no GSW code involved):

- Mackenzie (1981) nine-term sound speed equation;
- PSS-78 practical salinity from conductivity ratio (UNESCO 1983,
  Fofonoff & Millard);
- Bryden (1973) potential-temperature polynomial;
- Saunders & Fofonoff (UNESCO 1983) depth from pressure;
- buoyancy frequency N² as a window expression over profile neighbors.

All are plain arithmetic → whole-stage codegen, no Python in the loop.
Profile-axis resampling (interpolation onto standard depths) is the one
genuinely imperative op and uses applyInPandas (see profile_interp).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

G0 = 9.80665  # standard gravity, m/s²


def mackenzie_sound_speed(t: Column, s: Column, d: Column) -> Column:
    """Mackenzie (1981) sound speed c(T, S, D) in m/s.

    c = 1448.96 + 4.591 T − 5.304e−2 T² + 2.374e−4 T³ + 1.340 (S−35)
        + 1.630e−2 D + 1.675e−7 D² − 1.025e−2 T (S−35) − 7.139e−13 T D³
    """
    return (
        F.lit(1448.96)
        + 4.591 * t
        - 5.304e-2 * t * t
        + 2.374e-4 * t * t * t
        + 1.340 * (s - 35.0)
        + 1.630e-2 * d
        + 1.675e-7 * d * d
        - 1.025e-2 * t * (s - 35.0)
        - 7.139e-13 * t * d * d * d
    )


def practical_salinity(cond_ratio: Column, t: Column) -> Column:
    """PSS-78 practical salinity from conductivity ratio Rt at
    temperature t (pressure-corrected ratio supplied by caller).

    UNESCO 1983 / Fofonoff & Millard constants (public standard).
    """
    a = [0.0080, -0.1692, 25.3851, 14.0941, -7.0261, 2.7081]
    b = [0.0005, -0.0056, -0.0066, -0.0375, 0.0636, -0.0144]
    k = 0.0162
    sqrt_rt = F.sqrt(cond_ratio)
    rt_15 = sqrt_rt * cond_ratio  # Rt^1.5
    rt_2 = cond_ratio * cond_ratio
    rt_25 = rt_2 * sqrt_rt
    base = (
        F.lit(a[0])
        + a[1] * sqrt_rt
        + a[2] * cond_ratio
        + a[3] * rt_15
        + a[4] * rt_2
        + a[5] * rt_25
    )
    dsal = (
        (t - 15.0)
        / (1.0 + k * (t - 15.0))
        * (
            F.lit(b[0])
            + b[1] * sqrt_rt
            + b[2] * cond_ratio
            + b[3] * rt_15
            + b[4] * rt_2
            + b[5] * rt_25
        )
    )
    return base + dsal


def potential_temperature(t: Column, s: Column, p: Column, p_ref: Column | float = 0.0) -> Column:
    """Bryden (1973) polynomial for potential temperature θ(S, T, p)
    referenced to p_ref (decibar), atmospheric reference by default."""
    pr = F.lit(p_ref) if not isinstance(p_ref, Column) else p_ref
    dp = p - pr
    s35 = s - 35.0
    return (
        t
        - dp * (3.6504e-4 + 8.3198e-5 * t - 5.4065e-7 * t * t + 4.0274e-9 * t * t * t)
        - dp * s35 * (1.7439e-5 - 2.9778e-7 * t)
        - dp * dp * (8.9309e-7 - 3.1628e-8 * t + 2.1987e-10 * t * t)
        + 4.1057e-9 * s35 * dp * dp
        - dp * dp * dp * (-1.6056e-10 + 5.0484e-12 * t)
    )


def depth_from_pressure(p: Column, lat: Column) -> Column:
    """Saunders & Fofonoff depth (m) from pressure (decibar) and latitude
    (UNESCO 1983 check value: z(10000 dbar, 30°) = 9712.653 m):
    z = (9.72659 p − 2.2512e−5 p² + 2.279e−10 p³ − 1.82e−15 p⁴)
        / (g(φ) + 1.092e−6 p)
    g(φ) = 9.780318 (1 + 5.2788e−3 sin²φ + 2.36e−5 sin⁴φ)
    """
    sin2 = F.pow(F.sin(F.radians(lat)), 2)
    g = 9.780318 * (1.0 + 5.2788e-3 * sin2 + 2.36e-5 * sin2 * sin2)
    num = 9.72659 * p - 2.2512e-5 * p * p + 2.279e-10 * p * p * p - 1.82e-15 * p * p * p * p
    return num / (g + 1.092e-6 * p)


def nsquared(
    df: DataFrame,
    profile_col: str,
    depth_col: str,
    sigma_col: str,
) -> DataFrame:
    """Buoyancy frequency N² between adjacent profile levels:
    N² = (g / ρ₀) · Δσ / Δz, midpoint depth reported. Window lag over the
    profile order — one shuffle on profile_col (GSW's Nsquared works on a
    profile axis the same way)."""
    w = Window.partitionBy(profile_col).orderBy(depth_col)
    sigma_prev = F.lag(sigma_col).over(w)
    depth_prev = F.lag(depth_col).over(w)
    n2 = (
        F.lit(G0)
        / F.lit(1025.0)
        * (F.col(sigma_col) - sigma_prev)
        / (F.col(depth_col) - depth_prev)
    )
    return (
        df.withColumn("n_squared", n2)
        .withColumn("mid_depth", (F.col(depth_col) + depth_prev) / 2.0)
        .filter(F.col("n_squared").isNotNull())
    )


def profile_interp(
    df: DataFrame,
    profile_col: str,
    depth_col: str,
    value_col: str,
    target_depths: list[float],
) -> DataFrame:
    """Linear interpolation of a profile variable onto standard depths —
    the per-profile imperative op (GSW's pchip_interp analog) done with
    applyInPandas: one pandas group per profile, numpy interp inside."""
    import numpy as np
    import pandas as pd

    targets = np.asarray(sorted(target_depths), dtype=float)

    def interp(pdf: pd.DataFrame) -> pd.DataFrame:
        # sort on (depth, value) so duplicate depths order deterministically
        pdf = pdf.sort_values([depth_col, value_col])
        x = pdf[depth_col].to_numpy(dtype=float)
        y = pdf[value_col].to_numpy(dtype=float)
        mask = (targets >= x.min()) & (targets <= x.max())
        if not mask.any():
            return pd.DataFrame(
                {profile_col: [], "std_depth": [], "interp_value": []}
            )
        vals = np.interp(targets[mask], x, y)
        return pd.DataFrame(
            {
                profile_col: pdf[profile_col].iloc[0],
                "std_depth": targets[mask],
                "interp_value": np.round(vals, 6),
            }
        )

    out_schema = f"{profile_col} string, std_depth double, interp_value double"
    return df.groupBy(profile_col).applyInPandas(interp, schema=out_schema)
