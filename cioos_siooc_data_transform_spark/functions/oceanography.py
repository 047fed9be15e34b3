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
    referenced to p_ref, atmospheric reference by default. Inputs are
    DECIBAR (the engine-wide pressure unit); Bryden's fit is in BARS, so
    the pressure difference is scaled by 0.1 internally — the leading
    coefficient 3.6504e-4 °C/bar ≡ 3.65e-5 °C/dbar, matching the UNESCO
    (1983) adiabatic-gradient scale (3.5803e-5 °C/dbar)."""
    pr = F.lit(p_ref) if not isinstance(p_ref, Column) else p_ref
    dp = (p - pr) * 0.1
    s35 = s - 35.0
    return (
        t
        - dp * (3.6504e-4 + 8.3198e-5 * t - 5.4065e-7 * t * t + 4.0274e-9 * t * t * t)
        - dp * s35 * (1.7439e-5 - 2.9778e-7 * t)
        - dp * dp * (8.9309e-7 - 3.1628e-8 * t + 2.1987e-10 * t * t)
        + 4.1057e-9 * s35 * dp * dp
        - dp * dp * dp * (-1.6056e-10 + 5.0484e-12 * t)
    )


def lapse_rate_sql(s: str, t: str, p: str) -> str:
    """UNESCO 1983 adiabatic lapse rate Gamma(S, T, p) in K/dbar,
    portable SQL (Spark F.expr and DuckDB parse it identically); check
    value gamma(40, 40, 10000) = 3.255976e-4 (Fofonoff & Millard 1983,
    UNESCO Technical Papers in Marine Science 44)."""
    ds = f"(({s}) - 35.0e0)"
    return (
        f"(3.5803e-5 + 8.5258e-6*{t} - 6.836e-8*{t}*{t}"
        f" + 6.6228e-10*{t}*{t}*{t}"
        f" + (1.8932e-6 - 4.2393e-8*{t})*{ds}"
        f" + (1.8741e-8 - 6.7795e-10*{t} + 8.733e-12*{t}*{t}"
        f" - 5.4481e-14*{t}*{t}*{t})*{p}"
        f" + (-1.1351e-10 + 2.7759e-12*{t})*{ds}*{p}"
        f" + (-4.6206e-13 + 1.8676e-14*{t} - 2.1687e-16*{t}*{t})*{p}*{p})"
    )


def theta_rk4_stages(
    s: str, t: str, p: str, p_ref: str = "0.0e0"
) -> list[tuple[str, str]]:
    """The UNESCO (1983) 4th-order Runge-Kutta potential-temperature
    integration as a list of (column_name, sql_expr) stages — each stage
    references previous stages BY NAME, so callers materialize them as
    intermediate projection columns (Spark withColumn chain / DuckDB
    nested SELECTs) and the expression text stays LINEAR in the four
    lapse-rate evaluations instead of nesting exponentially.

    Check value (UNESCO TP 44): theta(40, 40, 10000, 0) = 36.89073 degC.
    Against TEOS-10's entropy-iterated pt0 this EOS-80 integration
    agrees to the EOS-80<->TEOS-10 reference difference (sub-mK at
    shelf pressures, pinned in tests/test_oceanography_checkvalues.py);
    it replaces the one-shot Bryden polynomial's ~mK truncation error
    with the full 4-stage integration of the SAME published lapse rate.
    """
    dp = f"(({p_ref}) - ({p}))"
    pmid = f"(({p}) + 0.5e0*{dp})"
    # Stage names carry a collision-resistant __theta_rk4_ prefix: a
    # caller DataFrame owning a bare _dth1/_q2/... column would
    # otherwise be silently overwritten and dropped by theta_rk4().
    x = "__theta_rk4_"
    return [
        (f"{x}dth1", f"({dp}*{lapse_rate_sql(s, t, p)})"),
        (f"{x}th1", f"(({t}) + 0.5e0*{x}dth1)"),
        (f"{x}q1", f"{x}dth1"),
        (f"{x}dth2", f"({dp}*{lapse_rate_sql(s, x + 'th1', pmid)})"),
        (f"{x}th2", f"({x}th1 + 0.29289322e0*({x}dth2 - {x}q1))"),
        (f"{x}q2", f"(0.58578644e0*{x}dth2 + 0.121320344e0*{x}q1)"),
        (f"{x}dth3", f"({dp}*{lapse_rate_sql(s, x + 'th2', pmid)})"),
        (f"{x}th3", f"({x}th2 + 1.707106781e0*({x}dth3 - {x}q2))"),
        (f"{x}q3", f"(3.414213562e0*{x}dth3 - 4.121320344e0*{x}q2)"),
        (f"{x}dth4", f"({dp}*{lapse_rate_sql(s, x + 'th3', p_ref)})"),
        ("theta_rk4", f"({x}th3 + ({x}dth4 - 2.0e0*{x}q3)/6.0e0)"),
    ]


def theta_rk4(df: DataFrame, s: str, t: str, p: str, p_ref: str = "0.0e0") -> DataFrame:
    """Append a ``theta_rk4`` column (UNESCO RK4 potential temperature,
    reference p_ref dbar) to df, dropping the intermediate stage
    columns. Pure whole-stage-codegen arithmetic, zero shuffle."""
    stages = theta_rk4_stages(s, t, p, p_ref)
    clash = [n for n, _ in stages if n in df.columns]
    if clash:
        raise ValueError(
            f"theta_rk4: input already has stage column(s) {clash} — "
            "rename them before calling (they would be overwritten and "
            "dropped)"
        )
    for name, expr in stages:
        df = df.withColumn(name, F.expr(expr))
    return df.drop(*[n for n, _ in stages if n != "theta_rk4"])


def sa_from_sp(sp: Column) -> Column:
    """Absolute Salinity from Practical Salinity via the TEOS-10
    reference-composition scaling SA = (35.16504 / 35) · SP g/kg
    (Millero, Feistel, Wright & McDougall 2008). GSW's SA_from_SP
    (GSW/conversions.py) adds a spatial Absolute-Salinity-Anomaly table
    lookup on top of this scaling; the atlas is a data file the engine
    does not ship, so the documented divergence is delta_SA = 0 (exact in
    the open surface ocean, < 0.025 g/kg elsewhere). Anchor:
    SA(35) = 35.16504 g/kg exactly."""
    return sp * (35.16504 / 35.0)


def rho_surface(s: Column, t: Column) -> Column:
    """One-atmosphere seawater density ρ(S, t, 0) in kg/m³ — the
    International Equation of State of Seawater (EOS-80, Millero &
    Poisson 1981 / UNESCO 1983), the published predecessor of GSW's
    rho (GSW/density.py), which this engine uses because the TEOS-10
    75-term specific-volume polynomial's coefficient table is impractical
    to re-derive safely. Published check values (UNESCO 1983):
    ρ(0, 5, 0) = 999.96675, ρ(35, 5, 0) = 1027.67547,
    ρ(35, 25, 0) = 1023.34306 kg/m³ (all reproduced in tests)."""
    rho_w = (
        F.lit(999.842594)
        + 6.793952e-2 * t
        - 9.095290e-3 * t * t
        + 1.001685e-4 * t * t * t
        - 1.120083e-6 * t * t * t * t
        + 6.536332e-9 * t * t * t * t * t
    )
    a = (
        F.lit(8.24493e-1)
        - 4.0899e-3 * t
        + 7.6438e-5 * t * t
        - 8.2467e-7 * t * t * t
        + 5.3875e-9 * t * t * t * t
    )
    b = F.lit(-5.72466e-3) + 1.0227e-4 * t - 1.6546e-6 * t * t
    return rho_w + a * s + b * (F.sqrt(s) * s) + 4.8314e-4 * s * s


def sigma0(s: Column, t: Column) -> Column:
    """Potential density anomaly σ₀ = ρ(S, θ, 0) − 1000 kg/m³; the caller
    supplies potential temperature θ (GSW/density.py sigma0 contract,
    which takes (SA, CT) — EOS-80 twin documented in rho_surface)."""
    return rho_surface(s, t) - 1000.0


def drho_dt(s: Column, t: Column) -> Column:
    """∂ρ/∂T of the EOS-80 one-atmosphere density (analytic term-by-term
    derivative of the rho_surface polynomial — same published
    coefficients, differentiated exactly)."""
    drho_w = (
        F.lit(6.793952e-2)
        - 2.0 * 9.095290e-3 * t
        + 3.0 * 1.001685e-4 * t * t
        - 4.0 * 1.120083e-6 * t * t * t
        + 5.0 * 6.536332e-9 * t * t * t * t
    )
    da = (
        F.lit(-4.0899e-3)
        + 2.0 * 7.6438e-5 * t
        - 3.0 * 8.2467e-7 * t * t
        + 4.0 * 5.3875e-9 * t * t * t
    )
    db = F.lit(1.0227e-4) - 2.0 * 1.6546e-6 * t
    return drho_w + da * s + db * (F.sqrt(s) * s)


def drho_ds(s: Column, t: Column) -> Column:
    """∂ρ/∂S of the EOS-80 one-atmosphere density (analytic)."""
    a = (
        F.lit(8.24493e-1)
        - 4.0899e-3 * t
        + 7.6438e-5 * t * t
        - 8.2467e-7 * t * t * t
        + 5.3875e-9 * t * t * t * t
    )
    b = F.lit(-5.72466e-3) + 1.0227e-4 * t - 1.6546e-6 * t * t
    return a + 1.5 * b * F.sqrt(s) + 2.0 * 4.8314e-4 * s


def thermal_expansion_alpha(s: Column, t: Column) -> Column:
    """Thermal expansion coefficient α = −(1/ρ)·∂ρ/∂T (K⁻¹) from the
    EOS-80 surface density — the exact counterpart of the documented
    constant α = 2e-4 used by the linear-EOS queries (GSW's alpha takes
    (SA, CT, p); this is the EOS-80 p=0 twin). Anchored in tests by
    central finite differences of rho_surface."""
    return -drho_dt(s, t) / rho_surface(s, t)


def haline_contraction_beta(s: Column, t: Column) -> Column:
    """Haline contraction coefficient β = (1/ρ)·∂ρ/∂S (kg/g-ish PSU⁻¹),
    EOS-80 p=0 twin of GSW's beta; finite-difference anchored."""
    return drho_ds(s, t) / rho_surface(s, t)


def t_freezing(s: Column, p: Column) -> Column:
    """Freezing point of seawater (°C) at salinity S and pressure p
    (decibar) — Millero 1978 / UNESCO 1983:
    t_f = −0.0575 S + 1.710523e−3 S^1.5 − 2.154996e−4 S² − 7.53e−4 p.
    Published check value: t_f(35, 0) = −1.922 °C (reproduced in tests).
    GSW's t_freezing (GSW/freezing.py) is the TEOS-10 Gibbs-function
    solve; this is the published polynomial standard it superseded."""
    return (
        F.lit(-0.0575) * s
        + 1.710523e-3 * (F.sqrt(s) * s)
        - 2.154996e-4 * s * s
        - 7.53e-4 * p
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


def coriolis_f(lat: Column) -> Column:
    """Coriolis parameter f = 2 Ω sin(φ), Ω = 7.292115e-5 rad/s (the
    published TEOS-10 / GSW ``f`` convention — GSW/geostrophy.py exposes
    the same one-liner). Pure codegen."""
    return 2.0 * 7.292115e-5 * F.sin(F.radians(lat))


def haversine_distance(
    lon1: Column, lat1: Column, lon2: Column, lat2: Column
) -> Column:
    """Great-circle distance in metres on a sphere of radius 6371000 m
    (the GSW ``distance`` convention, GSW/geostrophy.py) via the standard
    haversine formula. Pure codegen; trig is libm-dependent, so callers
    round the output before hashing."""
    dlat = F.radians(lat2) - F.radians(lat1)
    dlon = F.radians(lon2) - F.radians(lon1)
    a = (
        F.sin(dlat / 2.0) * F.sin(dlat / 2.0)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlon / 2.0)
        * F.sin(dlon / 2.0)
    )
    return 6371000.0 * (2.0 * F.atan2(F.sqrt(a), F.sqrt(1.0 - a)))


def dyn_height_profile(
    df: DataFrame,
    profile_col: str,
    p_col: str,
    t_col: str,
    s_col: str,
) -> DataFrame:
    """Dynamic-height anomaly profile: cumulative trapezoid integral of
    specific-volume anomaly over pressure — the GSW geo_strf_dyn_height
    operator shape (GSW/geostrophy.py), with a documented simplified
    LINEAR equation of state (delta = (alpha0 (T−T0) − beta0 (S−S0))/rho0,
    alpha0 = 2e-4 K⁻¹, beta0 = 7.6e-4 kg/g, rho0 = 1025 kg/m³) in place
    of the full TEOS-10 specific volume. Pressure in decibar (×1e4 → Pa).

    One window shuffle per profile; the running integral is a cumulative
    window sum — whole-stage codegen, no Python."""
    w = Window.partitionBy(profile_col).orderBy(p_col)

    def delta(t, s):
        return (2.0e-4 * (t - 10.0) - 7.6e-4 * (s - 35.0)) / 1025.0

    p = F.col(p_col)
    dseg = (
        (
            delta(F.col(t_col), F.col(s_col))
            + delta(F.lag(t_col).over(w), F.lag(s_col).over(w))
        )
        / 2.0
        * ((p - F.lag(p_col).over(w)) * 10000.0)
    )
    seg = df.select(profile_col, F.col(p_col).alias("p"), dseg.alias("dseg"))
    cum = Window.partitionBy(profile_col).orderBy("p").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return seg.select(
        profile_col,
        "p",
        F.round(F.sum(F.coalesce("dseg", F.lit(0.0))).over(cum), 6).alias(
            "dyn_height"
        ),
    )


def _targets_df(spark, target_depths: list[float]) -> DataFrame:
    rows = [(float(v),) for v in sorted(target_depths)]
    return spark.createDataFrame(rows, "std_depth double")


def profile_interp_declarative(
    df: DataFrame,
    profile_col: str,
    depth_col: str,
    value_col: str,
    target_depths: list[float],
) -> DataFrame:
    """Linear interpolation onto standard depths as PURE DataFrame ops —
    no Python in the loop, so the whole plan is whole-stage codegen and
    bit-for-bit mirrorable in a SQL oracle.

    Plan shape (scales to any number of profiles): duplicate depths are
    collapsed (min value — deterministic), one window shuffle per profile
    builds adjacent segments via lag, and the tiny sorted target list is
    broadcast-joined against segments (exact grid hits) ∪ (strict
    interior), so the big side streams once.
    """
    prof = df.groupBy(profile_col, depth_col).agg(F.min(value_col).alias("_v"))
    targets = F.broadcast(_targets_df(df.sparkSession, target_depths))

    exact = prof.join(
        targets, F.col(depth_col) == F.col("std_depth")
    ).select(profile_col, "std_depth", F.round("_v", 6).alias("interp_value"))

    w = Window.partitionBy(profile_col).orderBy(depth_col)
    seg = prof.select(
        profile_col,
        F.col(depth_col).alias("x_hi"),
        F.col("_v").alias("y_hi"),
        F.lag(depth_col).over(w).alias("x_lo"),
        F.lag("_v").over(w).alias("y_lo"),
    ).filter(F.col("x_lo").isNotNull())
    interior = seg.join(
        targets,
        (F.col("std_depth") > F.col("x_lo")) & (F.col("std_depth") < F.col("x_hi")),
    ).select(
        profile_col,
        "std_depth",
        F.round(
            F.col("y_lo")
            + (F.col("std_depth") - F.col("x_lo"))
            * ((F.col("y_hi") - F.col("y_lo")) / (F.col("x_hi") - F.col("x_lo"))),
            6,
        ).alias("interp_value"),
    )
    return exact.unionByName(interior)


def _round6(c: Column) -> Column:
    """Round to 6 dp via floor(v*1e6 + 0.5)/1e6 — pure IEEE ops, so the
    SQL oracle computes the bit-identical result. Engine-native round()
    disagrees between Spark (exact-decimal HALF_UP) and DuckDB (float
    path) when a value lands on an exact .5e-6 boundary."""
    return F.floor(c * 1000000.0 + 0.5) / 1000000.0


def pchip_interp(
    df: DataFrame,
    profile_col: str,
    depth_col: str,
    value_col: str,
    target_depths: list[float],
) -> DataFrame:
    """PCHIP (monotone shape-preserving cubic Hermite, Fritsch–Carlson
    1980) interpolation onto standard depths — the GSW ``pchip_interp``
    semantics (GSW/utility.py wraps SciPy's PchipInterpolator), rebuilt
    as PURE DataFrame ops so it runs JVM-side and mirrors into SQL.

    Derivative rule (identical to the published SciPy/Fritsch–Carlson
    algorithm):
    - interior k: 0 where the adjacent slopes change sign or either is 0,
      else the weighted harmonic mean (w1+w2)/(w1/m_{k-1} + w2/m_k) with
      w1 = 2 h_k + h_{k-1}, w2 = h_k + 2 h_{k-1};
    - endpoints: one-sided three-point estimate, clamped to preserve
      shape (set to 0 on sign change; capped at 3·m on overshoot);
    - two-point profiles degrade to the secant (linear).

    One window shuffle per profile; targets broadcast. Exact grid hits
    return the grid value; strict-interior targets evaluate the cubic
    Hermite segment.
    """
    prof = df.groupBy(profile_col, depth_col).agg(F.min(value_col).alias("_y"))
    targets = F.broadcast(_targets_df(df.sparkSession, target_depths))

    exact = prof.join(
        targets, F.col(depth_col) == F.col("std_depth")
    ).select(profile_col, "std_depth", _round6(F.col("_y")).alias("interp_value"))

    w = Window.partitionBy(profile_col).orderBy(depth_col)
    x, y = F.col(depth_col), F.col("_y")
    g = prof.select(
        profile_col,
        x.alias("x"),
        y.alias("y"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(profile_col)).alias("n"),
        (F.lead(depth_col).over(w) - x).alias("h"),
        ((F.lead("_y").over(w) - y) / (F.lead(depth_col).over(w) - x)).alias("m"),
    )
    wx = Window.partitionBy(profile_col).orderBy("x")
    g = g.select(
        "*",
        F.lag("h").over(wx).alias("h_prev"),
        F.lag("m").over(wx).alias("m_prev"),
        F.lead("h").over(wx).alias("h_next"),
        F.lead("m").over(wx).alias("m_next"),
    )

    # Endpoint three-point estimate, then the two Fritsch–Carlson clamps.
    def _endpoint(h0, h1, m0, m1):
        d = ((2.0 * h0 + h1) * m0 - h0 * m1) / (h0 + h1)
        d = F.when(F.signum(d) != F.signum(m0), F.lit(0.0)).otherwise(d)
        return F.when(
            (F.signum(m0) != F.signum(m1)) & (F.abs(d) > 3.0 * F.abs(m0)),
            3.0 * m0,
        ).otherwise(d)

    h0, h1 = F.col("h"), F.col("h_next")
    m0, m1 = F.col("m"), F.col("m_next")
    hp, mp = F.col("h_prev"), F.col("m_prev")
    w1 = 2.0 * h0 + hp
    w2 = h0 + 2.0 * hp
    interior_d = F.when(
        (mp * m0 <= 0.0), F.lit(0.0)
    ).otherwise((w1 + w2) / (w1 / mp + w2 / m0))
    d = (
        F.when(F.col("n") == 2, F.coalesce(m0, mp))  # linear fallback
        .when(F.col("rn") == 1, _endpoint(h0, h1, m0, m1))
        .when(
            F.col("rn") == F.col("n"),
            _endpoint(hp, F.lag("h", 2).over(wx), mp, F.lag("m", 2).over(wx)),
        )
        .otherwise(interior_d)
    )
    g = g.select(profile_col, "x", "y", "h", "m", d.alias("d"))
    seg = g.select(
        profile_col,
        F.col("x").alias("x_lo"),
        F.col("y").alias("y_lo"),
        "h",
        "m",
        F.col("d").alias("d_lo"),
        F.lead("d").over(Window.partitionBy(profile_col).orderBy("x")).alias("d_hi"),
    ).filter(F.col("h").isNotNull())

    t = F.col("std_depth")
    dx = t - F.col("x_lo")
    c2 = (3.0 * F.col("m") - 2.0 * F.col("d_lo") - F.col("d_hi")) / F.col("h")
    c3 = (F.col("d_lo") + F.col("d_hi") - 2.0 * F.col("m")) / (F.col("h") * F.col("h"))
    interior = seg.join(
        targets, (t > F.col("x_lo")) & (t < F.col("x_lo") + F.col("h"))
    ).select(
        profile_col,
        "std_depth",
        _round6(
            F.col("y_lo") + F.col("d_lo") * dx + c2 * dx * dx + c3 * dx * dx * dx
        ).alias("interp_value"),
    )
    return exact.unionByName(interior)


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
