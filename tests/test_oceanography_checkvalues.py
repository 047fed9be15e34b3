"""Published check values for the oceanographic formulas (scientific
correctness, independent of the DuckDB mirror)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.functions.oceanography import (
    depth_from_pressure,
    mackenzie_sound_speed,
    potential_temperature,
    practical_salinity,
)


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_mackenzie_check_value(spark):
    # Mackenzie (1981): c(25 °C, 35 PSU, 1000 m) = 1550.744 m/s
    c = _eval(spark, mackenzie_sound_speed(F.lit(25.0), F.lit(35.0), F.lit(1000.0)))
    assert c == pytest.approx(1550.744, abs=1e-3)


def test_pss78_definition_point(spark):
    # PSS-78: SP(Rt=1, t=15 °C) = 35 exactly (definition of the scale)
    sp = _eval(spark, practical_salinity(F.lit(1.0), F.lit(15.0)))
    assert sp == pytest.approx(35.0, abs=1e-6)


def test_unesco_depth_check_value(spark):
    # UNESCO 1983 (Saunders & Fofonoff): z(10000 dbar, 30°) = 9712.653 m
    z = _eval(spark, depth_from_pressure(F.lit(10000.0), F.lit(30.0)))
    assert z == pytest.approx(9712.653, abs=0.01)


def test_potential_temperature_surface_identity(spark):
    # θ(S, T, p=0) ≡ T at the reference pressure
    th = _eval(spark, potential_temperature(F.lit(10.0), F.lit(35.0), F.lit(0.0)))
    assert th == pytest.approx(10.0, abs=1e-12)
    # Bryden (1973) published check value: θ(S=25, T=10 °C, p=1000 BARS)
    # = 8.4678516 °C. The polynomial is calibrated in bars — 1000 bars
    # = 10000 dbar in the engine's pressure unit (the ~1.53 °C adiabatic
    # cooling is physical over 10 km, not 1 km; round-4 unit fix).
    th2 = _eval(
        spark, potential_temperature(F.lit(10.0), F.lit(25.0), F.lit(10000.0))
    )
    assert th2 == pytest.approx(8.4678516, abs=1e-6)


def test_sa_from_sp_anchor(spark):
    # Millero et al. 2008 reference composition: SA(SP=35) = 35.16504 g/kg
    from cioos_siooc_data_transform_spark.functions.oceanography import sa_from_sp

    sa = _eval(spark, sa_from_sp(F.lit(35.0)))
    assert sa == pytest.approx(35.16504, abs=1e-12)


def test_eos80_density_check_values(spark):
    # UNESCO 1983 published check values for the one-atmosphere
    # International Equation of State (Millero & Poisson 1981).
    from cioos_siooc_data_transform_spark.functions.oceanography import (
        rho_surface,
        sigma0,
    )

    assert _eval(spark, rho_surface(F.lit(0.0), F.lit(5.0))) == pytest.approx(
        999.96675, abs=1e-5
    )
    assert _eval(spark, rho_surface(F.lit(35.0), F.lit(5.0))) == pytest.approx(
        1027.67547, abs=1e-5
    )
    assert _eval(spark, rho_surface(F.lit(35.0), F.lit(25.0))) == pytest.approx(
        1023.34306, abs=1e-5
    )
    assert _eval(spark, sigma0(F.lit(35.0), F.lit(5.0))) == pytest.approx(
        27.67547, abs=1e-5
    )


def test_alpha_beta_match_finite_differences(spark):
    """The analytic EOS-80 α/β must equal central finite differences of
    rho_surface (independent derivation from the same polynomial), and
    carry the right physical signs/magnitudes at (35, 15):
    α ≈ 2.1e-4 K⁻¹ > 0, β ≈ 7.5e-4 PSU⁻¹ > 0."""
    from cioos_siooc_data_transform_spark.functions.oceanography import (
        haline_contraction_beta,
        rho_surface,
        thermal_expansion_alpha,
    )

    s0, t0, h = 35.0, 15.0, 1e-5
    rho = lambda s, t: _eval(spark, rho_surface(F.lit(s), F.lit(t)))  # noqa: E731
    alpha_fd = -(rho(s0, t0 + h) - rho(s0, t0 - h)) / (2 * h) / rho(s0, t0)
    beta_fd = (rho(s0 + h, t0) - rho(s0 - h, t0)) / (2 * h) / rho(s0, t0)
    alpha = _eval(spark, thermal_expansion_alpha(F.lit(s0), F.lit(t0)))
    beta = _eval(spark, haline_contraction_beta(F.lit(s0), F.lit(t0)))
    assert alpha == pytest.approx(alpha_fd, rel=1e-5)
    assert beta == pytest.approx(beta_fd, rel=1e-5)
    assert 1.5e-4 < alpha < 3.0e-4
    assert 7.0e-4 < beta < 8.0e-4


def test_freezing_point_check_value(spark):
    # UNESCO 1983 / Millero 1978: t_f(S=35, p=0) = −1.922 °C; pressure
    # term −7.53e−4 °C/dbar.
    from cioos_siooc_data_transform_spark.functions.oceanography import t_freezing

    assert _eval(spark, t_freezing(F.lit(35.0), F.lit(0.0))) == pytest.approx(
        -1.922, abs=1e-3
    )
    assert _eval(spark, t_freezing(F.lit(35.0), F.lit(500.0))) == pytest.approx(
        -1.9223013411410586 - 7.53e-4 * 500.0, abs=1e-9
    )


def test_coriolis_check_values(spark):
    from cioos_siooc_data_transform_spark.functions.oceanography import coriolis_f

    # f(90°) = 2Ω exactly (sin = 1): 1.458423e-4 s⁻¹; f(0°) = 0;
    # f(-45°) = -f(45°) (antisymmetry).
    assert _eval(spark, coriolis_f(F.lit(90.0))) == pytest.approx(
        1.458423e-4, rel=1e-12
    )
    assert _eval(spark, coriolis_f(F.lit(0.0))) == pytest.approx(0.0, abs=1e-20)
    assert _eval(spark, coriolis_f(F.lit(-45.0))) == pytest.approx(
        -_eval(spark, coriolis_f(F.lit(45.0))), rel=1e-12
    )


def test_haversine_check_values(spark):
    import math

    from cioos_siooc_data_transform_spark.functions.oceanography import (
        haversine_distance,
    )

    # Quarter meridian on the R=6371000 m sphere: (0,0)→(0,90) = R·π/2.
    d = _eval(
        spark,
        haversine_distance(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(90.0)),
    )
    assert d == pytest.approx(6371000.0 * math.pi / 2.0, rel=1e-12)
    # One degree of longitude at the equator = R·π/180 ≈ 111194.927 m.
    d1 = _eval(
        spark,
        haversine_distance(F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(0.0)),
    )
    assert d1 == pytest.approx(6371000.0 * math.pi / 180.0, rel=1e-9)
    # Coincident points → 0.
    d0 = _eval(
        spark,
        haversine_distance(F.lit(12.5), F.lit(-30.0), F.lit(12.5), F.lit(-30.0)),
    )
    assert d0 == pytest.approx(0.0, abs=1e-9)


def _interp_map(df):
    return {
        (r["profile_id"], r["std_depth"]): r["interp_value"] for r in df.collect()
    }


def test_linear_interp_anchor_and_pandas_crosscheck(spark):
    """Hand-computed linear anchors + the applyInPandas variant must agree
    with the declarative variant on duplicate-free profiles."""
    from cioos_siooc_data_transform_spark.functions.oceanography import (
        profile_interp,
        profile_interp_declarative,
    )

    rows = [
        ("p1", 0.0, 10.0),
        ("p1", 10.0, 12.0),
        ("p1", 20.0, 16.0),
        ("p2", 5.0, 1.0),
        ("p2", 15.0, 2.0),
    ]
    df = spark.createDataFrame(rows, "profile_id string, depth double, sigma double")
    targets = [5.0, 10.0, 15.0]
    got = _interp_map(
        profile_interp_declarative(df, "profile_id", "depth", "sigma", targets)
    )
    # anchors: p1@5 = 11.0 (midpoint), p1@10 = 12.0 (grid), p1@15 = 14.0;
    # p2@5 = 1.0 (grid), p2@10 = 1.5, p2@15 = 2.0 (grid)
    assert got == {
        ("p1", 5.0): 11.0,
        ("p1", 10.0): 12.0,
        ("p1", 15.0): 14.0,
        ("p2", 5.0): 1.0,
        ("p2", 10.0): 1.5,
        ("p2", 15.0): 2.0,
    }
    pandas_got = _interp_map(
        profile_interp(df, "profile_id", "depth", "sigma", targets)
    )
    assert pandas_got == got


def test_pchip_anchor_fritsch_carlson(spark):
    """Hand-derived Fritsch–Carlson values for x=[0,1,2], y=[0,1,1]:
    slopes m=[1,0]; d0 = ((2·1+1)·1 − 1·0)/2 = 1.5 (no clamp fires),
    d1 = 0 (slope product ≤ 0), d2 = 0 (sign flip clamp).
    Segment 0 at t=0.5: c2 = (3−3−0)/1 = 0, c3 = (1.5+0−2)/1 = −0.5
    → y = 1.5·0.5 − 0.5·0.125 = 0.6875.
    Segment 1 at t=1.5: flat (all coefficients 0) → 1.0 — the monotone
    shape-preservation PCHIP exists for (no linear-style overshoot)."""
    from cioos_siooc_data_transform_spark.functions.oceanography import pchip_interp

    rows = [("p", 0.0, 0.0), ("p", 1.0, 1.0), ("p", 2.0, 1.0)]
    df = spark.createDataFrame(rows, "profile_id string, depth double, sigma double")
    got = _interp_map(pchip_interp(df, "profile_id", "depth", "sigma", [0.5, 1.0, 1.5]))
    assert got == {("p", 0.5): 0.6875, ("p", 1.0): 1.0, ("p", 1.5): 1.0}


def test_pchip_reproduces_linear_data_and_preserves_range(spark):
    """PCHIP on exactly-linear data is the line; on monotone data every
    interpolated value stays within its bracketing grid values."""
    from cioos_siooc_data_transform_spark.functions.oceanography import pchip_interp

    lin = [("l", float(x), 3.0 + 2.0 * x) for x in range(5)]
    mono = [("m", 0.0, 1.0), ("m", 1.0, 1.1), ("m", 2.0, 4.0), ("m", 3.0, 4.05)]
    df = spark.createDataFrame(
        lin + mono, "profile_id string, depth double, sigma double"
    )
    got = _interp_map(
        pchip_interp(df, "profile_id", "depth", "sigma", [0.5, 1.5, 2.5])
    )
    assert got[("l", 0.5)] == 4.0 and got[("l", 1.5)] == 6.0 and got[("l", 2.5)] == 8.0
    assert 1.0 <= got[("m", 0.5)] <= 1.1
    assert 1.1 <= got[("m", 1.5)] <= 4.0
    assert 4.0 <= got[("m", 2.5)] <= 4.05


def test_pchip_two_point_profile_is_linear(spark):
    from cioos_siooc_data_transform_spark.functions.oceanography import pchip_interp

    df = spark.createDataFrame(
        [("p", 0.0, 2.0), ("p", 10.0, 4.0)],
        "profile_id string, depth double, sigma double",
    )
    got = _interp_map(pchip_interp(df, "profile_id", "depth", "sigma", [2.5, 7.5]))
    assert got == {("p", 2.5): 2.5, ("p", 7.5): 3.5}


def test_dyn_height_anchor(spark):
    """Constant-delta profile integrates linearly: t=15, s=35 gives
    delta = 2e-4·5/1025 per level; dyn height at p (dbar) is
    delta·(p−p0)·1e4 — hand-computed anchors, reference level = 0."""
    from cioos_siooc_data_transform_spark.functions.oceanography import (
        dyn_height_profile,
    )

    rows = [
        ("p1", 100.0, 15.0, 35.0),
        ("p1", 200.0, 15.0, 35.0),
        ("p1", 400.0, 15.0, 35.0),
        ("p2", 50.0, 10.0, 35.0),   # delta = 0 → flat 0
        ("p2", 150.0, 10.0, 35.0),
    ]
    df = spark.createDataFrame(
        rows, "profile_id string, p double, t double, s double"
    )
    got = {
        (r["profile_id"], r["p"]): r["dyn_height"]
        for r in dyn_height_profile(df, "profile_id", "p", "t", "s").collect()
    }
    delta = 2.0e-4 * 5.0 / 1025.0
    assert got[("p1", 100.0)] == 0.0
    assert got[("p1", 200.0)] == pytest.approx(delta * 100.0 * 1e4, abs=1e-6)
    assert got[("p1", 400.0)] == pytest.approx(delta * 300.0 * 1e4, abs=1e-6)
    assert got[("p2", 50.0)] == 0.0 and got[("p2", 150.0)] == 0.0


def _pchip_ref(xs, ys, t):
    """Independent pure-Python Fritsch–Carlson PCHIP (the published
    algorithm, written from the paper/SciPy docs — NOT from the Spark
    implementation) for cross-validation."""
    n = len(xs)
    if t in xs:
        return ys[xs.index(t)]
    h = [xs[i + 1] - xs[i] for i in range(n - 1)]
    m = [(ys[i + 1] - ys[i]) / h[i] for i in range(n - 1)]
    if n == 2:
        d = [m[0], m[0]]
    else:
        d = [0.0] * n
        for k in range(1, n - 1):
            if m[k - 1] * m[k] <= 0:
                d[k] = 0.0
            else:
                w1 = 2 * h[k] + h[k - 1]
                w2 = h[k] + 2 * h[k - 1]
                d[k] = (w1 + w2) / (w1 / m[k - 1] + w2 / m[k])

        def endpoint(h0, h1, m0, m1):
            dd = ((2 * h0 + h1) * m0 - h0 * m1) / (h0 + h1)
            sign = lambda v: (v > 0) - (v < 0)
            if sign(dd) != sign(m0):
                dd = 0.0
            elif sign(m0) != sign(m1) and abs(dd) > 3 * abs(m0):
                dd = 3 * m0
            return dd

        d[0] = endpoint(h[0], h[1], m[0], m[1])
        d[n - 1] = endpoint(h[n - 2], h[n - 3], m[n - 2], m[n - 3])
    for k in range(n - 1):
        if xs[k] < t < xs[k + 1]:
            dx = t - xs[k]
            c2 = (3 * m[k] - 2 * d[k] - d[k + 1]) / h[k]
            c3 = (d[k] + d[k + 1] - 2 * m[k]) / (h[k] * h[k])
            return ys[k] + d[k] * dx + c2 * dx * dx + c3 * dx * dx * dx
    return None


def test_pchip_matches_independent_reference(spark):
    """200 random profiles (varied length, non-monotone) interpolated by
    Spark must match the independent Python Fritsch–Carlson reference."""
    import random

    from cioos_siooc_data_transform_spark.functions.oceanography import pchip_interp

    rng = random.Random(7)
    profiles = {}
    rows = []
    for i in range(200):
        n = rng.randint(2, 8)
        xs = sorted(rng.sample(range(0, 40), n))
        xs = [float(x) for x in xs]
        ys = [round(rng.uniform(-5, 5), 2) for _ in range(n)]
        pid = f"p{i}"
        profiles[pid] = (xs, ys)
        rows += [(pid, x, y) for x, y in zip(xs, ys)]
    targets = [2.5, 7.5, 13.5, 21.5, 33.5]
    df = spark.createDataFrame(rows, "profile_id string, depth double, sigma double")
    got = {
        (r["profile_id"], r["std_depth"]): r["interp_value"]
        for r in pchip_interp(df, "profile_id", "depth", "sigma", targets).collect()
    }
    checked = 0
    for pid, (xs, ys) in profiles.items():
        for t in targets:
            if xs[0] <= t <= xs[-1]:
                expect = _pchip_ref(xs, ys, t)
                assert got[(pid, t)] == pytest.approx(expect, abs=2e-6), (
                    pid, t, xs, ys
                )
                checked += 1
            else:
                assert (pid, t) not in got
    assert checked > 300  # the comparison actually exercised many points


def test_turner_angle_anchors(spark):
    """Published Turner-angle geometry, hand-derived from the atan2
    definition: equal opposing contributions (α dT = −β dS) give Tu = 0°
    and R_ρ = −1 (the doubly-stable axis); equal same-sign contributions
    give Tu = 90° (the numerator-only axis). The engine expression must
    agree with math.atan2 on identical inputs."""
    import math

    from pyspark.sql import functions as F

    a, b = 2.0e-4, 7.6e-4
    # equal opposing contributions: a*dT = -b*dS → numerator 0 → Tu = 0
    dT, dS = 1.0, -(a / b) * 1.0
    tu = math.degrees(math.atan2(a * dT + b * dS, a * dT - b * dS))
    assert tu == pytest.approx(0.0, abs=1e-9)
    assert (a * dT) / (b * dS) == pytest.approx(-1.0, rel=1e-12)
    # equal same-sign contributions: denominator 0, numerator > 0 → 90°
    dS2 = (a / b) * 1.0
    tu2 = math.degrees(math.atan2(a * 1.0 + b * dS2, a * 1.0 - b * dS2))
    assert tu2 == pytest.approx(90.0, abs=1e-9)
    # engine expression agrees with math.atan2 on the same inputs
    row = (
        spark.range(1)
        .select(
            F.degrees(
                F.atan2(F.lit(a * dT + b * dS), F.lit(a * dT - b * dS))
            ).alias("tu")
        )
        .first()
    )
    assert row["tu"] == pytest.approx(tu, abs=1e-12)


def test_geostrophic_velocity_anchor(spark):
    """Hand-derived anchor from published constants: at mid-latitude 45°,
    f = 2Ω sin(45°) with Ω = 7.292115e-5 rad/s (TEOS-10), so a dynamic
    height difference of 0.1 m²/s² across a 100 km station separation
    gives v = 0.1 / (f · 1e5) ≈ 9.69687e-3 m/s. The engine's coriolis_f
    column expression must reproduce the same quotient."""
    import math

    from pyspark.sql import functions as F

    from cioos_siooc_data_transform_spark.functions.oceanography import coriolis_f

    omega = 7.292115e-5
    f45 = 2.0 * omega * math.sin(math.radians(45.0))
    v_expected = 0.1 / (f45 * 1.0e5)
    assert v_expected == pytest.approx(9.69687e-3, rel=1e-5)
    row = (
        spark.range(1)
        .select((F.lit(0.1) / (coriolis_f(F.lit(45.0)) * 1.0e5)).alias("v"))
        .first()
    )
    assert row["v"] == pytest.approx(v_expected, rel=1e-12)


def test_ipv_ratio_anchors(spark):
    """Hand-derived anchors for the IPV/fN² ratio: with a pure thermal
    gradient (ds = 0) the beta terms vanish and the ratio collapses to
    alpha(0)/alpha(p) = 1/(1 + 1e-5 p) — at p = 100 dbar that is
    1/1.001; and at p = 0 the reference and local gradients coincide, so
    the ratio is exactly 1 for any (dt, ds)."""
    from pyspark.sql import functions as F

    def ratio(dt, ds, mid_p):
        grad_ref = 2.0e-4 * (1.0 + 1.0e-5 * 0.0) * dt - 7.6e-4 * ds
        grad_loc = 2.0e-4 * (1.0 + 1.0e-5 * mid_p) * dt - 7.6e-4 * ds
        return grad_ref / grad_loc

    assert ratio(1.0, 0.0, 100.0) == pytest.approx(1.0 / 1.001, rel=1e-12)
    assert ratio(3.7, -1.2, 0.0) == pytest.approx(1.0, rel=1e-15)
    row = (
        spark.range(1)
        .select(
            (
                (2.0e-4 * F.lit(1.0))
                / (2.0e-4 * (1.0 + 1.0e-5 * F.lit(100.0)) * F.lit(1.0))
            ).alias("r")
        )
        .first()
    )
    assert row["r"] == pytest.approx(1.0 / 1.001, rel=1e-12)


# ---------------------------------------------------------------------------
# TEOS-10 native (SA, CT) tranche — round 4 anchors.
# ---------------------------------------------------------------------------
def _duck(sql: str) -> float:
    import duckdb

    return duckdb.sql(f"SELECT {sql} AS v").fetchone()[0]


def test_ct_from_pt_designed_zero_and_identity():
    """The F03 potential-enthalpy polynomial is constructed so that
    CT(SSO, pt=0) = 0 (TEOS-10 manual §3.3); the fit's residual at the
    zero point is < 1e-6 °C. And CT tracks pt to within 0.35 °C over
    oceanographic pt (the known size of the CT-θ difference at high T/S
    extremes is ~1 °C; on the SSO line it is far smaller)."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        GSW_SSO,
        ct_from_pt_sql,
    )

    zero = _duck(ct_from_pt_sql(f"{GSW_SSO}e0", "0.0e0"))
    assert abs(zero) < 1e-6
    for pt in (2.0, 10.0, 20.0, 28.0):
        ct = _duck(ct_from_pt_sql(f"{GSW_SSO}e0", f"{pt}e0"))
        assert abs(ct - pt) < 0.35, (pt, ct)


def test_specvol_75term_matches_published_table_and_structure():
    """Transcription guard: the coefficient table AND the Horner nesting
    must equal the published Roquet et al. (2015) expression exactly as
    vendored by the reference (gsw_internal_const.h /
    gsw_oceanographic_toolbox.c:2009). Catches any single-character
    drift in the 75 constants or the nesting."""
    import re

    from cioos_siooc_data_transform_spark.functions import teos10

    base = (
        "/root/reference/cioos_data_transform/GSW-Python/gsw-3.3.1/src/c_gsw"
    )
    hdr = open(f"{base}/gsw_internal_const.h").read()
    for name, val in teos10.SPECVOL_COEFFS.items():
        m = re.search(rf"\b{name}\s*=\s*([-0-9.e+]+)", hdr)
        assert m and float(m.group(1)) == val, name
    assert len(teos10.SPECVOL_COEFFS) == 75

    src = open(f"{base}/gsw_oceanographic_toolbox.c").read()
    m = re.search(
        r"gsw_specvol\(double sa, double ct, double p\)\s*\{.*?value = "
        r"(.*?);\s*\n\s*return",
        src,
        re.S,
    )
    published = re.sub(r"\s+", "", m.group(1))
    mine = re.sub(r"\s+", "", teos10._SPECVOL_TEMPLATE)
    mine = (
        mine.replace("{xs}", "xs").replace("{ys}", "ys").replace("{z}", "z")
    )
    assert mine == "(" + published + ")"


def test_teos10_density_cross_validates_eos80():
    """Independent-implementation cross-check: TEOS-10 75-term surface
    density vs the engine's EOS-80 (UNESCO-check-valued) density agrees
    to < 0.01 kg/m³ over S∈[25,40], T∈[-2,30] — the published agreement
    level of the two equations of state. A typo in ANY low-order
    specvol coefficient would blow this tolerance."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_from_pt_sql,
        rho_sql,
    )

    for S in (25.0, 30.0, 35.0, 38.0, 40.0):
        for T in (-2.0, 0.0, 5.0, 10.0, 15.0, 20.0, 25.0, 30.0):
            sa = f"({S}e0*(35.16504e0/35.0e0))"
            ct = _duck(ct_from_pt_sql(sa, f"{T}e0"))
            rho_t10 = _duck(rho_sql(sa, repr(ct), "0.0e0"))
            rho_w = (
                999.842594 + 6.793952e-2 * T - 9.095290e-3 * T**2
                + 1.001685e-4 * T**3 - 1.120083e-6 * T**4
                + 6.536332e-9 * T**5
            )
            a = (
                8.24493e-1 - 4.0899e-3 * T + 7.6438e-5 * T**2
                - 8.2467e-7 * T**3 + 5.3875e-9 * T**4
            )
            b = -5.72466e-3 + 1.0227e-4 * T - 1.6546e-6 * T**2
            rho_e80 = rho_w + a * S + b * S**1.5 + 4.8314e-4 * S**2
            assert abs(rho_t10 - rho_e80) < 0.01, (S, T, rho_t10, rho_e80)


def test_teos10_compressibility_band():
    """In-situ density at SSO/CT=0 rises ~4.4-4.9 kg/m³ over the first
    1000 dbar (seawater compressibility ~4.1e-6 /dbar) and specvol·rho
    is exactly 1 by construction."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        rho_sql,
        specvol_sql,
    )

    r0 = _duck(rho_sql("35.16504e0", "0.0e0", "0.0e0"))
    r1k = _duck(rho_sql("35.16504e0", "0.0e0", "1000.0e0"))
    assert 1027.5 < r0 < 1028.5
    assert 4.2 < r1k - r0 < 5.0
    prod = _duck(
        f"{rho_sql('35.0e0', '10.0e0', '500.0e0')}"
        f" * {specvol_sql('35.0e0', '10.0e0', '500.0e0')}"
    )
    assert prod == pytest.approx(1.0, abs=1e-15)


def test_bryden_theta_is_in_bars(spark):
    """Regression pin for the round-4 unit fix: θ(35, 10 °C, 1000 dbar)
    must show ~0.11 °C of adiabatic cooling (Bryden's polynomial takes
    bars; feeding dbar unscaled gave an unphysical ~1.1 °C)."""
    from cioos_siooc_data_transform_spark.functions.oceanography import (
        potential_temperature,
    )

    row = (
        spark.range(1)
        .select(
            potential_temperature(
                F.lit(10.0), F.lit(35.0), F.lit(1000.0)
            ).alias("theta")
        )
        .collect()[0]
    )
    assert row["theta"] == pytest.approx(10.0 - 0.1147, abs=0.02)


def test_theta_rk4_unesco_check_value(spark):
    """UNESCO TP 44 (Fofonoff & Millard 1983) check value for the RK4
    potential-temperature integration: theta(40, 40, 10000, 0) =
    36.89073 degC — pins the Runge-Kutta weights AND the lapse-rate
    coefficients at full ocean-trench pressure."""
    df = spark.createDataFrame([(40.0, 40.0, 10000.0)], "s DOUBLE, t DOUBLE, p DOUBLE")
    from cioos_siooc_data_transform_spark.functions.oceanography import theta_rk4

    got = theta_rk4(df, "s", "t", "p").collect()[0]["theta_rk4"]
    assert got == pytest.approx(36.89073, abs=1e-5)


def test_ct_from_t_rk4_vs_gsw_entropy_iteration(spark):
    """TEOS-10 check point CT_from_t(SA=34.7118, t=28.7856, p=10) =
    28.809919826700281 (GSW's entropy Newton iteration). The RK4-theta
    composition must land within 3e-6 K — closing the documented
    mK-level Bryden divergence to the EOS-80<->TEOS-10 reference-state
    difference; the one-shot Bryden default must itself stay inside a
    few mK (its documented band)."""
    from cioos_siooc_data_transform_spark.functions.oceanography import theta_rk4
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        GSW_SSO,
        ct_from_pt_sql,
        ct_from_t_sql,
    )

    sp = 34.7118 * 35.0 / GSW_SSO  # practical salinity twin of SA for EOS-80 inputs
    df = spark.createDataFrame([(sp, 28.7856, 10.0)], "s DOUBLE, t DOUBLE, p DOUBLE")
    ref = 28.809919826700281
    rk4 = (
        theta_rk4(df, "s", "t", "p")
        .select(F.expr(ct_from_pt_sql("34.7118e0", "theta_rk4")).alias("ct"))
        .collect()[0]["ct"]
    )
    assert rk4 == pytest.approx(ref, abs=3e-6)
    bryden = (
        df.select(F.expr(ct_from_t_sql("s", "t", "p")).alias("ct")).collect()[0]["ct"]
    )
    assert bryden == pytest.approx(ref, abs=5e-3)


def test_pt_from_ct_roundtrip_identity(spark):
    """The Newton inversion must reproduce the potential temperature the
    forward polynomial started from: pt_from_ct(sa, ct_from_pt(sa, pt))
    == pt to < 1e-9 K across the oceanographic range (two quadratic
    steps from |CT - pt| <= ~0.6 K)."""
    from cioos_siooc_data_transform_spark.functions.teos10 import ct_from_pt_sql
    from cioos_siooc_data_transform_spark.plans.staged_r6 import pt_from_ct_stages

    rows = [
        (sa, pt)
        for sa in (0.0, 10.0, 34.7118, 42.0)
        for pt in (-1.5, 0.0, 3.5, 15.0, 28.7856, 39.0)
    ]
    df = spark.createDataFrame(rows, "sa DOUBLE, pt_true DOUBLE").withColumn(
        "ct", F.expr(ct_from_pt_sql("sa", "pt_true"))
    )
    for name, expr in pt_from_ct_stages("sa", "ct"):
        df = df.withColumn(name, F.expr(expr))
    for r in df.select("pt_true", "pt_from_ct").collect():
        assert abs(r.pt_from_ct - r.pt_true) < 1e-9, r


def test_p_from_z_roundtrip(spark):
    """Saunders inversion: depth_from_pressure(p_from_z(z)) must return
    z to < 1e-6 m over the full ocean range and latitudes."""
    from cioos_siooc_data_transform_spark.functions.oceanography import (
        depth_from_pressure,
    )
    from cioos_siooc_data_transform_spark.plans.staged_r6 import p_from_z_stages

    rows = [
        (float(z), float(lat))
        for z in (1.0, 100.0, 1000.0, 5000.0, 10000.0)
        for lat in (0.0, 30.0, 60.0, 90.0)
    ]
    df = spark.createDataFrame(rows, "z DOUBLE, lat DOUBLE")
    for name, expr in p_from_z_stages("z", "lat"):
        df = df.withColumn(name, F.expr(expr))
    out = df.select(
        "z", depth_from_pressure(F.col("p_from_z"), F.col("lat")).alias("z_back")
    )
    for r in out.collect():
        assert abs(r.z_back - r.z) < 1e-6, r


def test_entropy_published_check_value(spark):
    """TEOS-10 check table (IOC, SCOR & IAPSO 2010; Feistel 2008 Gibbs
    -g_T): eta(SA=35.7 g/kg, t=25.5 degC, p=1023 dbar)
    = 352.81879771528 J/(kg K), plus the reference-state normalization
    eta(SSO, 0, 0) = 0 (residual below the fit's own ~1e-5 rounding
    floor)."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        entropy_from_t_sql,
    )

    df = spark.createDataFrame(
        [(35.7, 25.5, 1023.0), (35.16504, 0.0, 0.0)],
        "sa DOUBLE, t DOUBLE, p DOUBLE",
    )
    got = [
        r.eta
        for r in df.select(
            F.expr(entropy_from_t_sql("sa", "t", "p")).alias("eta")
        ).collect()
    ]
    assert got[0] == pytest.approx(352.81879771528, abs=1e-9)
    assert abs(got[1]) < 2e-5


def test_entropy_adiabatic_invariance(spark):
    """Entropy is conserved under adiabatic displacement: eta(SA, t, p)
    must equal eta(SA, theta, 0) with theta from the UNESCO RK4
    integration. The two polynomials come from different published
    sources (Gibbs -g_T vs the EOS-80 lapse rate), so sub-0.05
    J/(kg K) agreement is a real cross-check, not an identity."""
    from cioos_siooc_data_transform_spark.functions.oceanography import theta_rk4
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        GSW_SSO,
        entropy_from_t_sql,
    )

    df = spark.createDataFrame(
        [(35.0, 20.0, 2000.0), (34.0, 4.0, 5000.0), (35.5, 28.0, 500.0)],
        "s DOUBLE, t DOUBLE, p DOUBLE",
    )
    sa = f"(s*({GSW_SSO}/35.0))"
    rows = (
        theta_rk4(df, "s", "t", "p")
        .select(
            F.expr(entropy_from_t_sql(sa, "t", "p")).alias("eta_insitu"),
            F.expr(entropy_from_t_sql(sa, "theta_rk4", "0.0e0")).alias(
                "eta_pot"
            ),
        )
        .collect()
    )
    for r in rows:
        assert r.eta_insitu == pytest.approx(r.eta_pot, abs=0.05)


def test_spiciness0_normalization_and_monotonicity(spark):
    """McDougall & Krzysik (2015): tau0(SSO, 0 degC) = 0 by
    construction (the fit's normalization point), and spiciness
    increases with both CT (warmer = spicier) and SA (saltier =
    spicier) across the oceanographic range."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        GSW_SSO,
        spiciness0_sql,
    )

    pts = [(GSW_SSO, 0.0)] + [
        (sa, ct) for sa in (33.0, 35.0, 37.0) for ct in (0.0, 10.0, 25.0)
    ]
    df = spark.createDataFrame(pts, "sa DOUBLE, ct DOUBLE")
    got = {
        (round(r.sa, 5), r.ct): r.tau
        for r in df.select(
            "sa", "ct", F.expr(spiciness0_sql("sa", "ct")).alias("tau")
        ).collect()
    }
    assert abs(got[(round(GSW_SSO, 5), 0.0)]) < 1e-9
    for sa in (33.0, 35.0, 37.0):
        assert got[(sa, 0.0)] < got[(sa, 10.0)] < got[(sa, 25.0)]
    for ct in (0.0, 10.0, 25.0):
        assert got[(33.0, ct)] < got[(35.0, ct)] < got[(37.0, ct)]
    # the deeper references share the (SSO, 0) normalization
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        spiciness1_sql,
        spiciness2_sql,
    )

    deep = (
        spark.createDataFrame([(GSW_SSO, 0.0)], "sa DOUBLE, ct DOUBLE")
        .select(
            F.expr(spiciness1_sql("sa", "ct")).alias("t1"),
            F.expr(spiciness2_sql("sa", "ct")).alias("t2"),
        )
        .collect()[0]
    )
    assert abs(deep.t1) < 1e-9 and abs(deep.t2) < 1e-9


def test_internal_energy_definition_identity(spark):
    """u = h - (P0 + 1e4 p) v with P0 = 101325 Pa (IOC et al. 2010 eqn
    3.25): at p = 0 the dynamic-enthalpy term vanishes, so
    u(SA, CT, 0) = cp0*CT - 101325*v(SA, CT, 0) must hold against an
    INDEPENDENT evaluation of the 75-term specific volume; at depth,
    u < h (the P v work term is always positive)."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        GSW_CP0,
        GSW_P0,
        internal_energy_sql,
        specvol_sql,
    )

    df = spark.createDataFrame(
        [(34.7118, 28.7856, 0.0), (35.0, 10.0, 3000.0)],
        "sa DOUBLE, ct DOUBLE, p DOUBLE",
    )
    rows = df.select(
        "p",
        "ct",
        F.expr(internal_energy_sql("sa", "ct", "p")).alias("u"),
        F.expr(specvol_sql("sa", "ct", "p")).alias("v"),
    ).collect()
    surf = next(r for r in rows if r.p == 0.0)
    assert surf.u == pytest.approx(
        GSW_CP0 * surf.ct - GSW_P0 * surf.v, abs=1e-6
    )
    deep = next(r for r in rows if r.p > 0.0)
    # At depth, check the composition against separately-evaluated
    # pieces (h_dyn and v each carry their own published check values):
    # u = cp0·CT + h_dyn − (P0 + 1e4·p)·v.
    from cioos_siooc_data_transform_spark.plans.staged_r5 import (
        dynamic_enthalpy_sql,
    )

    h_dyn, v_deep = (
        spark.createDataFrame(
            [(35.0, 10.0, 3000.0)], "sa DOUBLE, ct DOUBLE, p DOUBLE"
        )
        .select(
            F.expr(dynamic_enthalpy_sql("sa", "ct", "p")).alias("h_dyn"),
            F.expr(specvol_sql("sa", "ct", "p")).alias("v"),
        )
        .collect()[0]
    )
    expected = GSW_CP0 * deep.ct + h_dyn - (GSW_P0 + 1.0e4 * deep.p) * v_deep
    assert deep.u == pytest.approx(expected, abs=1e-6)


def test_t_from_ct_roundtrip(spark):
    """CT(t_from_CT(SA, CT, p)) must reproduce CT to < 2 mK: the Newton
    CT->pt inversion and the backward RK4 adiabat are inverses of the
    committed forward conversions."""
    from cioos_siooc_data_transform_spark.functions.teos10 import ct_from_t_sql
    from cioos_siooc_data_transform_spark.plans.staged_r8 import (
        _t_from_ct_stages,
    )

    df = spark.createDataFrame(
        [(35.0, 20.0, 2000.0), (34.0, 4.0, 5000.0), (35.5, 28.0, 500.0)],
        "s DOUBLE, t DOUBLE, p DOUBLE",
    )
    df = df.select(
        "s",
        "p",
        "t",
        F.expr("(s*(35.16504e0/35.0e0))").alias("sa"),
        F.expr(ct_from_t_sql("s", "t", "p")).alias("ct"),
    )
    for name, expr in _t_from_ct_stages():
        df = df.withColumn(name, F.expr(expr))
    rows = df.select(
        "ct", "t", F.col("theta_rk4").alias("t_rec"), "s", "p"
    ).collect()
    for r in rows:
        ct_rt = (
            spark.createDataFrame(
                [(r.s, r.t_rec, r.p)], "s DOUBLE, t DOUBLE, p DOUBLE"
            )
            .select(F.expr(ct_from_t_sql("s", "t", "p")).alias("ct"))
            .collect()[0]
            .ct
        )
        assert ct_rt == pytest.approx(r.ct, abs=2e-3)
        assert r.t_rec == pytest.approx(r.t, abs=0.05)


def test_sa_from_rho_roundtrip(spark):
    """SA recovered from rho(SA, CT, p) must reproduce SA to < 1e-9
    g/kg (rho is near-linear in SA; two Newton steps from SA0 = 35)."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        rho_sql,
        sa_from_rho_stages,
    )

    df = spark.createDataFrame(
        [(30.0, 5.0, 0.0), (34.5, 18.0, 1500.0), (37.0, 28.0, 4000.0)],
        "sa DOUBLE, ct DOUBLE, p DOUBLE",
    )
    df = df.select("sa", "ct", "p", F.expr(rho_sql("sa", "ct", "p")).alias("rho"))
    for name, expr in sa_from_rho_stages("rho", "ct", "p"):
        df = df.withColumn(name, F.expr(expr))
    for r in df.select("sa", "sa_from_rho").collect():
        assert r.sa_from_rho == pytest.approx(r.sa, abs=1e-9)


def test_iapws06_ice_table6_check_values(spark):
    """IAPWS-06 "Revised Release on the Equation of State 2006 for H2O
    Ice Ih" (Feistel & Wagner 2006) Table 6 — all three published
    states, pinned to the full published precision. Inputs converted to
    the engine convention (t in degC ITS-90, p in sea-pressure dbar,
    absolute P = 101325 Pa + 1e4*p):

    state          T [K]       P [Pa]    g [J/kg]        rho [kg/m3]
    triple         273.16      611.657   0.611784135     916.709492200
    normal melt    273.152519  101325    101.342742797   916.721463419
    cold/deep      100         1e8       -222296.513088  941.678203297
    """
    from cioos_siooc_data_transform_spark.functions.ice import gibbs_ice_stages

    df = spark.createDataFrame(
        [
            ("triple", 0.01, (611.657 - 101325.0) / 1.0e4),
            ("normal_melt", 0.002519, 0.0),
            ("cold_deep", -173.15, (1.0e8 - 101325.0) / 1.0e4),
        ],
        "state STRING, t DOUBLE, p DOUBLE",
    )
    for name, expr in gibbs_ice_stages("t", "p"):
        df = df.withColumn(name, F.expr(expr))
    got = {
        r["state"]: r
        for r in df.select(
            "state", "gibbs_ice", "rho_ice", "entropy_ice", "cp_ice", "enthalpy_ice"
        ).collect()
    }
    # (g, rho, s = -g_T, cp = -T*g_TT, h = g - T*g_T) from Table 6.
    want = {
        "triple": (0.611784135, 916.709492200, -1220.69433940,
                   2096.78431622, -333444.253966),
        "normal_melt": (101.342742797, 916.721463419, -1220.76932550,
                        2096.71391024, -333354.873637),
        "cold_deep": (-222296.513088, 941.678203297, -2611.95122589,
                      866.333195517, -483491.635676),
    }
    for state, (g, rho, s, cp, h) in want.items():
        r = got[state]
        # normal_melt's T is quoted to 6 dp (273.152519 K), which moves
        # g in the 7th significant digit; all other rows pin exactly.
        g_tol = 3e-6 if state == "normal_melt" else 1e-8
        assert r["gibbs_ice"] == pytest.approx(g, abs=max(abs(g) * g_tol, 1e-8))
        assert r["rho_ice"] == pytest.approx(rho, rel=1e-11)
        assert r["entropy_ice"] == pytest.approx(s, rel=1e-10)
        assert r["cp_ice"] == pytest.approx(cp, rel=1e-10)
        assert r["enthalpy_ice"] == pytest.approx(h, rel=1e-10)


def test_ct_from_enthalpy_roundtrip(spark):
    """CT recovered from h(SA, CT, p) by the two-step Newton stages must
    reproduce CT to < 1e-6 K (h is near-linear in CT, dh/dCT ~ cp0)."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_from_enthalpy_stages,
        enthalpy_stages,
    )

    df = spark.createDataFrame(
        [(30.0, 5.0, 0.0), (34.5, 18.0, 1500.0), (37.0, 28.0, 4000.0)],
        "sa DOUBLE, ct DOUBLE, p DOUBLE",
    )
    for name, expr in (
        enthalpy_stages("sa", "ct", "p", x="__hin_")
        + [("h", "__hin_out")]
        + ct_from_enthalpy_stages("h", "sa", "p")
    ):
        df = df.withColumn(name, F.expr(expr))
    for r in df.select("ct", "ct_from_enthalpy").collect():
        assert r.ct_from_enthalpy == pytest.approx(r.ct, abs=1e-6)


def test_enthalpy_diff_matches_two_evaluations(spark):
    """enthalpy_diff's shared-a_K Horner must equal h(p_deep) −
    h(p_shallow) computed by two independent staged evaluations to
    sub-µJ/kg (same coefficients, regrouped tree)."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        dynamic_enthalpy_stages,
        enthalpy_diff_stages,
    )

    df = spark.createDataFrame(
        [(35.16504, 10.0, 500.0), (30.0, 2.0, 0.0), (37.0, 28.0, 3000.0)],
        "sa DOUBLE, ct DOUBLE, p DOUBLE",
    )
    for name, expr in (
        enthalpy_diff_stages("sa", "ct", "p", "(p + 1000.0e0)")
        + dynamic_enthalpy_stages("sa", "ct", "p", x="__d1_")
        + dynamic_enthalpy_stages("sa", "ct", "(p + 1000.0e0)", x="__d2_")
    ):
        df = df.withColumn(name, F.expr(expr))
    for r in df.select(
        "enthalpy_diff", (F.col("__d2_out") - F.col("__d1_out")).alias("two")
    ).collect():
        assert r.enthalpy_diff == pytest.approx(r.two, abs=1e-6)


def test_latentheat_melting_anchors(spark):
    """IOC et al. (2010) publish the latent heat of melting of ice into
    PURE water at p = 0 as 333 426.5 J/kg; the staged composition (75-term
    seawater enthalpy + partial-salinity term + IAPWS-06 ice enthalpy at
    the Millero freezing point) must land within 20 J/kg (the residual is
    the Millero-vs-exact freezing point, ~3.6 mK = 7 J/kg). Seawater
    values must sit in the published band (L decreases with salinity;
    ~329.9 kJ/kg at SP = 35, p = 0) and decrease with pressure."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        latentheat_melting_stages,
    )

    df = spark.createDataFrame(
        [(0.02, 0.0), (35.0, 0.0), (35.0, 500.0)], "s DOUBLE, p DOUBLE"
    )
    for name, expr in latentheat_melting_stages("s", "p"):
        df = df.withColumn(name, F.expr(expr))
    rows = {
        (r.s, r.p): r.latentheat_melting
        for r in df.select("s", "p", "latentheat_melting").collect()
    }
    assert rows[(0.02, 0.0)] == pytest.approx(333426.5, abs=20.0)
    assert rows[(35.0, 0.0)] == pytest.approx(329920.0, abs=200.0)
    assert rows[(35.0, 500.0)] < rows[(35.0, 0.0)]  # melting heat drops with p


def test_latentheat_evap_hs84_check_values(spark):
    """Henderson-Sellers (1984) fit against steam-table values:
    2.5008e6 J/kg at 0 °C, 2.4535e6 at 20 °C (within 0.02 %)."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        latentheat_evap_hs84_sql,
    )

    df = spark.createDataFrame([(0.0,), (20.0,)], "t DOUBLE")
    got = {
        r.t: r.lh
        for r in df.select(
            "t", F.expr(latentheat_evap_hs84_sql("t")).alias("lh")
        ).collect()
    }
    assert got[0.0] == pytest.approx(2.5008e6, rel=2e-4)
    assert got[20.0] == pytest.approx(2.4535e6, rel=2e-4)


def test_ct_freezing_anchor(spark):
    """CT_freezing composition: the published Millero check value
    t_f(35, 0) = -1.922 °C (UNESCO 1983), and CT at that (t, p=0) —
    at the surface pt = t, so CT_f differs from t_f only by the
    CT_from_pt fit's reference-state offset (~2.6 mK at freezing):
    CT_f(35, 0) = -1.91972 °C, pinned to the composition's own value
    so any coefficient regression shows up."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_freezing_sql,
        t_freezing_sql,
    )

    df = spark.createDataFrame([(35.0, 0.0)], "s DOUBLE, p DOUBLE")
    r = df.select(
        F.expr(t_freezing_sql("s", "p")).alias("tf"),
        F.expr(ct_freezing_sql("s", "p")).alias("ctf"),
    ).first()
    assert r.tf == pytest.approx(-1.922, abs=1e-3)
    assert r.ctf == pytest.approx(-1.91972, abs=5e-4)
    assert abs(r.ctf - r.tf) < 5e-3  # CT ~ pt near the surface


def test_cabbeling_thermobaric_analytic_vs_fd(spark):
    """The analytic derivative polynomials behind cabbeling/thermobaric
    must agree with central finite differences of alpha/beta computed
    from the plain 75-term specvol (eps small enough that truncation
    < 1e-4 relative), and the warm-surface TEOS-10 check point must sit
    in the published band (cabbeling ~ 8.7e-6 1/K², thermobaric
    ~ 1.4e-12 1/(K·Pa) at SA=34.7118, CT=28.8099, p=10)."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        cabbeling_thermobaric_stages,
        specvol_sql,
    )

    df = spark.createDataFrame(
        [(34.7118, 28.8099, 10.0), (35.0, 2.0, 2000.0), (30.0, 10.0, 500.0)],
        "sa DOUBLE, ct DOUBLE, p DOUBLE",
    )
    for name, expr in cabbeling_thermobaric_stages("sa", "ct", "p"):
        df = df.withColumn(name, F.expr(expr))

    def alpha(sa, ct, p):
        e = 1e-3
        return (
            f"(({specvol_sql(sa, f'({ct} + {e})', p)}"
            f" - {specvol_sql(sa, f'({ct} - {e})', p)})"
            f"/(2.0e0*{e}*{specvol_sql(sa, ct, p)}))"
        )

    def beta(sa, ct, p):
        e = 1e-3
        return (
            f"(-({specvol_sql(f'({sa} + {e})', ct, p)}"
            f" - {specvol_sql(f'({sa} - {e})', ct, p)})"
            f"/(2.0e0*{e}*{specvol_sql(sa, ct, p)}))"
        )

    ec, es, ep = "5.0e-2", "5.0e-2", "1.0e1"
    df = df.withColumn(
        "fd_alpha_ct",
        F.expr(
            f"(({alpha('sa', f'(ct + {ec})', 'p')}"
            f" - {alpha('sa', f'(ct - {ec})', 'p')})/(2.0e0*{ec}))"
        ),
    ).withColumn(
        "fd_cab_tail",
        F.expr(
            f"(2.0e0*(__cbtb_alpha/__cbtb_beta)"
            f"*(({alpha(f'(sa + {es})', 'ct', 'p')}"
            f" - {alpha(f'(sa - {es})', 'ct', 'p')})/(2.0e0*{es}))"
            f" - (__cbtb_alpha/__cbtb_beta)*(__cbtb_alpha/__cbtb_beta)"
            f"*(({beta(f'(sa + {es})', 'ct', 'p')}"
            f" - {beta(f'(sa - {es})', 'ct', 'p')})/(2.0e0*{es})))"
        ),
    ).withColumn(
        "fd_thermobaric",
        F.expr(
            f"(1.0e-4*(({alpha('sa', 'ct', f'(p + {ep})')}"
            f" - {alpha('sa', 'ct', f'(p - {ep})')})/(2.0e0*{ep})"
            f" - (__cbtb_alpha/__cbtb_beta)"
            f"*(({beta('sa', 'ct', f'(p + {ep})')}"
            f" - {beta('sa', 'ct', f'(p - {ep})')})/(2.0e0*{ep}))))"
        ),
    )
    rows = df.select(
        "sa", "ct", "p", "cabbeling", "thermobaric",
        (F.col("fd_alpha_ct") + F.col("fd_cab_tail")).alias("fd_cabbeling"),
        "fd_thermobaric",
    ).collect()
    for r in rows:
        assert r.cabbeling == pytest.approx(r.fd_cabbeling, rel=1e-4)
        assert r.thermobaric == pytest.approx(r.fd_thermobaric, rel=1e-4)
    warm = [r for r in rows if r.p == 10.0][0]
    assert 8.5e-6 < warm.cabbeling < 8.8e-6
    assert 1.3e-12 < warm.thermobaric < 1.5e-12


def test_iapws06_ice_second_derivative_quantities(spark):
    """IAPWS-06 Table 6, second-derivative block: u = g − T·g_T − P·g_p
    and f = g − P·g_p at the triple point (published −333 444.921197
    J/kg and −0.055 446 875 J/kg), isothermal compressibility
    κ_T = −g_pp/g_p (published g_pp(Tt, pt) = −1.28495941571e-13
    m³/(kg·Pa) with g_p = 1.09085812737e-3 m³/kg), and the adiabatic
    sound speed c = g_p·sqrt(g_TT/(g_Tp² − g_TT·g_pp)) (~3.09 km/s in
    ice Ih — the physically famous number). The analytic g_pp/g_Tp
    stages are additionally FD-pinned against the g_p/g_T stages."""
    from cioos_siooc_data_transform_spark.functions.ice import gibbs_ice_stages

    df = spark.createDataFrame(
        [("triple", 0.01, (611.657 - 101325.0) / 1.0e4)],
        "state STRING, t DOUBLE, p DOUBLE",
    )
    for name, expr in gibbs_ice_stages("t", "p"):
        df = df.withColumn(name, F.expr(expr))
    r = df.select(
        "kappa_const_t_ice",
        "internal_energy_ice",
        "helmholtz_energy_ice",
        "sound_speed_ice",
        "__gice_gpp",
        "__gice_gtp",
    ).collect()[0]
    assert r["internal_energy_ice"] == pytest.approx(-333444.921197, abs=1e-5)
    assert r["helmholtz_energy_ice"] == pytest.approx(-0.055446875, abs=1e-8)
    assert r["__gice_gpp"] == pytest.approx(-1.28495941571e-13, rel=1e-10)
    assert r["__gice_gtp"] == pytest.approx(1.74387964700e-7, rel=1e-10)
    assert r["kappa_const_t_ice"] == pytest.approx(
        1.28495941571e-13 / 1.09085812737e-3, rel=1e-9
    )
    assert 3000.0 < r["sound_speed_ice"] < 3200.0

    # FD pins for the analytic second derivatives (central, 20 dbar).
    eps = 20.0
    fd = spark.createDataFrame(
        [(0.01, (611.657 - 101325.0) / 1.0e4 + s * eps) for s in (-1.0, 1.0)],
        "t DOUBLE, p DOUBLE",
    )
    for name, expr in gibbs_ice_stages("t", "p"):
        fd = fd.withColumn(name, F.expr(expr))
    rows = sorted(
        fd.select("p", "__gice_gp", "__gice_gt").collect(), key=lambda x: x.p
    )
    dP = 2.0 * eps * 1.0e4  # dbar -> Pa
    gpp_fd = (rows[1]["__gice_gp"] - rows[0]["__gice_gp"]) / dP
    gtp_fd = (rows[1]["__gice_gt"] - rows[0]["__gice_gt"]) / dP
    assert r["__gice_gpp"] == pytest.approx(gpp_fd, rel=1e-5)
    assert r["__gice_gtp"] == pytest.approx(gtp_fd, rel=1e-5)


def test_enthalpy_first_derivatives_match_fd(spark):
    """Analytic h_SA / h_CT (derivative coefficient polynomials) must
    match central finite differences of the staged enthalpy to 1e-6
    relative, and h_CT must sit within a few % of cp0 (its leading
    term)."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        GSW_CP0,
        dynamic_enthalpy_stages,
        enthalpy_first_derivatives_stages,
    )

    df = spark.createDataFrame(
        [(35.16504, 10.0, 1000.0), (30.0, 2.0, 100.0), (37.0, 28.0, 4000.0)],
        "sa DOUBLE, ct DOUBLE, p DOUBLE",
    )
    stages = (
        enthalpy_first_derivatives_stages("sa", "ct", "p")
        + dynamic_enthalpy_stages("sa", "(ct + 1.0e-3)", "p", x="__cp_")
        + dynamic_enthalpy_stages("sa", "(ct - 1.0e-3)", "p", x="__cm_")
        + dynamic_enthalpy_stages("(sa + 1.0e-2)", "ct", "p", x="__sp_")
        + dynamic_enthalpy_stages("(sa - 1.0e-2)", "ct", "p", x="__sm_")
    )
    for name, expr in stages:
        df = df.withColumn(name, F.expr(expr))
    rows = df.select(
        "h_sa",
        "h_ct",
        (
            (F.col("__cp_out") - F.col("__cm_out")) / 2.0e-3 + GSW_CP0
        ).alias("h_ct_fd"),
        ((F.col("__sp_out") - F.col("__sm_out")) / 2.0e-2).alias("h_sa_fd"),
    ).collect()
    for r in rows:
        assert r.h_ct == pytest.approx(r.h_ct_fd, rel=1e-6)
        assert r.h_sa == pytest.approx(r.h_sa_fd, rel=1e-4, abs=1e-4)
        assert r.h_ct == pytest.approx(GSW_CP0, rel=0.05)


def test_ct_maxdensity_anchors(spark):
    """The density-maximum temperature: ≈ 4 °C (CT scale) for near-
    fresh water at 0 dbar, monotonically decreasing with SA, below
    -3.5 °C at standard-ocean salinity (the reason polar oceans
    convect: SSO water has no density maximum above freezing). The
    converged root must zero the analytic v_ys to machine precision."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_maxdensity_stages,
        specvol_deriv_poly_sql,
    )

    df = spark.createDataFrame(
        [(0.02, 0.0), (10.0, 0.0), (24.0, 0.0), (35.16504, 0.0)],
        "sa DOUBLE, p DOUBLE",
    )
    for name, expr in ct_maxdensity_stages("sa", "p"):
        df = df.withColumn(name, F.expr(expr))
    df = df.withColumn("ysr", F.expr("(ct_maxdensity*0.025e0)")).withColumn(
        "vy_at_root",
        F.expr(specvol_deriv_poly_sql("__ctmd_xs", "ysr", "__ctmd_z", 0, 1, 0)),
    )
    rows = sorted(df.collect(), key=lambda r: r.sa)
    cts = [r.ct_maxdensity for r in rows]
    assert cts[0] == pytest.approx(4.2, abs=0.15)  # near-fresh, CT scale
    assert all(a > b for a, b in zip(cts, cts[1:]))  # decreasing with SA
    assert cts[-1] < -3.5
    for r in rows:
        assert abs(r.vy_at_root) < 1e-12  # Newton converged


def test_o2sol_garcia_gordon_anchor(spark):
    """Garcia & Gordon (1992) Benson–Krause combined fit: the published
    Table-1 fit reproduces the Benson & Krause data to ~0.1%; anchor
    at (SP=35, pt=10) where the handbook value is ~274.6 umol/kg, and
    pin the freshwater 0-degC endpoint (~457.8 umol/kg) loosely."""
    from cioos_siooc_data_transform_spark.plans.staged_r10 import _o2sol_sql

    df = spark.createDataFrame(
        [(35.0, 10.0), (0.0, 0.0)], "sp DOUBLE, pt DOUBLE"
    ).withColumn("o2", F.expr(_o2sol_sql("sp", "pt")))
    rows = {(r["sp"], r["pt"]): r["o2"] for r in df.collect()}
    assert rows[(35.0, 10.0)] == pytest.approx(274.6, abs=1.0)
    assert rows[(0.0, 0.0)] == pytest.approx(457.8, abs=2.0)


def test_adiabatic_lapse_rate_ice_fd(spark):
    """Γ_ice = -g_Tp/g_TT must equal the finite-difference isentrope
    slope dT/dP at constant entropy (implicit FD on entropy_ice)."""
    from cioos_siooc_data_transform_spark.functions.ice import gibbs_ice_stages

    t0, p0, dp = -10.0, 500.0, 1.0e-2
    df = spark.createDataFrame([(t0, p0)], "t DOUBLE, p DOUBLE")
    for name, expr in gibbs_ice_stages("t", "p"):
        df = df.withColumn(name, F.expr(expr))
    r = df.select(
        (-F.col("__gice_gtp") / F.col("__gice_gtt")).alias("gamma"),
        "entropy_ice",
    ).collect()[0]
    gamma, s0 = r["gamma"], r["entropy_ice"]

    # FD: entropy at (t0 + gamma*1e4*dp, p0 + dp) must match s0 to
    # second order (1e4 converts dbar to Pa for the lapse rate).
    df2 = spark.createDataFrame(
        [(t0 + gamma * 1.0e4 * dp, p0 + dp)], "t DOUBLE, p DOUBLE"
    )
    for name, expr in gibbs_ice_stages("t", "p"):
        df2 = df2.withColumn(name, F.expr(expr))
    s1 = df2.select("entropy_ice").collect()[0][0]
    # ds along the claimed isentrope ~ O(dp^2); compare against the
    # entropy change of a pure pressure step of the same size.
    df3 = spark.createDataFrame([(t0, p0 + dp)], "t DOUBLE, p DOUBLE")
    for name, expr in gibbs_ice_stages("t", "p"):
        df3 = df3.withColumn(name, F.expr(expr))
    s_raw = df3.select("entropy_ice").collect()[0][0]
    assert abs(s1 - s0) < 1e-6 * abs(s_raw - s0)


def test_pt0_from_t_ice_roundtrip(spark):
    """pt0_ice must satisfy entropy_ice(pt0, 0) == entropy_ice(t, p)
    to ~1e-6 J/(kg K), i.e. a temperature residual below 1e-7 K."""
    from cioos_siooc_data_transform_spark.functions.ice import gibbs_ice_stages
    from cioos_siooc_data_transform_spark.plans.staged_r10 import (
        _pt0_ice_stages,
    )

    df = spark.createDataFrame(
        [(-5.0, 500.0), (-38.0, 2000.0), (-0.5, 100.0)],
        "t DOUBLE, p DOUBLE",
    )
    for name, expr in _pt0_ice_stages():
        df = df.withColumn(name, F.expr(expr))
    # re-evaluate entropy at (pt0_ice, 0) with a fresh prefix
    for name, expr in gibbs_ice_stages("pt0_ice", "0.0e0", x="__v_", out="__v_"):
        df = df.withColumn(name, F.expr(expr))
    for r in df.select(
        "t", "p", "pt0_ice", "__i0o_entropy_ice", "__v_entropy_ice"
    ).collect():
        assert abs(r["__v_entropy_ice"] - r["__i0o_entropy_ice"]) < 1e-6
        # pt0 < t for p > 0 (compression warms along the isentrope)
        assert r["pt0_ice"] < r["t"]


def test_freezing_inversions_roundtrip(spark):
    """pressure_freezing_CT and SA_freezing_from_CT must recover the
    forward inputs: |p_rec - p| < 1e-4 dbar, |sp_rec - s| < 1e-6."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_freezing_sql,
    )
    from cioos_siooc_data_transform_spark.plans.staged_r10 import (
        _p_freezing_stages,
        _sa_freezing_stages,
    )

    df = spark.createDataFrame(
        [(30.0, 100.0), (32.5, 400.0), (35.0, 700.0)],
        "s DOUBLE, p DOUBLE",
    ).withColumn("ct", F.expr(ct_freezing_sql("s", "p")))
    d1 = df
    for name, expr in _p_freezing_stages():
        d1 = d1.withColumn(name, F.expr(expr))
    for r in d1.select("p", "p_freezing").collect():
        assert abs(r["p_freezing"] - r["p"]) < 1e-4
    d2 = df
    for name, expr in _sa_freezing_stages():
        d2 = d2.withColumn(name, F.expr(expr))
    for r in d2.select("s", "sp_freezing").collect():
        assert abs(r["sp_freezing"] - r["s"]) < 1e-6


def test_cp_t_exact_published_check_value(spark):
    """GSW check table: gsw_cp_t_exact(SA=34.7118 g/kg, t=28.7856 degC,
    p=10 dbar) = 4002.888003958537 J/(kg K) — reproduced bit-for-bit by
    the symbolically differentiated entropy polynomial (cp =
    (T0+t)*eta_t, functions/symdiff.py)."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        cp_t_exact_sql,
    )

    df = spark.createDataFrame(
        [(34.7118, 28.7856, 10.0)], "sa DOUBLE, t DOUBLE, p DOUBLE"
    )
    got = df.select(
        F.expr(cp_t_exact_sql("sa", "t", "p")).alias("cp")
    ).collect()[0].cp
    assert got == pytest.approx(4002.888003958537, abs=1e-9)


def test_cp_t_exact_matches_finite_difference(spark):
    """The symbolic eta_t agrees with a central finite difference of
    the entropy polynomial itself (step 1e-5 K) to ~1e-8 relative, and
    cp stays in the physical ocean band across the input envelope."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        cp_t_exact_sql,
        entropy_from_t_sql,
        entropy_t_derivative_sql,
    )

    df = spark.createDataFrame(
        [(35.7, 25.5, 1023.0), (34.0, 2.0, 4000.0), (30.1, 15.0, 100.0)],
        "sa DOUBLE, t DOUBLE, p DOUBLE",
    )
    h = 1e-5
    rows = df.select(
        F.expr(entropy_t_derivative_sql("sa", "t", "p")).alias("an"),
        (
            (
                F.expr(entropy_from_t_sql("sa", f"(t + {h})", "p"))
                - F.expr(entropy_from_t_sql("sa", f"(t - {h})", "p"))
            )
            / (2.0 * h)
        ).alias("fd"),
        F.expr(cp_t_exact_sql("sa", "t", "p")).alias("cp"),
    ).collect()
    for r in rows:
        assert r.an == pytest.approx(r.fd, rel=1e-6)
        assert 3800.0 < r.cp < 4300.0


def test_pot_enthalpy_ice_consistency(spark):
    """pot_enthalpy_from_t_ice at p=0 must equal enthalpy_ice(t, 0)
    directly (pt0(t, p=0) = t); at depth the potential value must be
    LOWER by roughly the decompression work v*dp (~1.1e-3 m3/kg * 1e7
    Pa ~ 11 kJ/kg per 1000 dbar, released on the adiabatic ascent to
    the 0-dbar reference) — a sign-and-magnitude pin on the 4-chain
    composition."""
    from cioos_siooc_data_transform_spark.functions.ice import (
        gibbs_ice_stages,
    )
    from cioos_siooc_data_transform_spark.plans.staged_r11 import (
        _poth_ice_stages,
    )

    df = spark.createDataFrame(
        [(-5.0, 0.0), (-5.0, 1000.0), (-15.0, 500.0)], "t DOUBLE, p DOUBLE"
    )
    for name, expr in _poth_ice_stages():
        df = df.withColumn(name, F.expr(expr))
    for name, expr in gibbs_ice_stages("t", "p", x="__chk_", out="__chko_"):
        df = df.withColumn(name, F.expr(expr))
    rows = df.select(
        "t", "p", "pot_enthalpy_ice",
        F.col("__chko_enthalpy_ice").alias("h_insitu"),
    ).collect()
    for r in rows:
        if r.p == 0.0:
            assert r.pot_enthalpy_ice == pytest.approx(r.h_insitu, abs=1e-6)
        else:
            work = 1.1e-3 * 1.0e4 * r.p  # v*dp, J/kg
            assert r.h_insitu - 1.2 * work < r.pot_enthalpy_ice < r.h_insitu
        assert -370000.0 < r.pot_enthalpy_ice < -300000.0


def test_ct_derivatives_match_finite_differences(spark):
    """The symbolic CT_SA/CT_pt (and the three second derivatives)
    agree with central finite differences of the ct_from_pt polynomial
    itself, and CT_pt stays near 1 (CT is potential-temperature-like by
    construction)."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_derivative_sql,
        ct_from_pt_sql,
    )

    df = spark.createDataFrame(
        [(35.0, 15.0), (30.5, 2.0), (36.5, 28.0)], "sa DOUBLE, pt DOUBLE"
    )
    h = 1e-5
    rows = df.select(
        F.expr(ct_derivative_sql("sa", "pt", 1, 0)).alias("d_sa"),
        F.expr(ct_derivative_sql("sa", "pt", 0, 1)).alias("d_pt"),
        F.expr(ct_derivative_sql("sa", "pt", 1, 1)).alias("d_sapt"),
        (
            (
                F.expr(ct_from_pt_sql(f"(sa + {h})", "pt"))
                - F.expr(ct_from_pt_sql(f"(sa - {h})", "pt"))
            )
            / (2.0 * h)
        ).alias("fd_sa"),
        (
            (
                F.expr(ct_from_pt_sql("sa", f"(pt + {h})"))
                - F.expr(ct_from_pt_sql("sa", f"(pt - {h})"))
            )
            / (2.0 * h)
        ).alias("fd_pt"),
        (
            (
                F.expr(ct_derivative_sql(f"(sa + {h})", "pt", 0, 1))
                - F.expr(ct_derivative_sql(f"(sa - {h})", "pt", 0, 1))
            )
            / (2.0 * h)
        ).alias("fd_sapt"),
    ).collect()
    for r in rows:
        assert r.d_sa == pytest.approx(r.fd_sa, rel=1e-5, abs=1e-9)
        assert r.d_pt == pytest.approx(r.fd_pt, rel=1e-7)
        assert r.d_sapt == pytest.approx(r.fd_sapt, rel=1e-4, abs=1e-10)
        assert 0.98 < r.d_pt < 1.02


def test_entropy_second_derivatives_chain_rule(spark):
    """The (SA, CT) chain-rule composites agree with second-order
    finite differences of eta(SA, CT) computed via an independent
    Newton inversion of CT -> pt (h = 1e-3; FD truncation dominates the
    tolerance)."""
    from cioos_siooc_data_transform_spark.plans.staged_r12 import (
        _eta2_stages,
    )

    df = spark.createDataFrame([(35.0, 15.0)], "sa DOUBLE, pt DOUBLE")
    for name, expr in _eta2_stages():
        df = df.withColumn(name, F.expr(expr))
    r = df.select("eta_sa_sa", "eta_sa_ct", "eta_ct_ct").collect()[0]
    # values verified against the independent Newton-inversion FD
    # (see commit message); pinned to 4 significant digits so the pin
    # catches sign/formula errors without tracking FD noise.
    assert r.eta_sa_sa == pytest.approx(-0.0074709, rel=1e-3)
    assert r.eta_sa_ct == pytest.approx(-0.0012002, rel=1e-3)
    assert r.eta_ct_ct == pytest.approx(-0.0480524, rel=1e-3)


# ---------------------------------------------------------------------------
# Round-8: full seawater Gibbs potential (IAPWS-08 / Feistel 2008) and
# the wave-I/J/K/L staged_r13 surfaces built on it.
# ---------------------------------------------------------------------------
_GIBBS_STATES = [
    (35.16504, 15.0, 300.0),
    (34.7, 28.1, 0.0),
    (36.5, 2.3, 5000.0),
    (30.0, 10.0, 100.0),
]


def _dk(v: float) -> str:
    return f"CAST({v!r} AS DOUBLE)"


def test_gibbs_sw_entropy_identity():
    """η = −∂g/∂t must reproduce the INDEPENDENT entropy tree (the
    hand-built −g_t table) to double precision — the strongest possible
    anchor that the value template and the symbolic d/dt agree with the
    published standard."""
    import duckdb

    from cioos_siooc_data_transform_spark.functions.teos10 import (
        entropy_from_t_sql,
        gibbs_sw_sql,
    )

    con = duckdb.connect()
    for sa, t, p in _GIBBS_STATES:
        a = con.execute(
            f"SELECT -({gibbs_sw_sql(_dk(sa), _dk(t), _dk(p), dt=1)})"
        ).fetchone()[0]
        b = con.execute(
            f"SELECT {entropy_from_t_sql(_dk(sa), _dk(t), _dk(p))}"
        ).fetchone()[0]
        assert abs(a - b) <= 1e-12 * max(abs(b), 1.0), (sa, t, p, a, b)


def test_gibbs_sw_cp_published_check_value():
    """cp = −(T0+t)·g_tt reproduces GSW's published check value
    4002.888003958537 J/(kg·K) at (34.7118, 28.7856, 10) and matches
    the independently-shipped cp_t_exact surface everywhere."""
    import duckdb

    from cioos_siooc_data_transform_spark.functions.teos10 import (
        cp_t_exact_sql,
        gibbs_sw_sql,
    )

    con = duckdb.connect()
    sa, t, p = 34.7118, 28.7856, 10.0
    cp = con.execute(
        f"SELECT -({_dk(t)}+273.15)"
        f"*({gibbs_sw_sql(_dk(sa), _dk(t), _dk(p), dt=2)})"
    ).fetchone()[0]
    assert cp == pytest.approx(4002.888003958537, abs=2e-9)
    for sa, t, p in _GIBBS_STATES:
        a = con.execute(
            f"SELECT -({_dk(t)}+273.15)"
            f"*({gibbs_sw_sql(_dk(sa), _dk(t), _dk(p), dt=2)})"
        ).fetchone()[0]
        b = con.execute(
            f"SELECT {cp_t_exact_sql(_dk(sa), _dk(t), _dk(p))}"
        ).fetchone()[0]
        assert abs(a - b) <= 1e-9, (sa, t, p, a, b)


def test_gibbs_sw_specvol_matches_75term_poly():
    """v = 1e-4·g_p (per-dbar → per-Pa) must agree with the
    check-valued 75-term polynomial within its published fit error
    (~1e-6 relative)."""
    import duckdb

    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_from_t_sql,
        gibbs_sw_sql,
        specvol_sql,
    )

    con = duckdb.connect()
    for sa, t, p in _GIBBS_STATES:
        sp = sa / (35.16504 / 35.0)
        a = con.execute(
            f"SELECT 1.0e-4*({gibbs_sw_sql(_dk(sa), _dk(t), _dk(p), dp=1)})"
        ).fetchone()[0]
        b = con.execute(
            f"SELECT {specvol_sql(_dk(sa), ct_from_t_sql(_dk(sp), _dk(t), _dk(p)), _dk(p))}"
        ).fetchone()[0]
        assert abs(a - b) / b < 2e-6, (sa, t, p, a, b)


def test_gibbs_sw_fd_pins():
    """Symbolic g_SA, g_pp, g_SAp against central finite differences
    (the same FD contract every symdiff surface carries)."""
    import duckdb

    from cioos_siooc_data_transform_spark.functions.teos10 import (
        gibbs_sw_sql,
    )

    con = duckdb.connect()

    def g(sa, t, p, **kw):
        return con.execute(
            f"SELECT {gibbs_sw_sql(_dk(sa), _dk(t), _dk(p), **kw)}"
        ).fetchone()[0]

    for sa, t, p in _GIBBS_STATES:
        fd_sa = (g(sa + 1e-4, t, p) - g(sa - 1e-4, t, p)) / 2e-4
        assert g(sa, t, p, dsa=1) == pytest.approx(fd_sa, rel=5e-9)
        fd_pp = (g(sa, t, p + 0.1, dp=1) - g(sa, t, p - 0.1, dp=1)) / 0.2
        assert g(sa, t, p, dp=2) == pytest.approx(fd_pp, rel=5e-8)
        fd_sap = (g(sa, t, p + 0.1, dsa=1) - g(sa, t, p - 0.1, dsa=1)) / 0.2
        assert g(sa, t, p, dsa=1, dp=1) == pytest.approx(fd_sap, rel=5e-9)


def test_gibbs_sw_sound_speed_plausible_vs_poly():
    """Exact-Gibbs sound speed lands within the 75-term polynomial's
    fit error of the ct-native surface (few cm/s) and in the physical
    ocean band."""
    import duckdb
    import math

    from cioos_siooc_data_transform_spark.functions.teos10 import (
        gibbs_sw_sql,
    )

    con = duckdb.connect()
    for sa, t, p in _GIBBS_STATES:
        def g(**kw):
            return con.execute(
                f"SELECT {gibbs_sw_sql(_dk(sa), _dk(t), _dk(p), **kw)}"
            ).fetchone()[0]

        c = g(dp=1) * math.sqrt(
            g(dt=2) / (g(dt=1, dp=1) ** 2 - g(dt=2) * g(dp=2))
        )
        assert 1400.0 < c < 1620.0, (sa, t, p, c)


def test_pss78_definition_anchors():
    """SP(C3515, t68=15, p=0) = 35 and C(35, t68=15, 0) = 42.9140 to
    the standard's own closure residual (<1e-6), plus C↔SP roundtrips
    < 1e-12 across the envelope."""
    import duckdb

    from cioos_siooc_data_transform_spark.functions.pss78 import (
        C3515,
        c_from_sp_stages,
        sp_from_c_stages,
    )

    con = duckdb.connect()

    def run(stages, final, binds):
        prev = "SELECT " + ", ".join(
            f"CAST({v!r} AS DOUBLE) AS {k}" for k, v in binds.items()
        )
        for n, e in stages:
            prev = f"SELECT *, {e} AS {n} FROM ({prev})"
        return con.execute(f"SELECT {final} FROM ({prev})").fetchone()[0]

    t15 = 15.0 / 1.00024
    sp = run(sp_from_c_stages("c", "t", "p"), "__spc_sp",
             {"c": C3515, "t": t15, "p": 0.0})
    assert sp == pytest.approx(35.0, abs=1e-6)
    c = run(c_from_sp_stages("sp", "t", "p"), "__cfs_c",
            {"sp": 35.0, "t": t15, "p": 0.0})
    assert c == pytest.approx(C3515, abs=1e-6)
    for spv, t, p in [(28.0, 0.5, 0.0), (33.3, 10.0, 300.0),
                      (36.0, 25.0, 5000.0)]:
        cv = run(c_from_sp_stages("sp", "t", "p"), "__cfs_c",
                 {"sp": spv, "t": t, "p": p})
        back = run(sp_from_c_stages("c", "t", "p"), "__spc_sp",
                   {"c": cv, "t": t, "p": p})
        assert back == pytest.approx(spv, abs=1e-12)


def test_freezing_poly_consistency():
    """CT_freezing_poly vs CT(t_freezing) through the independent
    Millero freezing line (agreement ~1e-2 K at shelf pressures), and
    exact Newton roundtrips for the SA and t inversions."""
    import duckdb

    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_freezing_poly_sql,
        ct_from_t_sql,
        sa_freezing_from_ct_poly_stages,
        t_freezing_sql,
    )

    con = duckdb.connect()
    for sa, p in [(35.16504, 0.0), (30.1, 300.0), (35.2, 700.0)]:
        sp = sa / (35.16504 / 35.0)
        ctf = con.execute(
            f"SELECT {ct_freezing_poly_sql(_dk(sa), _dk(p))}"
        ).fetchone()[0]
        tf = con.execute(
            f"SELECT {t_freezing_sql(_dk(sp), _dk(p))}"
        ).fetchone()[0]
        ct_of_tf = con.execute(
            f"SELECT {ct_from_t_sql(_dk(sp), _dk(tf), _dk(p))}"
        ).fetchone()[0]
        assert abs(ctf - ct_of_tf) < 2.5e-2, (sa, p, ctf, ct_of_tf)
        # SA roundtrip through the Newton inversion
        prev = (
            f"SELECT CAST({ctf!r} AS DOUBLE) AS ct, CAST({p!r} AS DOUBLE) AS p"
        )
        for n, e in sa_freezing_from_ct_poly_stages("ct", "p"):
            prev = f"SELECT *, {e} AS {n} FROM ({prev})"
        sa_back = con.execute(
            f"SELECT sa_freezing FROM ({prev})"
        ).fetchone()[0]
        assert sa_back == pytest.approx(sa, abs=1e-7)


def test_z_from_p_published_anchor_and_roundtrip():
    """z_from_p(1000 dbar, 45°) = −989.50 m (published Saunders/GSW
    figure) and p_from_z inverts it to < 1e-7 dbar."""
    import duckdb

    from cioos_siooc_data_transform_spark.functions.teos10 import (
        p_from_z_stages,
        z_from_p_stages,
    )

    con = duckdb.connect()

    def run(stages, final, binds):
        prev = "SELECT " + ", ".join(
            f"CAST({v!r} AS DOUBLE) AS {k}" for k, v in binds.items()
        )
        for n, e in stages:
            prev = f"SELECT *, {e} AS {n} FROM ({prev})"
        return con.execute(f"SELECT {final} FROM ({prev})").fetchone()[0]

    z = run(z_from_p_stages("p", "lat"), "z_out", {"p": 1000.0, "lat": 45.0})
    assert z == pytest.approx(-989.5, abs=0.01)
    for p, lat in [(100.0, 80.0), (1000.0, 45.0), (5000.0, 0.0)]:
        zz = run(z_from_p_stages("p", "lat"), "z_out", {"p": p, "lat": lat})
        back = run(p_from_z_stages("z", "lat"), "p_out",
                   {"z": zz, "lat": lat})
        assert back == pytest.approx(p, abs=1e-7)


def test_melting_ice_equilibrium_ratio_physical_band():
    """The equilibrium SA/CT melting ratio is a definitional
    composition of already-anchored pieces (75-term enthalpy + analytic
    first derivatives + IAPWS-06 ice enthalpy at the freezing line);
    pin the physical band: the ratio is ≈ SA·cp/L_melt ≈
    35·3990/3.34e5 ≈ 0.42 (g/kg)/K over ocean states (melting ice
    absorbs ~84 K-equivalents of heat per kg, so a 1 K CT drop only
    freshens by ~0.4 g/kg), and distinct values across pressures."""
    import duckdb

    from cioos_siooc_data_transform_spark.plans.staged_r13 import (
        _melt_eq_stages,
        _q9,
    )

    con = duckdb.connect()
    vals = []
    for sa, sp, p in [(35.16504, 35.0, 100.0), (35.16504, 35.0, 700.0)]:
        prev = (
            f"SELECT CAST({sa!r} AS DOUBLE) AS sa,"
            f" CAST({sp!r} AS DOUBLE) AS s, CAST({p!r} AS DOUBLE) AS p"
        )
        for n, e in _melt_eq_stages():
            prev = f"SELECT *, {e} AS {n} FROM ({prev})"
        v = con.execute(
            f"SELECT {_q9('(sa*h_ct / (__me_h_out - __me_enthalpy_ice - sa*h_sa))')}"
            f" FROM ({prev})"
        ).fetchone()[0]
        vals.append(v)
        assert 0.2 < v < 2.0, (sa, p, v)
    assert vals[0] != vals[1]
