"""GSW/TEOS-10-family derived-variable [Q] operators (SURVEY.md §2.10 U3)
exercised on synthetic columns with DuckDB oracle twins.

Inputs are constructed deterministically from lineitem columns (cast to
DOUBLE up front so both engines run identical IEEE arithmetic); formulas
are mirrored with identical operation order, so results match bit-for-bit
before the protective rounding. depth_from_pressure involves libm sin()
(last-ulp differences between JVM and C possible) → rounded to 4 dp; the
pure-arithmetic formulas round at 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.functions.oceanography import (
    coriolis_f,
    dyn_height_profile,
    depth_from_pressure,
    haversine_distance,
    mackenzie_sound_speed,
    nsquared,
    pchip_interp,
    potential_temperature,
    practical_salinity,
    profile_interp_declarative,
    rho_surface,
    sa_from_sp,
    sigma0,
    t_freezing,
)
from cioos_siooc_data_transform_spark.plans.registry import register
from cioos_siooc_data_transform_spark.session import read_table as _t

# Shared synthetic input construction (SQL + Spark mirrors).
_IN_SQL = """
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity % 30 AS DOUBLE) AS t,
           CAST(30.0 + l_discount * 50 AS DOUBLE) AS s,
           CAST(l_linenumber * 150.0 AS DOUBLE) AS d,
           CAST(l_linenumber * 100.0 AS DOUBLE) AS p,
           CAST((l_suppkey % 120) - 60 AS DOUBLE) AS lat,
           CAST(0.5 + l_discount * 5 AS DOUBLE) AS rt
    FROM lineitem
"""


def _inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity") % 30).cast("double").alias("t"),
        (F.lit(30.0) + F.col("l_discount") * 50).cast("double").alias("s"),
        (F.col("l_linenumber") * 150.0).cast("double").alias("d"),
        (F.col("l_linenumber") * 100.0).cast("double").alias("p"),
        ((F.col("l_suppkey") % 120) - 60).cast("double").alias("lat"),
        (F.lit(0.5) + F.col("l_discount") * 5).cast("double").alias("rt"),
    )


@register(
    "gsw_sound_speed",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           round(1448.96 + 4.591 * t - 5.304e-2 * t * t + 2.374e-4 * t * t * t
                 + 1.340 * (s - 35.0) + 1.630e-2 * d + 1.675e-7 * d * d
                 - 1.025e-2 * t * (s - 35.0) - 7.139e-13 * t * d * d * d,
                 6) AS sound_speed
    FROM ({_IN_SQL})
    """,
)
def gsw_sound_speed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mackenzie (1981) nine-term equation."""
    df = _inputs(spark, sf_dir)
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            mackenzie_sound_speed(F.col("t"), F.col("s"), F.col("d")), 6
        ).alias("sound_speed"),
    )


@register(
    "gsw_practical_salinity",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           round(
             (0.0080 + -0.1692 * sqrt(rt) + 25.3851 * rt + 14.0941 * (sqrt(rt) * rt)
              + -7.0261 * (rt * rt) + 2.7081 * (rt * rt * sqrt(rt)))
             + (t - 15.0) / (1.0 + 0.0162 * (t - 15.0))
               * (0.0005 + -0.0056 * sqrt(rt) + -0.0066 * rt + -0.0375 * (sqrt(rt) * rt)
                  + 0.0636 * (rt * rt) + -0.0144 * (rt * rt * sqrt(rt))),
             6) AS sp
    FROM ({_IN_SQL})
    """,
)
def gsw_practical_salinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSS-78 SP(Rt, t) — UNESCO 1983 constants."""
    df = _inputs(spark, sf_dir)
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.round(practical_salinity(F.col("rt"), F.col("t")), 6).alias("sp"),
    )


@register(
    "gsw_potential_temperature",
    # dp = (p - 0) * 0.1: engine pressures are dbar, Bryden's fit is in
    # bars (see functions/oceanography.potential_temperature).
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           round(
             t
             - ((p - 0.0e0) * 0.1e0) * (3.6504e-4 + 8.3198e-5 * t - 5.4065e-7 * t * t + 4.0274e-9 * t * t * t)
             - ((p - 0.0e0) * 0.1e0) * (s - 35.0) * (1.7439e-5 - 2.9778e-7 * t)
             - ((p - 0.0e0) * 0.1e0) * ((p - 0.0e0) * 0.1e0) * (8.9309e-7 - 3.1628e-8 * t + 2.1987e-10 * t * t)
             + 4.1057e-9 * (s - 35.0) * ((p - 0.0e0) * 0.1e0) * ((p - 0.0e0) * 0.1e0)
             - ((p - 0.0e0) * 0.1e0) * ((p - 0.0e0) * 0.1e0) * ((p - 0.0e0) * 0.1e0) * (-1.6056e-10 + 5.0484e-12 * t),
             6) AS theta
    FROM ({_IN_SQL})
    """,
)
def gsw_potential_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bryden (1973) polynomial, reference pressure 0 (p in dbar,
    scaled to bars internally)."""
    df = _inputs(spark, sf_dir)
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            potential_temperature(F.col("t"), F.col("s"), F.col("p")), 6
        ).alias("theta"),
    )


@register(
    "gsw_sa_from_sp",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           round(s * (35.16504 / 35.0), 6) AS sa
    FROM ({_IN_SQL})
    """,
)
def gsw_sa_from_sp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEOS-10 reference-composition scaling (Millero et al. 2008);
    delta_SA atlas documented out of scope (see functions/oceanography)."""
    df = _inputs(spark, sf_dir)
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.round(sa_from_sp(F.col("s")), 6).alias("sa"),
    )


@register(
    "gsw_rho_sigma0",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           round(
             (999.842594 + 6.793952e-2 * t - 9.095290e-3 * t * t
              + 1.001685e-4 * t * t * t - 1.120083e-6 * t * t * t * t
              + 6.536332e-9 * t * t * t * t * t)
             + (8.24493e-1 - 4.0899e-3 * t + 7.6438e-5 * t * t
                - 8.2467e-7 * t * t * t + 5.3875e-9 * t * t * t * t) * s
             + (-5.72466e-3 + 1.0227e-4 * t - 1.6546e-6 * t * t)
               * (sqrt(s) * s)
             + 4.8314e-4 * s * s,
             6) AS rho,
           round(
             (999.842594 + 6.793952e-2 * t - 9.095290e-3 * t * t
              + 1.001685e-4 * t * t * t - 1.120083e-6 * t * t * t * t
              + 6.536332e-9 * t * t * t * t * t)
             + (8.24493e-1 - 4.0899e-3 * t + 7.6438e-5 * t * t
                - 8.2467e-7 * t * t * t + 5.3875e-9 * t * t * t * t) * s
             + (-5.72466e-3 + 1.0227e-4 * t - 1.6546e-6 * t * t)
               * (sqrt(s) * s)
             + 4.8314e-4 * s * s
             - 1000.0,
             6) AS sigma0
    FROM ({_IN_SQL})
    """,
)
def gsw_rho_sigma0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EOS-80 one-atmosphere density + potential density anomaly
    (Millero & Poisson 1981; published UNESCO 1983 check values pinned
    in tests)."""
    df = _inputs(spark, sf_dir)
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.round(rho_surface(F.col("s"), F.col("t")), 6).alias("rho"),
        F.round(sigma0(F.col("s"), F.col("t")), 6).alias("sigma0"),
    )


@register(
    "gsw_alpha_beta",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           floor(-(
              (6.793952e-2 - 2.0 * 9.095290e-3 * t + 3.0 * 1.001685e-4 * t * t
               - 4.0 * 1.120083e-6 * t * t * t + 5.0 * 6.536332e-9 * t * t * t * t)
              + (-4.0899e-3 + 2.0 * 7.6438e-5 * t - 3.0 * 8.2467e-7 * t * t
                 + 4.0 * 5.3875e-9 * t * t * t) * s
              + (1.0227e-4 - 2.0 * 1.6546e-6 * t) * (sqrt(s) * s)
             ) / (
              (999.842594 + 6.793952e-2 * t - 9.095290e-3 * t * t
               + 1.001685e-4 * t * t * t - 1.120083e-6 * t * t * t * t
               + 6.536332e-9 * t * t * t * t * t)
              + (8.24493e-1 - 4.0899e-3 * t + 7.6438e-5 * t * t
                 - 8.2467e-7 * t * t * t + 5.3875e-9 * t * t * t * t) * s
              + (-5.72466e-3 + 1.0227e-4 * t - 1.6546e-6 * t * t) * (sqrt(s) * s)
              + 4.8314e-4 * s * s
             ) * 1e9 + 0.5) / 1e9 AS alpha,
           floor((
              (8.24493e-1 - 4.0899e-3 * t + 7.6438e-5 * t * t
               - 8.2467e-7 * t * t * t + 5.3875e-9 * t * t * t * t)
              + 1.5 * (-5.72466e-3 + 1.0227e-4 * t - 1.6546e-6 * t * t) * sqrt(s)
              + 2.0 * 4.8314e-4 * s
             ) / (
              (999.842594 + 6.793952e-2 * t - 9.095290e-3 * t * t
               + 1.001685e-4 * t * t * t - 1.120083e-6 * t * t * t * t
               + 6.536332e-9 * t * t * t * t * t)
              + (8.24493e-1 - 4.0899e-3 * t + 7.6438e-5 * t * t
                 - 8.2467e-7 * t * t * t + 5.3875e-9 * t * t * t * t) * s
              + (-5.72466e-3 + 1.0227e-4 * t - 1.6546e-6 * t * t) * (sqrt(s) * s)
              + 4.8314e-4 * s * s
             ) * 1e9 + 0.5) / 1e9 AS beta
    FROM ({_IN_SQL})
    """,
)
def gsw_alpha_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact EOS-80 thermal expansion α = −ρ⁻¹ ∂ρ/∂T and haline
    contraction β = ρ⁻¹ ∂ρ/∂S (analytic derivatives of the published
    Millero & Poisson polynomial) — the exact counterparts of the
    constant α/β the linear-EOS queries document, and GSW alpha/beta's
    p=0 twin. Rounded at 9 dp (the coefficients are O(1e-4))."""
    from cioos_siooc_data_transform_spark.functions.oceanography import (
        haline_contraction_beta,
        thermal_expansion_alpha,
    )

    df = _inputs(spark, sf_dir)
    a = thermal_expansion_alpha(F.col("s"), F.col("t"))
    b = haline_contraction_beta(F.col("s"), F.col("t"))
    return df.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(a * 1e9 + 0.5) / 1e9).alias("alpha"),
        (F.floor(b * 1e9 + 0.5) / 1e9).alias("beta"),
    )


@register(
    "gsw_freezing_point",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           round(-0.0575 * s + 1.710523e-3 * (sqrt(s) * s)
                 - 2.154996e-4 * s * s - 7.53e-4 * p,
                 6) AS t_freeze
    FROM ({_IN_SQL})
    """,
)
def gsw_freezing_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Millero 1978 / UNESCO 1983 freezing-point polynomial."""
    df = _inputs(spark, sf_dir)
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.round(t_freezing(F.col("s"), F.col("p")), 6).alias("t_freeze"),
    )


@register(
    "gsw_depth_from_pressure",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           round(
             (9.72659 * p - 2.2512e-5 * p * p + 2.279e-10 * p * p * p
              - 1.82e-15 * p * p * p * p)
             / (9.780318 * (1.0 + 5.2788e-3 * pow(sin(radians(lat)), 2)
                            + 2.36e-5 * pow(sin(radians(lat)), 2) * pow(sin(radians(lat)), 2))
                + 1.092e-6 * p),
             4) AS depth_m
    FROM ({_IN_SQL})
    """,
)
def gsw_depth_from_pressure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Saunders & Fofonoff / UNESCO 1983 (4 dp: sin() is libm-dependent)."""
    df = _inputs(spark, sf_dir)
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.round(depth_from_pressure(F.col("p"), F.col("lat")), 4).alias("depth_m"),
    )


@register(
    "gsw_nsquared_profile",
    oracle="""
    WITH levels AS (
      SELECT l_orderkey, l_quantity,
             row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_quantity, l_extendedprice
             ) AS rn
      FROM lineitem
    ), prof AS (
      SELECT l_orderkey,
             CAST(rn * 10.0 AS DOUBLE) AS depth,
             CAST(20.0 + l_quantity * 0.1 + rn * 0.05 AS DOUBLE) AS sigma
      FROM levels
    ), lagged AS (
      SELECT l_orderkey, depth, sigma,
             lag(sigma) OVER (PARTITION BY l_orderkey ORDER BY depth) AS sigma_prev,
             lag(depth) OVER (PARTITION BY l_orderkey ORDER BY depth) AS depth_prev
      FROM prof
    )
    SELECT l_orderkey,
           (depth + depth_prev) / 2.0 AS mid_depth,
           round(9.80665 / 1025.0 * (sigma - sigma_prev) / (depth - depth_prev), 6)
             AS n_squared
    FROM lagged WHERE sigma_prev IS NOT NULL
    """,
)
def gsw_nsquared_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N² between adjacent levels as a window expression (GSW Nsquared's
    profile-axis shape, SURVEY.md U3)."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so
    # the profile level is a deterministic row_number — ties on the full
    # sort key yield identical (depth, sigma) anyway.
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"
    )
    levels = li.withColumn("rn", F.row_number().over(w))
    prof = levels.select(
        "l_orderkey",
        (F.col("rn") * 10.0).cast("double").alias("depth"),
        (F.lit(20.0) + F.col("l_quantity") * 0.1 + F.col("rn") * 0.05)
        .cast("double")
        .alias("sigma"),
    )
    out = nsquared(prof, "l_orderkey", "depth", "sigma")
    return out.select(
        "l_orderkey",
        "mid_depth",
        F.round("n_squared", 6).alias("n_squared"),
    )


@register(
    "gsw_profile_interp",
    oracle="""
    WITH src AS (
      SELECT CAST(l_orderkey AS VARCHAR) AS profile_id,
             CAST(l_linenumber * 10.0 AS DOUBLE) AS depth,
             CAST(20.0 + l_quantity * 0.1 AS DOUBLE) AS sigma
      FROM lineitem
    ), prof AS (
      SELECT profile_id, depth, min(sigma) AS v
      FROM src GROUP BY profile_id, depth
    ), targets AS (
      SELECT CAST(unnest([10.0, 25.0, 40.0, 60.0]) AS DOUBLE) AS std_depth
    ), seg AS (
      SELECT profile_id, depth AS x_hi, v AS y_hi,
             lag(depth) OVER w AS x_lo, lag(v) OVER w AS y_lo
      FROM prof WINDOW w AS (PARTITION BY profile_id ORDER BY depth)
    )
    SELECT profile_id, std_depth, round(v, 6) AS interp_value
    FROM prof JOIN targets ON depth = std_depth
    UNION ALL
    SELECT profile_id, std_depth,
           round(y_lo + (std_depth - x_lo) * ((y_hi - y_lo) / (x_hi - x_lo)), 6)
             AS interp_value
    FROM seg JOIN targets ON std_depth > x_lo AND std_depth < x_hi
    """,
)
def gsw_profile_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-profile linear resampling onto standard depths, expressed as
    pure DataFrame ops (window lag + broadcast target join) so the whole
    plan is JVM codegen AND mirrors bit-for-bit into the SQL oracle.
    The imperative applyInPandas variant (profile_interp) is cross-checked
    against this one in tests/test_oceanography.py."""
    li = _t(spark, sf_dir, "lineitem")
    prof = li.select(
        F.col("l_orderkey").cast("string").alias("profile_id"),
        (F.col("l_linenumber") * 10.0).cast("double").alias("depth"),
        (F.lit(20.0) + F.col("l_quantity") * 0.1).cast("double").alias("sigma"),
    )
    return profile_interp_declarative(
        prof, "profile_id", "depth", "sigma", [10.0, 25.0, 40.0, 60.0]
    )


# PCHIP derivative selector expressions shared between the two endpoint
# rows; mirrored verbatim in the SQL oracle below.
_PCHIP_SQL = """
    WITH levels AS (
      SELECT l_orderkey, l_quantity,
             row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_quantity, l_extendedprice
             ) AS lvl
      FROM lineitem
    ), prof AS (
      SELECT CAST(l_orderkey AS VARCHAR) AS profile_id,
             CAST(lvl * 10.0 AS DOUBLE) AS x,
             CAST(20.0 + l_quantity * 0.1 + lvl * 0.05 AS DOUBLE) AS y
      FROM levels
    ), targets AS (
      SELECT CAST(unnest([10.0, 17.0, 33.0, 57.0]) AS DOUBLE) AS std_depth
    ), g0 AS (
      SELECT profile_id, x, y,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY profile_id) AS n,
             lead(x) OVER w - x AS h,
             (lead(y) OVER w - y) / (lead(x) OVER w - x) AS m
      FROM prof WINDOW w AS (PARTITION BY profile_id ORDER BY x)
    ), g1 AS (
      SELECT *, lag(h) OVER w AS h_prev, lag(m) OVER w AS m_prev,
             lead(h) OVER w AS h_next, lead(m) OVER w AS m_next,
             lag(h, 2) OVER w AS h_prev2, lag(m, 2) OVER w AS m_prev2
      FROM g0 WINDOW w AS (PARTITION BY profile_id ORDER BY x)
    ), g2 AS (
      SELECT *,
             CASE WHEN rn = 1 THEN m ELSE m_prev END AS m_a,
             CASE WHEN rn = 1 THEN m_next ELSE m_prev2 END AS m_b,
             CASE WHEN rn = 1
                  THEN ((2.0 * h + h_next) * m - h * m_next) / (h + h_next)
                  ELSE ((2.0 * h_prev + h_prev2) * m_prev - h_prev * m_prev2)
                       / (h_prev + h_prev2)
             END AS de_raw
      FROM g1
    ), g3 AS (
      SELECT *,
             CASE WHEN sign(de_raw) <> sign(m_a) THEN 0.0 ELSE de_raw END AS de_1
      FROM g2
    ), gd AS (
      SELECT profile_id, x, y, h, m,
        CASE
          WHEN n = 2 THEN coalesce(m, m_prev)
          WHEN rn = 1 OR rn = n THEN
            CASE WHEN sign(m_a) <> sign(m_b) AND abs(de_1) > 3.0 * abs(m_a)
                 THEN 3.0 * m_a ELSE de_1 END
          ELSE
            CASE WHEN m_prev * m <= 0.0 THEN 0.0
                 ELSE ((2.0 * h + h_prev) + (h + 2.0 * h_prev))
                      / ((2.0 * h + h_prev) / m_prev + (h + 2.0 * h_prev) / m)
            END
        END AS d
      FROM g3
    ), seg0 AS (
      SELECT profile_id, x AS x_lo, y AS y_lo, h, m, d AS d_lo,
             lead(d) OVER (PARTITION BY profile_id ORDER BY x) AS d_hi
      FROM gd
    ), seg AS (
      SELECT * FROM seg0 WHERE h IS NOT NULL
    )
    SELECT profile_id, std_depth,
           floor(y * 1000000.0 + 0.5) / 1000000.0 AS interp_value
    FROM gd JOIN targets ON x = std_depth
    UNION ALL
    SELECT profile_id, std_depth,
           floor((y_lo + d_lo * (std_depth - x_lo)
                 + ((3.0 * m - 2.0 * d_lo - d_hi) / h)
                   * (std_depth - x_lo) * (std_depth - x_lo)
                 + ((d_lo + d_hi - 2.0 * m) / (h * h))
                   * (std_depth - x_lo) * (std_depth - x_lo) * (std_depth - x_lo))
                 * 1000000.0 + 0.5) / 1000000.0 AS interp_value
    FROM seg JOIN targets ON std_depth > x_lo AND std_depth < x_lo + h
"""


@register("gsw_pchip_interp", oracle=_PCHIP_SQL)
def gsw_pchip_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCHIP (Fritsch–Carlson monotone cubic) profile resampling — the
    GSW pchip_interp semantics (GSW/utility.py) as pure DataFrame ops;
    the derivative rule and Hermite evaluation are mirrored term-for-term
    in the DuckDB oracle. Anchored against hand-derived Fritsch–Carlson
    values in tests/test_oceanography.py."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"
    )
    levels = li.withColumn("lvl", F.row_number().over(w))
    prof = levels.select(
        F.col("l_orderkey").cast("string").alias("profile_id"),
        (F.col("lvl") * 10.0).cast("double").alias("depth"),
        (F.lit(20.0) + F.col("l_quantity") * 0.1 + F.col("lvl") * 0.05)
        .cast("double")
        .alias("sigma"),
    )
    return pchip_interp(
        prof, "profile_id", "depth", "sigma", [10.0, 17.0, 33.0, 57.0]
    )


@register(
    "gsw_coriolis_f",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           round(2.0 * 7.292115e-5 * sin(radians(lat)), 12) AS f
    FROM ({_IN_SQL})
    """,
)
def gsw_coriolis_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coriolis parameter (GSW ``f``, GSW/geostrophy.py) — published
    anchor: f(90°) = 1.458423e-4 s⁻¹ exactly (tests)."""
    df = _inputs(spark, sf_dir)
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.round(coriolis_f(F.col("lat")), 12).alias("f"),
    )


@register(
    "gsw_distance",
    oracle="""
    WITH pts AS (
      SELECT s_nationkey, s_suppkey,
             CAST(s_suppkey % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon,
             CAST(s_suppkey % 1700 AS DOUBLE) / 10.0 - 85.0 AS lat
      FROM supplier
    ), legs AS (
      SELECT s_nationkey, s_suppkey, lon, lat,
             lag(lon) OVER w AS lon0, lag(lat) OVER w AS lat0
      FROM pts WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_suppkey)
    )
    SELECT s_nationkey, s_suppkey,
           round(6371000.0 * (2.0 * atan2(
             sqrt(  sin((radians(lat) - radians(lat0)) / 2.0)
                  * sin((radians(lat) - radians(lat0)) / 2.0)
                  + cos(radians(lat0)) * cos(radians(lat))
                  * sin((radians(lon) - radians(lon0)) / 2.0)
                  * sin((radians(lon) - radians(lon0)) / 2.0)),
             sqrt(1.0 - (sin((radians(lat) - radians(lat0)) / 2.0)
                  * sin((radians(lat) - radians(lat0)) / 2.0)
                  + cos(radians(lat0)) * cos(radians(lat))
                  * sin((radians(lon) - radians(lon0)) / 2.0)
                  * sin((radians(lon) - radians(lon0)) / 2.0))))), 3)
             AS leg_m
    FROM legs WHERE lon0 IS NOT NULL
    """,
)
def gsw_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle leg distance along a per-nation supplier track (GSW
    ``distance`` convention: sphere R = 6371000 m, haversine). Published
    anchor: quarter meridian (0,0)→(0,90) = R·π/2 ≈ 10007543.398 m
    (tests). One window shuffle; trig rounded at 3 dp (libm)."""
    from pyspark.sql import Window

    sup = _t(spark, sf_dir, "supplier")
    pts = sup.select(
        "s_nationkey",
        "s_suppkey",
        ((F.col("s_suppkey") % 3600).cast("double") / 10.0 - 180.0).alias("lon"),
        ((F.col("s_suppkey") % 1700).cast("double") / 10.0 - 85.0).alias("lat"),
    )
    w = Window.partitionBy("s_nationkey").orderBy("s_suppkey")
    legs = pts.select(
        "s_nationkey",
        "s_suppkey",
        "lon",
        "lat",
        F.lag("lon").over(w).alias("lon0"),
        F.lag("lat").over(w).alias("lat0"),
    ).filter(F.col("lon0").isNotNull())
    return legs.select(
        "s_nationkey",
        "s_suppkey",
        F.round(
            haversine_distance(
                F.col("lon0"), F.col("lat0"), F.col("lon"), F.col("lat")
            ),
            3,
        ).alias("leg_m"),
    )


@register(
    "gsw_dyn_height",
    oracle="""
    WITH levels AS (
      SELECT l_orderkey, l_quantity, l_partkey,
             row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_quantity, l_extendedprice
             ) AS lvl
      FROM lineitem
    ), prof AS (
      SELECT CAST(l_orderkey AS VARCHAR) AS profile_id,
             CAST(lvl * 100.0 AS DOUBLE) AS p,
             CAST(5.0 + l_quantity * 0.2 AS DOUBLE) AS t,
             CAST(32.0 + (l_partkey % 100) * 0.01 AS DOUBLE) AS s
      FROM levels
    ), seg AS (
      SELECT profile_id, p,
             ((2.0e-4 * (t - 10.0) - 7.6e-4 * (s - 35.0)) / 1025.0
              + (2.0e-4 * (lag(t) OVER w - 10.0)
                 - 7.6e-4 * (lag(s) OVER w - 35.0)) / 1025.0) / 2.0
             * ((p - lag(p) OVER w) * 10000.0) AS dseg
      FROM prof WINDOW w AS (PARTITION BY profile_id ORDER BY p)
    )
    SELECT profile_id, p,
           round(sum(coalesce(dseg, 0.0)) OVER (
             PARTITION BY profile_id ORDER BY p
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 6) AS dyn_height
    FROM seg
    """,
)
def gsw_dyn_height(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-height anomaly profile: the cumulative trapezoid integral
    of specific-volume anomaly over pressure, per profile — the operator
    shape of GSW geo_strf_dyn_height (GSW/geostrophy.py), which this
    mirrors with a documented simplified LINEAR equation of state
    (delta = (alpha0*(T-T0) - beta0*(S-S0))/rho0, alpha0 = 2e-4/K,
    beta0 = 7.6e-4 kg/g, rho0 = 1025 kg/m3) rather than the full TEOS-10
    specific volume. One window shuffle per profile; the running integral
    is a cumulative window sum — whole-stage codegen, no Python."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    w0 = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"
    )
    prof = li.withColumn("lvl", F.row_number().over(w0)).select(
        F.col("l_orderkey").cast("string").alias("profile_id"),
        (F.col("lvl") * 100.0).cast("double").alias("p"),
        (F.lit(5.0) + F.col("l_quantity") * 0.2).cast("double").alias("t"),
        (F.lit(32.0) + (F.col("l_partkey") % 100) * 0.01).cast("double").alias("s"),
    )
    return dyn_height_profile(prof, "profile_id", "p", "t", "s")


@register(
    "gsw_turner_rsubrho",
    oracle="""
    WITH levels AS (
      SELECT l_orderkey, l_quantity, l_partkey,
             row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_quantity, l_extendedprice
             ) AS lvl
      FROM lineitem
    ), prof AS (
      SELECT CAST(l_orderkey AS VARCHAR) AS profile_id,
             CAST(lvl * 10.0 AS DOUBLE) AS depth,
             CAST(5.0 + l_quantity * 0.2 AS DOUBLE) AS t,
             CAST(32.0 + (l_partkey % 100) * 0.01 AS DOUBLE) AS s
      FROM levels
    ), lagged AS (
      SELECT profile_id, depth,
             2.0e-4 * (t - lag(t) OVER w) AS a_dt,
             7.6e-4 * (s - lag(s) OVER w) AS b_ds,
             (depth + lag(depth) OVER w) / 2.0 AS mid_depth
      FROM prof WINDOW w AS (PARTITION BY profile_id ORDER BY depth)
    )
    SELECT profile_id, mid_depth,
           round(degrees(atan2(a_dt + b_ds, a_dt - b_ds)), 6) + 0.0 AS turner_deg,
           round(a_dt / b_ds, 6) + 0.0 AS r_subrho
    FROM lagged
    WHERE b_ds IS NOT NULL AND b_ds <> 0.0
    """,
)
def gsw_turner_rsubrho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turner angle and density ratio between adjacent profile levels —
    the GSW Turner_Rsubrho shape (GSW/stability.py: Tu = atan2(α dT + β
    dS, α dT − β dS) in degrees, R_ρ = α dT / β dS), with the same
    documented constant-coefficient linear EOS as dyn_height_profile
    (α = 2e-4 K⁻¹, β = 7.6e-4 kg/g). Zero-salinity-gradient level pairs
    are dropped (R_ρ undefined). One window shuffle per profile; anchors
    in tests (pure thermal gradient → Tu = ±45°, doubly-stable equal
    contributions → Tu = 0°, R_ρ = −1)."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    w0 = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"
    )
    prof = li.withColumn("lvl", F.row_number().over(w0)).select(
        F.col("l_orderkey").cast("string").alias("profile_id"),
        (F.col("lvl") * 10.0).cast("double").alias("depth"),
        (F.lit(5.0) + F.col("l_quantity") * 0.2).cast("double").alias("t"),
        (F.lit(32.0) + (F.col("l_partkey") % 100) * 0.01).cast("double").alias("s"),
    )
    w = Window.partitionBy("profile_id").orderBy("depth")
    a_dt = 2.0e-4 * (F.col("t") - F.lag("t").over(w))
    b_ds = 7.6e-4 * (F.col("s") - F.lag("s").over(w))
    lagged = prof.select(
        "profile_id",
        ((F.col("depth") + F.lag("depth").over(w)) / 2.0).alias("mid_depth"),
        a_dt.alias("a_dt"),
        b_ds.alias("b_ds"),
    )
    return lagged.filter(
        F.col("b_ds").isNotNull() & (F.col("b_ds") != 0.0)
    ).select(
        "profile_id",
        "mid_depth",
        (
            F.round(
                F.degrees(
                    F.atan2(F.col("a_dt") + F.col("b_ds"), F.col("a_dt") - F.col("b_ds"))
                ),
                6,
            )
            + 0.0
        ).alias("turner_deg"),
        (F.round(F.col("a_dt") / F.col("b_ds"), 6) + 0.0).alias("r_subrho"),
    )


@register(
    "gsw_geostrophic_velocity",
    oracle="""
    WITH st AS (
      SELECT s_nationkey AS transect, s_suppkey AS station,
             CAST(s_suppkey % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon,
             CAST(s_suppkey % 1700 AS DOUBLE) / 10.0 - 85.0 AS lat
      FROM supplier
    ), prof AS (
      SELECT transect, station, lon, lat, lvl,
             CAST(lvl * 100.0 AS DOUBLE) AS p,
             CAST(5.0 + ((station * 7 + lvl * 13) % 50) * 0.2 AS DOUBLE) AS t,
             CAST(32.0 + ((station * 3 + lvl * 5) % 100) * 0.01 AS DOUBLE) AS sal
      FROM st, generate_series(1, 4) AS u(lvl)
    ), seg AS (
      SELECT transect, station, lon, lat, lvl, p,
             ((2.0e-4 * (t - 10.0) - 7.6e-4 * (sal - 35.0)) / 1025.0
              + (2.0e-4 * (lag(t) OVER w - 10.0)
                 - 7.6e-4 * (lag(sal) OVER w - 35.0)) / 1025.0) / 2.0
             * ((p - lag(p) OVER w) * 10000.0) AS dseg
      FROM prof WINDOW w AS (PARTITION BY station ORDER BY p)
    ), dh AS (
      SELECT transect, station, lon, lat, lvl, p,
             sum(coalesce(dseg, 0.0)) OVER (
               PARTITION BY station ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS phi
      FROM seg
    ), pairs AS (
      SELECT transect, station, lvl, p, phi,
             lag(phi) OVER w AS phi0,
             lag(lon) OVER w AS lon0, lag(lat) OVER w AS lat0,
             lon, lat
      FROM dh WINDOW w AS (PARTITION BY transect, lvl ORDER BY station)
    )
    SELECT transect, station, lvl,
           round((phi - phi0) / (
             (2.0 * 7.292115e-5 * sin(radians((lat0 + lat) / 2.0)))
             * (6371000.0 * (2.0 * atan2(
                 sqrt(  sin((radians(lat) - radians(lat0)) / 2.0)
                      * sin((radians(lat) - radians(lat0)) / 2.0)
                      + cos(radians(lat0)) * cos(radians(lat))
                      * sin((radians(lon) - radians(lon0)) / 2.0)
                      * sin((radians(lon) - radians(lon0)) / 2.0)),
                 sqrt(1.0 - (sin((radians(lat) - radians(lat0)) / 2.0)
                      * sin((radians(lat) - radians(lat0)) / 2.0)
                      + cos(radians(lat0)) * cos(radians(lat))
                      * sin((radians(lon) - radians(lon0)) / 2.0)
                      * sin((radians(lon) - radians(lon0)) / 2.0)))))))
           , 6) + 0.0 AS v_geo
    FROM pairs
    WHERE phi0 IS NOT NULL AND (lat0 + lat) <> 0.0
    """,
)
def gsw_geostrophic_velocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geostrophic velocity between adjacent stations on a transect — the
    GSW geostrophic_velocity contract (GSW/geostrophy.py: v = Δ(dynamic
    height) / (f · distance)), composed entirely from this module's
    building blocks: dyn_height_profile's cumulative trapezoid integral
    (same documented linear EOS), haversine_distance, and coriolis_f at
    the station-pair mid-latitude. Equator-crossing pairs (f = 0) are
    dropped. Stations carry a generated 4-level profile; the plan is two
    window shuffles (per-station integral, then per-(transect, level)
    station lag) — all whole-stage codegen, no Python.
    """
    from pyspark.sql import Window

    sup = _t(spark, sf_dir, "supplier")
    st = sup.select(
        F.col("s_nationkey").alias("transect"),
        F.col("s_suppkey").alias("station"),
        ((F.col("s_suppkey") % 3600).cast("double") / 10.0 - 180.0).alias("lon"),
        ((F.col("s_suppkey") % 1700).cast("double") / 10.0 - 85.0).alias("lat"),
    )
    prof = st.select(
        "*", F.explode(F.sequence(F.lit(1), F.lit(4))).alias("lvl")
    ).select(
        "transect",
        "station",
        "lon",
        "lat",
        "lvl",
        (F.col("lvl") * 100.0).cast("double").alias("p"),
        (F.lit(5.0) + ((F.col("station") * 7 + F.col("lvl") * 13) % 50) * 0.2)
        .cast("double")
        .alias("t"),
        (F.lit(32.0) + ((F.col("station") * 3 + F.col("lvl") * 5) % 100) * 0.01)
        .cast("double")
        .alias("sal"),
    )
    wp = Window.partitionBy("station").orderBy("p")

    def _delta(t, s):
        return (2.0e-4 * (t - 10.0) - 7.6e-4 * (s - 35.0)) / 1025.0

    dseg = (
        (_delta(F.col("t"), F.col("sal")) + _delta(F.lag("t").over(wp), F.lag("sal").over(wp)))
        / 2.0
        * ((F.col("p") - F.lag("p").over(wp)) * 10000.0)
    )
    cum = wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dh = prof.select(
        "transect", "station", "lon", "lat", "lvl", "p", dseg.alias("dseg")
    ).select(
        "transect",
        "station",
        "lon",
        "lat",
        "lvl",
        F.sum(F.coalesce("dseg", F.lit(0.0))).over(cum).alias("phi"),
    )
    ws = Window.partitionBy("transect", "lvl").orderBy("station")
    pairs = dh.select(
        "transect",
        "station",
        "lvl",
        "phi",
        "lon",
        "lat",
        F.lag("phi").over(ws).alias("phi0"),
        F.lag("lon").over(ws).alias("lon0"),
        F.lag("lat").over(ws).alias("lat0"),
    ).filter(F.col("phi0").isNotNull() & ((F.col("lat0") + F.col("lat")) != 0.0))
    f_mid = coriolis_f((F.col("lat0") + F.col("lat")) / 2.0)
    dist = haversine_distance(F.col("lon0"), F.col("lat0"), F.col("lon"), F.col("lat"))
    return pairs.select(
        "transect",
        "station",
        "lvl",
        (F.round((F.col("phi") - F.col("phi0")) / (f_mid * dist), 6) + 0.0).alias(
            "v_geo"
        ),
    )


@register(
    "gsw_ipv_fn2_ratio",
    oracle="""
    WITH levels AS (
      SELECT l_orderkey, l_quantity, l_partkey,
             row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_quantity, l_extendedprice
             ) AS lvl
      FROM lineitem
    ), prof AS (
      SELECT CAST(l_orderkey AS VARCHAR) AS profile_id,
             CAST(lvl * 100.0 AS DOUBLE) AS p,
             CAST(5.0 + l_quantity * 0.2 AS DOUBLE) AS t,
             CAST(32.0 + (l_partkey % 100) * 0.01 AS DOUBLE) AS s
      FROM levels
    ), lagged AS (
      SELECT profile_id,
             (p + lag(p) OVER w) / 2.0 AS mid_p,
             t - lag(t) OVER w AS dt,
             s - lag(s) OVER w AS ds
      FROM prof WINDOW w AS (PARTITION BY profile_id ORDER BY p)
    )
    SELECT profile_id, mid_p,
           floor(((2.0e-4 * (1.0 + 1.0e-5 * 0.0) * dt - 7.6e-4 * ds)
                  / (2.0e-4 * (1.0 + 1.0e-5 * mid_p) * dt - 7.6e-4 * ds))
                 * 1e6 + 0.5) / 1e6 AS ipv_ratio
    FROM lagged
    WHERE dt IS NOT NULL
      AND (2.0e-4 * (1.0 + 1.0e-5 * mid_p) * dt - 7.6e-4 * ds) <> 0.0
    """,
)
def gsw_ipv_fn2_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPV-vs-fN² ratio between adjacent profile levels — the GSW
    IPV_vs_fNsquared_ratio contract (GSW/stability.py): the vertical
    gradient of potential density referenced to p_ref = 0 divided by the
    locally-referenced gradient (the f and g factors cancel in the
    ratio). The documented linear EOS gains a thermobaric-like pressure
    dependence alpha(p) = alpha0 (1 + 1e-5 p) — with a pressure-free
    alpha the ratio is identically 1 and the operator would be vacuous.
    Level pairs with a zero local gradient are dropped. Rounding uses
    floor(v*1e6 + 0.5)/1e6 on both sides (pure IEEE ops — round() itself
    diverges between engines on exact .5e-6 boundaries). One window
    shuffle per profile, whole-stage codegen."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    w0 = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"
    )
    prof = li.withColumn("lvl", F.row_number().over(w0)).select(
        F.col("l_orderkey").cast("string").alias("profile_id"),
        (F.col("lvl") * 100.0).cast("double").alias("p"),
        (F.lit(5.0) + F.col("l_quantity") * 0.2).cast("double").alias("t"),
        (F.lit(32.0) + (F.col("l_partkey") % 100) * 0.01).cast("double").alias("s"),
    )
    w = Window.partitionBy("profile_id").orderBy("p")
    lagged = prof.select(
        "profile_id",
        ((F.col("p") + F.lag("p").over(w)) / 2.0).alias("mid_p"),
        (F.col("t") - F.lag("t").over(w)).alias("dt"),
        (F.col("s") - F.lag("s").over(w)).alias("ds"),
    )
    grad_ref = 2.0e-4 * (1.0 + 1.0e-5 * 0.0) * F.col("dt") - 7.6e-4 * F.col("ds")
    grad_loc = (
        2.0e-4 * (1.0 + 1.0e-5 * F.col("mid_p")) * F.col("dt") - 7.6e-4 * F.col("ds")
    )
    return (
        lagged.filter(F.col("dt").isNotNull() & (grad_loc != 0.0))
        .select(
            "profile_id",
            "mid_p",
            (F.floor((grad_ref / grad_loc) * 1e6 + 0.5) / 1e6).alias("ipv_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# TEOS-10 native (SA, CT) tranche — round 4. The polynomial text is
# GENERATED once (functions/teos10.py) and parsed by both engines, so the
# IEEE operation trees are identical by construction.
# ---------------------------------------------------------------------------
from cioos_siooc_data_transform_spark.functions.teos10 import (  # noqa: E402
    ct_from_t_sql,
    rho_sql,
)

_SA_SQL = "(s*(35.16504e0/35.0e0))"


@register(
    "gsw_ct_from_t",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           round({ct_from_t_sql("s", "t", "p")}, 6) AS ct
    FROM ({_IN_SQL})
    """,
)
def gsw_ct_from_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conservative Temperature from in-situ (SP, T, p): SP→SA by the
    TEOS-10 reference-composition scaling, T→θ by Bryden (1973, bars),
    θ→CT by the Feistel (2003) potential-enthalpy polynomial
    (TEOS-10 manual A.12; reference gsw_ct_from_pt,
    GSW-Python/gsw-3.3.1/src/c_gsw/gsw_oceanographic_toolbox.c:1401 —
    same published constants, re-expressed as one codegen scalar
    expression; GSW's entropy-iterated pt0 documented divergence ≲ mK)."""
    df = _inputs(spark, sf_dir)
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.expr(ct_from_t_sql("s", "t", "p")), 6).alias("ct"),
    )


@register(
    "gsw_rho_ct_native",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           round({rho_sql("sa", "ct", "p")}, 6) AS rho_ct,
           round({rho_sql("sa", "ct", "0.0e0")} - 1000.0e0, 6) AS sigma0_ct
    FROM (
      SELECT l_orderkey, l_linenumber, p, {_SA_SQL} AS sa,
             {ct_from_t_sql("s", "t", "p")} AS ct
      FROM ({_IN_SQL})
    )
    """,
)
def gsw_rho_ct_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SA/CT-native in-situ density and potential density anomaly from
    the 75-term specific-volume polynomial (Roquet, Madec, McDougall &
    Barker 2015 — the expression TEOS-10 adopted; reference gsw_specvol,
    GSW-Python/gsw-3.3.1/src/c_gsw/gsw_oceanographic_toolbox.c:2009 and
    coefficient table gsw_internal_const.h). CT is materialized as a
    column first so the 75-term evaluation runs once per output — both
    engines see the identical two-step plan. Validated against the
    engine's independent EOS-80 implementation (max surface-grid
    divergence 0.0075 kg/m³, tests/test_oceanography_checkvalues.py)."""
    df = _inputs(spark, sf_dir)
    staged = df.select(
        "l_orderkey",
        "l_linenumber",
        "p",
        F.expr(_SA_SQL).alias("sa"),
        F.expr(ct_from_t_sql("s", "t", "p")).alias("ct"),
    )
    return staged.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.expr(rho_sql("sa", "ct", "p")), 6).alias("rho_ct"),
        F.round(
            F.expr(rho_sql("sa", "ct", "0.0e0")) - 1000.0, 6
        ).alias("sigma0_ct"),
    )
