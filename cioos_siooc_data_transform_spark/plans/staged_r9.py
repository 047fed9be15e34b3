"""STAGED round-9 queries — NOT registered (round-9 runway seed).

Same contract as staged_r5..r8: LOCAL registry, strict-harness pytest
coverage in tests/test_staged_r9.py, idempotent ``activate()``.
Activation order: staged_r8 (round 8) -> this module (round 9).

NEW in this module's contract: ``STAGED_REPLACEMENTS`` — queries that
REPLACE a live registered query of the same name because their
expression tree changed (the staged-Horner dynamic-enthalpy migration:
value-identical at the query's quantization except ~1e-5-probability
last-ulp boundary rows, but strictly a semantics change, so the names
must leave ``__spark_entry__._CHECKED`` and re-earn driver rows at
activation). ``activate()`` overwrites those registry entries; the
activation commit must drop the replaced names from _CHECKED in the
same change (budget math: len(STAGED_QUERIES) + len(STAGED_REPLACEMENTS)
<= 50 fresh names).

Content so far:
- Wave A — TEOS-10 native alpha/beta/ratio from the ANALYTIC derivative
  polynomials (GSW twins: gsw_alpha, gsw_beta, gsw_alpha_on_beta);
  Simpson's-paradox audit over discount->revenue correlations; IVF
  recall-vs-nprobe curve (the ANN tuning audit).
- Wave B (replacements) — gsw_dynamic_enthalpy and gsw_enthalpy
  migrated to the staged per-z-power form (functions/teos10.py
  dynamic_enthalpy_stages): the flat inline text exceeds janino's
  64 KB method limit and silently runs interpreted (~10x slower,
  measured 5.4 s vs 0.5 s at sf0.1 for one evaluation).
- Wave C — ice second-derivative quantities: kappa_const_t_ice,
  internal/Helmholtz energy of ice, adiabatic sound speed in ice
  (analytic g_pp/g_Tp; IAPWS-06 Table-6 + FD pinned).
- Wave D — Simpson's-paradox slope audit, interval union coverage
  (sweep-line), single-bin DFT power at 24 h / 7 d, Gumbel block-maxima
  fit with 30-block return level.
- Wave E — IVF recall-vs-nprobe tuning curve, stupid-backoff trigram
  LM scoring (held-out halves, per-level backoff counts), backlog
  aging, Laspeyres price index, the Gopher-rule quality funnel,
  record-breaking-events trend test.
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
from cioos_siooc_data_transform_spark.plans.staged_r6 import (
    _stage_sql,
    pearson_r_from_sums,
)
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


def _register_replacement(name: str, oracle: str):
    def deco(fn):
        STAGED_REPLACEMENTS[name] = (fn, oracle)
        return fn

    return deco


def activate() -> int:
    """Round-9 activation (idempotent): new names register once;
    replacements overwrite unconditionally (their freshness is enforced
    by the _CHECKED edit in the activation commit + the entry-contract
    budget test)."""
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


# ---------------------------------------------------------------------------
# Wave A — TEOS-10 native alpha/beta/ratio (GSW twins: gsw_alpha,
# gsw_beta, gsw_alpha_on_beta) from the analytic 75-term derivative
# polynomials — the native-(SA, CT) upgrade of the live EOS-80
# gsw_alpha_beta. Divisions + sqrt only: exact parity; zero shuffle.
# ---------------------------------------------------------------------------
def _alpha_beta_oracle() -> str:
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        cabbeling_thermobaric_stages,
        ct_from_t_sql,
    )

    inner = f"""
    SELECT l_orderkey, l_linenumber, {_SA_SQL} AS sa,
           {ct_from_t_sql("s", "t", "p")} AS ct, p
    FROM ({_IN_SQL})
    """
    stages = [
        s
        for s in cabbeling_thermobaric_stages("sa", "ct", "p")
        if s[0]
        in {
            "__cbtb_xs", "__cbtb_ys", "__cbtb_z", "__cbtb_v", "__cbtb_vx",
            "__cbtb_vy", "__cbtb_dxdsa", "__cbtb_v_ct", "__cbtb_v_sa",
            "__cbtb_alpha", "__cbtb_beta", "__cbtb_r",
        }
    ]
    staged = _stage_sql(inner, stages)
    return f"""
    SELECT l_orderkey, l_linenumber,
           floor(__cbtb_alpha * 1.0e12 + 0.5) / 1.0e12 AS alpha,
           floor(__cbtb_beta * 1.0e12 + 0.5) / 1.0e12 AS beta,
           floor(__cbtb_r * 1.0e9 + 0.5) / 1.0e9 AS alpha_on_beta
    FROM {staged}
    """


@_register("gsw_alpha_beta_75term", oracle="__WAVE_A9__")
def gsw_alpha_beta_75term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thermal expansion alpha = v_CT/v, haline contraction
    beta = −v_SA/v, and the density ratio alpha/beta — ANALYTIC
    derivatives of the 75-term specvol (the native-(SA, CT) upgrade of
    the live EOS-80 gsw_alpha_beta; GSW twins gsw_alpha / gsw_beta /
    gsw_alpha_on_beta). Reuses the first half of
    cabbeling_thermobaric_stages — FD agreement is pinned by that
    family's test."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        cabbeling_thermobaric_stages,
        ct_from_t_sql,
    )

    df = _inputs(spark, sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        "p",
        F.expr(_SA_SQL).alias("sa"),
        F.expr(ct_from_t_sql("s", "t", "p")).alias("ct"),
    )
    keep = {
        "__cbtb_xs", "__cbtb_ys", "__cbtb_z", "__cbtb_v", "__cbtb_vx",
        "__cbtb_vy", "__cbtb_dxdsa", "__cbtb_v_ct", "__cbtb_v_sa",
        "__cbtb_alpha", "__cbtb_beta", "__cbtb_r",
    }
    for name, expr in cabbeling_thermobaric_stages("sa", "ct", "p"):
        if name in keep:
            df = df.withColumn(name, F.expr(expr))
    return df.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(F.col("__cbtb_alpha") * 1.0e12 + 0.5) / 1.0e12).alias("alpha"),
        (F.floor(F.col("__cbtb_beta") * 1.0e12 + 0.5) / 1.0e12).alias("beta"),
        (F.floor(F.col("__cbtb_r") * 1.0e9 + 0.5) / 1.0e9).alias(
            "alpha_on_beta"
        ),
    )


STAGED_ORACLES["gsw_alpha_beta_75term"] = _alpha_beta_oracle()


# ---------------------------------------------------------------------------
# Wave B — staged-Horner migrations of the two live flat-text
# dynamic-enthalpy queries (REPLACEMENTS: same names, same inputs, same
# quantization; the tree regroups per-z-power so codegen survives
# janino's 64 KB method limit — measured 5.4 s -> ~0.5 s at sf0.1 for
# one evaluation. Values differ from the flat form only in last-ulp
# rounding below the 6-dp output floor; still handled as a semantics
# change for driver bookkeeping).
# ---------------------------------------------------------------------------
def _dyn_enthalpy_staged_oracle() -> str:
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_from_t_sql,
        dynamic_enthalpy_stages,
    )

    inner = f"""
      SELECT l_orderkey, l_linenumber, p, {_SA_SQL} AS sa,
             {ct_from_t_sql("s", "t", "p")} AS ct
      FROM ({_IN_SQL})
    """
    staged = _stage_sql(inner, dynamic_enthalpy_stages("sa", "ct", "p"))
    return f"""
    SELECT l_orderkey, l_linenumber,
           round(__hdyn_out, 6) AS h_dyn
    FROM {staged}
    """


@_register_replacement("gsw_dynamic_enthalpy", oracle="__WAVE_B9__")
def gsw_dynamic_enthalpy_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic enthalpy (the pressure-dependent part of specific
    enthalpy) — staged per-z-power form of the same 75 published
    coefficients the original flat query summed (plans/staged_r5.py);
    one a_K stage set + Horner combine per row, whole-stage codegen."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_from_t_sql,
        dynamic_enthalpy_stages,
    )

    df = _inputs(spark, sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        "p",
        F.expr(_SA_SQL).alias("sa"),
        F.expr(ct_from_t_sql("s", "t", "p")).alias("ct"),
    )
    for name, expr in dynamic_enthalpy_stages("sa", "ct", "p"):
        df = df.withColumn(name, F.expr(expr))
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("__hdyn_out"), 6).alias("h_dyn"),
    )


STAGED_REPLACEMENTS["gsw_dynamic_enthalpy"] = (
    STAGED_REPLACEMENTS["gsw_dynamic_enthalpy"][0],
    _dyn_enthalpy_staged_oracle(),
)


def _enthalpy_staged_oracle() -> str:
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_from_t_sql,
        enthalpy_stages,
    )

    inner = f"""
      SELECT l_orderkey, l_linenumber, p, {_SA_SQL} AS sa,
             {ct_from_t_sql("s", "t", "p")} AS ct
      FROM ({_IN_SQL})
    """
    staged = _stage_sql(inner, enthalpy_stages("sa", "ct", "p"))
    return f"""
    SELECT l_orderkey, l_linenumber,
           round(__h_out, 6) AS enthalpy
    FROM {staged}
    """


@_register_replacement("gsw_enthalpy", oracle="__WAVE_B9__")
def gsw_enthalpy_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h(SA, CT, p) = cp0·CT + h_dyn — staged per-z-power form (see
    gsw_dynamic_enthalpy replacement)."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_from_t_sql,
        enthalpy_stages,
    )

    df = _inputs(spark, sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        "p",
        F.expr(_SA_SQL).alias("sa"),
        F.expr(ct_from_t_sql("s", "t", "p")).alias("ct"),
    )
    for name, expr in enthalpy_stages("sa", "ct", "p"):
        df = df.withColumn(name, F.expr(expr))
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("__h_out"), 6).alias("enthalpy"),
    )


STAGED_REPLACEMENTS["gsw_enthalpy"] = (
    STAGED_REPLACEMENTS["gsw_enthalpy"][0],
    _enthalpy_staged_oracle(),
)


# ---------------------------------------------------------------------------
# Wave C — ice second-derivative quantities (GSW twins:
# gsw_kappa_const_t_ice, gsw_internal_energy_ice,
# gsw_helmholtz_energy_ice, gsw_sound_speed_ice in
# GSW/_wrapped_ufuncs.py / GSW/ice.py): analytic g_pp / g_Tp stages on
# the IAPWS-06 Gibbs potential, Table-6 + FD pinned in
# tests/test_oceanography_checkvalues.py. Shares the wave-H input shape
# (sub-zero t, shelf pressures) from staged_r8.
# ---------------------------------------------------------------------------
def _ice9_query(out_col: str, scale: float):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from cioos_siooc_data_transform_spark.functions.ice import (
            gibbs_ice_stages,
        )
        from cioos_siooc_data_transform_spark.plans.staged_r8 import _ice_inputs

        df = _ice_inputs(spark, sf_dir)
        for name, expr in gibbs_ice_stages("t", "p"):
            df = df.withColumn(name, F.expr(expr))
        return df.select(
            "l_orderkey",
            "l_linenumber",
            (F.floor(F.col(out_col) * scale + 0.5) / scale).alias(out_col),
        )

    return fn


def _ice9_oracle(out_col: str, scale: float) -> str:
    from cioos_siooc_data_transform_spark.functions.ice import gibbs_ice_stages
    from cioos_siooc_data_transform_spark.plans.staged_r8 import _ICE_IN_SQL

    staged = _stage_sql(_ICE_IN_SQL, gibbs_ice_stages("t", "p"))
    return f"""
    SELECT l_orderkey, l_linenumber,
           floor({out_col} * {scale:.1e} + 0.5) / {scale:.1e} AS {out_col}
    FROM {staged}
    """


# scales by magnitude: kappa ~1e-10 1/Pa (1e22 -> 1e-12 relative? no:
# value*1e22 ~ 1e12 exact-int range, 1e-22 floor ~ 1e-12 relative);
# u/f ~ 1e5 J/kg -> 1e-3 floor (the wave-H transcendental argument);
# c ~ 3e3 m/s -> 1e-4 floor.
for _col, _scale in (
    ("kappa_const_t_ice", 1.0e22),
    ("internal_energy_ice", 1.0e3),
    ("helmholtz_energy_ice", 1.0e3),
    ("sound_speed_ice", 1.0e4),
):
    _fn = _ice9_query(_col, _scale)
    _fn.__name__ = f"gsw_{_col}"
    _fn.__doc__ = (
        f"Ice Ih {_col} from the IAPWS-06 Gibbs second derivatives "
        "(Table-6 + FD pinned in tests)."
    )
    STAGED_QUERIES[f"gsw_{_col}"] = _fn
    STAGED_ORACLES[f"gsw_{_col}"] = _ice9_oracle(_col, _scale)


# ---------------------------------------------------------------------------
# Wave D — statistical audits over the TPC-H / events tables:
# Simpson's-paradox slope audit, interval union coverage (sweep-line),
# daily/weekly spectral power, and Gumbel block-maxima fitting.
# Integer-exact sums everywhere a rounded aggregate needs
# order-independence (the per-term-quantize idiom extends to the
# cos/sin spectral terms: a last-ulp cos difference flips a 1e-12 term
# quantum with ~1e-4 probability, drifting the exact sum by ~1e-11 —
# five decades below the 1e-6 output floor).
# ---------------------------------------------------------------------------
@_register(
    "lineitem_simpson_paradox_audit",
    oracle="""
    WITH pts AS (
      SELECT l_returnflag AS grp,
             CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS x,
             CAST(l_quantity AS BIGINT) AS y
      FROM lineitem
    ), per AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx, sum(x*y) AS sxy
      FROM pts GROUP BY grp
      UNION ALL
      SELECT '__pooled__', CAST(count(*) AS BIGINT),
             sum(x), sum(y), sum(x*x), sum(x*y)
      FROM pts
    ), slopes AS (
      SELECT grp, n,
             floor((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                   / NULLIF(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE), 0.0)
                   * 1.0e6 + 0.5) / 1.0e6 AS slope
      FROM per
    )
    SELECT s.grp, s.n, s.slope,
           CASE WHEN s.grp = '__pooled__' THEN FALSE
                ELSE (s.slope > 0) <> (p.slope > 0) END AS sign_flips_pooled
    FROM slopes s
    CROSS JOIN (SELECT slope FROM slopes WHERE grp = '__pooled__') p
    """,
)
def lineitem_simpson_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox detector: the pooled OLS slope of quantity on
    discount next to each return-flag stratum's slope, flagging sign
    reversals — the aggregation-bias audit any metrics pipeline should
    run before trusting a pooled trend. One exact-integer moment pass
    (grouping-sets shape via union), slopes finished in double on the
    exact sums; the pooled row broadcasts back as a 1-row dimension."""
    li = _t(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_returnflag").alias("grp"),
        F.floor(F.col("l_discount") * 100.0 + 0.5).cast("long").alias("x"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    def moments(df, label):
        g = df.groupBy(*( ["grp"] if label is None else [] )).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
        return g if label is None else g.select(F.lit(label).alias("grp"), "*")
    per = moments(pts, None).unionByName(moments(pts, "__pooled__"))
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    den = F.nullif(nd * sxx - sx * sx, F.lit(0.0))
    slopes = per.select(
        "grp",
        "n",
        (F.floor((nd * sxy - sx * sy) / den * 1.0e6 + 0.5) / 1.0e6).alias(
            "slope"
        ),
    )
    pooled = slopes.filter(F.col("grp") == "__pooled__").select(
        F.col("slope").alias("pooled_slope")
    )
    return slopes.crossJoin(F.broadcast(pooled)).select(
        "grp",
        "n",
        "slope",
        F.when(F.col("grp") == "__pooled__", F.lit(False))
        .otherwise((F.col("slope") > 0) != (F.col("pooled_slope") > 0))
        .alias("sign_flips_pooled"),
    )


@_register(
    "interval_union_coverage",
    oracle="""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e
      FROM events
    ), marked AS (
      SELECT user_id, s, e,
             CASE WHEN s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS brk
      FROM iv
    ), isl AS (
      SELECT user_id, e,  s,
             sum(brk) OVER (PARTITION BY user_id ORDER BY s, e
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    ), runs AS (
      SELECT user_id, island, min(s) AS island_s, max(e) AS island_e,
             CAST(count(*) AS BIGINT) AS n_iv
      FROM isl GROUP BY 1, 2
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(n_iv) AS BIGINT) AS n_intervals,
           CAST(sum(island_e - island_s) AS BIGINT) AS covered_us
    FROM runs GROUP BY user_id
    """,
)
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union length of overlapping intervals per user (each event opens
    a 5-minute window): the classic sweep-line — sort by start, break
    when a start exceeds the running max end, sum island extents. Two
    windows sharing one (user_id; s, e) sort; all arithmetic exact
    integer epoch-µs. The merged-island length is the
    double-counting-free exposure metric sessionization/billing needs."""
    e = _t(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(300000000)).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.withColumn(
        "brk",
        F.when(F.col("s") > prev_max_e, 1).otherwise(0),
    )
    isl = marked.withColumn(
        "island",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    runs = isl.groupBy("user_id", "island").agg(
        F.min("s").alias("island_s"),
        F.max("e").alias("island_e"),
        F.count(F.lit(1)).cast("long").alias("n_iv"),
    )
    return runs.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum("n_iv").cast("long").alias("n_intervals"),
        F.sum(F.col("island_e") - F.col("island_s"))
        .cast("long")
        .alias("covered_us"),
    )


_DFT_TERMS_SQL = """
      SELECT event_type,
             CAST(floor(value * cos(2.0e0*pi()*((epoch_us(ts) % 86400000000)
                        / 86400000000.0e0)) * 1.0e6 + 0.5) AS BIGINT) AS c24,
             CAST(floor(value * sin(2.0e0*pi()*((epoch_us(ts) % 86400000000)
                        / 86400000000.0e0)) * 1.0e6 + 0.5) AS BIGINT) AS s24,
             CAST(floor(value * cos(2.0e0*pi()*((epoch_us(ts) % 604800000000)
                        / 604800000000.0e0)) * 1.0e6 + 0.5) AS BIGINT) AS c168,
             CAST(floor(value * sin(2.0e0*pi()*((epoch_us(ts) % 604800000000)
                        / 604800000000.0e0)) * 1.0e6 + 0.5) AS BIGINT) AS s168,
             CAST(floor(abs(value) * 1.0e6 + 0.5) AS BIGINT) AS av
      FROM events
"""


@_register(
    "events_dft_power_daily_weekly",
    oracle=f"""
    WITH terms AS ({_DFT_TERMS_SQL}),
    sums AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c24) AS HUGEINT) AS sc24, CAST(sum(s24) AS HUGEINT) AS ss24,
             CAST(sum(c168) AS HUGEINT) AS sc168, CAST(sum(s168) AS HUGEINT) AS ss168,
             CAST(sum(av) AS HUGEINT) AS sav
      FROM terms GROUP BY event_type
    )
    SELECT event_type, n,
           floor(sqrt(CAST(sc24 AS DOUBLE)*CAST(sc24 AS DOUBLE)
                      + CAST(ss24 AS DOUBLE)*CAST(ss24 AS DOUBLE))
                 / CAST(sav AS DOUBLE) * 1.0e6 + 0.5) / 1.0e6 AS daily_power,
           floor(sqrt(CAST(sc168 AS DOUBLE)*CAST(sc168 AS DOUBLE)
                      + CAST(ss168 AS DOUBLE)*CAST(ss168 AS DOUBLE))
                 / CAST(sav AS DOUBLE) * 1.0e6 + 0.5) / 1.0e6 AS weekly_power
    FROM sums
    """,
)
def events_dft_power_daily_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-bin DFT power at the 24 h and 7 d periods per event type —
    the spectral seasonality detector (|Σv·e^{-iωt}|/Σ|v|, 0 = flat,
    →1 = pure tone). Per-term micro-quantization before the exact sums:
    a last-ulp cos() disagreement flips a term's 1e-6 quantum with
    ~1e-7 probability, drifting the HUGEINT/long sum ~1e-6 against a
    ~1e9 total — nine decades below the output floor. One
    map-side-combinable agg; phases from exact integer epoch-µs."""
    e = _t(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    def term(trig, period_us):
        phase = 2.0 * 3.141592653589793 * (
            (us % F.lit(period_us)) / float(period_us)
        )
        return F.floor(F.col("value") * trig(phase) * 1.0e6 + 0.5).cast("long")
    terms = e.select(
        "event_type",
        term(F.cos, 86400000000).alias("c24"),
        term(F.sin, 86400000000).alias("s24"),
        term(F.cos, 604800000000).alias("c168"),
        term(F.sin, 604800000000).alias("s168"),
        F.floor(F.abs(F.col("value")) * 1.0e6 + 0.5).cast("long").alias("av"),
    )
    sums = terms.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("c24").cast("decimal(38,0)")).alias("sc24"),
        F.sum(F.col("s24").cast("decimal(38,0)")).alias("ss24"),
        F.sum(F.col("c168").cast("decimal(38,0)")).alias("sc168"),
        F.sum(F.col("s168").cast("decimal(38,0)")).alias("ss168"),
        F.sum(F.col("av").cast("decimal(38,0)")).alias("sav"),
    )
    def power(sc, ss):
        return (
            F.floor(
                F.sqrt(
                    sc.cast("double") * sc.cast("double")
                    + ss.cast("double") * ss.cast("double")
                )
                / F.col("sav").cast("double")
                * 1.0e6
                + 0.5
            )
            / 1.0e6
        )
    return sums.select(
        "event_type",
        "n",
        power(F.col("sc24"), F.col("ss24")).alias("daily_power"),
        power(F.col("sc168"), F.col("ss168")).alias("weekly_power"),
    )


@_register(
    "events_block_maxima_gumbel",
    oracle="""
    WITH blocks AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day_id,
             CAST(max(CAST(floor(value * 1.0e6 + 0.5) AS BIGINT)) AS BIGINT)
               AS m
      FROM events GROUP BY 1, 2
    ), mom AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_blocks,
             CAST(sum(m) AS HUGEINT) AS sm, CAST(sum(m*m) AS HUGEINT) AS smm
      FROM blocks GROUP BY event_type
    ), fit AS (
      SELECT event_type, n_blocks,
             CAST(sm AS DOUBLE) / 1.0e6 / n_blocks AS mean_max,
             sqrt(CAST(smm AS DOUBLE) / 1.0e12 / n_blocks
                  - (CAST(sm AS DOUBLE) / 1.0e6 / n_blocks)
                    * (CAST(sm AS DOUBLE) / 1.0e6 / n_blocks))
               * sqrt(6.0e0) / pi() AS beta
      FROM mom
    )
    SELECT event_type, n_blocks,
           floor((mean_max - 0.57721566490153286e0 * beta) * 1.0e6 + 0.5)
             / 1.0e6 AS gumbel_loc,
           floor(beta * 1.0e6 + 0.5) / 1.0e6 AS gumbel_scale,
           floor(((mean_max - 0.57721566490153286e0 * beta)
                  - beta * ln(-ln(1.0e0 - 1.0e0/30.0e0))) * 1.0e6 + 0.5)
             / 1.0e6 AS return_level_30
    FROM fit
    """,
)
def events_block_maxima_gumbel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value analysis per type: daily block maxima fitted to a
    Gumbel distribution by the method of moments (β = s·√6/π,
    μ = m̄ − γ·β with Euler–Mascheroni γ), plus the 30-block return
    level μ − β·ln(−ln(1 − 1/30)) — the "how bad can a day get"
    capacity-planning number. Maxima quantize to exact micro-ints; both
    engines finish the fit in double on identical exact moments."""
    e = _t(spark, sf_dir, "events")
    blocks = e.groupBy(
        "event_type",
        (F.unix_micros("ts") / F.lit(86400000000)).cast("long").alias("day_id"),
    ).agg(
        F.max(F.floor(F.col("value") * 1.0e6 + 0.5).cast("long")).alias("m")
    )
    mom = blocks.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(F.col("m").cast("decimal(38,0)")).alias("sm"),
        F.sum(
            F.col("m").cast("decimal(19,0)") * F.col("m").cast("decimal(19,0)")
        ).alias("smm"),
    )
    mean_max = F.col("sm").cast("double") / 1.0e6 / F.col("n_blocks")
    beta = (
        F.sqrt(
            F.col("smm").cast("double") / 1.0e12 / F.col("n_blocks")
            - mean_max * mean_max
        )
        * F.sqrt(F.lit(6.0))
        / 3.141592653589793
    )
    gamma = 0.57721566490153286
    ret_mult = F.lit(-1.0) * F.log(F.lit(-1.0) * F.log(F.lit(1.0 - 1.0 / 30.0)))
    return mom.select(
        "event_type",
        "n_blocks",
        (F.floor((mean_max - gamma * beta) * 1.0e6 + 0.5) / 1.0e6).alias(
            "gumbel_loc"
        ),
        (F.floor(beta * 1.0e6 + 0.5) / 1.0e6).alias("gumbel_scale"),
        (
            F.floor(
                ((mean_max - gamma * beta) + beta * ret_mult) * 1.0e6 + 0.5
            )
            / 1.0e6
        ).alias("return_level_30"),
    )


# ---------------------------------------------------------------------------
# Wave E — ANN tuning, LM backoff, finance/ops round-out.
# ---------------------------------------------------------------------------
def _nprobe_arm_sql(nprobe: int) -> str:
    """One IVF arm of the recall curve at a given nprobe (query probes
    its `nprobe` nearest cells; corpus stays single-assigned)."""
    return f"""
      SELECT {nprobe} AS nprobe, b.query_id,
             CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hits
      FROM bf b
      LEFT JOIN (
        SELECT query_id, neighbor_id FROM (
          SELECT qa.query_id, ca.neighbor_id,
                 row_number() OVER (
                   PARTITION BY qa.query_id
                   ORDER BY round(list_cosine_similarity(qa.qv, ca.cv2), 4)
                              DESC,
                            ca.neighbor_id ASC
                 ) AS rank
          FROM (SELECT vec_id AS query_id, embedding AS qv, centroid_id
                FROM multi WHERE vec_id < 5 AND rn <= {nprobe}) qa
          JOIN (SELECT vec_id AS neighbor_id, embedding AS cv2, centroid_id
                FROM multi WHERE rn = 1) ca
            ON qa.centroid_id = ca.centroid_id
               AND ca.neighbor_id != qa.query_id
        ) WHERE rank <= 5
      ) i ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
      GROUP BY b.query_id
"""


_NPROBE_CURVE_ORACLE = f"""
    WITH cent AS (SELECT vec_id AS centroid_id,
                         CAST(embedding AS DOUBLE[]) AS cv
                  FROM embeddings WHERE vec_id < 8),
    multi AS (
      SELECT v.vec_id, CAST(v.embedding AS DOUBLE[]) AS embedding,
             cent.centroid_id,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY round(list_cosine_similarity(v.embedding, cent.cv), 4)
                          DESC,
                        cent.centroid_id ASC
             ) AS rn
      FROM embeddings v, cent
    ),
    q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings),
    bf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY round(list_cosine_similarity(qv, cv), 4) DESC,
                          neighbor_id ASC
               ) AS rank
        FROM q, c WHERE neighbor_id != query_id
      ) WHERE rank <= 5
    ),
    arms AS (
{_nprobe_arm_sql(1)}
      UNION ALL
{_nprobe_arm_sql(2)}
      UNION ALL
{_nprobe_arm_sql(4)}
    )
    SELECT CAST(nprobe AS BIGINT) AS nprobe,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(n_hits) AS BIGINT) AS total_hits,
           sum(n_hits) / (5.0 * count(*)) AS mean_recall_at_5
    FROM arms GROUP BY nprobe
"""


@_register("similarity_ivf_nprobe_curve", oracle=_NPROBE_CURVE_ORACLE)
def similarity_ivf_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN tuning curve: mean recall@5 of the IVF index at nprobe ∈
    {1, 2, 4} against exact brute-force truth — THE plot you read before
    fixing an index configuration (recall rises with nprobe at
    proportional probe cost; the curve's knee picks the deployment
    point). Reuses operators/similarity.ivf_topk's multi-probe
    assignment; each arm's hit join is k·|queries| rows, broadcast;
    recall is an exact rational."""
    from cioos_siooc_data_transform_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    centroids = emb.filter(F.col("vec_id") < 8)
    bf = brute_force_topk(queries, emb, k=5, round_dp=4).select(
        "query_id", "neighbor_id"
    )
    arms = None
    for nprobe in (1, 2, 4):
        ivf = ivf_topk(
            queries, emb, centroids, k=5, round_dp=4, nprobe=nprobe
        ).select("query_id", F.col("neighbor_id").alias("ivf_neighbor_id"))
        hits = (
            bf.join(
                ivf,
                (bf["query_id"] == ivf["query_id"])
                & (bf["neighbor_id"] == ivf["ivf_neighbor_id"]),
                "left",
            )
            .select(bf["query_id"].alias("qid"), "ivf_neighbor_id")
            .groupBy("qid")
            .agg(
                F.sum(
                    F.when(F.col("ivf_neighbor_id").isNotNull(), 1).otherwise(0)
                )
                .cast("long")
                .alias("n_hits")
            )
            .select(F.lit(nprobe).alias("nprobe"), "qid", "n_hits")
        )
        arms = hits if arms is None else arms.unionByName(hits)
    return arms.groupBy(F.col("nprobe").cast("long").alias("nprobe")).agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum("n_hits").cast("long").alias("total_hits"),
        (F.sum("n_hits") / (5.0 * F.count(F.lit(1)))).alias("mean_recall_at_5"),
    )


@_register(
    "lm_trigram_backoff_logprob",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    tg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(words) - 2, 0)),
                    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
               AS t
      FROM w WHERE doc_id % 2 = 1
    ),
    train AS (SELECT words FROM w WHERE doc_id % 2 = 0),
    ttg AS (
      SELECT unnest(list_transform(generate_series(1, greatest(len(words) - 2, 0)),
                    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
               AS t
      FROM train
    ),
    tfreq AS (SELECT t, CAST(count(*) AS DOUBLE) AS ct FROM ttg GROUP BY t),
    tbg AS (
      SELECT unnest(list_transform(generate_series(1, greatest(len(words) - 1, 0)),
                    i -> words[i] || ' ' || words[i+1])) AS b
      FROM train
    ),
    bfreq AS (SELECT b, CAST(count(*) AS DOUBLE) AS cb FROM tbg GROUP BY b),
    tun AS (SELECT unnest(words) AS u FROM train),
    ufreq AS (SELECT u, CAST(count(*) AS DOUBLE) AS cu FROM tun GROUP BY u),
    n_tok AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tun),
    scored AS (
      SELECT tg.doc_id,
             CASE
               WHEN tf.ct IS NOT NULL AND bctx.cb IS NOT NULL
                 THEN ln(tf.ct / bctx.cb)
               WHEN btail.cb IS NOT NULL AND uctx.cu IS NOT NULL
                 THEN ln(0.4e0 * btail.cb / uctx.cu)
               WHEN utail.cu IS NOT NULL
                 THEN ln(0.16e0 * utail.cu / n_tok.n)
               ELSE ln(0.16e0 / n_tok.n)
             END AS lp,
             CASE WHEN tf.ct IS NOT NULL AND bctx.cb IS NOT NULL THEN 0
                  WHEN btail.cb IS NOT NULL AND uctx.cu IS NOT NULL THEN 1
                  ELSE 2 END AS level
      FROM tg
      CROSS JOIN n_tok
      LEFT JOIN tfreq tf ON tf.t = tg.t
      LEFT JOIN bfreq bctx
        ON bctx.b = split_part(tg.t, ' ', 1) || ' ' || split_part(tg.t, ' ', 2)
      LEFT JOIN bfreq btail
        ON btail.b = split_part(tg.t, ' ', 2) || ' ' || split_part(tg.t, ' ', 3)
      LEFT JOIN ufreq uctx ON uctx.u = split_part(tg.t, ' ', 2)
      LEFT JOIN ufreq utail ON utail.u = split_part(tg.t, ' ', 3)
    ),
    q AS (
      SELECT doc_id,
             CAST(floor(lp * 1.0e9 + 0.5) AS BIGINT) AS lpq, level
      FROM scored
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
           CAST(sum(CASE WHEN level = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_backoff_bigram,
           CAST(sum(CASE WHEN level = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_backoff_unigram,
           floor(CAST(sum(lpq) AS DOUBLE) / 1.0e9 / count(*) * 1.0e6 + 0.5)
             / 1.0e6 AS avg_logprob_sb
    FROM q GROUP BY doc_id
    """,
)
def lm_trigram_backoff_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff trigram scoring (Brants et al. 2007): held-out
    docs (odd ids) score against counts from the train half (even ids);
    unseen trigrams back off to 0.4·P(bigram), then 0.4²·P(unigram),
    with per-level usage counts in the output — the data-quality view
    of how much a corpus half explains the other. Frequency tables are
    vocabulary-sized broadcasts; per-term logprobs quantize to 1e-9
    before the exact sum (a raw double sum of ln() terms would be
    order-dependent)."""
    from cioos_siooc_data_transform_spark.operators.dedup import (
        word_shingles,
        words_expr,
    )

    docs = _t(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 2 == 1)
    tr = docs.filter(F.col("doc_id") % 2 == 0)
    tg = ev.select(
        "doc_id", F.explode(word_shingles(words_expr(F.col("text")), 3)).alias("t")
    )
    ttg = tr.select(
        F.explode(word_shingles(words_expr(F.col("text")), 3)).alias("t")
    )
    tfreq = ttg.groupBy("t").agg(F.count(F.lit(1)).cast("double").alias("ct"))
    tbg = tr.select(
        F.explode(word_shingles(words_expr(F.col("text")), 2)).alias("b")
    )
    bfreq = tbg.groupBy("b").agg(F.count(F.lit(1)).cast("double").alias("cb"))
    tun = tr.select(F.explode(words_expr(F.col("text"))).alias("u"))
    ufreq = tun.groupBy("u").agg(F.count(F.lit(1)).cast("double").alias("cu"))
    n_tok = tun.agg(F.count(F.lit(1)).cast("double").alias("n"))
    sp = lambda c, i: F.split_part(F.col(c), F.lit(" "), F.lit(i))  # noqa: E731
    scored = (
        tg.crossJoin(F.broadcast(n_tok))
        .join(F.broadcast(tfreq), "t", "left")
        .join(
            F.broadcast(bfreq.select(F.col("b").alias("bctx_b"), F.col("cb").alias("cb_ctx"))),
            F.concat_ws(" ", sp("t", 1), sp("t", 2)) == F.col("bctx_b"),
            "left",
        )
        .join(
            F.broadcast(bfreq.select(F.col("b").alias("btail_b"), F.col("cb").alias("cb_tail"))),
            F.concat_ws(" ", sp("t", 2), sp("t", 3)) == F.col("btail_b"),
            "left",
        )
        .join(
            F.broadcast(ufreq.select(F.col("u").alias("uctx_u"), F.col("cu").alias("cu_ctx"))),
            sp("t", 2) == F.col("uctx_u"),
            "left",
        )
        .join(
            F.broadcast(ufreq.select(F.col("u").alias("utail_u"), F.col("cu").alias("cu_tail"))),
            sp("t", 3) == F.col("utail_u"),
            "left",
        )
    )
    tri_hit = F.col("ct").isNotNull() & F.col("cb_ctx").isNotNull()
    bi_hit = F.col("cb_tail").isNotNull() & F.col("cu_ctx").isNotNull()
    lp = (
        F.when(tri_hit, F.log(F.col("ct") / F.col("cb_ctx")))
        .when(bi_hit, F.log(0.4 * F.col("cb_tail") / F.col("cu_ctx")))
        .when(
            F.col("cu_tail").isNotNull(),
            F.log(0.16 * F.col("cu_tail") / F.col("n")),
        )
        .otherwise(F.log(0.16 / F.col("n")))
    )
    level = (
        F.when(tri_hit, 0).when(bi_hit, 1).otherwise(2)
    )
    q = scored.select(
        "doc_id",
        F.floor(lp * 1.0e9 + 0.5).cast("long").alias("lpq"),
        level.alias("level"),
    )
    return q.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_trigrams"),
        F.sum(F.when(F.col("level") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_backoff_bigram"),
        F.sum(F.when(F.col("level") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n_backoff_unigram"),
        (
            F.floor(
                F.sum("lpq").cast("double")
                / 1.0e9
                / F.count(F.lit(1))
                * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("avg_logprob_sb"),
    )


@_register(
    "orders_backlog_aging",
    oracle="""
    WITH ref AS (SELECT max(o_orderdate) AS ref_date FROM orders),
    open_o AS (
      SELECT date_diff('day', o.o_orderdate, r.ref_date) AS age_days,
             CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders o CROSS JOIN ref r
      WHERE o.o_orderstatus = 'O'
    )
    SELECT CASE WHEN age_days <= 30 THEN '0-30'
                WHEN age_days <= 90 THEN '31-90'
                WHEN age_days <= 365 THEN '91-365'
                ELSE '365+' END AS age_bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS value_cents
    FROM open_o GROUP BY 1
    """,
)
def orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accounts-receivable-style backlog aging: OPEN orders bucketed by
    age at the corpus reference date (max order date — a 1-row
    broadcast, no driver collect), with counts and exact integer-cent
    value per bucket. Day arithmetic is exact integer date difference
    on both engines."""
    o = _t(spark, sf_dir, "orders")
    ref = o.agg(F.max("o_orderdate").alias("ref_date"))
    open_o = (
        o.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(ref))
        .select(
            F.datediff(F.col("ref_date"), F.col("o_orderdate")).alias(
                "age_days"
            ),
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
    )
    bucket = (
        F.when(F.col("age_days") <= 30, "0-30")
        .when(F.col("age_days") <= 90, "31-90")
        .when(F.col("age_days") <= 365, "91-365")
        .otherwise("365+")
    )
    return open_o.groupBy(bucket.alias("age_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("value_cents"),
    )


@_register(
    "lineitem_price_index_laspeyres",
    oracle="""
    WITH m AS (
      SELECT l_partkey AS pk,
             year(l_shipdate) * 12 + month(l_shipdate) AS month_id,
             CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1, 2
    ), base AS (
      SELECT pk, cents AS cents0, qty AS qty0
      FROM m JOIN (SELECT min(month_id) AS m0 FROM m) ON month_id = m0
    ), priced AS (
      SELECT m.month_id,
             CAST(floor(CAST(m.cents AS DOUBLE) / m.qty * 1.0e4 + 0.5)
                  AS BIGINT) AS p_t,            -- unit price, 1e-4 cents
             CAST(floor(CAST(b.cents0 AS DOUBLE) / b.qty0 * 1.0e4 + 0.5)
                  AS BIGINT) AS p_0,
             b.qty0
      FROM m JOIN base b ON m.pk = b.pk
    )
    SELECT CAST(month_id AS BIGINT) AS month_id,
           CAST(count(*) AS BIGINT) AS n_parts,
           floor(CAST(sum(p_t * qty0) AS DOUBLE)
                 / CAST(sum(p_0 * qty0) AS DOUBLE) * 1.0e6 + 0.5) / 1.0e6
             AS laspeyres_index
    FROM priced GROUP BY month_id
    """,
)
def lineitem_price_index_laspeyres(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres price index by ship month: Σp_t·q₀ / Σp₀·q₀ over parts
    present in both the base (first) month and month t — the
    fixed-basket inflation measure. Unit prices quantize to exact
    1e-4-cent ints BEFORE the cross products (products of quantized
    ints sum exactly as longs), so the index is a division of two exact
    integers. Base-month basket is part-keyed and broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    m = li.groupBy(
        F.col("l_partkey").alias("pk"),
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("month_id"),
    ).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long"))
        .cast("long")
        .alias("cents"),
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
    )
    m0 = m.agg(F.min("month_id").alias("m0"))
    base = (
        m.crossJoin(F.broadcast(m0))
        .filter(F.col("month_id") == F.col("m0"))
        .select(
            "pk", F.col("cents").alias("cents0"), F.col("qty").alias("qty0")
        )
    )
    priced = m.join(base, "pk").select(
        "month_id",
        F.floor(F.col("cents").cast("double") / F.col("qty") * 1.0e4 + 0.5)
        .cast("long")
        .alias("p_t"),
        F.floor(F.col("cents0").cast("double") / F.col("qty0") * 1.0e4 + 0.5)
        .cast("long")
        .alias("p_0"),
        "qty0",
    )
    return priced.groupBy(F.col("month_id").cast("long").alias("month_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        (
            F.floor(
                F.sum(F.col("p_t") * F.col("qty0")).cast("double")
                / F.sum(F.col("p_0") * F.col("qty0")).cast("double")
                * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("laspeyres_index"),
    )


@_register(
    "quality_filter_funnel",
    oracle="""
    WITH feats AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS wc,
             n_chars,
             len(list_distinct(list_filter(string_split(text, ' '),
                 w -> list_contains(['a','the','and','of','to','in'], w))))
               AS n_stop,
             len(list_distinct(string_split(text, ' '))) AS n_distinct
      FROM documents
    ), rules AS (
      SELECT doc_id,
             wc >= 10 AS r1,
             -- mean word length in [3, 10]: cross-multiplied ints
             (n_chars - wc + 1) >= 3 * wc AND (n_chars - wc + 1) <= 10 * wc
               AS r2,
             n_stop >= 2 AS r3,
             10 * n_distinct >= 3 * wc AS r4
      FROM feats
    ), marks AS (
      SELECT doc_id,
             CASE WHEN r1 THEN 1 ELSE 0 END AS s1,
             CASE WHEN r1 AND r2 THEN 1 ELSE 0 END AS s2,
             CASE WHEN r1 AND r2 AND r3 THEN 1 ELSE 0 END AS s3,
             CASE WHEN r1 AND r2 AND r3 AND r4 THEN 1 ELSE 0 END AS s4
      FROM rules
    )
    SELECT stage, n_pass,
           floor(n_pass * 1.0e6 / n_total + 0.5) / 1.0e6 AS pass_rate
    FROM (
      SELECT 'all' AS stage, CAST(count(*) AS BIGINT) AS n_pass,
             CAST(count(*) AS BIGINT) AS n_total FROM marks
      UNION ALL SELECT '1_min_words', CAST(sum(s1) AS BIGINT),
             CAST(count(*) AS BIGINT) FROM marks
      UNION ALL SELECT '2_word_len', CAST(sum(s2) AS BIGINT),
             CAST(count(*) AS BIGINT) FROM marks
      UNION ALL SELECT '3_stopwords', CAST(sum(s3) AS BIGINT),
             CAST(count(*) AS BIGINT) FROM marks
      UNION ALL SELECT '4_distinct_ratio', CAST(sum(s4) AS BIGINT),
             CAST(count(*) AS BIGINT) FROM marks
    )
    """,
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential quality-filter attrition (the Gopher-rule funnel):
    how many documents survive each successive gate — minimum word
    count, mean-word-length band (cross-multiplied integer comparison,
    no float ratio), minimum distinct stopwords, distinct-word ratio.
    The per-doc pass is one narrow row-local projection; the funnel is
    one tiny agg (grouping-sets shape via union). The stagewise counts
    are what a pipeline dashboard plots to see WHICH rule eats the
    corpus."""
    d = _t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    stop = F.array(*[F.lit(s) for s in ["a", "the", "and", "of", "to", "in"]])
    feats = d.select(
        "doc_id",
        F.size(words).alias("wc"),
        F.col("n_chars"),
        F.size(
            F.array_distinct(
                F.filter(words, lambda w: F.array_contains(stop, w))
            )
        ).alias("n_stop"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
    )
    ml = F.col("n_chars") - F.col("wc") + 1
    rules = feats.select(
        "doc_id",
        (F.col("wc") >= 10).alias("r1"),
        ((ml >= 3 * F.col("wc")) & (ml <= 10 * F.col("wc"))).alias("r2"),
        (F.col("n_stop") >= 2).alias("r3"),
        (10 * F.col("n_distinct") >= 3 * F.col("wc")).alias("r4"),
    )
    marks = rules.select(
        F.when(F.col("r1"), 1).otherwise(0).alias("s1"),
        F.when(F.col("r1") & F.col("r2"), 1).otherwise(0).alias("s2"),
        F.when(F.col("r1") & F.col("r2") & F.col("r3"), 1)
        .otherwise(0)
        .alias("s3"),
        F.when(F.col("r1") & F.col("r2") & F.col("r3") & F.col("r4"), 1)
        .otherwise(0)
        .alias("s4"),
    )
    agg = marks.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum("s1").cast("long").alias("p1"),
        F.sum("s2").cast("long").alias("p2"),
        F.sum("s3").cast("long").alias("p3"),
        F.sum("s4").cast("long").alias("p4"),
    )
    stages = None
    for stage, col in (
        ("all", "n_total"),
        ("1_min_words", "p1"),
        ("2_word_len", "p2"),
        ("3_stopwords", "p3"),
        ("4_distinct_ratio", "p4"),
    ):
        row = agg.select(
            F.lit(stage).alias("stage"),
            F.col(col).alias("n_pass"),
            (
                F.floor(F.col(col) * 1.0e6 / F.col("n_total") + 0.5) / 1.0e6
            ).alias("pass_rate"),
        )
        stages = row if stages is None else stages.unionByName(row)
    return stages


@_register(
    "events_record_breaks",
    oracle="""
    WITH seq AS (
      SELECT event_type, value,
             max(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prior_max
      FROM events
    ), marked AS (
      SELECT event_type,
             CASE WHEN prior_max IS NULL OR value > prior_max THEN 1 ELSE 0
               END AS is_record
      FROM seq
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(is_record) AS BIGINT) AS n_records,
           floor((ln(CAST(count(*) AS DOUBLE)) + 0.57721566490153286e0)
                 * 1.0e6 + 0.5) / 1.0e6 AS expected_iid,
           floor(sum(is_record) * 1.0e6
                 / (ln(CAST(count(*) AS DOUBLE)) + 0.57721566490153286e0)
                 + 0.5) / 1.0e6 AS record_excess_ratio
    FROM marked GROUP BY event_type
    """,
)
def events_record_breaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-breaking event counts per type vs the exchangeable-i.i.d.
    expectation H_n ≈ ln n + γ: a ratio ≫ 1 means the series trends
    upward (records keep falling), ≪ 1 means early saturation — a
    distribution-free trend test. One ordered window per type (running
    max over the preceding frame), one agg."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = e.select(
        "event_type",
        F.when(
            F.max("value").over(w).isNull()
            | (F.col("value") > F.max("value").over(w)),
            1,
        )
        .otherwise(0)
        .alias("is_record"),
    )
    gamma = 0.57721566490153286
    hn = F.log(F.count(F.lit(1)).cast("double")) + gamma
    return marked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("is_record").cast("long").alias("n_records"),
        (F.floor(hn * 1.0e6 + 0.5) / 1.0e6).alias("expected_iid"),
        (F.floor(F.sum("is_record") * 1.0e6 / hn + 0.5) / 1.0e6).alias(
            "record_excess_ratio"
        ),
    )
