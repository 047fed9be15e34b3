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
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
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
