"""STAGED round-12 queries — NOT registered (round-12 runway seed).

Same contract as staged_r5..r11: LOCAL registry, strict-harness pytest
coverage in tests/test_staged_r12.py, idempotent ``activate()``.
Activation order: staged_r8 (round 8) -> ... -> staged_r11 (round 11)
-> this module (round 12). Budget: len(STAGED_QUERIES) +
len(STAGED_REPLACEMENTS) <= 50 fresh names at activation.

Content so far:
- Wave A — GSW CT-derivative tranche via symbolic differentiation of
  the ct_from_pt polynomial (functions/symdiff.py): CT first/second
  derivatives, pt first derivatives (implicit inverse), entropy first
  derivatives wrt (SA, CT) by the chain rule.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.plans.staged_r11 import _stage_sql_cte
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


def activate() -> int:
    """Round-12 activation (idempotent): new names register once;
    replacements overwrite unconditionally."""
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


# ===========================================================================
# Wave A — GSW CT-derivative tranche (symbolic differentiation of the
# ct_from_pt polynomial; FD-pinned in tests). Inputs are the standard
# (SA = s·SSO/35, pt = t) synthetic grid; p-derivative surfaces use the
# entropy chain at p = 0. All per-row whole-stage-codegen expressions.
# ===========================================================================
def _ctd_inner() -> str:
    from cioos_siooc_data_transform_spark.plans.staged_r5 import (
        _IN_SQL,
        _SA_SQL,
    )

    return f"""
      SELECT l_orderkey, l_linenumber, {_SA_SQL} AS sa, t AS pt
      FROM ({_IN_SQL})
    """


def _ctd_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cioos_siooc_data_transform_spark.plans.staged_r5 import (
        _SA_SQL,
        _inputs,
    )

    return _inputs(spark, sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        F.expr(_SA_SQL).alias("sa"),
        F.col("t").alias("pt"),
    )


def _ct_first_oracle() -> str:
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_derivative_sql,
    )

    return f"""
    SELECT l_orderkey, l_linenumber,
           floor({ct_derivative_sql("sa", "pt", 1, 0)} * 1.0e9 + 0.5) / 1.0e9
             AS ct_sa,
           floor({ct_derivative_sql("sa", "pt", 0, 1)} * 1.0e9 + 0.5) / 1.0e9
             AS ct_pt
    FROM ({_ctd_inner()})
    """


@_register("gsw_ct_first_derivatives", oracle="__WAVE_A12A__")
def gsw_ct_first_derivatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """∂CT/∂SA and ∂CT/∂pt of the conservative-temperature polynomial
    (GSW twin: gsw_CT_first_derivatives) — the Jacobian every
    (SA, pt) <-> (SA, CT) coordinate change uses — as SYMBOLIC
    derivatives of the shipped ct_from_pt fit (functions/symdiff.py;
    FD-pinned in tests/test_oceanography_checkvalues.py). One shared
    literal tree per column, zero shuffle."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_derivative_sql,
    )

    df = _ctd_inputs(spark, sf_dir)
    return df.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.floor(F.expr(ct_derivative_sql("sa", "pt", 1, 0)) * 1.0e9 + 0.5)
            / 1.0e9
        ).alias("ct_sa"),
        (
            F.floor(F.expr(ct_derivative_sql("sa", "pt", 0, 1)) * 1.0e9 + 0.5)
            / 1.0e9
        ).alias("ct_pt"),
    )


STAGED_ORACLES["gsw_ct_first_derivatives"] = _ct_first_oracle()


def _ct_second_oracle() -> str:
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_derivative_sql,
    )

    return f"""
    SELECT l_orderkey, l_linenumber,
           floor({ct_derivative_sql("sa", "pt", 2, 0)} * 1.0e12 + 0.5)
             / 1.0e12 AS ct_sa_sa,
           floor({ct_derivative_sql("sa", "pt", 1, 1)} * 1.0e12 + 0.5)
             / 1.0e12 AS ct_sa_pt,
           floor({ct_derivative_sql("sa", "pt", 0, 2)} * 1.0e12 + 0.5)
             / 1.0e12 AS ct_pt_pt
    FROM ({_ctd_inner()})
    """


@_register("gsw_ct_second_derivatives", oracle="__WAVE_A12B__")
def gsw_ct_second_derivatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second derivatives CT_SA_SA, CT_SA_pt, CT_pt_pt (GSW twin:
    gsw_CT_second_derivatives) — the curvature of the CT(SA, pt)
    surface that second-order water-mass transformations consume —
    by differentiating the symbolic first derivatives AGAIN (the
    differentiator composes). FD-pinned; per-row math only."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_derivative_sql,
    )

    df = _ctd_inputs(spark, sf_dir)
    return df.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.floor(F.expr(ct_derivative_sql("sa", "pt", 2, 0)) * 1.0e12 + 0.5)
            / 1.0e12
        ).alias("ct_sa_sa"),
        (
            F.floor(F.expr(ct_derivative_sql("sa", "pt", 1, 1)) * 1.0e12 + 0.5)
            / 1.0e12
        ).alias("ct_sa_pt"),
        (
            F.floor(F.expr(ct_derivative_sql("sa", "pt", 0, 2)) * 1.0e12 + 0.5)
            / 1.0e12
        ).alias("ct_pt_pt"),
    )


STAGED_ORACLES["gsw_ct_second_derivatives"] = _ct_second_oracle()


def _pt_first_oracle() -> str:
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_derivative_sql,
    )

    ct_sa = ct_derivative_sql("sa", "pt", 1, 0)
    ct_pt = ct_derivative_sql("sa", "pt", 0, 1)
    return f"""
    SELECT l_orderkey, l_linenumber,
           floor((-({ct_sa}) / ({ct_pt})) * 1.0e9 + 0.5) / 1.0e9 AS pt_sa,
           floor((1.0e0 / ({ct_pt})) * 1.0e9 + 0.5) / 1.0e9 AS pt_ct
    FROM ({_ctd_inner()})
    """


@_register("gsw_pt_first_derivatives", oracle="__WAVE_A12C__")
def gsw_pt_first_derivatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """∂pt/∂SA at constant CT and ∂pt/∂CT (GSW twin:
    gsw_pt_first_derivatives) via the implicit inverse of the CT
    surface: pt_CT = 1/CT_pt and pt_SA = −CT_SA/CT_pt, both from the
    symbolic Jacobian — no Newton iteration needed for the DERIVATIVES
    even though pt(SA, CT) itself requires one. Evaluated on the
    (SA, pt) grid, i.e. at CT = ct_from_pt(SA, pt) (the roundtrip
    contract of the inversion family)."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_derivative_sql,
    )

    df = _ctd_inputs(spark, sf_dir)
    ct_sa = F.expr(ct_derivative_sql("sa", "pt", 1, 0))
    ct_pt = F.expr(ct_derivative_sql("sa", "pt", 0, 1))
    return df.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(-ct_sa / ct_pt * 1.0e9 + 0.5) / 1.0e9).alias("pt_sa"),
        (F.floor(F.lit(1.0) / ct_pt * 1.0e9 + 0.5) / 1.0e9).alias("pt_ct"),
    )


STAGED_ORACLES["gsw_pt_first_derivatives"] = _pt_first_oracle()


def _eta_first_oracle() -> str:
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_derivative_sql,
        entropy_sa_derivative_sql,
        entropy_t_derivative_sql,
    )

    eta_t = entropy_t_derivative_sql("sa", "pt", "0.0e0")
    eta_sa = entropy_sa_derivative_sql("sa", "pt", "0.0e0")
    ct_sa = ct_derivative_sql("sa", "pt", 1, 0)
    ct_pt = ct_derivative_sql("sa", "pt", 0, 1)
    return f"""
    SELECT l_orderkey, l_linenumber,
           floor((({eta_sa}) - ({eta_t}) * ({ct_sa}) / ({ct_pt}))
                 * 1.0e9 + 0.5) / 1.0e9 AS eta_sa_at_ct,
           floor((({eta_t}) / ({ct_pt})) * 1.0e9 + 0.5) / 1.0e9 AS eta_ct
    FROM ({_ctd_inner()})
    """


@_register("gsw_entropy_first_derivatives", oracle="__WAVE_A12D__")
def gsw_entropy_first_derivatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """∂η/∂SA at constant CT and ∂η/∂CT (GSW twin:
    gsw_entropy_first_derivatives) by the chain rule through the CT
    Jacobian: η_CT = η_pt/CT_pt and η_SA|CT = η_SA|pt −
    η_pt·CT_SA/CT_pt, every factor a symbolic derivative of a shipped
    polynomial (entropy at p = 0, ct_from_pt) — the composition that
    closes the (SA, CT) thermodynamic gradient surface without any
    hand-derived table. FD-pinned via its factors; zero shuffle."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_derivative_sql,
        entropy_sa_derivative_sql,
        entropy_t_derivative_sql,
    )

    df = _ctd_inputs(spark, sf_dir)
    eta_t = F.expr(entropy_t_derivative_sql("sa", "pt", "0.0e0"))
    eta_sa = F.expr(entropy_sa_derivative_sql("sa", "pt", "0.0e0"))
    ct_sa = F.expr(ct_derivative_sql("sa", "pt", 1, 0))
    ct_pt = F.expr(ct_derivative_sql("sa", "pt", 0, 1))
    return df.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.floor((eta_sa - eta_t * ct_sa / ct_pt) * 1.0e9 + 0.5) / 1.0e9
        ).alias("eta_sa_at_ct"),
        (F.floor(eta_t / ct_pt * 1.0e9 + 0.5) / 1.0e9).alias("eta_ct"),
    )


STAGED_ORACLES["gsw_entropy_first_derivatives"] = _eta_first_oracle()
