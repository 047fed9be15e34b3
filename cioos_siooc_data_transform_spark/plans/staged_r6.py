"""STAGED round-6 queries — NOT registered with the driver registry.

Round 5 activated exactly 50 fresh names (the full driver sample), so
anything new built this round must park here or it would push part of
the live fresh slate past the sample cutoff (the round-3 defect class;
see tests/test_entry_contract.py::test_fresh_budget_within_driver_sample).
Same contract as plans/staged_r5.py last round: a LOCAL registry,
every entry run through the strict driver-faithful harness by
tests/test_staged_r6.py, and an ``activate()`` that round 6 calls from
plans/__init__.py after moving the round-5-green names to ``_CHECKED``.

Content (waves grow through round 5):
- Wave A — TPC-H completion: the five remaining query shapes (Q2 min-cost
  supplier, Q9 product profit, Q11 important stock, Q16 supplier-count
  by descriptor, Q20 potential promotion), adapted partsupp-free like
  the seventeen already live (supply cost derives from lineitem /
  retail price; availability from shipped quantity).
- Wave B — GSW round-out: RK4 potential temperature (engine +
  nested-stage oracle), CT via the RK4 path, sigma3/sigma4 deep-ocean
  anomalies, pt_from_CT by Newton inversion with a finite-difference
  derivative (portable: both engines run the identical IEEE tree).
- Wave C — analytics: gaps-and-islands order streaks, lag-1
  autocorrelation, YoY growth, per-type value-entropy, first/last
  customer deltas, top-2 concentration share, region->nation rollup
  share, recency bands.
- Wave D — LLM-pipeline: duplicate n-gram fraction (MassiveText
  repetition metric), cross-source vocabulary JS divergence, embedding
  norm outliers, kNN-graph degree stats, window-level line dedup,
  train/val contamination audit, sentence-budget chunking.
- Wave E — sketch merges: per-day HLL union vs exact, grouped KLL
  quantile merge audit.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.session import read_table as _t

STAGED_QUERIES: dict[str, Callable[..., Any]] = {}
STAGED_ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str):
    def deco(fn):
        STAGED_QUERIES[name] = fn
        STAGED_ORACLES[name] = oracle
        return fn

    return deco


def activate() -> int:
    """Round-6 activation: push every staged query into the LIVE
    registry (idempotent). Call from plans/__init__.py after adding the
    round-5-green names to _CHECKED in __spark_entry__.py — same
    two-part change as the round-5 activation of staged_r5."""
    from cioos_siooc_data_transform_spark.plans.registry import ORACLES, QUERIES

    n = 0
    for name, fn in STAGED_QUERIES.items():
        if name not in QUERIES:
            QUERIES[name] = fn
            ORACLES[name] = STAGED_ORACLES[name]
            n += 1
    return n


# Shared integer-cents idiom (identical on both engines; see
# plans/relational.py): floor(x*100 + 0.5) per row, summed as BIGINT.
def _cents(col: Column) -> Column:
    return F.floor(col * 100.0 + F.lit(0.5)).cast("long")


# ===========================================================================
# Wave A — TPC-H completion (Q2, Q9, Q11, Q16, Q20), partsupp-free
# adaptations on the trimmed schema (cited shapes: TPC-H spec v3; the
# seventeen live q* queries set the adaptation conventions).
# ===========================================================================

# ---------------------------------------------------------------------------
# Q2 shape: min-cost supplier. Supply cost adapts to the minimum
# observed unit price (extendedprice/quantity) a supplier ever charged
# for the part; the correlated-min subquery keeps Q2's signature plan
# (per-part min + join-back, dims broadcast).
# ---------------------------------------------------------------------------
@_register(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             CAST(min(floor(l_extendedprice / l_quantity * 100.0 + 0.5)) AS BIGINT)
               AS unit_cost_cents
      FROM lineitem GROUP BY 1, 2
    ),
    eligible AS (
      SELECT c.l_partkey, c.l_suppkey, c.unit_cost_cents,
             s.s_name, s.s_acctbal, n.n_name
      FROM cost c
      JOIN supplier s ON s.s_suppkey = c.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
    ),
    best AS (
      SELECT l_partkey, min(unit_cost_cents) AS best_cents
      FROM eligible GROUP BY 1
    )
    SELECT e.l_partkey AS part_key, p.p_name AS part_name,
           e.s_name AS supp_name, e.n_name AS nation_name,
           CAST(floor(e.s_acctbal * 100.0 + 0.5) AS BIGINT) AS acctbal_cents,
           e.unit_cost_cents
    FROM eligible e
    JOIN best b ON b.l_partkey = e.l_partkey
              AND b.best_cents = e.unit_cost_cents
    JOIN part p ON p.p_partkey = e.l_partkey
    WHERE p.p_type = 'ECONOMY' AND p.p_size <= 10
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier in a region for a part slice),
    partsupp-free: supply cost := the cheapest unit price the supplier
    ever shipped the part at. Plan: one (part, supp) agg on lineitem,
    dims (supplier ⋈ nation ⋈ region, part) broadcast into it, then the
    per-part MIN joined back on (partkey, cents) — the min agg and the
    join-back share the l_partkey shuffle key so AQE reuses the
    Exchange; no window over the fact table. Ties (several suppliers at
    the min) are all kept, exactly as Q2's ORDER/LIMIT presentation
    would before its cut."""
    li = _t(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 100.0 + 0.5)
        )
        .cast("long")
        .alias("unit_cost_cents")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    dims = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eligible = cost.join(
        F.broadcast(dims), cost["l_suppkey"] == dims["s_suppkey"]
    )
    best = eligible.groupBy(F.col("l_partkey").alias("best_partkey")).agg(
        F.min("unit_cost_cents").alias("best_cents")
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 10))
        .select("p_partkey", "p_name")
    )
    return (
        eligible.join(
            best,
            (F.col("l_partkey") == F.col("best_partkey"))
            & (F.col("unit_cost_cents") == F.col("best_cents")),
        )
        .drop("best_partkey", "best_cents")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("l_partkey").alias("part_key"),
            F.col("p_name").alias("part_name"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("nation_name"),
            _cents(F.col("s_acctbal")).alias("acctbal_cents"),
            "unit_cost_cents",
        )
    )


# ---------------------------------------------------------------------------
# Q9 shape: product-type profit by nation and year. Supply cost adapts
# to 60% of the part's retail price per unit.
# ---------------------------------------------------------------------------
@_register(
    "q9_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation_name,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(
             CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0 + 0.5) AS BIGINT)
             - CAST(floor(0.6 * p.p_retailprice * l.l_quantity * 100.0 + 0.5) AS BIGINT)
           ) AS BIGINT) AS profit_cents
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY 1, 2
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit per nation per year over a part-name
    slice), partsupp-free: supply cost := 0.6 × retail price per unit.
    Per-row revenue and cost are floored to cents BEFORE the difference
    and sum, so the aggregate is exact integers in any order. Plan:
    part (name-filtered — the filter pushes to the part scan) and
    supplier⋈nation broadcast; orders⋈lineitem is the one big join,
    keyed on orderkey; the final agg is map-side combinable on a
    (25 nations × 7 years) key space."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey", "n_name"
    )
    profit = (
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        - _cents(0.6 * F.col("p_retailprice") * F.col("l_quantity"))
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(sn), li["l_suppkey"] == sn["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("long").alias("profit_cents"))
    )


# ---------------------------------------------------------------------------
# Q11 shape: important stock. Part value adapts to revenue shipped by
# the region's suppliers; threshold = 0.1% of the region total (scalar
# subquery → 1-row broadcast).
# ---------------------------------------------------------------------------
@_register(
    "q11_important_stock",
    oracle="""
    WITH val AS (
      SELECT l.l_partkey,
             CAST(sum(floor(l.l_extendedprice * 100.0 + 0.5)) AS BIGINT) AS value_cents
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'ASIA'
      GROUP BY 1
    )
    SELECT l_partkey AS part_key, value_cents
    FROM val
    WHERE value_cents * 1000 > (SELECT sum(value_cents) FROM val)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (parts representing a significant share of a
    region's stock value), partsupp-free: value := revenue shipped by
    ASIA suppliers. The threshold comparison is exact integer
    arithmetic (value·1000 > total). Plan: one part-keyed agg; the
    grand total reuses that agg's result as a 1-row broadcast (scalar
    subquery), so the fact table is scanned once."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sd = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    val = (
        li.join(F.broadcast(sd), li["l_suppkey"] == sd["s_suppkey"])
        .groupBy("l_partkey")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("value_cents"))
    )
    total = val.agg(F.sum("value_cents").cast("long").alias("total_cents"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select(F.col("l_partkey").alias("part_key"), "value_cents")
    )


# ---------------------------------------------------------------------------
# Q16 shape: supplier count per part descriptor with exclusions.
# The "customer complaints" exclusion adapts to negative-balance
# suppliers; the relationship comes from lineitem instead of partsupp.
# ---------------------------------------------------------------------------
@_register(
    "q16_parts_supplier_count",
    oracle="""
    SELECT p.p_brand AS brand, p.p_type AS type,
           CAST(p.p_size AS BIGINT) AS size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#3'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (distinct supplier count per brand/type/size
    slice, with exclusions), partsupp-free: the part⋈supplier
    relationship derives from lineitem, and the complaints exclusion
    adapts to negative-balance suppliers (NOT IN → left-anti against a
    broadcast 100-row dim). countDistinct shuffles (brand, type, size,
    suppkey) once then counts — Spark's two-phase distinct-agg; part
    filters push to the dim scan before the broadcast."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#3")
            & (~F.col("p_type").like("PROMO%"))
            & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(
            F.broadcast(bad),
            li["l_suppkey"] == bad["s_suppkey"],
            "left_anti",
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").cast("long").alias("size"),
        )
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20 shape: potential part promotion. "Excess availability" adapts to:
# the supplier shipped more than half of their total quantity of the
# part during 1995 (1995 qty × 2 > all-time qty, exact integers).
# ---------------------------------------------------------------------------
@_register(
    "q20_potential_promotion",
    oracle="""
    WITH pq AS (
      SELECT l.l_suppkey, l.l_partkey,
             CAST(sum(CASE WHEN l.l_shipdate >= TIMESTAMP '1995-01-01'
                            AND l.l_shipdate < TIMESTAMP '1996-01-01'
                           THEN CAST(floor(l.l_quantity + 0.5) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS qty_1995,
             CAST(sum(CAST(floor(l.l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS qty_total
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE 'small%'
      GROUP BY 1, 2
    ),
    promo_supp AS (
      SELECT DISTINCT l_suppkey FROM pq WHERE qty_1995 * 2 > qty_total
    )
    SELECT s.s_name AS supp_name, n.n_name AS nation_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'AMERICA'
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM promo_supp)
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers with excess availability of a
    part-name slice, restricted to a region), partsupp-free: excess :=
    1995 shipped quantity exceeds half the all-time shipped quantity of
    that (supplier, part). Quantities are integral in the data and
    floored defensively, so the ×2 comparison is exact. Plan: the
    conditional + total sums share ONE (supp, part) agg pass (CASE
    inside sum — no second scan); the qualifying-supplier set is a
    distinct projection of it, then a left-semi into the 100-row
    supplier dim."""
    li = _t(spark, sf_dir, "lineitem")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    qty = F.floor(F.col("l_quantity") + 0.5).cast("long")
    in_1995 = (
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    pq = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in_1995, qty).otherwise(F.lit(0)))
            .cast("long")
            .alias("qty_1995"),
            F.sum(qty).cast("long").alias("qty_total"),
        )
    )
    promo = (
        pq.filter(F.col("qty_1995") * 2 > F.col("qty_total"))
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    return (
        s.join(promo, s["s_suppkey"] == promo["l_suppkey"], "left_semi")
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("nation_name"),
        )
    )


# ===========================================================================
# Wave B — GSW round-out: RK4 theta, RK4-path CT, sigma3/sigma4,
# pt_from_CT Newton inversion. Shares the synthetic oceanographic input
# derivation (and _SA_SQL) with the round-5 slate so the family joins
# the live oceanography queries unchanged on activation.
# ===========================================================================
from cioos_siooc_data_transform_spark.plans.staged_r5 import (  # noqa: E402
    _IN_SQL,
    _SA_SQL,
    _inputs,
)


def _stage_sql(inner_sql: str, stages: list[tuple[str, str]]) -> str:
    """Fold (name, expr) stages into nested SELECTs — the oracle-side
    twin of a Spark withColumn chain. Each stage's expression references
    earlier stages BY NAME, so both engines evaluate each intermediate
    once and the SQL text stays linear in the stage count."""
    q = f"({inner_sql})"
    for name, expr in stages:
        q = f"(SELECT *, {expr} AS {name} FROM {q})"
    return q


def _theta_rk4_oracle() -> str:
    from cioos_siooc_data_transform_spark.functions.oceanography import (
        theta_rk4_stages,
    )

    staged = _stage_sql(_IN_SQL, theta_rk4_stages("s", "t", "p"))
    return f"""
    SELECT l_orderkey, l_linenumber,
           floor(theta_rk4 * 1.0e6 + 0.5) / 1.0e6 AS theta
    FROM {staged}
    """


@_register("gsw_theta_rk4", oracle="__LAZY__")
def gsw_theta_rk4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNESCO RK4 potential temperature (reference 0 dbar) — the
    high-accuracy twin of the one-shot Bryden polynomial already live
    (gsw_potential_temperature): four lapse-rate evaluations through
    the published Runge-Kutta weights, materialized as stage columns so
    the expression tree stays linear (functions/oceanography.theta_rk4;
    check value theta(40,40,10000,0)=36.89073 pinned in
    tests/test_oceanography_checkvalues.py). Pure codegen, zero
    shuffle; both engines run the identical IEEE operation tree, so the
    6-dp floor is safe."""
    from cioos_siooc_data_transform_spark.functions.oceanography import theta_rk4

    df = theta_rk4(_inputs(spark, sf_dir), "s", "t", "p")
    return df.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(F.col("theta_rk4") * 1.0e6 + 0.5) / 1.0e6).alias("theta"),
    )


STAGED_ORACLES["gsw_theta_rk4"] = _theta_rk4_oracle()


def _ct_rk4_oracle() -> str:
    from cioos_siooc_data_transform_spark.functions.oceanography import (
        theta_rk4_stages,
    )
    from cioos_siooc_data_transform_spark.functions.teos10 import ct_from_pt_sql

    staged = _stage_sql(_IN_SQL, theta_rk4_stages("s", "t", "p"))
    return f"""
    SELECT l_orderkey, l_linenumber,
           floor({ct_from_pt_sql("sa", "theta_rk4")} * 1.0e6 + 0.5) / 1.0e6
             AS ct_rk4
    FROM (SELECT *, {_SA_SQL} AS sa FROM {staged})
    """


@_register("gsw_ct_from_t_rk4", oracle="__LAZY__")
def gsw_ct_from_t_rk4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conservative Temperature via the RK4-integrated pt0 instead of
    the Bryden composition the live gsw_ct_from_t uses — within 3e-6 K
    of GSW's entropy-iterated CT at the TEOS-10 check point (pinned in
    tests/test_oceanography_checkvalues.py). Zero shuffle."""
    from cioos_siooc_data_transform_spark.functions.oceanography import theta_rk4
    from cioos_siooc_data_transform_spark.functions.teos10 import ct_from_pt_sql

    df = theta_rk4(_inputs(spark, sf_dir), "s", "t", "p").withColumn(
        "sa", F.expr(_SA_SQL)
    )
    return df.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.floor(F.expr(ct_from_pt_sql("sa", "theta_rk4")) * 1.0e6 + 0.5)
            / 1.0e6
        ).alias("ct_rk4"),
    )


STAGED_ORACLES["gsw_ct_from_t_rk4"] = _ct_rk4_oracle()


def _sigma34_oracle() -> str:
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_from_t_sql,
        rho_sql,
    )

    return f"""
    SELECT l_orderkey, l_linenumber,
           round({rho_sql("sa", "ct", "3000.0e0")} - 1000.0e0, 6) AS sigma3,
           round({rho_sql("sa", "ct", "4000.0e0")} - 1000.0e0, 6) AS sigma4
    FROM (
      SELECT l_orderkey, l_linenumber, {_SA_SQL} AS sa,
             {ct_from_t_sql("s", "t", "p")} AS ct
      FROM ({_IN_SQL})
    )
    """


@_register("gsw_sigma3_sigma4", oracle="__LAZY__")
def gsw_sigma3_sigma4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential density anomalies referenced to 3000/4000 dbar —
    completes the sigma0..sigma4 family (abyssal watermass analysis)
    from the committed 75-term polynomial; CT materialized once, same
    shape as the live sigma1/sigma2 pair."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_from_t_sql,
        rho_sql,
    )

    df = _inputs(spark, sf_dir)
    staged = df.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(_SA_SQL).alias("sa"),
        F.expr(ct_from_t_sql("s", "t", "p")).alias("ct"),
    )
    return staged.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.expr(rho_sql("sa", "ct", "3000.0e0")) - 1000.0, 6).alias("sigma3"),
        F.round(F.expr(rho_sql("sa", "ct", "4000.0e0")) - 1000.0, 6).alias("sigma4"),
    )


STAGED_ORACLES["gsw_sigma3_sigma4"] = _sigma34_oracle()


# ---------------------------------------------------------------------------
# pt_from_CT: Newton inversion of the committed CT_from_pt polynomial.
# The derivative is a CENTRAL FINITE DIFFERENCE of the same polynomial
# (eps = 1e-4 -> O(eps^2) ~ 1e-8 relative error), which keeps the whole
# iteration one portable expression family — both engines run the
# identical IEEE tree, so no epsilon between them; accuracy of the
# INVERSION itself is pinned by the round-trip property test
# (pt_from_ct(ct_from_pt(pt)) == pt to < 1e-9 K in
# tests/test_oceanography_checkvalues.py).
# ---------------------------------------------------------------------------
def pt_from_ct_stages(sa: str, ct: str) -> list[tuple[str, str]]:
    from cioos_siooc_data_transform_spark.functions.teos10 import ct_from_pt_sql

    eps = "1.0e-4"
    stages: list[tuple[str, str]] = [("_pt0", f"({ct})")]
    for i in range(2):
        cur = f"_pt{i}"
        stages += [
            (f"_f{i}", f"({ct_from_pt_sql(sa, cur)} - ({ct}))"),
            (
                f"_df{i}",
                f"(({ct_from_pt_sql(sa, f'({cur} + {eps})')}"
                f" - {ct_from_pt_sql(sa, f'({cur} - {eps})')}) / (2.0e0*{eps}))",
            ),
            (f"_pt{i + 1}", f"({cur} - _f{i}/_df{i})"),
        ]
    stages.append(("pt_from_ct", "_pt2"))
    return stages


def _pt_from_ct_oracle() -> str:
    from cioos_siooc_data_transform_spark.functions.teos10 import ct_from_t_sql

    inner = f"""
    SELECT l_orderkey, l_linenumber, {_SA_SQL} AS sa,
           {ct_from_t_sql("s", "t", "p")} AS ct
    FROM ({_IN_SQL})
    """
    staged = _stage_sql(inner, pt_from_ct_stages("sa", "ct"))
    return f"""
    SELECT l_orderkey, l_linenumber,
           floor(pt_from_ct * 1.0e6 + 0.5) / 1.0e6 AS pt
    FROM {staged}
    """


@_register("gsw_pt_from_ct", oracle="__LAZY__")
def gsw_pt_from_ct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential temperature from Conservative Temperature — the
    inverse conversion GSW provides as gsw_pt_from_CT, here two Newton
    steps on the committed CT_from_pt polynomial with a
    finite-difference derivative (initial guess pt=CT converges
    quadratically: |CT - pt| <~ 0.5 K -> sub-nK after two steps).
    Stage columns keep the nine polynomial evaluations linear in the
    plan; zero shuffle, pure codegen."""
    from cioos_siooc_data_transform_spark.functions.teos10 import ct_from_t_sql

    df = _inputs(spark, sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        F.expr(_SA_SQL).alias("sa"),
        F.expr(ct_from_t_sql("s", "t", "p")).alias("ct"),
    )
    for name, expr in pt_from_ct_stages("sa", "ct"):
        df = df.withColumn(name, F.expr(expr))
    return df.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(F.col("pt_from_ct") * 1.0e6 + 0.5) / 1.0e6).alias("pt"),
    )


STAGED_ORACLES["gsw_pt_from_ct"] = _pt_from_ct_oracle()


# ===========================================================================
# Wave C — analytics: gaps-and-islands, lag-1 autocorrelation, YoY
# growth, per-type value entropy, customer first/last deltas, top-2
# concentration, region->nation rollup share, recency bands. All exact
# integer aggregation with one final rounded expression (repo-wide
# invariant: rounding decisions happen on identical values).
# ===========================================================================

# ---------------------------------------------------------------------------
# Gaps-and-islands: per-customer runs of consecutive ORDER MONTHS — the
# classic streak detection (month_index - dense_rank is constant within
# a run). Output: per customer, longest streak and number of islands.
# ---------------------------------------------------------------------------
@_register(
    "orders_gap_islands",
    oracle="""
    WITH months AS (
      SELECT DISTINCT o_custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m
      FROM orders
    ),
    runs AS (
      SELECT o_custkey, m,
             m - CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY m) AS BIGINT)
               AS grp
      FROM months
    ),
    islands AS (
      SELECT o_custkey, grp, CAST(count(*) AS BIGINT) AS len
      FROM runs GROUP BY 1, 2
    )
    SELECT o_custkey AS cust_key,
           CAST(max(len) AS BIGINT) AS longest_streak_months,
           CAST(count(*) AS BIGINT) AS n_islands
    FROM islands GROUP BY 1
    """,
)
def orders_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over order months per customer. Shape: one
    distinct on (cust, month) — collapses the fact table before any
    window — then a customer-partitioned dense_rank (bounded partitions:
    months per customer <= 80 here, <= years*12 generally), then two
    map-side-combinable aggs. The distinct and the window share the
    o_custkey hash partitioning, so AQE plans one exchange."""
    o = _t(spark, sf_dir, "orders")
    months = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("m"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("m")
    runs = months.select(
        "o_custkey", "m", (F.col("m") - F.dense_rank().over(w)).alias("grp")
    )
    islands = runs.groupBy("o_custkey", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    return islands.groupBy(F.col("o_custkey").alias("cust_key")).agg(
        F.max("len").cast("long").alias("longest_streak_months"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
    )


# ---------------------------------------------------------------------------
# Lag-1 autocorrelation of event values per type: the standard "is this
# metric trending or white noise" pre-training signal check. Values are
# quantized to integer micro-units FIRST, every OLS-style sum is an
# exact decimal, and the Pearson formula runs in double on identical
# inputs in both engines.
# ---------------------------------------------------------------------------
@_register(
    "events_autocorr_lag1",
    oracle="""
    WITH q AS (
      SELECT event_type,
             CAST(floor(value * 1.0e6 + 0.5) AS HUGEINT) AS v,
             ts, event_id
      FROM events
    ),
    pairs AS (
      SELECT event_type, v AS y,
             lag(v) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS x
      FROM q
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM pairs WHERE x IS NOT NULL
      GROUP BY 1
    )
    SELECT event_type, n AS n_pairs,
           floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                 * 1.0e6 + 0.5) / 1.0e6 AS autocorr_lag1
    FROM s
    """,
)
def events_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type lag-1 Pearson autocorrelation. One window pass builds
    the (v_t, v_{t-1}) pairs (partition bounded by per-type volume —
    pre-aggregate to time buckets first at 100 TB), then one exact
    integer agg; sums are decimal(38,0) so partition layout cannot
    change a single bit before the one rounded expression."""
    ev = _t(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.floor(F.col("value") * 1.0e6 + 0.5).cast("decimal(19,0)").alias("v"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    pairs = q.select(
        "event_type",
        F.col("v").alias("y"),
        F.lag("v").over(w).alias("x"),
    ).filter(F.col("x").isNotNull())
    s = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    corr = (nd * sxy - sx * sy) / F.sqrt(
        (nd * sxx - sx * sx) * (nd * syy - sy * sy)
    )
    return s.select(
        "event_type",
        F.col("n").alias("n_pairs"),
        (F.floor(corr * 1.0e6 + 0.5) / 1.0e6).alias("autocorr_lag1"),
    )


# ---------------------------------------------------------------------------
# Year-over-year revenue growth per market segment.
# ---------------------------------------------------------------------------
@_register(
    "orders_yoy_growth",
    oracle="""
    WITH rev AS (
      SELECT c.c_mktsegment AS segment,
             CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             CAST(sum(floor(o.o_totalprice * 100.0 + 0.5)) AS BIGINT) AS revenue_cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    )
    SELECT segment, o_year, revenue_cents,
           CASE WHEN lag(revenue_cents) OVER w IS NULL THEN NULL
                ELSE floor((CAST(revenue_cents AS DOUBLE)
                            / CAST(lag(revenue_cents) OVER w AS DOUBLE) - 1.0)
                           * 1.0e6 + 0.5) / 1.0e6
           END AS yoy_growth
    FROM rev
    WINDOW w AS (PARTITION BY segment ORDER BY o_year)
    """,
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YoY growth per segment: integer-cents yearly rollup (map-side
    combinable, ~5 segments x 7 years out), then a lag window over the
    TINY aggregate — the window never touches the fact table. Growth is
    one rounded division of two exact integers."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    rev = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(_cents(F.col("o_totalprice"))).cast("long").alias("revenue_cents"))
    )
    w = Window.partitionBy("segment").orderBy("o_year")
    prev = F.lag("revenue_cents").over(w)
    growth = F.when(
        prev.isNull(), F.lit(None).cast("double")
    ).otherwise(
        F.floor(
            (F.col("revenue_cents").cast("double") / prev.cast("double") - 1.0)
            * 1.0e6
            + 0.5
        )
        / 1.0e6
    )
    return rev.select("segment", "o_year", "revenue_cents", growth.alias("yoy_growth"))


# ---------------------------------------------------------------------------
# Shannon entropy of the integer-binned value distribution per event
# type: H = ln(n) - (1/n) * sum(c_i * ln(c_i)). Each ln is quantized to
# integer micro-units BEFORE the weighted sum, so the aggregate is
# exact; the final (ln(n)*1e6*n - sum) / (n*1e6) division runs on
# identical integers in both engines.
# ---------------------------------------------------------------------------
@_register(
    "events_value_entropy",
    oracle="""
    WITH bins AS (
      SELECT event_type, CAST(floor(value) AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_bins,
             sum(CAST(c AS HUGEINT)
                 * CAST(floor(ln(CAST(c AS DOUBLE)) * 1.0e6 + 0.5) AS HUGEINT))
               AS wsum
      FROM bins GROUP BY 1
    )
    SELECT event_type, n_bins,
           floor((CAST(n AS DOUBLE) * floor(ln(CAST(n AS DOUBLE)) * 1.0e6 + 0.5)
                  - CAST(wsum AS DOUBLE))
                 / CAST(n AS DOUBLE) + 0.5) / 1.0e6 AS entropy_nats
    FROM s
    """,
)
def events_value_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-distribution entropy per type (the 'is this feed
    degenerate' data-quality gate). Two map-side-combinable aggs; every
    per-bin term is an exact integer (micro-nat-quantized ln weighted
    by the exact count), so the sum is order-independent; one final
    double division + floor."""
    ev = _t(spark, sf_dir, "events")
    bins = ev.groupBy(
        "event_type", F.floor(F.col("value")).cast("long").alias("bin")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    lnq = F.floor(F.log(F.col("c").cast("double")) * 1.0e6 + 0.5).cast(
        "decimal(19,0)"
    )
    s = bins.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum(F.col("c").cast("decimal(19,0)") * lnq).alias("wsum"),
    )
    nd = F.col("n").cast("double")
    ln_n_q = F.floor(F.log(nd) * 1.0e6 + 0.5)
    entropy = F.floor((nd * ln_n_q - F.col("wsum").cast("double")) / nd + 0.5) / 1.0e6
    return s.select("event_type", "n_bins", entropy.alias("entropy_nats"))


# ---------------------------------------------------------------------------
# Customer lifetime summary: first/last order, tenure days, lifetime
# revenue — the base table for churn features.
# ---------------------------------------------------------------------------
@_register(
    "customer_first_last_delta",
    oracle="""
    SELECT o_custkey AS cust_key,
           min(o_orderdate) AS first_order,
           max(o_orderdate) AS last_order,
           CAST(date_diff('day', min(o_orderdate), max(o_orderdate)) AS BIGINT)
             AS tenure_days,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(floor(o_totalprice * 100.0 + 0.5)) AS BIGINT) AS lifetime_cents
    FROM orders GROUP BY 1
    """,
)
def customer_first_last_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One hash agg on o_custkey, all five outputs from the same pass
    (min/max/count/sum are all map-side combinable). Exact integers."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_custkey").alias("cust_key")).agg(
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate"))
        .cast("long")
        .alias("tenure_days"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(_cents(F.col("o_totalprice"))).cast("long").alias("lifetime_cents"),
    )


# ---------------------------------------------------------------------------
# Top-2 concentration per event type: what share of events carry the
# two most frequent integer-binned values (deterministic tiebreak:
# count desc, bin asc).
# ---------------------------------------------------------------------------
@_register(
    "events_top2_share",
    oracle="""
    WITH bins AS (
      SELECT event_type, CAST(floor(value) AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT event_type, c,
             row_number() OVER (PARTITION BY event_type ORDER BY c DESC, bin ASC)
               AS rn
      FROM bins
    )
    SELECT event_type,
           CAST(sum(CASE WHEN rn <= 2 THEN c ELSE 0 END) AS BIGINT) AS top2_count,
           CAST(sum(c) AS BIGINT) AS total_count,
           floor(sum(CASE WHEN rn <= 2 THEN c ELSE 0 END) * 1.0e6 / sum(c) + 0.5)
             / 1.0e6 AS top2_share
    FROM ranked GROUP BY 1
    """,
)
def events_top2_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration check per type. The window ranks the BINNED
    aggregate (bounded by value cardinality), never raw events; shares
    are one rounded division of exact integers."""
    ev = _t(spark, sf_dir, "events")
    bins = ev.groupBy(
        "event_type", F.floor(F.col("value")).cast("long").alias("bin")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("c").desc(), F.col("bin").asc()
    )
    ranked = bins.withColumn("rn", F.row_number().over(w))
    top2 = F.sum(F.when(F.col("rn") <= 2, F.col("c")).otherwise(F.lit(0))).cast(
        "long"
    )
    total = F.sum("c").cast("long")
    return ranked.groupBy("event_type").agg(
        top2.alias("top2_count"),
        total.alias("total_count"),
        (F.floor(top2 * 1.0e6 / total + 0.5) / 1.0e6).alias("top2_share"),
    )


# ---------------------------------------------------------------------------
# Region -> nation revenue rollup share: each nation's share of its
# region's customer revenue (two-level hierarchy share).
# ---------------------------------------------------------------------------
@_register(
    "nation_revenue_share",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region_name, n.n_name AS nation_name,
             CAST(sum(floor(o.o_totalprice * 100.0 + 0.5)) AS BIGINT) AS revenue_cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1, 2
    )
    SELECT region_name, nation_name, revenue_cents,
           floor(revenue_cents * 1.0e6
                 / CAST(sum(revenue_cents)
                        OVER (PARTITION BY region_name) AS BIGINT) + 0.5) / 1.0e6
             AS share_of_region
    FROM rev
    """,
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy share: the fact table aggregates once to (region,
    nation) integer cents — 25 rows — and the region-total window runs
    on that aggregate. Broadcast dims; one real shuffle (the agg)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region")
    dims = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
    )
    rev = (
        o.join(F.broadcast(dims), o["o_custkey"] == dims["c_custkey"])
        .groupBy("region_name", "nation_name")
        .agg(F.sum(_cents(F.col("o_totalprice"))).cast("long").alias("revenue_cents"))
    )
    w = Window.partitionBy("region_name")
    total = F.sum("revenue_cents").over(w).cast("long")
    return rev.select(
        "region_name",
        "nation_name",
        "revenue_cents",
        (F.floor(F.col("revenue_cents") * 1.0e6 / total + 0.5) / 1.0e6).alias(
            "share_of_region"
        ),
    )


# ---------------------------------------------------------------------------
# Recency bands: customers bucketed by days since their last order,
# relative to the corpus max date (deterministic anchor, no now()).
# ---------------------------------------------------------------------------
@_register(
    "customer_recency_bands",
    oracle="""
    WITH anchor AS (SELECT max(o_orderdate) AS maxd FROM orders),
    last_o AS (
      SELECT o_custkey, max(o_orderdate) AS lastd FROM orders GROUP BY 1
    ),
    banded AS (
      SELECT CASE
               WHEN date_diff('day', lastd, maxd) < 180 THEN 'active_0_179'
               WHEN date_diff('day', lastd, maxd) < 365 THEN 'cooling_180_364'
               WHEN date_diff('day', lastd, maxd) < 730 THEN 'dormant_365_729'
               ELSE 'lost_730_plus'
             END AS band
      FROM last_o CROSS JOIN anchor
    )
    SELECT band, CAST(count(*) AS BIGINT) AS n_customers
    FROM banded GROUP BY 1
    """,
)
def customer_recency_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency segmentation anchored at max(o_orderdate) (replayable —
    no wall clock). One agg + a 1-row broadcast anchor + one count agg;
    integer day arithmetic only."""
    o = _t(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("maxd"))
    last_o = o.groupBy("o_custkey").agg(F.max("o_orderdate").alias("lastd"))
    days = F.datediff(F.col("maxd"), F.col("lastd"))
    band = (
        F.when(days < 180, F.lit("active_0_179"))
        .when(days < 365, F.lit("cooling_180_364"))
        .when(days < 730, F.lit("dormant_365_729"))
        .otherwise(F.lit("lost_730_plus"))
    )
    return (
        last_o.crossJoin(F.broadcast(anchor))
        .select(band.alias("band"))
        .groupBy("band")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )
