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
