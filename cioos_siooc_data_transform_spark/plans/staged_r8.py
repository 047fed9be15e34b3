"""STAGED round-8 queries — NOT registered (round-8 runway seed).

Same contract as staged_r5/r6/r7: LOCAL registry, strict-harness pytest
coverage in tests/test_staged_r8.py, idempotent ``activate()``. The
activation order is staged_r6 (round 6) -> staged_r7 (round 7, already
complete at 50) -> this module (round 8). Rounds 6 and 7 should keep
filling it toward 50.

Content so far:
- Wave A — multi-lag autocorrelation function (the full ACF profile,
  one window pass), pairwise language JS-divergence matrix, basket-size
  distribution with exact moments, per-brand price dispersion (CV).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.plans.staged_r6 import (
    _cents,
    pearson_r_from_sums,
)
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
    """Round-8 activation (idempotent) — same two-part change as every
    prior slate."""
    from cioos_siooc_data_transform_spark.plans.registry import ORACLES, QUERIES

    n = 0
    for name, fn in STAGED_QUERIES.items():
        if name not in QUERIES:
            QUERIES[name] = fn
            ORACLES[name] = STAGED_ORACLES[name]
            n += 1
    return n


# ---------------------------------------------------------------------------
# Full autocorrelation profile: Pearson r at lags 1..5 per event type
# from ONE window pass (five lag columns share the sort) — extends the
# live single-lag autocorr to the ACF shape seasonality hunting needs.
# ---------------------------------------------------------------------------
def _acf_oracle() -> str:
    lag_selects = ",\n             ".join(
        f"lag(v, {k}) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS x{k}"
        for k in range(1, 6)
    )
    unions = "\n      UNION ALL\n".join(
        f"""      SELECT event_type, {k} AS lag, x{k} AS x, v AS y
      FROM lagged WHERE x{k} IS NOT NULL"""
        for k in range(1, 6)
    )
    return f"""
    WITH q AS (
      SELECT event_type, ts, event_id,
             CAST(floor(value * 1.0e6 + 0.5) AS HUGEINT) AS v
      FROM events
    ),
    lagged AS (
      SELECT event_type, v,
             {lag_selects}
      FROM q
    ),
    pairs AS (
{unions}
    ),
    s AS (
      SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
      FROM pairs GROUP BY 1, 2
    )
    SELECT event_type, CAST(lag AS BIGINT) AS lag, n AS n_pairs,
           floor((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))
                 * 1.0e6 + 0.5) / 1.0e6 AS acf
    FROM s
    """


@_register("events_acf_profile", oracle="__LAZY__")
def events_acf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACF at lags 1-5 per type: five lag columns from ONE sorted
    window pass (shared Exchange + sort), stacked long, then the shared
    exact-sum Pearson finisher per (type, lag)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    q = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 1.0e6 + 0.5).cast("decimal(19,0)").alias("v"),
    )
    lagged = q.select(
        "event_type",
        "v",
        *[F.lag("v", k).over(w).alias(f"x{k}") for k in range(1, 6)],
    )
    stacked = None
    for k in range(1, 6):
        part = lagged.filter(F.col(f"x{k}").isNotNull()).select(
            "event_type",
            F.lit(k).cast("long").alias("lag"),
            F.col(f"x{k}").alias("x"),
            F.col("v").alias("y"),
        )
        stacked = part if stacked is None else stacked.unionByName(part)
    s = stacked.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return s.select(
        "event_type",
        "lag",
        F.col("n").alias("n_pairs"),
        pearson_r_from_sums().alias("acf"),
    )


STAGED_ORACLES["events_acf_profile"] = _acf_oracle()


# ---------------------------------------------------------------------------
# Pairwise JS divergence between LANGUAGE vocabulary distributions (all
# 10 pairs) — the matrix generalization of the live two-cohort source
# JS divergence; per-term contributions pico-quantized as there.
# ---------------------------------------------------------------------------
@_register(
    "lang_js_divergence_matrix",
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    c AS (
      SELECT lang, t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
    ),
    n AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
    pairs AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b FROM n a JOIN n b
      ON a.lang < b.lang
    ),
    grid AS (
      SELECT p.lang_a, p.lang_b, t.t,
             COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb,
             na.n AS na, nb.n AS nb
      FROM pairs p
      CROSS JOIN (SELECT DISTINCT t FROM c) t
      LEFT JOIN c ca ON ca.lang = p.lang_a AND ca.t = t.t
      LEFT JOIN c cb ON cb.lang = p.lang_b AND cb.t = t.t
      JOIN n na ON na.lang = p.lang_a
      JOIN n nb ON nb.lang = p.lang_b
      WHERE COALESCE(ca.c, 0) + COALESCE(cb.c, 0) > 0
    ),
    terms AS (
      SELECT lang_a, lang_b,
             CAST(floor((
               CASE WHEN ca > 0 THEN
                 0.5 * (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
                     * ln((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
                          / (0.5 * (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
                                    + CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))))
               ELSE 0.0 END
               +
               CASE WHEN cb > 0 THEN
                 0.5 * (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
                     * ln((CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
                          / (0.5 * (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
                                    + CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))))
               ELSE 0.0 END) * 1.0e12 + 0.5) AS HUGEINT) AS tq
      FROM grid
    )
    SELECT lang_a, lang_b,
           floor(CAST(sum(tq) AS DOUBLE) / 1.0e6 + 0.5) / 1.0e6 AS js_nats
    FROM terms GROUP BY 1, 2
    """,
)
def lang_js_divergence_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JS divergence for every language pair over the shared vocabulary
    grid (absent terms contribute through the present side only). One
    (lang, term) count agg; the pair grid joins against the BOUNDED
    vocab; per-term contributions pico-quantized before the
    order-independent sums."""
    docs = _t(spark, sf_dir, "documents")
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr

    tok = docs.select("lang", F.explode(words_expr(F.col("text"))).alias("t"))
    c = tok.groupBy("lang", "t").agg(F.count(F.lit(1)).cast("long").alias("c"))
    n = c.groupBy("lang").agg(F.sum("c").cast("long").alias("n"))
    na = n.select(F.col("lang").alias("lang_a"), F.col("n").alias("na"))
    nb = n.select(F.col("lang").alias("lang_b"), F.col("n").alias("nb"))
    pairs = na.crossJoin(nb).filter(F.col("lang_a") < F.col("lang_b"))
    terms_v = c.select("t").distinct()
    ca = c.select(
        F.col("lang").alias("lang_a"), F.col("t"), F.col("c").alias("ca")
    )
    cb = c.select(
        F.col("lang").alias("lang_b"), F.col("t"), F.col("c").alias("cb")
    )
    grid = (
        pairs.crossJoin(terms_v)
        .join(ca, ["lang_a", "t"], "left")
        .join(cb, ["lang_b", "t"], "left")
        .select(
            "lang_a",
            "lang_b",
            F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
            "na",
            "nb",
        )
        .filter(F.col("ca") + F.col("cb") > 0)
    )
    pa = F.col("ca").cast("double") / F.col("na").cast("double")
    pb = F.col("cb").cast("double") / F.col("nb").cast("double")
    m = 0.5 * (pa + pb)
    contrib = F.when(F.col("ca") > 0, 0.5 * pa * F.log(pa / m)).otherwise(
        F.lit(0.0)
    ) + F.when(F.col("cb") > 0, 0.5 * pb * F.log(pb / m)).otherwise(F.lit(0.0))
    terms = grid.select(
        "lang_a",
        "lang_b",
        F.floor(contrib * 1.0e12 + 0.5).cast("decimal(38,0)").alias("tq"),
    )
    return terms.groupBy("lang_a", "lang_b").agg(
        (F.floor(F.sum("tq").cast("double") / 1.0e6 + 0.5) / 1.0e6).alias(
            "js_nats"
        )
    )


# ---------------------------------------------------------------------------
# Basket-size distribution: lines-per-order histogram plus exact mean.
# ---------------------------------------------------------------------------
@_register(
    "orders_basket_size_distribution",
    oracle="""
    WITH b AS (
      SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY 1
    )
    SELECT n_lines AS basket_size,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM b GROUP BY 1
    """,
)
def orders_basket_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lines-per-order histogram (1..7 in TPC-H-shaped data) — the
    basket-analysis base rate. Two map-side-combinable aggs."""
    li = _t(spark, sf_dir, "lineitem")
    b = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("basket_size")
    )
    return b.groupBy("basket_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )


# ---------------------------------------------------------------------------
# Price dispersion per brand: coefficient of variation from exact sums.
# ---------------------------------------------------------------------------
@_register(
    "part_brand_price_dispersion",
    oracle="""
    WITH q AS (
      SELECT p_brand, CAST(floor(p_retailprice * 100.0 + 0.5) AS HUGEINT) AS v
      FROM part
    ),
    s AS (
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
             sum(v) AS s1, sum(v*v) AS s2
      FROM q GROUP BY 1
    )
    SELECT p_brand AS brand, n AS n_parts,
           CAST(floor(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)
             AS mean_cents,
           floor(sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                      - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                 / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * 1.0e6 + 0.5)
             / 1.0e6 AS coeff_variation
    FROM s
    """,
)
def part_brand_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coefficient of variation (sigma/mu) of retail price per brand —
    the scale-free dispersion gauge. One exact-sum agg per brand; the
    CV expression runs on bit-identical doubles."""
    p = _t(spark, sf_dir, "part")
    q = p.select(
        "p_brand", _cents(F.col("p_retailprice")).cast("decimal(19,0)").alias("v")
    )
    s = q.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    sd = F.sqrt(F.col("s2").cast("double") / nd - mean * mean)
    return s.select(
        F.col("p_brand").alias("brand"),
        F.col("n").alias("n_parts"),
        F.floor(mean).cast("long").alias("mean_cents"),
        (F.floor(sd / mean * 1.0e6 + 0.5) / 1.0e6).alias("coeff_variation"),
    )
