"""STAGED round-13 queries — NOT registered (round-13 runway seed).

Same contract as staged_r5..r11: LOCAL registry, strict-harness pytest
coverage in tests/test_staged_r13.py, idempotent ``activate()``.
Activation order: staged_r8 (round 8) -> ... -> staged_r12 (round 12)
-> this module (round 13). Budget: len(STAGED_QUERIES) +
len(STAGED_REPLACEMENTS) <= 50 fresh names at activation.

Content so far:
- Wave A — density inversion, welfare inequality, seasonal trend,
  kNN-graph mutuality.
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
    """Round-13 activation (idempotent): new names register once;
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
# Wave A — density inversion in CT, welfare inequality, seasonal
# Mann-Kendall, kNN mutuality.
# ===========================================================================
def _ct_from_rho_stages() -> list[tuple[str, str]]:
    from cioos_siooc_data_transform_spark.functions.teos10 import rho_sql

    x = "__cfr_"
    stages: list[tuple[str, str]] = [
        # roundtrip target: rho at the grid (sa, ct, p)
        (f"{x}target", rho_sql("sa", "ct", "p")),
        (f"{x}ct0", "15.0e0"),
    ]
    for k in (1, 2, 3):
        prev = f"{x}ct{k - 1}"
        stages += [
            (f"{x}r{k}", rho_sql("sa", prev, "p")),
            (f"{x}rp{k}", rho_sql("sa", f"({prev} + 0.01e0)", "p")),
            (f"{x}rm{k}", rho_sql("sa", f"({prev} - 0.01e0)", "p")),
            (
                f"{x}ct{k}",
                f"({prev} - ({x}r{k} - {x}target)"
                f" / (({x}rp{k} - {x}rm{k}) / 0.02e0))",
            ),
        ]
    stages.append(("ct_from_rho", f"{x}ct3"))
    return stages


def _ct_from_rho_oracle() -> str:
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_from_t_sql,
    )
    from cioos_siooc_data_transform_spark.plans.staged_r5 import (
        _IN_SQL,
        _SA_SQL,
    )

    inner = f"""
      SELECT l_orderkey, l_linenumber, p, {_SA_SQL} AS sa,
             {ct_from_t_sql("s", "t", "p")} AS ct
      FROM ({_IN_SQL})
    """
    staged = _stage_sql_cte(inner, _ct_from_rho_stages())
    return f"""
    SELECT l_orderkey, l_linenumber,
           floor(ct_from_rho * 1.0e9 + 0.5) / 1.0e9 AS ct_from_rho
    FROM ({staged})
    """


@_register("gsw_ct_from_rho", oracle="__WAVE_A13A__")
def gsw_ct_from_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conservative Temperature from in-situ density (GSW twin:
    gsw_CT_from_rho): Newton on the 75-term rho(SA, CT, p) with a
    central-FD derivative (eps = 0.01 K, the sa_from_rho recipe), three
    steps from CT0 = 15 °C — drho/dCT = −rho·alpha is smaller and more
    variable than the SA slope, hence one extra step; the target rho
    comes from the forward polynomial at the grid (roundtrip contract).
    NOTE: in the warm low-density regime rho(CT) is non-monotone near
    the temperature of maximum density, but the synthetic envelope
    (CT >= ~0.3 °C, SA >= 30) stays on the monotone branch — the same
    envelope statement the other inversions carry. Twelve small Horner
    evaluations, zero shuffle."""
    from cioos_siooc_data_transform_spark.functions.teos10 import (
        ct_from_t_sql,
    )
    from cioos_siooc_data_transform_spark.plans.staged_r5 import (
        _SA_SQL,
        _inputs,
    )

    df = _inputs(spark, sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        "p",
        F.expr(_SA_SQL).alias("sa"),
        F.expr(ct_from_t_sql("s", "t", "p")).alias("ct"),
    )
    for name, expr in _ct_from_rho_stages():
        df = df.withColumn(name, F.expr(expr))
    return df.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(F.col("ct_from_rho") * 1.0e9 + 0.5) / 1.0e9).alias(
            "ct_from_rho"
        ),
    )


STAGED_ORACLES["gsw_ct_from_rho"] = _ct_from_rho_oracle()


@_register(
    "customer_spend_atkinson_index",
    oracle="""
    WITH s AS (
      SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS HUGEINT) AS cents
      FROM orders GROUP BY 1
    ),
    a AS (
      SELECT CAST(count(*) AS HUGEINT) AS n, sum(cents) AS tot,
             CAST(sum(CAST(floor(ln(CAST(cents AS DOUBLE)) * 1.0e9 + 0.5)
                           AS HUGEINT)) AS DOUBLE) / 1.0e9 AS sum_ln
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           floor(CAST(tot AS DOUBLE) / CAST(n AS DOUBLE) / 100.0e0 * 1.0e2
                 + 0.5) / 1.0e2 AS mean_spend_dollars,
           floor(exp(sum_ln / CAST(n AS DOUBLE)) / 100.0e0 * 1.0e2 + 0.5)
             / 1.0e2 AS geomean_spend_dollars,
           floor((1.0e0 - exp(sum_ln / CAST(n AS DOUBLE))
                  / (CAST(tot AS DOUBLE) / CAST(n AS DOUBLE)))
                 * 1.0e6 + 0.5) / 1.0e6 AS atkinson_eps1
    FROM a
    """,
)
def customer_spend_atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality index at inequality-aversion ε = 1:
    A = 1 − geomean/mean of per-customer total spend — the welfare-
    economics member of the inequality battery (Gini weights transfers
    uniformly, Theil is entropy-based, Atkinson makes the social
    trade-off explicit: A = 0.3 means society would give up 30% of
    total spend for perfect equality). Per-customer ln(spend) quantizes
    to 1e-9 before the exact sum (the geomean is exp of an exact-sum
    mean). Spend > 0 by construction (every customer has >= 1 priced
    order)."""
    o = _t(spark, sf_dir, "orders")
    s = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long"))
        .cast("decimal(38,0)")
        .alias("cents")
    )
    a = s.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("cents").alias("tot"),
        (
            F.sum(
                F.floor(F.log(F.col("cents").cast("double")) * 1.0e9 + 0.5)
                .cast("decimal(38,0)")
            ).cast("double")
            / 1.0e9
        ).alias("sum_ln"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("tot").cast("double") / nd
    geo = F.exp(F.col("sum_ln") / nd)
    return a.select(
        F.col("n").cast("long").alias("n_customers"),
        (F.floor(mean / 100.0 * 1.0e2 + 0.5) / 1.0e2).alias(
            "mean_spend_dollars"
        ),
        (F.floor(geo / 100.0 * 1.0e2 + 0.5) / 1.0e2).alias(
            "geomean_spend_dollars"
        ),
        (F.floor((F.lit(1.0) - geo / mean) * 1.0e6 + 0.5) / 1.0e6).alias(
            "atkinson_eps1"
        ),
    )


@_register(
    "orders_seasonal_mann_kendall",
    oracle="""
    WITH m AS (
      SELECT year(o_orderdate) AS yr, month(o_orderdate) AS moy,
             CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.moy,
             CASE WHEN b.rev > a.rev THEN 1
                  WHEN b.rev < a.rev THEN -1 ELSE 0 END AS sgn
      FROM m a JOIN m b ON a.moy = b.moy AND a.yr < b.yr
    ),
    per AS (
      SELECT moy, CAST(sum(sgn) AS BIGINT) AS s_m,
             CAST(count(*) AS BIGINT) AS n_pairs,
             (SELECT CAST(count(*) AS DOUBLE) FROM m mm
              WHERE mm.moy = pairs.moy) AS n_m
      FROM pairs GROUP BY moy
    ),
    t AS (
      SELECT CAST(sum(s_m) AS BIGINT) AS s,
             sum(n_m * (n_m - 1.0e0) * (2.0e0 * n_m + 5.0e0) / 18.0e0)
               AS var_s,
             CAST(sum(n_pairs) AS BIGINT) AS n_pairs
      FROM per
    )
    SELECT s AS mk_s, n_pairs,
           floor(var_s * 1.0e3 + 0.5) / 1.0e3 AS var_s,
           floor((CASE WHEN s > 0 THEN s - 1.0e0
                       WHEN s < 0 THEN s + 1.0e0 ELSE 0.0e0 END)
                 / sqrt(var_s) * 1.0e6 + 0.5) / 1.0e6 AS z_stat
    FROM t
    """,
)
def orders_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann–Kendall trend test (Hirsch & Slack 1984): the MK S
    statistic computed WITHIN each month-of-year series (so the annual
    cycle cannot masquerade as trend) and summed, with the no-ties
    variance Σ n(n−1)(2n+5)/18 and the continuity-corrected z — the
    nonparametric trend test hydrology standardized on, complementing
    Theil–Sen (which estimates the slope this tests). Pairwise sign
    comparisons are within-month across years: quadratic in YEARS, not
    rows; all counts exact."""
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("moy")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long"))
        .cast("long")
        .alias("rev")
    )
    a = m.select("moy", F.col("yr").alias("ya"), F.col("rev").alias("ra"))
    b = m.select(
        F.col("moy").alias("moy2"), F.col("yr").alias("yb"), F.col("rev").alias("rb")
    )
    pairs = a.join(
        b, (F.col("moy") == F.col("moy2")) & (F.col("ya") < F.col("yb"))
    ).select(
        "moy",
        F.when(F.col("rb") > F.col("ra"), 1)
        .when(F.col("rb") < F.col("ra"), -1)
        .otherwise(0)
        .alias("sgn"),
    )
    nm = m.groupBy("moy").agg(F.count(F.lit(1)).cast("double").alias("n_m"))
    per = (
        pairs.groupBy("moy")
        .agg(
            F.sum("sgn").cast("long").alias("s_m"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
        )
        .join(F.broadcast(nm), "moy")
    )
    t = per.agg(
        F.sum("s_m").cast("long").alias("s"),
        F.sum(
            F.col("n_m")
            * (F.col("n_m") - F.lit(1.0))
            * (F.lit(2.0) * F.col("n_m") + F.lit(5.0))
            / F.lit(18.0)
        ).alias("var_s"),
        F.sum("n_pairs").cast("long").alias("n_pairs"),
    )
    s = F.col("s")
    corr = (
        F.when(s > 0, s - F.lit(1.0))
        .when(s < 0, s + F.lit(1.0))
        .otherwise(F.lit(0.0))
    )
    return t.select(
        s.alias("mk_s"),
        "n_pairs",
        (F.floor(F.col("var_s") * 1.0e3 + 0.5) / 1.0e3).alias("var_s"),
        (
            F.floor(corr / F.sqrt(F.col("var_s")) * 1.0e6 + 0.5) / 1.0e6
        ).alias("z_stat"),
    )


@_register(
    "embedding_knn_mutuality",
    oracle="""
    WITH sub AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id < 500
    ),
    nn AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(q.v, c.v), 4) DESC,
                          c.vec_id ASC
               ) AS rank
        FROM sub q, sub c WHERE c.vec_id != q.vec_id
      ) WHERE rank <= 10
    ),
    mut AS (
      SELECT a.query_id, a.neighbor_id
      FROM nn a JOIN nn b
        ON a.query_id = b.neighbor_id AND a.neighbor_id = b.query_id
    ),
    t AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM nn) AS n_edges,
             (SELECT CAST(count(*) AS BIGINT) FROM mut) AS n_mutual
    )
    SELECT n_edges, n_mutual,
           floor(CAST(n_mutual AS DOUBLE) / n_edges * 1.0e6 + 0.5) / 1.0e6
             AS mutuality_rate
    FROM t
    """,
)
def embedding_knn_mutuality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutuality rate of the 10-NN graph: the share of directed kNN
    edges whose reverse edge also exists — low mutuality is the other
    face of hubness (hubs are everyone's neighbor but reciprocate
    almost no one) and decides whether a mutual-kNN graph (the standard
    denoising for clustering/UMAP-style pipelines) keeps enough edges
    to stay connected. Same bounded probe subset and engine-stable
    neighbor contract as the hubness audit; the mutual check is one
    self equi-join on reversed keys."""
    from cioos_siooc_data_transform_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    sub = emb.filter(F.col("vec_id") < 500)
    nn = brute_force_topk(sub, sub, k=10, round_dp=4).select(
        "query_id", "neighbor_id"
    )
    rev = nn.select(
        F.col("neighbor_id").alias("query_id"),
        F.col("query_id").alias("neighbor_id"),
    )
    mut = nn.join(rev, ["query_id", "neighbor_id"])
    ne = nn.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    nm = mut.agg(F.count(F.lit(1)).cast("long").alias("n_mutual"))
    return ne.crossJoin(F.broadcast(nm)).select(
        "n_edges",
        "n_mutual",
        (
            F.floor(
                F.col("n_mutual").cast("double") / F.col("n_edges") * 1.0e6
                + 0.5
            )
            / 1.0e6
        ).alias("mutuality_rate"),
    )
