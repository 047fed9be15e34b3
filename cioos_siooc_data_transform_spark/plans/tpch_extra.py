"""TPC-H relational-completeness tranche (round 4).

The remaining TPC-H query shapes expressible over the testdata's trimmed
schemas (no partsupp table; no l_commitdate/l_receiptdate/l_shipmode,
p_container, c_phone, o_comment columns) — each query keeps the
standard plan shape (the part the engine is graded on: correlated
EXISTS → semi join, NOT EXISTS → anti join, scalar subqueries →
broadcast aggregates, disjunctive pushdown) with predicates adapted to
the columns that exist; every adaptation is noted on the query.

Scale notes per query are on the docstrings: nation/region are
broadcast dims at any scale; part scales with SF so its joins are left
to AQE; every aggregate is map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.plans.registry import register
from cioos_siooc_data_transform_spark.session import read_table as _t

_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "q4_priority_late",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o_orderpriority
    """,
)
def q4_priority_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): correlated EXISTS with
    an inequality on the correlated row → LEFT SEMI join on (key,
    inequality). Adaptation: 'l_commitdate < l_receiptdate' (columns
    absent) becomes 'l_shipdate > o_orderdate' — same correlated-
    inequality plan. Semi join never duplicates orders rows; the agg is
    a tiny 5-group map-side combine."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(CAST(floor(volume * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0 AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
             {_REV} AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping between two nations, by year). The two
    nation dims are broadcast (25 rows at any SF); the nation-pair
    disjunction prunes AFTER the cheap broadcast joins, so the fact
    tables shuffle only on their join keys. Four shuffles of real work
    (l⋈o, ⋈c, two broadcasts free, final agg)."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"),
                              F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"),
                              F.col("n_name").alias("cust_nation")))
    joined = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            (
                F.sum(F.floor(F.col("volume") * 100.0 + 0.5).cast("long"))
                .cast("double")
                / 100.0
            ).alias("revenue")
        )
    )


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3'
                          THEN CAST(floor(volume * 100.0 + 0.5) AS BIGINT)
                          ELSE 0 END)
                 / sum(CAST(floor(volume * 100.0 + 0.5) AS BIGINT)), 6)
             AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             {_REV} AS volume, n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
    )
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): a supplier nation's share of a
    region's order volume for one part type, by year — conditional
    aggregation over a 7-table join. nation/region broadcast; the part
    filter prunes the probe side before the fact joins (predicate
    pushdown visible in the scan). Adaptation: p_type values are
    single-word here ('PROMO'), date window dropped (all years kept —
    more output rows, same plan)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), "n_regionkey")
    n2 = F.broadcast(
        n.select(F.col("n_nationkey").alias("s_nk"),
                 F.col("n_name").alias("supp_nation"))
    )
    joined = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("s_nk"))
    )
    vol = joined.select(
        F.year("o_orderdate").cast("long").alias("o_year"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        "supp_nation",
    )
    cents = F.floor(F.col("volume") * 100.0 + 0.5).cast("long")
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", cents).otherwise(0))
            / F.sum(cents),
            6,
        ).alias("mkt_share")
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM (
      SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
             CAST(sum(CAST(floor({_REV} * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    )
    ORDER BY rev_cents DESC, c_custkey ASC LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    lost to returns in one quarter. The quarter + returnflag filters
    push to the scans; TakeOrderedAndProject does per-partition top-k
    (k·partitions rows to the driver, never the full agg). Tie-break on
    c_custkey makes the LIMIT deterministic on both engines. Revenue is
    summed as integer CENTS (each line's revenue floor-rounded to a
    BIGINT first): float sums are addition-order-dependent across
    engines, and at sf0.01 one group already landed on a 2-dp rounding
    boundary — integer summation is order-independent and exact."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0 + 0.5
    ).cast("long")
    agg = (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(n, c["c_nationkey"] == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(cents).cast("long").alias("rev_cents"))
    )
    return (
        agg.orderBy(F.col("rev_cents").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            (F.col("rev_cents").cast("double") / 100.0).alias("revenue"),
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
    )


@register(
    "q12_late_shipments",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE date_diff('day', o.o_orderdate, l.l_shipdate) > 60
    GROUP BY l_linestatus
    """,
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority counts): conditional
    priority counting over late lines. Adaptation: l_shipmode/
    l_receiptdate are absent — 'late' is shipdate > 60 days after the
    order date, grouped by l_linestatus. The CASE sums are integer
    map-side combinable; DuckDB's HUGEINT sums cast to BIGINT (the
    driver-canon rule the oracle lint enforces)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .filter(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): LEFT OUTER join
    with a join-time predicate (NOT a post-filter — customers with no
    qualifying orders must survive with count 0), then a second
    aggregation over the counts. Adaptation: the o_comment NOT LIKE
    filter becomes an o_orderpriority exclusion (same join-time-
    predicate plan). Two shuffles: by custkey, then by c_count."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT round(
             100.0 * sum(CASE WHEN p_type = 'PROMO'
                  THEN CAST(floor({_REV} * 100.0 + 0.5) AS BIGINT)
                  ELSE 0 END)
               / sum(CAST(floor({_REV} * 100.0 + 0.5) AS BIGINT)),
             6) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): promo share of one month's revenue.
    Single conditional-aggregation pass; the month filter prunes the
    lineitem scan to ~1/84 of rows before the part join (pushdown
    visible as PushedFilters). Adaptation: p_type equality ('PROMO' is a
    whole word here) instead of LIKE 'PROMO%'."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0 + 0.5
    ).cast("long")
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(0))
                / F.sum(cents),
                6,
            ).alias("promo_revenue")
        )
    )


@register(
    "q17_small_quantity",
    oracle="""
    SELECT round(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                 / 700.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey, sum(l_quantity) AS sum_qty, count(*) AS cnt_qty
      FROM lineitem GROUP BY l_partkey
    ) t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity * 5.0 * t.cnt_qty < t.sum_qty
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): the correlated scalar
    subquery 'quantity < 0.2·avg(quantity) of this part' decorrelates
    into a per-part aggregate joined back — one extra agg-shuffle
    instead of a per-row subquery. Adaptation: p_container absent, the
    brand filter alone selects the part subset."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    # quantity < 0.2*avg(quantity) cross-multiplied to 5*q*cnt <
    # sum(q): quantities are integer-valued, so both sides are EXACT
    # (order-independent) and boundary membership cannot flip with the
    # engines' float summation order — the class of defect the round-2
    # driver canonicalization hunt established as policy.
    cuts = li.groupBy(F.col("l_partkey").alias("cut_pk")).agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt_qty"),
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(cuts, li["l_partkey"] == F.col("cut_pk"))
        .filter(F.col("l_quantity") * 5.0 * F.col("cnt_qty") < F.col("sum_qty"))
        .agg(
            F.round(
                F.sum(
                    F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
                )
                / 700.0,
                2,
            ).alias("avg_yearly")
        )
    )


@register(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT CAST(sum(CAST(floor({_REV} * 100.0 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3'  AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): disjunction of correlated
    (brand, quantity-range) predicates across the join — the classic
    test that an OR of conjunctions still prunes both scans (each side's
    implied domain — brands on part, quantity on lineitem — pushes
    down). Adaptation: container/shipinstruct legs absent."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(p, li["l_partkey"] == p["p_partkey"])
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30))
    )
    return j.filter(cond).agg(
        (
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
                    + 0.5
                ).cast("long")
            ).cast("double")
            / 100.0
        ).alias("revenue")
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, numwait FROM (
      SELECT s.s_name, count(*) AS numwait
      FROM supplier s
      JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      JOIN orders o ON o.o_orderkey = l1.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND date_diff('day', o.o_orderdate, l1.l_shipdate) > 60
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
        )
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND date_diff('day', o3.o_orderdate, l3.l_shipdate) > 60
        )
      GROUP BY s.s_name
    )
    ORDER BY numwait DESC, s_name ASC LIMIT 10
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): the only supplier
    whose line shipped late on a finished multi-supplier order — an
    EXISTS (another supplier participated) stacked with a NOT EXISTS (no
    OTHER supplier was also late), i.e. a semi join AND an anti join
    against the same fact table with different predicates. Adaptation:
    receipt/commit dates absent — 'late' is shipdate > 60 days after
    the order date (the o3 join re-derives each line's order date)."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    late1 = (
        li.join(o.filter(F.col("o_orderstatus") == "F"),
                li["l_orderkey"] == o["o_orderkey"])
        .filter(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60)
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    with_other = late1.join(
        others,
        (F.col("l_orderkey") == F.col("ok2")) & (F.col("l_suppkey") != F.col("sk2")),
        "left_semi",
    )
    late_all = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60)
        .select(F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3"))
    )
    sole_late = with_other.join(
        late_all,
        (F.col("l_orderkey") == F.col("ok3")) & (F.col("l_suppkey") != F.col("sk3")),
        "left_anti",
    )
    agg = (
        sole_late.join(s, F.col("l_suppkey") == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return agg.orderBy(F.col("numwait").desc(), F.col("s_name").asc()).limit(10)


@register(
    "q22_dormant_customers",
    oracle="""
    SELECT c_nationkey, count(*) AS numcust,
           CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      )
    GROUP BY c_nationkey
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): rich customers who never
    ordered — an uncorrelated scalar subquery (the positive-balance
    average, a 1-row broadcast) plus NOT EXISTS → LEFT ANTI join on the
    orders table. Adaptation: c_phone country codes absent, grouped by
    c_nationkey instead (same plan: filter → anti join → agg)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("cut")
    )
    rich = c.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("cut"))
    dormant = rich.join(o, rich["c_custkey"] == o["o_custkey"], "left_anti")
    return dormant.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        (
            F.sum(F.floor(F.col("c_acctbal") * 100.0 + 0.5).cast("long"))
            .cast("double")
            / 100.0
        ).alias("totacctbal"),
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(floor({_REV} * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS total_revenue_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue_cents
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue_cents = (SELECT max(total_revenue_cents) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the revenue CTE is reused twice — once
    as the join input and once under a scalar MAX — which Spark plans as
    one shuffle agg plus a 1-row broadcast against it (the classic
    view-reuse + scalar-subquery shape; partsupp-free, so expressible on
    the trimmed schema). Revenue is canonicalized to integer cents with
    the shared floor idiom BEFORE the max-equality so tie membership is
    decided on the exact hashed value, not a float ulp. Scale: the
    window filter pushes to the parquet scan; the per-supplier agg is
    map-side combinable on a uniform key; the MAX side is a 1-row
    broadcast, so the only real shuffle is the revenue groupBy."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
                    + 0.5
                ).cast("long")
            )
            .cast("long")
            .alias("total_revenue_cents")
        )
    )
    top = rev.agg(F.max("total_revenue_cents").alias("max_cents"))
    return (
        s.join(rev, s["s_suppkey"] == rev["supplier_no"])
        .join(F.broadcast(top))
        .filter(F.col("total_revenue_cents") == F.col("max_cents"))
        .select("s_suppkey", "s_name", "total_revenue_cents")
    )
