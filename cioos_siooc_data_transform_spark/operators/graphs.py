"""Graph operators (beyond-reference scope): triangle counting with
selectable edge orientation.

The registered ``graph_triangle_count`` query (plans/analytics.py) keeps
the id-oriented a<b<c enumeration because its DuckDB oracle mirrors it
literally. This module is the operator-level surface with the 100 TB
default: (degree, id) edge orientation — the compact-forward refinement
(Chiba–Nishizeki / Latapy) that provably caps every vertex's
forward-degree at O(sqrt(|E|)), because a vertex with forward-degree d
points only at neighbours of degree >= its own, and there can be at most
2*sqrt(|E|) vertices of degree >= sqrt(|E|).

Why it matters at scale: the two-hop wedge join materializes
sum(forward_degree^2) candidate wedges. With raw-id orientation a
low-id hub keeps its full fan-out (degree^2 wedges — the skew killer);
with degree orientation every hub's edges point INTO it, so the hub
generates zero wedges and the global wedge count is bounded by
|E|^(3/2) — the optimal triangle-enumeration work bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from cioos_siooc_data_transform_spark.session import checkpoint_df


def copurchase_pair_support(
    items: DataFrame,
    order_col: str = "l_orderkey",
    part_col: str = "l_partkey",
) -> DataFrame:
    """(pa, pb, support) for every unordered part pair co-occurring in
    at least one order, pa < pb, support = number of distinct orders
    containing both.

    Round-14 form (guide §2.4 — remove the shuffle): ONE shuffle
    assembles each order's distinct part set (``collect_set`` — the
    combiner dedups map-side, so sorted-by-order parquet collapses to
    ~1 row/order before the exchange), pairs are generated IN-ARRAY
    with higher-order functions (no self-join, no second scan-side
    exchange), and the pair count stays the same combiner-friendly
    hash agg. Replaces distinct + self-join + pair agg: 3 Exchanges
    and a sort-merge join -> 2 Exchanges, no join. Equivalence:
    ``sort_array(collect_set(p))`` = the order's distinct parts
    ascending, and element i paired with every later element is
    exactly the pa < pb pair set of the old distinct+self-join
    (exceptAll both ways = 0 at sf0.001/0.01/0.1).

    Scale note: baskets are bounded (TPC-H orders hold <= 7 items; any
    100 TB co-occurrence job caps basket size first — the LSH
    mega-bucket guard), so the per-order array and its pair fan-out
    are O(1) and the pair aggregation keys stay uniform."""
    arrs = items.groupBy(order_col).agg(
        F.sort_array(F.collect_set(part_col)).alias("__ps")
    )
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col("__ps"),
                lambda x, i: F.transform(
                    F.slice(F.col("__ps"), i + F.lit(2), F.size(F.col("__ps"))),
                    lambda y: F.struct(x.alias("pa"), y.alias("pb")),
                ),
            )
        )
    )
    return (
        arrs.select(pair.alias("__p"))
        .select("__p.pa", "__p.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support"))
    )


def vertex_degrees(edges: DataFrame, src: str = "a", dst: str = "b") -> DataFrame:
    """(vertex, degree) over an undirected edge set given as one row per
    edge (either direction, no duplicates). One explode + one
    map-side-combinable count agg."""
    return (
        edges.select(F.explode(F.array(F.col(src), F.col(dst))).alias("vertex"))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )


def orient_edges_by_degree(
    edges: DataFrame, src: str = "a", dst: str = "b"
) -> DataFrame:
    """Re-orient each undirected edge from its lower-(degree, id)
    endpoint to its higher one. Returns (src, dst) with the invariant
    rank(src) < rank(dst) where rank = (degree, id) — total order, so
    the orientation is deterministic and acyclic.

    Two hash joins against the degree table (a vertex-count-sized dim —
    broadcast when it fits, which at 100 TB it often does not; either
    way both joins are equi-keyed shuffles, never quadratic)."""
    deg = vertex_degrees(edges, src, dst)
    da = deg.select(F.col("vertex").alias(src), F.col("degree").alias("_da"))
    db = deg.select(F.col("vertex").alias(dst), F.col("degree").alias("_db"))
    j = edges.join(da, src).join(db, dst)
    fwd = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col(src) < F.col(dst))
    )
    return j.select(
        F.when(fwd, F.col(src)).otherwise(F.col(dst)).alias(src),
        F.when(fwd, F.col(dst)).otherwise(F.col(src)).alias(dst),
    )


def forward_degrees(oriented: DataFrame, src: str = "a") -> DataFrame:
    """(vertex, fwd_degree) of an oriented edge set — the quantity whose
    square bounds per-vertex wedge work in the two-hop join."""
    return oriented.groupBy(F.col(src).alias("vertex")).agg(
        F.count(F.lit(1)).cast("long").alias("fwd_degree")
    )


def enumerate_triangles(
    oriented: DataFrame, src: str = "a", dst: str = "b"
) -> DataFrame:
    """Each triangle exactly once from an acyclically oriented edge set:
    e(u,v) |><| e(v,w) closes with e(u,w) (every triangle has exactly one
    vertex with two out-edges under a total-order orientation). Returns
    canonical id-sorted (x, y, z), x < y < z, regardless of how the
    edges were oriented. Three equi-joins, edge set localCheckpointed
    once (eager=False: lineage truncation without executing the edge
    job at plan-build time)."""
    e = checkpoint_df(oriented.select(src, dst), eager=False)
    e1 = e
    e2 = e.select(F.col(src).alias("_v"), F.col(dst).alias("_w"))
    e3 = e.select(F.col(src).alias("_u3"), F.col(dst).alias("_w3"))
    tri = (
        e1.join(e2, e1[dst] == e2["_v"])
        .join(e3, (F.col(src) == F.col("_u3")) & (F.col("_w") == F.col("_w3")))
        .select(F.col(src).alias("_u"), F.col(dst).alias("_vv"), F.col("_w"))
    )
    ids = F.array_sort(F.array("_u", "_vv", "_w"))
    return tri.select(
        ids[0].alias("x"), ids[1].alias("y"), ids[2].alias("z")
    )


def triangle_count(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    orientation: str = "degree",
) -> DataFrame:
    """Per-vertex triangle counts (keyed by each triangle's MIN-id
    vertex, matching the registered query's output contract) over an
    undirected edge set.

    orientation='degree' (default) re-orients edges by (degree, id)
    before the wedge join — the scale-safe path; orientation='id'
    reproduces the registered query's a<b<c enumeration (its oracle
    twin). Both enumerate the identical triangle set (property-pinned
    in tests/test_graphs.py); only the join workload distribution
    differs."""
    if orientation == "degree":
        oriented = orient_edges_by_degree(edges, src, dst)
    elif orientation == "id":
        oriented = edges.select(
            F.least(F.col(src), F.col(dst)).alias(src),
            F.greatest(F.col(src), F.col(dst)).alias(dst),
        )
    else:
        raise ValueError(f"orientation must be 'degree' or 'id': {orientation!r}")
    tri = enumerate_triangles(oriented, src, dst)
    return tri.groupBy(F.col("x").alias("part_key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
