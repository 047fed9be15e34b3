"""Triangle-counting operator: degree orientation must count the exact
same triangles as id orientation (the registered query's oracle-paired
variant), while provably flattening hub fan-out — the property that
makes it the 100 TB default."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F


def _edges_df(spark, pairs):
    pairs = [(int(min(a, b)), int(max(a, b))) for a, b in pairs]
    return spark.createDataFrame(sorted(set(pairs)), "a LONG, b LONG")


def _brute_triangles(pairs):
    es = {(min(a, b), max(a, b)) for a, b in pairs}
    verts = sorted({v for e in es for v in e})
    return {
        (x, y, z)
        for x, y, z in combinations(verts, 3)
        if (x, y) in es and (x, z) in es and (y, z) in es
    }


def _random_graph():
    """Deterministic pseudo-random graph, dense enough for triangles."""
    import random

    rng = random.Random(1234)
    n = 60
    pairs = {tuple(sorted(rng.sample(range(n), 2))) for _ in range(400)}
    return sorted(pairs)


def test_both_orientations_count_identical_triangles(spark):
    from cioos_siooc_data_transform_spark.operators.graphs import triangle_count

    pairs = _random_graph()
    edges = _edges_df(spark, pairs)
    by_deg = {
        r.part_key: r.n_triangles
        for r in triangle_count(edges, orientation="degree").collect()
    }
    by_id = {
        r.part_key: r.n_triangles
        for r in triangle_count(edges, orientation="id").collect()
    }
    assert by_deg == by_id
    want = {}
    for x, _, _ in _brute_triangles(pairs):
        want[x] = want.get(x, 0) + 1
    assert by_deg == want


def test_triangle_sets_identical_not_just_counts(spark):
    from cioos_siooc_data_transform_spark.operators.graphs import (
        enumerate_triangles,
        orient_edges_by_degree,
    )

    pairs = _random_graph()
    edges = _edges_df(spark, pairs)
    got = {
        (r.x, r.y, r.z)
        for r in enumerate_triangles(orient_edges_by_degree(edges)).collect()
    }
    assert got == _brute_triangles(pairs)
    # exactly-once: no triangle enumerated twice
    n = enumerate_triangles(orient_edges_by_degree(edges)).count()
    assert n == len(got)


def test_degree_orientation_flattens_hub_fanout(spark):
    """Synthetic hub graph: vertex 0 joined to 1..200 plus a sparse ring
    among the leaves. Under id orientation the hub keeps its full
    fan-out (forward-degree 200 -> 200^2/2 wedges); under degree
    orientation every hub edge points INTO the hub, so its
    forward-degree is 0 and the max forward-degree is leaf-sized. This
    is the forward-degree <= O(sqrt(|E|)) bound made visible."""
    from cioos_siooc_data_transform_spark.operators.graphs import (
        forward_degrees,
        orient_edges_by_degree,
        triangle_count,
    )

    hub = [(0, i) for i in range(1, 201)]
    ring = [(i, i + 1) for i in range(1, 200)]
    edges = _edges_df(spark, hub + ring)

    fwd_deg = {
        r.vertex: r.fwd_degree
        for r in forward_degrees(orient_edges_by_degree(edges)).collect()
    }
    assert fwd_deg.get(0, 0) == 0, "hub must have zero forward-degree"
    assert max(fwd_deg.values()) <= 3, "leaf forward-degree stays O(sqrt(E))"

    # id orientation: vertex 0 is the global min id, so it keeps all 200.
    id_fwd = (
        edges.groupBy("a").agg(F.count(F.lit(1)).alias("d")).filter(F.col("a") == 0)
    ).collect()
    assert id_fwd[0].d == 200

    # and the counts still agree with brute force (hub+ring triangles:
    # (0, i, i+1) for each ring edge -> 199 triangles, all keyed to 0).
    got = {
        r.part_key: r.n_triangles
        for r in triangle_count(edges, orientation="degree").collect()
    }
    assert got == {0: 199}


def test_copurchase_pair_support_matches_self_join(spark):
    """The round-14 collect_set pair-generation derivation must yield
    exactly the distinct+self-join pair-support relation (same pairs,
    same support counts), including duplicate item rows per order and
    singleton orders."""
    from cioos_siooc_data_transform_spark.operators.graphs import (
        copurchase_pair_support,
    )

    import random

    rng = random.Random(99)
    rows = []
    for k in range(40):
        # baskets of 1..7 items, with deliberate duplicate rows
        items = rng.sample(range(25), rng.randint(1, 7))
        for p in items:
            rows.append((k, p))
            if rng.random() < 0.3:
                rows.append((k, p))  # duplicate lineitem row
    df = spark.createDataFrame(rows, "l_orderkey LONG, l_partkey LONG")

    items = df.distinct()
    a = items.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = items.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    old = (
        a.join(b, "k")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    new = copurchase_pair_support(df)
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0
