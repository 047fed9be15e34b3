"""Hand-computed anchors for the sequence-packing operators: exact fit,
overflow reset, oversized document, and chunk-boundary splitting."""

from __future__ import annotations


def _docs(spark, rows):
    # rows: (source, doc_id, n_tokens) → text with exactly n single-space words
    data = [(s, d, " ".join(["w"] * n)) for s, d, n in rows]
    return spark.createDataFrame(data, "source string, doc_id long, text string")


def test_greedy_nosplit_anchors(spark):
    from cioos_siooc_data_transform_spark.operators.packing import pack_greedy_nosplit

    rows = [
        ("a", 1, 100),  # bin 1 (fill 100)
        ("a", 2, 156),  # bin 1 (fill 256 — exact fit)
        ("a", 3, 1),    # bin 2 (would overflow)
        ("a", 4, 300),  # bin 3 (oversized → alone)
        ("a", 5, 10),   # bin 4 (previous bin over capacity)
        ("b", 1, 50),   # bin 1 (independent source)
    ]
    got = {
        (r["source"], r["doc_id"]): r["bin_id"]
        for r in pack_greedy_nosplit(_docs(spark, rows), 256).collect()
    }
    assert got == {
        ("a", 1): 1, ("a", 2): 1, ("a", 3): 2,
        ("a", 4): 3, ("a", 5): 4, ("b", 1): 1,
    }


def test_chunks_fixed_anchors(spark):
    from cioos_siooc_data_transform_spark.operators.packing import pack_chunks_fixed

    rows = [
        ("a", 1, 200),  # spans [0,200)   → chunk 0: 200
        ("a", 2, 100),  # spans [200,300) → chunk 0: 56, chunk 1: 44
        ("a", 3, 600),  # spans [300,900) → chunks 1..3: 212, 256, 132
    ]
    got = {
        (r["doc_id"], r["chunk_id"]): r["chunk_tokens"]
        for r in pack_chunks_fixed(_docs(spark, rows), 256).collect()
    }
    assert got == {
        (1, 0): 200,
        (2, 0): 56, (2, 1): 44,
        (3, 1): 212, (3, 2): 256, (3, 3): 132,
    }
    # conservation: every token lands in exactly one chunk
    assert sum(v for (_, _), v in got.items()) == 900
