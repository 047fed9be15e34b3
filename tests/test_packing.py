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


def test_packing_invariants_random(spark):
    """Random corpora: chunk packing conserves every token exactly once
    with no chunk over capacity; greedy packing never overfills a bin
    (except a single oversized doc alone) and assigns bins contiguously
    in doc order."""
    import random

    from cioos_siooc_data_transform_spark.operators.packing import (
        pack_chunks_fixed,
        pack_greedy_nosplit,
    )

    rng = random.Random(11)
    cap = 64
    rows = []
    for src in ("a", "b", "c"):
        for d in range(40):
            rows.append((src, d, rng.randint(1, 100)))  # some docs > cap
    docs = _docs(spark, rows)
    tokens = {(s, d): n for s, d, n in rows}

    chunks = pack_chunks_fixed(docs, cap).collect()
    per_doc = {}
    for r in chunks:
        assert 1 <= r["chunk_tokens"] <= cap
        per_doc[(r["source"], r["doc_id"])] = per_doc.get(
            (r["source"], r["doc_id"]), 0
        ) + r["chunk_tokens"]
    assert per_doc == tokens  # conservation, nothing lost or duplicated

    packed = pack_greedy_nosplit(docs, cap).collect()
    fills = {}
    for r in packed:
        key = (r["source"], r["bin_id"])
        fills.setdefault(key, []).append((r["doc_id"], r["tokens"]))
    for (src, bin_id), members in fills.items():
        total = sum(t for _, t in members)
        if total > cap:
            assert len(members) == 1  # only an oversized doc may overflow
    # bins contiguous & non-decreasing in doc order per source
    for src in ("a", "b", "c"):
        seq = sorted(
            ((r["doc_id"], r["bin_id"]) for r in packed if r["source"] == src)
        )
        bins = [b for _, b in seq]
        assert bins[0] == 1
        assert all(0 <= b2 - b1 <= 1 for b1, b2 in zip(bins, bins[1:]))


def test_greedy_nosplit_subsharded_mega_source(spark):
    """shard_rows sub-shards a deliberately-huge single source so no
    applyInPandas group ever sees more than ~shard_rows rows, while the
    output keeps every packing invariant: all docs assigned exactly once,
    bin ids one contiguous 1-based sequence per source, no bin overfilled
    (except an oversized doc alone), bins non-decreasing in doc order,
    and bins never span a shard boundary. A small source alongside keeps
    the exact unsharded semantics (guard fires only above shard_rows)."""
    import random

    from cioos_siooc_data_transform_spark.operators.packing import (
        pack_greedy_nosplit,
    )

    rng = random.Random(7)
    cap, shard_rows = 64, 500
    rows = [("mega", d, rng.randint(1, 100)) for d in range(3000)]
    rows += [("small", d, rng.randint(1, 40)) for d in range(20)]
    docs = _docs(spark, rows)

    packed = pack_greedy_nosplit(docs, cap, shard_rows=shard_rows).collect()
    assert len(packed) == len(rows)  # every doc exactly once
    assert {(r["source"], r["doc_id"]) for r in packed} == {
        (s, d) for s, d, _ in rows
    }

    for src, n_docs in (("mega", 3000), ("small", 20)):
        seq = sorted(
            (r["doc_id"], r["bin_id"], r["tokens"])
            for r in packed
            if r["source"] == src
        )
        bins = [b for _, b, _ in seq]
        assert bins[0] == 1
        assert all(0 <= b2 - b1 <= 1 for b1, b2 in zip(bins, bins[1:]))
        fills = {}
        for _, b, t in seq:
            fills[b] = fills.get(b, 0) + t
        counts = {}
        for _, b, _ in seq:
            counts[b] = counts.get(b, 0) + 1
        for b, total in fills.items():
            if total > cap:
                assert counts[b] == 1
        if src == "mega":
            # no bin spans a doc_id DIV shard_rows boundary
            shard_of_bin = {}
            for d, b, _ in seq:
                shard_of_bin.setdefault(b, set()).add(d // shard_rows)
            assert all(len(s) == 1 for s in shard_of_bin.values())

    # small source must match the unsharded output exactly
    unsharded = {
        (r["doc_id"]): r["bin_id"]
        for r in pack_greedy_nosplit(
            docs.filter("source = 'small'"), cap
        ).collect()
    }
    sharded_small = {
        r["doc_id"]: r["bin_id"] for r in packed if r["source"] == "small"
    }
    assert sharded_small == unsharded


def test_greedy_nosplit_sharding_is_rank_based_not_id_based(spark):
    """Sparse, offset doc_ids (stride 1000, starting at 5x10^6) must
    still shard into exactly-N-row rank ranges: id-value-based sharding
    would put every doc in its own shard (zero consolidation) or, for
    ids clustered under shard_rows, defeat the mega-source guard
    entirely. Asserts real consolidation happens AND the per-shard
    wasted-partial-bin bound holds."""
    import random

    from cioos_siooc_data_transform_spark.operators.packing import (
        pack_greedy_nosplit,
    )

    rng = random.Random(11)
    cap, shard_rows = 64, 400
    rows = [
        ("sparse", 5_000_000 + d * 1000, rng.randint(1, 30)) for d in range(2000)
    ]
    docs = _docs(spark, rows)
    packed = sorted(
        (r["doc_id"], r["bin_id"], r["tokens"])
        for r in pack_greedy_nosplit(docs, cap, shard_rows=shard_rows).collect()
    )
    assert len(packed) == 2000
    bins = [b for _, b, _ in packed]
    assert bins[0] == 1
    assert all(0 <= b2 - b1 <= 1 for b1, b2 in zip(bins, bins[1:]))
    n_bins = max(bins)
    total_tokens = sum(t for _, _, t in packed)
    # consolidation: ~total/cap bins plus at most one wasted partial bin
    # per shard — NOT one bin per doc (the id-value-sharding failure)
    n_shards = -(-2000 // shard_rows)
    # every bin except the last of each shard closed because the NEXT
    # doc (≤30 tokens) did not fit, so its fill is > cap-30 — the
    # principled first-fit bound; id-value sharding would give ~2000
    assert n_bins <= total_tokens // (cap - 30 + 1) + n_shards, n_bins
    # rank-contiguity: docs of one bin are adjacent in doc_id order and
    # every rank-shard holds at most shard_rows rows
    shard_of_rank = [i // shard_rows for i in range(2000)]
    bin_shards = {}
    for i, (_, b, _) in enumerate(packed):
        bin_shards.setdefault(b, set()).add(shard_of_rank[i])
    assert all(len(s) == 1 for s in bin_shards.values())
