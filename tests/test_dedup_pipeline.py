"""End-to-end dedup pipeline: LSH candidates → Jaccard confirm →
connected components → keeper selection."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_connected_components(spark):
    from cioos_siooc_data_transform_spark.operators.dedup import connected_components

    # two components: {1,2,3,4} (chain) and {10,11}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    comp = {
        r["doc_id"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_chain(spark):
    """A 60-hop path needs pointer jumping — one-hop propagation capped at
    12 rounds would silently split it."""
    from cioos_siooc_data_transform_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "doc_a long, doc_b long"
    )
    comp = {
        r["doc_id"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert len(comp) == 61
    assert set(comp.values()) == {0}


def test_connected_components_raises_when_unconverged(spark):
    import pytest as _pytest

    from cioos_siooc_data_transform_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_rounds=2)


def test_deduplicate_documents(spark):
    from cioos_siooc_data_transform_spark.operators.dedup import (
        deduplicate_documents,
        ngram_jaccard_pairs,
        word_shingles,
        words_expr,
    )
    from cioos_siooc_data_transform_spark.session import read_table

    docs = read_table(spark, SF, "documents")
    out = deduplicate_documents(docs).cache()
    assert out.count() == docs.count()

    keepers = out.filter(F.col("is_keeper")).count()
    dropped = out.filter(~F.col("is_keeper")).count()
    assert keepers + dropped == docs.count()
    assert dropped > 0  # the sf0.01 corpus has near-dup clusters

    # every non-keeper's component head must itself be a keeper
    comp_heads = {
        r["component"] for r in out.filter(~F.col("is_keeper")).collect()
    }
    keeper_ids = {
        r["doc_id"] for r in out.filter(F.col("is_keeper")).collect()
    }
    assert comp_heads <= keeper_ids

    # components agree with direct high-jaccard pairs: any confirmed pair
    # must land in one component
    shingled = docs.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles(words_expr(F.col("text")), 3))).alias("s"),
    ).distinct()
    jac = ngram_jaccard_pairs(shingled, "doc_id", "s", threshold=0.5)
    comp = {r["doc_id"]: r["component"] for r in out.collect()}
    for r in jac.collect():
        assert comp[r["doc_a"]] == comp[r["doc_b"]], (r["doc_a"], r["doc_b"])
    out.unpersist()


def test_lsh_identical_docs_always_pair(spark):
    """Property: documents with identical shingle sets share every band,
    so LSH must emit them as candidates; disjoint docs never pair."""
    from cioos_siooc_data_transform_spark.operators.dedup import (
        lsh_band_buckets,
        lsh_candidate_pairs,
        minhash_signature,
        word_shingles,
        words_expr,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),   # identical to 1
            (3, "one two three four five six seven"),      # disjoint
            (4, "alpha beta gamma delta epsilon eta"),     # near-dup of 1
        ],
        "doc_id long, text string",
    )
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles(words_expr(F.col("text")), 3))).alias("s"),
    )
    sig = minhash_signature(sh, "doc_id", "s", num_hashes=8)
    buckets = lsh_band_buckets(sig, "doc_id", num_hashes=8, bands=4)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(buckets, "doc_id").collect()
    }
    assert (1, 2) in pairs          # identical → guaranteed candidate
    assert (1, 3) not in pairs and (2, 3) not in pairs and (3, 4) not in pairs


def test_minhash_set_and_exploded_formulations_agree(spark):
    """The row-local array formulation (minhash_signature_sets,
    jaccard_for_pair_sets) must produce bit-identical signatures and
    Jaccard values to the exploded groupBy formulation, for both hash
    families — they are interchangeable physical strategies over the
    same logical operator."""
    from pyspark.sql import functions as F

    from cioos_siooc_data_transform_spark.operators.dedup import (
        doc_shingle_sets,
        jaccard_for_pair_sets,
        jaccard_for_pairs,
        minhash_signature,
        minhash_signature_sets,
        word_shingles,
        words_expr,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),
            (3, "one two three four five six seven"),
            (4, "alpha beta gamma delta epsilon zeta"),
            (5, "ab"),  # too short to shingle → dropped by both forms
        ],
        "doc_id long, text string",
    )
    exploded = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(words_expr(F.col("text")), 3))
        ).alias("s"),
    )
    sets_ = doc_shingle_sets(docs, "doc_id", "text", 3)
    for family in ("md5", "xxhash64"):
        a = {
            tuple(r)
            for r in minhash_signature(
                exploded, "doc_id", "s", num_hashes=8, hash_family=family
            ).collect()
        }
        b = {
            tuple(r)
            for r in minhash_signature_sets(
                sets_, "doc_id", num_hashes=8, hash_family=family
            ).collect()
        }
        assert a == b, family

    pairs = spark.createDataFrame(
        [(1, 2), (1, 4), (2, 3)], "doc_a long, doc_b long"
    )
    ja = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_for_pairs(pairs, exploded, "doc_id", "s").collect()
    }
    jb = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_for_pair_sets(pairs, sets_, "doc_id").collect()
    }
    assert ja == jb
    assert ja[(1, 4)] == 1.0  # identical docs
