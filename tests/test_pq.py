"""Product quantization: codebook shapes, deterministic encode, and
ADC recall against the exact L2 ground truth."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.operators.similarity import (
    pq_adc_topk,
    pq_encode,
    train_pq_codebooks,
)
from cioos_siooc_data_transform_spark.session import read_table

SF = "/root/testdata/sf0.01"


def _exact_l2_topk(queries, corpus, k):
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", d2.alias("d2"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id")
    )


def test_pq_shapes_and_determinism(spark):
    emb = read_table(spark, SF, "embeddings")
    books = train_pq_codebooks(emb, m=8, k=16, seed=42)
    assert len(books) == 8
    assert all(len(b) == 16 for b in books)
    assert all(len(c) == 8 for b in books for c in b)
    books2 = train_pq_codebooks(emb, m=8, k=16, seed=42)
    assert books == books2  # fixed seed → identical codebooks

    codes = pq_encode(emb, books).collect()
    assert len(codes) == emb.count()
    for r in codes[:20]:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])


def test_pq_adc_is_exact_reconstruction_distance(spark):
    """ADC's whole contract: the looked-up distance must equal
    ||q - reconstruct(codes)||^2 EXACTLY (same centroids, same order of
    the m partial sums) — verified against a numpy reference for every
    returned (query, neighbor) pair."""
    import numpy as np

    emb = read_table(spark, SF, "embeddings")
    books = train_pq_codebooks(emb, m=8, k=16, seed=42)
    B = np.array(books)
    queries = emb.filter(F.col("vec_id") < 10)
    codes_df = pq_encode(emb, books)
    out = pq_adc_topk(queries, codes_df, books, k_top=5).collect()
    assert len(out) == 10 * 5
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    codes = {r["vec_id"]: r["codes"] for r in codes_df.collect()}
    for r in out:
        q = vecs[r["query_id"]]
        rec = np.concatenate([B[j][codes[r["neighbor_id"]][j]] for j in range(8)])
        ref = round(float(((q - rec) ** 2).sum()), 6)
        assert abs(ref - r["approx_dist2"]) < 1e-9, (r, ref)


def test_pq_adc_recall_beats_random(spark):
    """recall@10 of ADC vs exact L2. These synthetic 64-dim embeddings
    are near-isotropic (distance concentration), so absolute recall is
    modest — measured ~0.28 with m=8, k=16; the floor asserts the index
    stays an order of magnitude above the random baseline
    (10/499 = 0.02)."""
    emb = read_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    books = train_pq_codebooks(emb, m=8, k=16, seed=42)
    codes = pq_encode(emb, books)
    approx = pq_adc_topk(queries, codes, books, k_top=10).select(
        "query_id", F.col("neighbor_id").alias("a_n")
    )
    exact = _exact_l2_topk(queries, emb, 10)
    hits = exact.join(
        approx,
        (exact["query_id"] == approx["query_id"])
        & (exact["neighbor_id"] == approx["a_n"]),
        "left_semi",
    ).count()
    recall = hits / (20 * 10)
    assert recall >= 0.15, recall


def test_pq_compression_ratio():
    """The storage story the operator exists for: 64 float32 = 256 bytes
    becomes 8 code bytes (k=16 ≤ 256 → 1 byte each) = 32x."""
    assert (64 * 4) / 8 == 32.0
