"""KMeans-trained IVF: deterministic training, plug-compatible centroids,
and reasonable recall against exact brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_trained_ivf_recall(spark):
    from cioos_siooc_data_transform_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        train_ivf_centroids,
    )
    from cioos_siooc_data_transform_spark.session import read_table

    emb = read_table(spark, SF, "embeddings")
    centroids = train_ivf_centroids(emb, n_cells=4)
    assert centroids.count() == 4

    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(queries, emb, k=5)
    approx = ivf_topk(queries, emb, centroids, k=5)

    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # single-probe IVF with 4 cells on 500 unclustered vectors: expect
    # meaningful but partial recall
    assert recall >= 0.3, recall

    # multi-probe: recall must not decrease, and usually improves
    multi = ivf_topk(queries, emb, centroids, k=5, nprobe=2)
    multi_pairs = {(r["query_id"], r["neighbor_id"]) for r in multi.collect()}
    recall2 = len(exact_pairs & multi_pairs) / len(exact_pairs)
    assert recall2 >= recall, (recall, recall2)

    # determinism: retraining with the same seed gives identical centers
    again = train_ivf_centroids(emb, n_cells=4)
    a = sorted(map(tuple, (r["embedding"] for r in centroids.collect())))
    b = sorted(map(tuple, (r["embedding"] for r in again.collect())))
    assert a == b
