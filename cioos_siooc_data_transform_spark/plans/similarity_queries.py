"""Similarity-search [Q] operators over the embeddings table (beyond-
reference scope): exact brute-force cosine top-k and the IVF-bucketed
approximate variant (the 100 TB scale path).

Cosine is rounded to 4 dp BEFORE ranking/thresholding on both sides so
ordering and cuts are engine-stable (float-sum-order independence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
)
from cioos_siooc_data_transform_spark.plans.registry import register
from cioos_siooc_data_transform_spark.session import read_table as _t


@register(
    "similarity_topk_bruteforce",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings)
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT query_id, neighbor_id,
             round(list_cosine_similarity(qv, cv), 4) AS cos_sim,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY round(list_cosine_similarity(qv, cv), 4) DESC, neighbor_id ASC
             ) AS rank
      FROM q, c WHERE neighbor_id != query_id
    ) WHERE rank <= 10
    """,
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return brute_force_topk(queries, emb, k=10, round_dp=4)


@register(
    "similarity_ivf_topk",
    oracle="""
    WITH cent AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings WHERE vec_id < 8),
    assigned AS (
      SELECT vec_id, embedding, centroid_id FROM (
        SELECT v.vec_id, CAST(v.embedding AS DOUBLE[]) AS embedding, cent.centroid_id,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY round(list_cosine_similarity(v.embedding, cent.cv), 4) DESC,
                          cent.centroid_id ASC
               ) AS rn
        FROM embeddings v, cent
      ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qv, centroid_id FROM assigned WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv2, centroid_id FROM assigned)
    SELECT query_id, centroid_id, neighbor_id, cos_sim, rank FROM (
      SELECT q.query_id, q.centroid_id, c.neighbor_id,
             round(list_cosine_similarity(q.qv, c.cv2), 4) AS cos_sim,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY round(list_cosine_similarity(q.qv, c.cv2), 4) DESC,
                        c.neighbor_id ASC
             ) AS rank
      FROM q JOIN c ON q.centroid_id = c.centroid_id AND c.neighbor_id != q.query_id
    ) WHERE rank <= 5
    """,
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8)
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(queries, emb, centroids, k=5, round_dp=4)
