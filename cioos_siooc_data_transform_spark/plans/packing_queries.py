"""Sequence-packing [Q] operators (LLM training-data pipeline scope):
concat-and-chunk fixed-window packing and greedy no-split bin packing
over the documents table, each with a DuckDB oracle twin (window
arithmetic / recursive CTE)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cioos_siooc_data_transform_spark.operators.packing import (
    pack_chunks_fixed,
    pack_greedy_nosplit,
)
from cioos_siooc_data_transform_spark.plans.registry import register
from cioos_siooc_data_transform_spark.session import read_table as _t

_CAPACITY = 256  # context-window tokens; small enough to pack several docs


@register(
    "pack_chunks_fixed",
    oracle=f"""
    WITH d AS (
      SELECT source, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
      FROM documents
      WHERE len(string_split(text, ' ')) > 0
    ), w AS (
      SELECT source, doc_id, tokens,
             CAST(sum(tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS e
      FROM d
    )
    SELECT source, doc_id, CAST(u.c AS BIGINT) AS chunk_id,
           CAST(least(e, (u.c + 1) * {_CAPACITY})
                - greatest(e - tokens, u.c * {_CAPACITY}) AS BIGINT)
             AS chunk_tokens
    FROM w, unnest(generate_series(
      (e - tokens) // {_CAPACITY}, (e - 1) // {_CAPACITY})) AS u(c)
    """,
)
def pack_chunks_fixed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk packing index: per source, documents
    are concatenated in doc_id order and split at {capacity}-token
    boundaries; one row per (document, overlapped window). All integer
    codegen; one cumulative window shuffle per source."""
    return pack_chunks_fixed(_t(spark, sf_dir, "documents"), _CAPACITY)


@register(
    "pack_greedy_nosplit",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT source, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
      WHERE len(string_split(text, ' ')) > 0
    ), s AS (
      SELECT source, doc_id, tokens, rn,
             CAST(1 AS BIGINT) AS bin_id, tokens AS fill
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.source, d.doc_id, d.tokens, d.rn,
             CASE WHEN s.fill + d.tokens > {_CAPACITY}
                  THEN s.bin_id + 1 ELSE s.bin_id END,
             CASE WHEN s.fill + d.tokens > {_CAPACITY}
                  THEN d.tokens ELSE s.fill + d.tokens END
      FROM d JOIN s ON d.source = s.source AND d.rn = s.rn + 1
    )
    SELECT source, doc_id, tokens, bin_id FROM s
    """,
)
def pack_greedy_nosplit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-in-order no-split packing (padded-batch strategy): the
    stateful fill-and-reset scan runs as Arrow-batched applyInPandas per
    source; the oracle is the equivalent recursive CTE."""
    return pack_greedy_nosplit(_t(spark, sf_dir, "documents"), _CAPACITY)


_WIN = 64  # RAG chunk window (tokens)
_STRIDE = 48
_OVERLAP = _WIN - _STRIDE  # 16 tokens; a start inside the final overlap region yields a chunk fully contained in its predecessor


@register(
    "chunk_sliding_windows",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      FROM documents
    )
    SELECT doc_id,
           CAST(u.s // {_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(u.s AS BIGINT) AS start_tok,
           CAST(least(u.s + {_WIN}, n) - u.s AS BIGINT) AS chunk_len,
           array_to_string(
             list_slice(toks, u.s + 1, least(u.s + {_WIN}, n)), ' '
           ) AS chunk_text
    FROM d, unnest(generate_series(0, n - 1, {_STRIDE})) AS u(s)
    WHERE u.s = 0 OR u.s < n - {_OVERLAP}
    """,
)
def chunk_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style overlapping chunker: fixed {win}-token windows at
    {stride}-token stride over each document's whitespace tokens,
    emitting the materialized chunk text; a start inside the final
    overlap region would produce a chunk that is a strict suffix of its
    predecessor (pure duplicate retrieval content), so those starts are
    dropped on both engines. Row-local (sequence + explode
    + slice — zero shuffles, whole-stage codegen): at 100 TB this is a
    pure map stage whose output is ~(1 + overlap/stride)× the corpus,
    and the wide source text column is dropped in the same stage."""
    from pyspark.sql import functions as F

    docs = _t(spark, sf_dir, "documents")
    from cioos_siooc_data_transform_spark.operators.dedup import words_expr

    d = docs.select("doc_id", words_expr(F.col("text")).alias("toks")).select(
        "doc_id", "toks", F.size("toks").cast("long").alias("n")
    )
    exploded = d.select(
        "doc_id",
        "toks",
        "n",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("n") - 1, F.lit(_STRIDE))
        ).alias("s"),
    ).filter((F.col("s") == 0) | (F.col("s") < F.col("n") - _OVERLAP))
    chunk_len = F.least(F.col("s") + _WIN, F.col("n")) - F.col("s")
    return exploded.select(
        "doc_id",
        (F.col("s") / _STRIDE).cast("long").alias("chunk_idx"),
        F.col("s").alias("start_tok"),
        chunk_len.cast("long").alias("chunk_len"),
        F.array_join(
            F.slice(F.col("toks"), (F.col("s") + 1).cast("int"), chunk_len.cast("int")),
            " ",
        ).alias("chunk_text"),
    )
