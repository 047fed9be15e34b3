"""Deduplication [Q] operators over the documents/embeddings tables, with
DuckDB oracle twins (beyond-reference scope, BASELINE.json north star).

Hash portability: every hash the oracle must reproduce is md5 (identical
hex in Spark and DuckDB); min-hash takes the lexicographic min of hex
digests, which is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.operators.dedup import (
    exact_dedup,
    lsh_band_buckets,
    lsh_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    word_shingles,
    words_expr,
)
from cioos_siooc_data_transform_spark.operators.similarity import cosine_expr
from cioos_siooc_data_transform_spark.plans.registry import register
from cioos_siooc_data_transform_spark.session import read_table as _t

# Shared oracle CTE: distinct 3-word shingles per document.
_SHINGLES_CTE = """
    w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, greatest(len(words) - 2, 0)),
                      i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS s
        FROM w
      )
    )
"""


def _distinct_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc DISTINCT shingles.

    array_distinct dedups inside the row; the trailing global distinct is
    then a near-no-op shuffle, but it creates an Exchange that Spark
    REUSES for every downstream consumer (self-join sides + size agg) —
    without it the text→shingle explode is recomputed per consumer, which
    benches ~1.7× slower on the LSH/Jaccard pipelines."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(words_expr(F.col("text")), 3))
        ).alias("s"),
    ).distinct()


# ---------------------------------------------------------------------------
# Exact dedup: digest groupBy, keep min id.
# ---------------------------------------------------------------------------
@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash, min(doc_id) AS keeper_id, count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(_t(spark, sf_dir, "documents"), "doc_id", "text")


# ---------------------------------------------------------------------------
# MinHash + LSH candidate pairs: 8 md5 hash fns, 4 bands × 2 rows,
# mega-bucket guard at 50.
# ---------------------------------------------------------------------------
@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sig AS (
      SELECT doc_id,
             {", ".join(
                 f"min(substr(md5(s || '#{(k - 1) // 4}'), {((k - 1) % 4) * 8 + 1}, 8)) AS h{k}"
                 for k in range(1, 9)
             )}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, unnest([
        {", ".join(f"md5('{b}' || h{2 * b + 1} || h{2 * b + 2})" for b in range(4))}
      ]) AS bucket
      FROM sig
    ),
    guarded AS (
      SELECT doc_id, bucket FROM (
        SELECT doc_id, bucket, count(*) OVER (PARTITION BY bucket) AS n FROM bands
      ) WHERE n <= 50
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM guarded a JOIN guarded b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    shingles = _distinct_shingles(spark, sf_dir)
    sig = minhash_signature(shingles, "doc_id", "s", num_hashes=8, hash_family="md5")
    buckets = lsh_band_buckets(sig, "doc_id", num_hashes=8, bands=4)
    return lsh_candidate_pairs(buckets, "doc_id", max_bucket_size=50)


# ---------------------------------------------------------------------------
# SimHash (16-bit portable variant): majority vote per md5-derived bit over
# distinct tokens.
# ---------------------------------------------------------------------------
_BIT_SUMS = ",\n             ".join(
    f"sum(CASE WHEN (v >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}" for i in range(16)
)
_HASH_SUM = " + ".join(f"(CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(16))


@register(
    "dedup_simhash",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    tok AS (SELECT DISTINCT doc_id, unnest(words) AS t FROM w),
    val AS (
      SELECT doc_id,
             ((instr('0123456789abcdef', substr(md5(t), 1, 1)) - 1) * 4096 +
              (instr('0123456789abcdef', substr(md5(t), 2, 1)) - 1) * 256 +
              (instr('0123456789abcdef', substr(md5(t), 3, 1)) - 1) * 16 +
              (instr('0123456789abcdef', substr(md5(t), 4, 1)) - 1)) AS v
      FROM tok
    ),
    sums AS (SELECT doc_id, {_BIT_SUMS} FROM val GROUP BY doc_id)
    SELECT doc_id, CAST({_HASH_SUM} AS BIGINT) AS simhash FROM sums
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", F.explode(F.array_distinct(words_expr(F.col("text")))).alias("t")
    )
    return simhash(tokens, "doc_id", "t", bits=16)


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs via inverted-index join (threshold 0.5).
# ---------------------------------------------------------------------------
@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, jaccard FROM (
      SELECT doc_a, doc_b,
             round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
      FROM common
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
    ) WHERE jaccard >= 0.5
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    shingles = _distinct_shingles(spark, sf_dir)
    return ngram_jaccard_pairs(shingles, "doc_id", "s", threshold=0.5)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup pairs (threshold on ROUNDED cosine so the
# cut is engine-stable).
# ---------------------------------------------------------------------------
@register(
    "dedup_embedding_cosine",
    oracle="""
    SELECT doc_a, doc_b, cos_sim FROM (
      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ) WHERE cos_sim >= 0.45
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("doc_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("doc_b"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("doc_a") < F.col("doc_b")).select(
        "doc_a",
        "doc_b",
        F.round(cosine_expr(F.col("va"), F.col("vb")), 4).alias("cos_sim"),
    )
    return pairs.filter(F.col("cos_sim") >= 0.45)


# ---------------------------------------------------------------------------
# SimHash near-dup pairs: hamming distance ≤ 3 over a blocked self-join
# (block = high byte of the hash — candidates must agree on it, which is
# the standard multi-index SimHash trick; at 64-bit scale the hash splits
# into 4 blocks and pairs must match on ≥ 1).
# ---------------------------------------------------------------------------
@register(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    tok AS (SELECT DISTINCT doc_id, unnest(words) AS t FROM w),
    val AS (
      SELECT doc_id,
             ((instr('0123456789abcdef', substr(md5(t), 1, 1)) - 1) * 4096 +
              (instr('0123456789abcdef', substr(md5(t), 2, 1)) - 1) * 256 +
              (instr('0123456789abcdef', substr(md5(t), 3, 1)) - 1) * 16 +
              (instr('0123456789abcdef', substr(md5(t), 4, 1)) - 1)) AS v
      FROM tok
    ),
    sums AS (SELECT doc_id, {_BIT_SUMS} FROM val GROUP BY doc_id),
    sh AS (SELECT doc_id, CAST({_HASH_SUM} AS BIGINT) AS simhash FROM sums),
    blocked AS (SELECT doc_id, simhash, simhash >> 8 AS block FROM sh)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM blocked a JOIN blocked b
      ON a.block = b.block AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", F.explode(F.array_distinct(words_expr(F.col("text")))).alias("t")
    )
    sh = simhash(tokens, "doc_id", "t", bits=16).withColumn(
        "block", F.shiftright(F.col("simhash"), 8)
    )
    a = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sh_a"),
        "block",
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sh_b"),
        "block",
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, "block")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Edit-distance near-dup pairs: Levenshtein over (lang, length-bucket)
# blocks — the char-level dedup primitive for short texts; blocking keeps
# the quadratic comparison inside small buckets (same pattern as LSH).
# ---------------------------------------------------------------------------
@register(
    "dedup_edit_distance",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang, CAST(floor(n_chars / 50) AS BIGINT) AS len_bucket,
             substr(text, 1, 40) AS prefix
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS edit_dist
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
    WHERE levenshtein(a.prefix, b.prefix) <= 12
    """,
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / 50).cast("long").alias("len_bucket"),
        F.substring("text", 1, 40).alias("prefix"),
    )
    a = d.select(
        F.col("doc_id").alias("doc_a"), "lang", "len_bucket",
        F.col("prefix").alias("pa"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("len_bucket").alias("lb_b"),
        F.col("prefix").alias("pb"),
    )
    pairs = a.join(
        b,
        (F.col("lang") == F.col("lang_b"))
        & (F.col("len_bucket") == F.col("lb_b"))
        & (F.col("doc_a") < F.col("doc_b")),
    )
    dist = F.levenshtein(F.col("pa"), F.col("pb"))
    return (
        pairs.withColumn("edit_dist", dist.cast("long"))
        .filter(F.col("edit_dist") <= 12)
        .select("doc_a", "doc_b", "edit_dist")
    )
