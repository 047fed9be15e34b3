"""Text-analysis and multimodal [Q] operators over the documents table
(beyond-reference scope): language ID, quality scoring, token counting,
fingerprinting, and the multimodal binary-column plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
)
from cioos_siooc_data_transform_spark.operators.text import (
    LANG_STOPWORDS,
    fingerprint,
    lang_hit_counts,
    predict_language,
    quality_score,
    token_counts,
    words_expr,
)
from cioos_siooc_data_transform_spark.plans.registry import register
from cioos_siooc_data_transform_spark.session import read_table as _t


def _sw_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang]) + "]"


# ---------------------------------------------------------------------------
# Language ID: stopword-hit argmax with fixed priority order.
# ---------------------------------------------------------------------------
@register(
    "text_langid",
    oracle=f"""
    WITH w AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS dw FROM documents),
    h AS (
      SELECT doc_id,
             CAST(len(list_intersect(dw, {_sw_list("en")})) AS BIGINT) AS en_hits,
             CAST(len(list_intersect(dw, {_sw_list("es")})) AS BIGINT) AS es_hits,
             CAST(len(list_intersect(dw, {_sw_list("fr")})) AS BIGINT) AS fr_hits,
             CAST(len(list_intersect(dw, {_sw_list("de")})) AS BIGINT) AS de_hits
      FROM w
    )
    SELECT doc_id, en_hits, es_hits, fr_hits, de_hits,
           CASE
             WHEN en_hits > 0 AND en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= de_hits THEN 'en'
             WHEN es_hits > 0 AND es_hits >= fr_hits AND es_hits >= de_hits THEN 'es'
             WHEN fr_hits > 0 AND fr_hits >= de_hits THEN 'fr'
             WHEN de_hits > 0 THEN 'de'
             ELSE 'und'
           END AS pred_lang
    FROM h
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    words = words_expr(F.col("text"))
    hits = lang_hit_counts(words)
    return docs.select(
        "doc_id",
        *[hits[lg].cast("long").alias(f"{lg}_hits") for lg in ["en", "es", "fr", "de"]],
        predict_language(hits).alias("pred_lang"),
    )


# ---------------------------------------------------------------------------
# Quality scoring: length / stopword density / word-shape heuristic.
# ---------------------------------------------------------------------------
@register(
    "text_quality_score",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(list_filter(string_split(text, ' '),
                      x -> list_contains({_sw_list("en")}, x))) AS BIGINT) AS stop_hits
      FROM documents
    )
    SELECT doc_id, n_tokens,
           least(n_tokens, 100) * 4
           + least(CAST(floor(stop_hits * 1200.0 / n_tokens) AS BIGINT), 300)
           + least(CAST(floor((n_chars - n_tokens + 1) * 300.0 / (n_tokens * 8)) AS BIGINT), 300)
             AS quality
    FROM w
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    words = words_expr(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_tokens"),
        quality_score(F.col("text"), words).alias("quality"),
    )


# ---------------------------------------------------------------------------
# Token counting: whitespace + BPE-ish regex.
# ---------------------------------------------------------------------------
@register(
    "text_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS bpe_tokens
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    ws, bpe = token_counts(F.col("text"))
    return docs.select(
        "doc_id", ws.cast("long").alias("ws_tokens"), bpe.cast("long").alias("bpe_tokens")
    )


# ---------------------------------------------------------------------------
# Fingerprinting: sorted-distinct-token md5 with cluster sizes.
# ---------------------------------------------------------------------------
@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
             AS fp,
           count(*) OVER (
             PARTITION BY md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
           ) AS cluster_size
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    fp = fingerprint(words_expr(F.col("text")))
    out = docs.select("doc_id", fp.alias("fp"))
    return out.withColumn("cluster_size", F.count(F.lit(1)).over(Window.partitionBy("fp")))


# ---------------------------------------------------------------------------
# Multimodal: opaque binary payload + typed metadata (plumbing check).
# ---------------------------------------------------------------------------
@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           lower(hex(substring(text, 1, 8))) AS prefix_hex
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.lower(F.hex(F.substring("text", 1, 8))).alias("prefix_hex"),
    )


# ---------------------------------------------------------------------------
# Multimodal: mapInPandas feature extraction over Arrow batches with the
# deterministic fake decoder (real decode is the stubbed codec boundary).
# ---------------------------------------------------------------------------
@register(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id,
           CAST((strlen(text) % 64) + 16 AS BIGINT) AS width,
           CAST((strlen(text) % 48) + 16 AS BIGINT) AS height,
           CAST(((strlen(text) % 64) + 16) * ((strlen(text) % 48) + 16) AS BIGINT) AS n_pixels,
           md5(text) AS checksum
    FROM documents
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    media = attach_binary_payload(docs, "doc_id", "text", "source")
    return extract_features(media, fake_decode=True)


# ---------------------------------------------------------------------------
# Feature-hashing bag-of-words embedding (hashing trick), long form:
# (doc_id, bucket, weight) with L2-normalized counts — the deterministic
# text→vector step a training pipeline runs before similarity search.
# ---------------------------------------------------------------------------
@register(
    "text_hash_embedding",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ), bucketed AS (
      SELECT doc_id,
             ((instr('0123456789abcdef', substr(md5(t), 1, 1)) - 1) * 16 +
              (instr('0123456789abcdef', substr(md5(t), 2, 1)) - 1)) % 32 AS bucket
      FROM tok
    ), counts AS (
      SELECT doc_id, bucket, count(*) AS n FROM bucketed GROUP BY 1, 2
    ), norms AS (
      SELECT doc_id, sqrt(sum(CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS l2
      FROM counts GROUP BY doc_id
    )
    SELECT c.doc_id, CAST(c.bucket AS BIGINT) AS bucket,
           round(CAST(c.n AS DOUBLE) / norms.l2, 6) AS weight
    FROM counts c JOIN norms ON c.doc_id = norms.doc_id
    """,
)
def text_hash_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(words_expr(F.col("text"))).alias("t"))
    h = F.md5(F.col("t"))
    nib = lambda i: F.instr(F.lit("0123456789abcdef"), F.substring(h, i, 1)) - 1  # noqa: E731
    bucket = ((nib(1) * 16 + nib(2)) % 32).cast("long")
    counts = tok.select("doc_id", bucket.alias("bucket")).groupBy(
        "doc_id", "bucket"
    ).agg(F.count(F.lit(1)).alias("n"))
    norms = counts.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("n").cast("double") * F.col("n").cast("double"))).alias("l2")
    )
    return counts.join(norms, "doc_id").select(
        "doc_id",
        "bucket",
        F.round(F.col("n").cast("double") / F.col("l2"), 6).alias("weight"),
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition signals: duplicate-token mass and top-token
# dominance. Counts are integer-exact; the one ratio uses the shared
# floor(v*1e6+0.5)/1e6 rounding so both engines round identically even on
# exact .5e-6 boundaries (e.g. 57/128 token ratios).
# ---------------------------------------------------------------------------
@register(
    "text_repetition_ratio",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ), per_word AS (
      SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(max(c) AS BIGINT) AS top_token_count,
           floor((1.0 - count(*) / sum(c)) * 1000000.0 + 0.5) / 1000000.0
             AS repetition_ratio
    FROM per_word GROUP BY doc_id
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-token mass per document (the Gopher repetition family):
    1 − distinct/total plus the dominant token's count. One explode + one
    two-level agg — map-side combinable, no Python."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(words_expr(F.col("text"))).alias("t")
    )
    per_word = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    agg = per_word.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.max("c").cast("long").alias("top_token_count"),
    )
    ratio = (
        F.floor(
            (1.0 - F.col("n_distinct") / F.col("n_tokens")) * 1000000.0 + 0.5
        )
        / 1000000.0
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        "top_token_count",
        ratio.alias("repetition_ratio"),
    )


# ---------------------------------------------------------------------------
# Multimodal frame sampling: the 1→N mapInPandas shape (each payload
# explodes into its sampled frames). Deterministic stub decode mirrors
# into SQL: frame count/stride from payload length, signature from
# payload bytes + index.
# ---------------------------------------------------------------------------
@register(
    "multimodal_frame_sample",
    oracle="""
    WITH f AS (
      SELECT doc_id, text,
             CAST(strlen(text) AS BIGINT) AS n,
             CAST((strlen(text) % 10) + 2 AS BIGINT) AS n_frames
      FROM documents
    ), idx AS (
      SELECT doc_id, text, n, n_frames,
             unnest(generate_series(0, n_frames - 1, 2)) AS frame_idx
      FROM f
    )
    SELECT doc_id,
           CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(frame_idx * (n // n_frames) AS BIGINT) AS frame_offset,
           md5(text || CAST(frame_idx AS VARCHAR)) AS frame_sig
    FROM idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cioos_siooc_data_transform_spark.operators.multimodal import sample_frames

    docs = _t(spark, sf_dir, "documents")
    media = attach_binary_payload(docs, "doc_id", "text", "source")
    return sample_frames(media, every_k=2, fake_decode=True)


# ---------------------------------------------------------------------------
# Token-distribution Shannon entropy per document: low entropy = repeated
# boilerplate / keyword stuffing, high = diverse vocabulary. A standard
# pretraining quality signal next to the Gopher ratios. One explode + two
# combinable aggs; floor-rounded at 6 dp like every float score here.
# ---------------------------------------------------------------------------
@register(
    "text_token_entropy",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ), cnt AS (
      SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2
    ), tot AS (
      SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n FROM cnt GROUP BY 1
    )
    SELECT cnt.doc_id,
           CAST(tot.n AS BIGINT) AS n_tokens,
           floor(-sum((c / n) * log2(c / n)) * 1000000.0 + 0.5) / 1000000.0
             AS token_entropy
    FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
    GROUP BY cnt.doc_id, tot.n
    """,
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(words_expr(F.col("text"))).alias("t"))
    cnt = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("doc_id").agg(F.sum("c").cast("double").alias("n"))
    p = F.col("c") / F.col("n")
    ent = -F.sum(p * F.log2(p))
    return (
        cnt.join(tot, "doc_id")
        .groupBy("doc_id", "n")
        .agg((F.floor(ent * 1000000.0 + 0.5) / 1000000.0).alias("token_entropy"))
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            "token_entropy",
        )
    )


# ---------------------------------------------------------------------------
# TF-IDF in long form: tf from one per-doc aggregation, df from a
# vocabulary-sized table that BROADCASTS back onto the term key (the same
# Zipf-skew rule as lm_unigram_logprob: never shuffle the corpus on a
# token key). ln(N/df) with the shared floor-rounding on both engines.
# ---------------------------------------------------------------------------
@register(
    "text_tfidf",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ), tf AS (
      SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
    ), df AS (
      SELECT t, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY 1
    ), n AS (
      SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tok
    )
    SELECT tf.doc_id, tf.t AS term, tf.tf, df.df,
           floor(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) * 1000000.0
                 + 0.5) / 1000000.0 AS tfidf
    FROM tf JOIN df ON tf.t = df.t CROSS JOIN n
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form TF-IDF: the document-frequency table is vocabulary-sized
    and broadcasts (hint pinned); the corpus-side tf aggregation is
    map-side combinable on (doc, term). No shuffle ever carries the
    Zipf-skewed bare term key."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(words_expr(F.col("text"))).alias("t"))
    tf = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    df_tab = tok.groupBy("t").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    n_docs = tok.select(F.countDistinct("doc_id").cast("long").alias("n_docs"))
    tfidf = (
        F.floor(
            F.col("tf")
            * F.log(F.col("n_docs").cast("double") / F.col("df"))
            * 1000000.0
            + 0.5
        )
        / 1000000.0
    )
    return (
        tf.join(F.broadcast(df_tab), "t")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            F.col("t").alias("term"),
            "tf",
            "df",
            tfidf.alias("tfidf"),
        )
    )


# ---------------------------------------------------------------------------
# Variable-frame-rate sampling: per-clip native fps, uniform target-rate
# timestamps — frame_idx = (j·native) DIV target. Integer-exact stub.
# ---------------------------------------------------------------------------
@register(
    "multimodal_frame_sample_fps",
    oracle="""
    WITH f AS (
      SELECT doc_id, text,
             CAST((strlen(text) % 7) + 10 AS BIGINT) AS native_fps,
             CAST((strlen(text) % 30) + 5 AS BIGINT) AS n_frames
      FROM documents
    ), j AS (
      SELECT doc_id, text, native_fps, n_frames, u.j
      FROM f, unnest(generate_series(0, (n_frames * 4) // native_fps)) AS u(j)
    ), idx AS (
      SELECT doc_id, text, native_fps, n_frames,
             (j * native_fps) // 4 AS frame_idx
      FROM j
    )
    SELECT doc_id,
           CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(frame_idx * 1000 // native_fps AS BIGINT) AS frame_ts_ms,
           native_fps,
           md5(text || ':' || CAST(frame_idx AS VARCHAR)) AS frame_sig
    FROM idx WHERE frame_idx < n_frames
    """,
)
def multimodal_frame_sample_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cioos_siooc_data_transform_spark.operators.multimodal import (
        sample_frames_at_fps,
    )

    docs = _t(spark, sf_dir, "documents")
    media = attach_binary_payload(docs, "doc_id", "text", "source")
    return sample_frames_at_fps(media, target_fps=4, fake_decode=True)


# ---------------------------------------------------------------------------
# Gopher-style quality filter (Rae et al. 2021, public rule set), adapted
# to the short synthetic corpus: every rule is expressed in integer
# arithmetic (cross-multiplied ratios), so keep/drop is bit-exact in any
# engine — no float thresholds anywhere. Pure codegen, one projection.
# ---------------------------------------------------------------------------
@register(
    "text_gopher_filter",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             string_split(text, ' ') AS words,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(length(text) - (len(string_split(text, ' ')) - 1) AS BIGINT)
               AS total_word_len
      FROM documents
    ), m AS (
      SELECT doc_id, n_words, total_word_len,
             CAST(len(list_filter(words, x -> contains(x, '#')
                                          OR contains(x, '...'))) AS BIGINT)
               AS n_symbol_words,
             CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT)
               AS n_alpha_words,
             CAST(len(list_intersect(list_distinct(words), {_sw_list("en")})) AS BIGINT)
               AS n_distinct_stop
      FROM w
    )
    SELECT doc_id, n_words,
           (n_words >= 10 AND n_words <= 100000) AS r_len,
           (3 * n_words <= total_word_len AND total_word_len <= 10 * n_words)
             AS r_word_len,
           (10 * n_symbol_words <= n_words) AS r_symbol,
           (5 * n_alpha_words >= 4 * n_words) AS r_alpha,
           (n_distinct_stop >= 2) AS r_stop,
           ((n_words >= 10 AND n_words <= 100000)
            AND (3 * n_words <= total_word_len AND total_word_len <= 10 * n_words)
            AND (10 * n_symbol_words <= n_words)
            AND (5 * n_alpha_words >= 4 * n_words)
            AND (n_distinct_stop >= 2)) AS keep
    FROM m
    """,
)
def text_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule document filter (Rae et al. 2021 §A1.1, public):
    word-count bounds, mean-word-length bounds, symbol-to-word ratio,
    alphabetic-word fraction, and a minimum distinct-stopword count —
    each ratio cross-multiplied into integer comparisons so the verdicts
    are engine-exact. The word-count lower bound is adapted (10, not 50)
    to the short synthetic corpus; the rule structure is Gopher's. Single
    narrow projection, whole-stage codegen, no shuffle at all."""
    docs = _t(spark, sf_dir, "documents")
    words = words_expr(F.col("text"))
    n_words = F.size(words).cast("long")
    total_word_len = (F.length("text") - (F.size(words) - 1)).cast("long")
    n_symbol = F.size(
        F.filter(words, lambda x: x.contains("#") | x.contains("..."))
    ).cast("long")
    n_alpha = F.size(F.filter(words, lambda x: x.rlike("[A-Za-z]"))).cast("long")
    sw = F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(words), sw)).cast("long")
    base = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        total_word_len.alias("twl"),
        n_symbol.alias("nsym"),
        n_alpha.alias("nalpha"),
        n_stop.alias("nstop"),
    )
    r_len = (F.col("n_words") >= 10) & (F.col("n_words") <= 100000)
    r_word_len = (3 * F.col("n_words") <= F.col("twl")) & (
        F.col("twl") <= 10 * F.col("n_words")
    )
    r_symbol = 10 * F.col("nsym") <= F.col("n_words")
    r_alpha = 5 * F.col("nalpha") >= 4 * F.col("n_words")
    r_stop = F.col("nstop") >= 2
    return base.select(
        "doc_id",
        "n_words",
        r_len.alias("r_len"),
        r_word_len.alias("r_word_len"),
        r_symbol.alias("r_symbol"),
        r_alpha.alias("r_alpha"),
        r_stop.alias("r_stop"),
        (r_len & r_word_len & r_symbol & r_alpha & r_stop).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Per-source contribution cap: keep the top-K documents per source by
# quality — the Common-Crawl-style guard against any one domain flooding
# the training mix. One window per source (high-cardinality key); the
# rank is on (integer quality DESC, doc_id ASC), fully deterministic.
# ---------------------------------------------------------------------------
@register(
    "cap_per_source",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, source,
             least(CAST(len(string_split(text, ' ')) AS BIGINT), 100) * 4
             + least(CAST(floor(
                 CAST(len(list_filter(string_split(text, ' '),
                          x -> list_contains({_sw_list("en")}, x))) AS BIGINT)
                 * 1200.0 / len(string_split(text, ' '))) AS BIGINT), 300)
             + least(CAST(floor(
                 (CAST(length(text) AS BIGINT) - len(string_split(text, ' ')) + 1)
                 * 300.0 / (len(string_split(text, ' ')) * 8)) AS BIGINT), 300)
               AS quality
      FROM documents
    ), ranked AS (
      SELECT doc_id, source, quality,
             row_number() OVER (
               PARTITION BY source ORDER BY quality DESC, doc_id ASC
             ) AS rk
      FROM q
    )
    SELECT doc_id, source, quality, rk FROM ranked WHERE rk <= 10
    """,
)
def cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents per source by quality score — the per-domain
    contribution cap every web-scale training mix applies so no single
    domain dominates. Rank key is (integer quality DESC, doc_id ASC):
    deterministic, no float comparisons. Plan: one window shuffle on
    source; at 100 TB a skewed mega-domain is exactly what the cap
    removes, and rank-then-filter prunes it to K rows per key."""
    docs = _t(spark, sf_dir, "documents")
    words = words_expr(F.col("text"))
    q = docs.select(
        "doc_id",
        "source",
        quality_score(F.col("text"), words).alias("quality"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        q.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
    )


# ---------------------------------------------------------------------------
# Mixture temperature weighting: the data-mixing step that turns raw
# per-source counts into sampling weights p_s^alpha / sum(p^alpha)
# (alpha = 0.5 here, i.e. sqrt-temperature upsampling of small sources).
# One tiny aggregation (one row per source) + a scalar normalizer — the
# whole query moves |sources| rows regardless of corpus size.
# ---------------------------------------------------------------------------
@register(
    "mixture_temperature_weights",
    oracle="""
    WITH n AS (
      SELECT source, CAST(count(*) AS DOUBLE) AS n_docs FROM documents GROUP BY source
    ), z AS (
      SELECT sum(sqrt(n_docs)) AS norm FROM n
    )
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           floor(sqrt(n_docs) / norm * 1e6 + 0.5) / 1e6 AS weight,
           CAST(floor(sqrt(n_docs) / norm * 10000.0) AS BIGINT) AS draws_per_10k
    FROM n, z
    """,
)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling weights with temperature alpha = 0.5
    (weight_s = sqrt(n_s) / sum_t sqrt(n_t)) and the integer draw budget
    per 10k samples — the mixture-balancing computation LLM training runs
    before sampling shards. The normalizer is a scalar cross join (one
    row), so the plan is one groupBy(source) plus a broadcast of one
    number. Weights use the engine-stable floor(v*1e6+0.5)/1e6 rounding."""
    docs = _t(spark, sf_dir, "documents")
    n = docs.groupBy("source").agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    z = n.agg(F.sum(F.sqrt("n_docs")).alias("norm"))
    return n.crossJoin(F.broadcast(z)).select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        (F.floor(F.sqrt("n_docs") / F.col("norm") * 1e6 + 0.5) / 1e6).alias("weight"),
        F.floor(F.sqrt("n_docs") / F.col("norm") * 10000.0)
        .cast("long")
        .alias("draws_per_10k"),
    )


# ---------------------------------------------------------------------------
# Unigram LM scoring (CCNet-shape): score every document by the mean
# log-probability of its tokens under the corpus's own unigram model.
# Scale design: the frequency table is vocabulary-sized (not corpus-
# sized) and BROADCASTS — joining token occurrences to it by shuffle
# would be the classic Zipf-skew trap ('the' lands on one reducer);
# broadcasting sidesteps the skew entirely. Per-doc mean is a map-side
# combinable agg on doc_id.
# ---------------------------------------------------------------------------
@register(
    "lm_unigram_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), freq AS (
      SELECT w, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY w
    ), total AS (
      SELECT sum(c) AS n FROM freq
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           floor(sum(ln(c / n)) / count(*) * 1e6 + 0.5) / 1e6 AS avg_logprob
    FROM tok JOIN freq USING (w), total
    GROUP BY doc_id
    """,
)
def lm_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean unigram log-probability per document under the corpus's own
    unigram distribution — the CCNet-style LM quality signal (docs full
    of rare garbage tokens score low; docs of common fluent words score
    high). ln() is libm on both engines (<= 1 ulp apart per term), so the
    mean is rounded with the engine-stable floor trick at 6 dp."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(words_expr(F.col("text"))).alias("w")
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("c"))
    total = freq.agg(F.sum("c").alias("n"))
    return (
        tok.join(F.broadcast(freq), "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            (
                F.floor(
                    F.sum(F.log(F.col("c") / F.col("n")))
                    / F.count(F.lit(1))
                    * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# PII scrubbing: regex redaction of email-shaped tokens. The synthetic
# corpus contains no PII, so each doc gets a deterministic contact line
# appended first — the redaction machinery (count + replace) is then
# exercised for real. The pattern sticks to syntax RE2 (DuckDB) and the
# JVM regex engine interpret identically (character classes, +, \. —
# no lookarounds, no lazy quantifiers). Row-local codegen, no shuffle.
# ---------------------------------------------------------------------------
_PII_RE = r"[a-z0-9]+@[a-z0-9]+\.[a-z]+"


@register(
    "text_pii_scrub",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact: user' || CAST(doc_id AS VARCHAR)
                  || '@example.com' AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_PII_RE}')) AS BIGINT) AS n_redactions,
           md5(regexp_replace(t, '{_PII_RE}', '<EMAIL>', 'g')) AS scrubbed_digest
    FROM aug
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email redaction over the documents table: count the PII-shaped
    matches and emit the digest of the scrubbed text (digest, not the
    text, keeps the comparison compact). Every training pipeline runs a
    pass of this shape before release; at scale it is a pure projection
    — no shuffle, whole-stage codegen, trivially parallel."""
    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com"),
        ).alias("t"),
    )
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_PII_RE), 0))
        .cast("long")
        .alias("n_redactions"),
        F.md5(F.regexp_replace(F.col("t"), _PII_RE, "<EMAIL>")).alias(
            "scrubbed_digest"
        ),
    )


# ---------------------------------------------------------------------------
# Vocabulary building: corpus-wide heavy hitters. Top-K by count is a
# groupBy(token) + TakeOrdered — partial aggregation combines map-side,
# and the global sort moves only k rows per partition. The BPE-pair
# variant counts ADJACENT token pairs (the counting step inside every
# BPE/WordPiece trainer's merge loop).
# ---------------------------------------------------------------------------
@register(
    "vocab_top_tokens",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    )
    SELECT w, CAST(count(*) AS BIGINT) AS cnt
    FROM tok GROUP BY w
    ORDER BY cnt DESC, w ASC LIMIT 50
    """,
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 tokens by corpus frequency (vocabulary seed / heavy
    hitters). Deterministic tiebreak on the token itself. The plan is
    partial-agg + TakeOrdered: only 50 rows per partition reach the
    driver-side merge, never the full vocabulary."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(F.explode(words_expr(F.col("text"))).alias("w"))
    return (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("w").asc())
        .limit(50)
    )


@register(
    "vocab_bpe_pair_counts",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ), pairs AS (
      SELECT unnest(list_transform(
               generate_series(1, greatest(len(words) - 1, 0)),
               i -> words[i] || ' ' || words[i + 1])) AS pair
      FROM w
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair
    HAVING count(*) >= 5
    """,
)
def vocab_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-token pair frequencies with a minimum support of 5 — the
    counting kernel of a BPE/WordPiece merge step, run corpus-wide. Pair
    generation is row-local (the same zip_with-over-shifted-slices shape
    as shingling, with the slice length clamped to 0 via
    greatest); the only shuffle is the combiner-friendly count."""
    docs = _t(spark, sf_dir, "documents")
    words = words_expr(F.col("text"))
    cnt = F.greatest(F.size(words) - 1, F.lit(0))
    pairs = docs.select(
        F.explode(
            F.when(
                F.size(words) >= 2,
                F.zip_with(
                    F.slice(words, 1, cnt),
                    F.slice(words, 2, cnt),
                    lambda a, b: F.concat_ws(" ", a, b),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") >= 5)
    )


@register(
    "text_bigram_repetition",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ), bg AS (
      SELECT doc_id,
             list_transform(range(1, len(words)),
                            i -> words[i] || ' ' || words[i + 1]) AS b
      FROM w WHERE len(words) >= 2
    )
    SELECT doc_id,
           CAST(len(b) AS BIGINT) AS n_bigrams,
           CAST(len(list_distinct(b)) AS BIGINT) AS n_distinct_bigrams,
           floor((1.0 - len(list_distinct(b)) / len(b)) * 1000000.0 + 0.5)
             / 1000000.0 AS dup_bigram_ratio
    FROM bg
    """,
)
def text_bigram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-bigram mass per document — the order-sensitive member
    of the Gopher repetition family (dup-n-gram fraction; the unigram
    member is ``text_repetition_ratio``). Computed entirely ROW-LOCALLY
    with slice + zip_with STRUCT pairs: zero shuffles, no explode, no
    aggregation state, and no per-bigram string allocation. Measured
    A/B at sf0.1 (noop write, warm): exploded two-level groupBy 3.4 s;
    row-local over concat_ws shingles (element_at chain inside
    transform) 5.6 s; slice+zip_with struct pairs **0.46 s** — the
    interpreted higher-order element_at/concat chain was the cost, not
    the aggregation. Pair-struct distinctness == bigram-string
    distinctness because tokens cannot contain the delimiter. The ratio
    uses the shared floor(v*1e6+0.5) rounding on both engines."""
    docs = _t(spark, sf_dir, "documents")
    words = words_expr(F.col("text"))
    pairs = F.zip_with(
        F.slice(words, 1, F.size(words) - 1),
        F.slice(words, 2, F.size(words) - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    d = docs.filter(F.size(words) >= 2).select(
        "doc_id",
        F.size(pairs).cast("long").alias("n_bigrams"),
        F.size(F.array_distinct(pairs)).cast("long").alias("n_distinct_bigrams"),
    )
    ratio = (
        F.floor(
            (1.0 - F.col("n_distinct_bigrams") / F.col("n_bigrams")) * 1000000.0
            + 0.5
        )
        / 1000000.0
    )
    return d.select(
        "doc_id", "n_bigrams", "n_distinct_bigrams",
        ratio.alias("dup_bigram_ratio"),
    )


@register(
    "udtf_tokenize_offsets",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) AS pos1,
             unnest(string_split(text, ' ')) AS token
      FROM documents
    )
    SELECT doc_id,
           CAST(pos1 - 1 AS BIGINT) AS pos,
           token,
           CAST(coalesce(sum(length(token) + 1) OVER (
             PARTITION BY doc_id ORDER BY pos1
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS start_char,
           CAST(coalesce(sum(length(token) + 1) OVER (
             PARTITION BY doc_id ORDER BY pos1
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + length(token) AS BIGINT) AS end_char
    FROM tok
    """,
)
def udtf_tokenize_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-with-character-offsets as a Python UDTF (the Spark 4
    user-defined TABLE function surface, §2.10 completeness): each
    document row expands to one row per token carrying its [start, end)
    character span — the alignment primitive NER/labeling/redaction
    pipelines need (a span model predicts offsets; this is the join key
    back to tokens). Arrow-optimized (useArrow) so the 1→N expansion is
    batched, not row-at-a-time pickling; the UDTF applies via a LATERAL
    join, which Spark plans as a pure map-side Generate — zero
    shuffles. The oracle reproduces the offsets relationally (prefix
    sums of token lengths), pinning the Python scan exactly."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos bigint, token string, start_char bigint, end_char bigint", useArrow=True)
    class TokenizeOffsets:
        def eval(self, text: str):
            start = 0
            for i, tok in enumerate(text.split(" ")):
                yield i, tok, start, start + len(tok)
                start += len(tok) + 1

    spark.udtf.register("tokenize_offsets_udtf", TokenizeOffsets)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents_udtf_v")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token, t.start_char, t.end_char
        FROM documents_udtf_v d, LATERAL tokenize_offsets_udtf(d.text) t
        """
    )
