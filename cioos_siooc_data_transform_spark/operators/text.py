"""Text-analysis operators for training-data pipelines (beyond-reference
scope): language ID, quality scoring, token counting, fingerprinting.

All pure Catalyst column expressions — language ID and quality scoring run
inside whole-stage codegen; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.operators.dedup import words_expr  # noqa: F401

# Small per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Priority order (ties broken earlier-first): en, es, fr, de.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "en", "es", "que", "un"],
    "fr": ["le", "la", "de", "et", "en", "est", "que", "un"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit"],
}
LANG_PRIORITY = ["en", "es", "fr", "de"]


def _lit_array(values: list[str]) -> Column:
    return F.array(*[F.lit(v) for v in values])


def lang_hit_counts(words: Column) -> dict[str, Column]:
    """Distinct-token stopword hits per language."""
    distinct = F.array_distinct(words)
    return {
        lang: F.size(F.array_intersect(distinct, _lit_array(sw)))
        for lang, sw in LANG_STOPWORDS.items()
    }


def predict_language(hits: dict[str, Column]) -> Column:
    """argmax over languages in priority order; all-zero → 'und'."""
    expr = F.lit("und")
    for lang in reversed(LANG_PRIORITY):
        later = [h for lg, h in hits.items() if LANG_PRIORITY.index(lg) > LANG_PRIORITY.index(lang)]
        cond = hits[lang] > 0
        for other in later:
            cond = cond & (hits[lang] >= other)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def stopword_occurrences(words: Column, stopwords: list[str]) -> Column:
    """Total stopword OCCURRENCES (not distinct) — quality-score input."""
    sw = _lit_array(stopwords)
    return F.size(F.filter(words, lambda x: F.array_contains(sw, x)))


def quality_score(text: Column, words: Column) -> Column:
    """Heuristic quality as integer points 0..1000: length, stopword
    density, word shape (C4/Gopher-style filter signals).

    Integer-valued on purpose: each component is floor(int·scale / int),
    which is bit-identical across engines (float rounding of a formula
    like Σ wᵢ·ratioᵢ frequently lands exactly on decimal rounding
    boundaries, where last-ulp differences flip the rounded digit).
    """
    n_tokens = F.size(words)
    n_chars = F.length(text)
    stop_hits = stopword_occurrences(words, LANG_STOPWORDS["en"])
    len_pts = F.least(n_tokens, F.lit(100)).cast("long") * 4
    stop_pts = F.least(
        F.floor(stop_hits * F.lit(1200.0) / n_tokens), F.lit(300).cast("long")
    )
    shape_pts = F.least(
        F.floor((n_chars - n_tokens + 1) * F.lit(300.0) / (n_tokens * 8)),
        F.lit(300).cast("long"),
    )
    # NULL text must score 0, not 1000: F.least SKIPS the NULL division
    # results, so without the guard every component silently saturates;
    # an empty token array would DIVIDE_BY_ZERO under ANSI mode.
    return (
        F.when(
            text.isNotNull() & (n_tokens > 0),
            len_pts + stop_pts + shape_pts,
        )
        .otherwise(0)
        .cast("long")
    )


def token_counts(text: Column) -> tuple[Column, Column]:
    """(whitespace token count, BPE-ish regex token count)."""
    ws = F.size(F.split(F.trim(text), r"\s+"))
    bpe = F.size(F.regexp_extract_all(text, F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0))
    return ws, bpe


def fingerprint(words: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token set (collapses word-order shuffles to one cluster key)."""
    return F.md5(F.concat_ws(" ", F.sort_array(F.array_distinct(words))))
