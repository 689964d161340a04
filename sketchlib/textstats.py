"""Text-analysis operators for training-data pipelines.

All hot paths are built-in Spark SQL expressions (JVM codegen, no Python):
quality scoring, token counting, language ID heuristics, and rolling-hash
fingerprints compose into one projection over the text column — a single
whole-stage-codegen'd scan at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword heuristic;
# deliberately ASCII + language-distinctive function words
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"],
    "es": ["el", "la", "los", "que", "es", "una", "por", "con", "para", "del"],
}


def words_col(text: Column) -> Column:
    """Whitespace tokens, empty-token filtered (matches the DuckDB oracle

    semantics used across this repo: regexp split on \\s+ after trim)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != "")


def quality_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Integer-exact quality features (oracle-friendly: counts, not ratios):

    characters, whitespace words, alpha-only words, distinct words, longest
    word, punctuation marks from a fixed ASCII class."""
    words = words_col(F.col(text_col))
    return df.select(
        "*",
        F.length(text_col).alias("q_chars"),
        F.size(words).alias("q_words"),
        F.size(F.filter(words, lambda w: w.rlike("^[A-Za-z]+$"))).alias("q_alpha_words"),
        F.size(F.array_distinct(words)).alias("q_distinct_words"),
        F.array_max(F.transform(words, F.length)).alias("q_max_word_len"),
        (
            F.length(text_col)
            - F.length(F.regexp_replace(F.col(text_col), r"[.,;:!?'\"()\[\]-]", ""))
        ).alias("q_punct"),
    )


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish token count without a tokenizer model: words + intra-word

    splits every 4 chars (the classic chars/4 heuristic, but exact and
    reproducible in SQL)."""
    words = words_col(text)
    return F.aggregate(
        F.transform(words, lambda w: F.floor((F.length(w) + F.lit(3)) / F.lit(4)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def lang_scores(word_set: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts over a precomputed distinct-word set."""
    return {
        lang: F.size(F.array_intersect(word_set, F.array(*[F.lit(m) for m in marks])))
        for lang, marks in LANG_MARKERS.items()
    }


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of stopword-marker hits ('und' =

    undetermined when no markers hit). Pure SQL expressions; the word set is
    materialized ONCE as a projected column — without it Catalyst re-expands
    the regexp split inside every per-language score (measured 12x slower).
    """
    with_words = df.withColumn("__wordset", F.array_distinct(words_col(F.lower(F.col(text_col)))))
    scores = lang_scores(F.col("__wordset"))
    pairs = F.array(
        *[F.struct(score.alias("score"), F.lit(lang).alias("lang")) for lang, score in scores.items()]
    )
    best = F.array_max(pairs)
    return with_words.select(
        *df.columns,
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
    )


def fingerprint64(text: Column) -> Column:
    """64-bit content fingerprint via built-in xxhash64 (JVM-side) — the

    shuffle-friendly stand-in for full-text comparisons in exact dedup."""
    return F.xxhash64(text)
