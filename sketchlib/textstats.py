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


def _marker_mask_map() -> Column:
    """One literal map word -> packed per-language hit mask (8 bits/lang).

    A word on several languages' marker lists ('la' is French AND Spanish)
    carries the SUM of its per-language contributions, so one map lookup is
    exactly equivalent to intersecting all marker sets separately.
    """
    word_mask: dict[str, int] = {}
    for i, marks in enumerate(LANG_MARKERS.values()):
        for m in marks:
            word_mask[m] = word_mask.get(m, 0) + (1 << (8 * i))
    kv = []
    for w, mask in word_mask.items():
        kv += [F.lit(w), F.lit(mask).cast("long")]
    return F.create_map(*kv)


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of stopword-marker hits ('und' =
    undetermined when no markers hit). Pure SQL expressions; the word set is
    materialized ONCE as a projected column — without it Catalyst re-expands
    the regexp split inside every per-language score (measured 12x slower).

    Scores come from ONE aggregate over the word set with a packed
    marker-mask map lookup (all languages in a single pass), then unpack by
    bit-shift — semantically identical to per-language array_intersect but
    ~9x cheaper to whole-stage-codegen-compile and one pass instead of
    #langs passes over the words. Ties break like struct max: highest
    score, then lexicographically greatest language code.
    """
    langs = list(LANG_MARKERS)
    mask_map = _marker_mask_map()
    ws = F.array_distinct(words_col(F.lower(F.col(text_col))))
    packed = F.aggregate(
        ws, F.lit(0).cast("long"), lambda acc, w: acc + F.coalesce(mask_map[w], F.lit(0).cast("long"))
    )
    with_packed = df.withColumn("__packed", packed)
    pairs = F.array(
        *[
            F.struct(
                F.shiftright("__packed", 8 * i).bitwiseAND(F.lit(255)).cast("int").alias("score"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    best = F.array_max(pairs)
    return with_packed.select(
        *df.columns,
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
    )


def fingerprint64(text: Column) -> Column:
    """64-bit content fingerprint via built-in xxhash64 (JVM-side) — the

    shuffle-friendly stand-in for full-text comparisons in exact dedup."""
    return F.xxhash64(text)

def word_grams(ws: Column, n: int) -> Column:
    """Array of space-joined word n-grams over an array-of-words column
    (position i = words[i..i+n-1]; [] when len(words) < n), built by
    zipping the array with its shifted selves.

    NEVER build grams with ``slice(words, i, n)`` inside a transform
    lambda: Catalyst's CollapseProject inlines whatever expression produced
    the words array into the lambda body (even across a select), and
    subexpressions inside a higher-order-function lambda re-evaluate PER
    ELEMENT on the interpreted HOF path — the gram build becomes O(words²)
    per document (measured 5x slower at 54-word docs). The zip_with chain
    keeps every slice OUTSIDE the lambdas. Intermediate zips pad with
    NULLs (concat_ws skips them), leaving n-1 malformed tail entries that
    the final slice drops.
    """
    gram = ws
    for k in range(1, n):
        shifted = F.slice(ws, k + 1, F.greatest(F.size(ws) - k, F.lit(0)))
        gram = F.zip_with(gram, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.slice(gram, 1, F.greatest(F.size(ws) - (n - 1), F.lit(0)))


def repetition_signals(
    df: DataFrame, text_col: str = "text", ns: tuple[int, ...] = (2, 3)
) -> DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al. 2021 §A1.1
    repetition filters), token-granular and integer-exact:

    for each n in ``ns``, per document:
    - ``rep{n}_grams``           total word-n-gram occurrences,
    - ``rep{n}_dup_grams``       occurrences of n-grams appearing >= 2 times
                                 (ALL occurrences counted, the Gopher
                                 convention for "fraction in duplicate
                                 n-grams" — the fraction is dup/total),
    - ``rep{n}_top_gram``        the highest single n-gram occurrence count
                                 ("top n-gram fraction" numerator).

    Everything is a PURE projection — zip_with-chained gram construction,
    array_sort, one ``aggregate`` fold counting adjacent runs — ZERO
    shuffles, streaming at scan speed over 100 TB; the per-source rollup
    downstream is the only exchange. Counts stay integers (never the float
    fraction) so SQL oracles reproduce them hash-exactly.

    Construction notes (both measured, both matter):
    - grams come from zipping the word array with its shifted selves, NOT
      from ``slice(words, i, n)`` inside a transform lambda: a subexpression
      referenced inside a higher-order-function lambda is re-evaluated PER
      ELEMENT on Spark's interpreted HOF path, making that shape O(words²)
      per document (5x slower at 54-word docs, worse on long ones);
    - HOF lambdas must stay at their natural arity — a defaulted second
      parameter (``lambda i, n=n``) silently turns a transform lambda into
      the (element, index) form.
    """
    out = df
    ws_expr = words_col(F.lower(F.col(text_col)))
    for n in ns:
        grams = word_grams(F.col("_rs_ws"), n)
        folded = F.aggregate(
            F.array_sort(grams),
            F.struct(
                F.lit("").alias("prev"),
                F.lit(0).alias("run"),
                F.lit(0).alias("dup"),
                F.lit(0).alias("top"),
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
                (
                    acc["dup"]
                    + F.when(
                        (x == acc["prev"]) & (acc["run"] == 1), F.lit(2)
                    )
                    .when(x == acc["prev"], F.lit(1))
                    .otherwise(F.lit(0))
                ).alias("dup"),
                F.greatest(
                    acc["top"],
                    F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
                ).alias("top"),
            ),
        )
        out = (
            out.withColumn("_rs_ws", ws_expr)
            .withColumn(f"_rep{n}", folded)
            .withColumn(f"rep{n}_grams", F.size(grams).cast("long"))
            .select(
                "*",
                F.col(f"_rep{n}")["dup"].cast("long").alias(f"rep{n}_dup_grams"),
                F.col(f"_rep{n}")["top"].cast("long").alias(f"rep{n}_top_gram"),
            )
            .drop(f"_rep{n}", "_rs_ws")
        )
    return out
