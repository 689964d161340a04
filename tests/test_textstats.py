"""Text-analysis operators: quality counts, BPE-ish counting, language ID."""

import pandas as pd

from sketchlib.textstats import lang_id, quality_stats, token_count_bpe_ish


def test_quality_stats_counts(spark):
    pdf = pd.DataFrame(
        {"doc_id": ["a", "b"], "text": ["Hello, world! abc", "  one  two2   three... "]}
    )
    out = {r["doc_id"]: r for r in quality_stats(spark.createDataFrame(pdf)).collect()}
    a = out["a"]
    assert a["q_chars"] == 17
    assert a["q_words"] == 3  # Hello, world! abc
    assert a["q_alpha_words"] == 1  # only 'abc' is pure alpha
    assert a["q_punct"] == 2  # ',' and '!'
    b = out["b"]
    assert b["q_words"] == 3
    assert b["q_alpha_words"] == 1  # 'one' ('two2' has a digit, 'three...' dots)
    assert b["q_punct"] == 3  # the three dots
    assert b["q_distinct_words"] == 3
    assert b["q_max_word_len"] == 8  # 'three...'


def test_bpe_ish_token_count(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pd.DataFrame({"text": ["abcd efghi x", ""]}))
    got = df.select(token_count_bpe_ish(F.col("text")).alias("t")).collect()
    # ceil(4/4)+ceil(5/4)+ceil(1/4) = 1+2+1 = 4 ; empty -> 0
    assert [r["t"] for r in got] == [4, 0]


def test_lang_id_on_real_sentences(spark):
    pdf = pd.DataFrame(
        {
            "text": [
                "the cat sat on the mat and it was happy",
                "der Hund ist nicht mit der Katze auf dem Sofa",
                "le chat est dans la maison et il dort pour une heure",
                "el perro es una mascota que vive con la familia del vecino",
                "zzz qqq xxx",  # no markers
            ]
        }
    )
    got = [r["lang_pred"] for r in lang_id(spark.createDataFrame(pdf)).collect()]
    assert got == ["en", "de", "fr", "es", "und"]


def test_lang_id_packed_equals_per_language_intersects(spark):
    """The packed marker-mask formulation must equal per-language
    array_intersect scoring exactly — including words shared across marker
    lists ('la','que','est','es' overlap fr/es) and tie-breaking."""
    from pyspark.sql import functions as F

    from sketchlib.textstats import lang_id, lang_scores, words_col

    rows = [
        ("la que es una la que",),           # shared fr/es markers only
        ("le la les et est",),               # fr wins
        ("el la los que es",),               # es
        ("the la of es und der die das",),   # cross-language soup
        ("xyzzy plugh",),                    # no markers -> und
        ("",),
        ("der die das und ist the and of to is in that it was for",),  # en vs de tie shape
    ]
    df = spark.createDataFrame(rows, "text string")
    got = [r["lang_pred"] for r in lang_id(df).collect()]

    ref = df.withColumn("__ws", F.array_distinct(words_col(F.lower(F.col("text")))))
    scores = lang_scores(F.col("__ws"))
    pairs = F.array(
        *[F.struct(s.alias("score"), F.lit(l).alias("lang")) for l, s in scores.items()]
    )
    best = F.array_max(pairs)
    exp = [
        r["p"]
        for r in ref.select(
            F.when(best["score"] > 0, best["lang"]).otherwise("und").alias("p")
        ).collect()
    ]
    assert got == exp, (got, exp)
