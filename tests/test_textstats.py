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
