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


def test_doc_rarity_mass_segment_sum_and_empty_docs(spark, tmp_path):
    """The mapInArrow segment-sum must equal a per-doc loop, including
    zero-length and null token lists (mass 0) and docs straddling batch
    boundaries; never_undercounts is structural for every doc."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from sketchlib import queries as Q

    rng = np.random.default_rng(23)
    rows = []
    for i in range(300):
        # i%7==6 puts empty docs at Arrow-batch ENDS under the
        # maxRecordsPerBatch=7 override below — the layout where a clamped
        # reduceat boundary silently truncated the preceding doc's segment
        if i % 17 == 0 or i % 7 == 6 or i == 299:
            toks = []  # empty doc (incl. the final row of the last batch)
        else:
            toks = [int(t) for t in rng.integers(0, 400, int(rng.integers(1, 60)))]
        rows.append((f"d{i:04d}", toks, len(toks), "s0"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "tokens", "n_tok", "source"])
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
            T.StructField("n_tok", T.IntegerType(), False),
            T.StructField("source", T.StringType(), False),
        ]
    )
    d = tmp_path / "rarity_sf"
    spark.createDataFrame(pdf, schema=schema).write.parquet(
        str(d / "x.parquet")
    )
    import sketchlib.queries as qq

    # point sequences_path at the synthetic table for this call
    orig = qq.sequences_path
    qq.sequences_path = lambda s, sf: str(d / "x.parquet")
    orig_for = qq.sequences_for
    qq.sequences_for = lambda s, sf: s.read.parquet(str(d / "x.parquet"))
    batch_before = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        out = {r["doc_id"]: r for r in Q.doc_rarity_mass(spark, "ignored", bottom_k=300).collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", batch_before)
        qq.sequences_path = orig
        qq.sequences_for = orig_for
    # exact per-doc mass by hand
    from collections import Counter

    freq = Counter(t for _, toks, _, _ in rows for t in toks)
    for doc_id, toks, _, _ in rows:
        if not toks:
            # documented contract: token-less docs carry no mass and are
            # excluded from the ranking (explode/UNNEST semantics)
            assert doc_id not in out
            continue
        exact = sum(freq[t] for t in toks)
        r = out[doc_id]
        assert r["exact_mass"] == exact, doc_id
        assert r["never_undercounts"], doc_id
        assert r["within_eps"], doc_id


def test_repetition_signals(spark):
    """Gopher-style repetition signals: integer-exact duplicate/top n-gram
    occurrence counts, token-granular, computed as a PURE projection."""
    from sketchlib.textstats import repetition_signals

    rows = [
        (1, "a b a b a b"),   # 2-grams {a b:3, b a:2}: dup=5 top=3 total=5
        (2, "x y z w"),       # all unique
        (3, "q"),             # too short for any 2-gram
        (4, "m m m m"),       # one gram repeated 3x
        (5, "Spam SPAM spam eggs"),  # case-folded: {spam spam:2, spam eggs:1}
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_signals(df, ns=(2, 3)).collect()}
    exp2 = {1: (5, 5, 3), 2: (3, 0, 1), 3: (0, 0, 0), 4: (3, 3, 3), 5: (3, 2, 2)}
    exp3 = {1: (4, 4, 2), 2: (2, 0, 1), 3: (0, 0, 0), 4: (2, 2, 2), 5: (2, 0, 1)}
    for d, r in out.items():
        assert (r["rep2_grams"], r["rep2_dup_grams"], r["rep2_top_gram"]) == exp2[d], d
        assert (r["rep3_grams"], r["rep3_dup_grams"], r["rep3_top_gram"]) == exp3[d], d
    # zero-shuffle law: the signals are a projection, no Exchange in the plan
    explained = repetition_signals(df, ns=(2, 3))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in explained
    # pandas oracle on random word soup: per-doc gram counting from scratch
    import collections
    import random

    rng = random.Random(7)
    vocab = ["aa", "bb", "cc", "dd"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(40)
    ]
    df2 = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_signals(df2, ns=(2,)).collect()}
    for i, text in docs:
        ws = [w for w in text.lower().strip().split() if w]
        grams = [" ".join(ws[j : j + 2]) for j in range(max(len(ws) - 1, 0))]
        c = collections.Counter(grams)
        dup = sum(v for v in c.values() if v >= 2)
        top = max(c.values(), default=0)
        r = got[i]
        assert (r["rep2_grams"], r["rep2_dup_grams"], r["rep2_top_gram"]) == (
            len(grams), dup, top,
        ), (i, text)
