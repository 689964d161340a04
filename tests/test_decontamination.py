"""decontamination_check: the no-false-negative law pinned NON-vacuously on
a synthetic corpus where duplicate texts are guaranteed to straddle the
benchmark/train split."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    rng = np.random.default_rng(11)
    rows = []
    # 160 unique docs + ONE text duplicated across 40 doc_ids: with the
    # ~20% md5 split, some of the 40 land on each side with probability
    # 1 - (0.8^40 + 0.2^40) — effectively certain; asserted below.
    dup_text = " ".join(f"w{int(w)}" for w in rng.integers(0, 500, 60))
    for i in range(200):
        text = (
            dup_text
            if i % 5 == 0
            else " ".join(f"w{int(w)}" for w in rng.integers(0, 5000, 60))
        )
        rows.append((i, text, "en", f"s{i % 3}", len(text)))
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    d = tmp_path_factory.mktemp("decon_sf")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_exact_dups_always_flagged(spark, corpus_dir):
    from pyspark.sql import functions as F

    from sketchlib import queries as Q

    # precondition: the duplicated text straddles the split (else the law
    # under test is vacuous)
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        % 5
    )
    split = docs.withColumn("bench", bucket == 0)
    dup_sides = (
        split.groupBy("text")
        .agg(F.countDistinct("bench").alias("sides"), F.count("*").alias("n"))
        .where((F.col("n") > 1) & (F.col("sides") == 2))
        .count()
    )
    assert dup_sides >= 1, "fixture must have a dup text on both sides"

    row = Q.decontamination_check(spark, corpus_dir).collect()[0]
    assert row["n_contaminated_exact"] >= 1  # non-vacuous
    assert row["all_exact_contaminated_flagged"]  # Bloom: no false negatives
    assert row["flagged_ge_exact"]


def test_clean_corpus_flags_nothing_required(spark, tmp_path):
    """All-unique corpus: exact contamination is 0 and the booleans hold
    trivially (false positives may flag extra docs; the contract only
    bounds from below)."""
    import pandas as pd

    rng = np.random.default_rng(12)
    pdf = pd.DataFrame(
        [
            (
                i,
                " ".join(f"u{int(w)}" for w in rng.integers(0, 10**6, 40)),
                "en",
                "s0",
                40,
            )
            for i in range(100)
        ],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    d = tmp_path / "clean_sf"
    spark.createDataFrame(pdf).write.parquet(str(d / "documents.parquet"))
    from sketchlib import queries as Q

    row = Q.decontamination_check(spark, str(d)).collect()[0]
    assert row["n_contaminated_exact"] == 0
    assert row["all_exact_contaminated_flagged"] and row["flagged_ge_exact"]
