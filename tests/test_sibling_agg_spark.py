"""Distributed CMS/Bloom/KLL/t-digest pipelines vs single-process oracles."""

import numpy as np
import pytest

from sketchlib.agg import BloomAggregator, CmsAggregator, KllAggregator, TDigestAggregator
from sketchlib.bloom import BloomFilter
from sketchlib.cms import CountMinSketch
from sketchlib.data import SEQUENCES_SCHEMA, gen_sequences_pandas


@pytest.fixture(scope="module")
def tiny_pdf():
    return gen_sequences_pandas(2_000)


@pytest.fixture(scope="module")
def tiny_df(spark, tiny_pdf):
    return spark.createDataFrame(tiny_pdf, schema=SEQUENCES_SCHEMA).repartition(7)


def all_tokens(pdf):
    return np.concatenate(pdf["tokens"].to_list()).astype(np.int32)


def test_cms_spark_matches_numpy_oracle(spark, tiny_df, tiny_pdf):
    """CMS merge is exact addition -> distributed counters == single-pass."""
    agg = CmsAggregator(width_log2=12, depth=4, key_cols=[], value_col="tokens")
    row = agg.merged(tiny_df).collect()[0]
    got = CountMinSketch.from_bytes(bytes(row["sketch"]))
    oracle = CountMinSketch.empty(12, 4)
    oracle.update_batch(all_tokens(tiny_pdf))
    assert np.array_equal(got.counters, oracle.counters)


def test_cms_point_estimates_df(spark, tiny_df, tiny_pdf):
    agg = CmsAggregator(width_log2=14, depth=5, key_cols=[], value_col="tokens")
    probes = np.array([0, 1, 42, 49999], dtype=np.int32)
    est = {r["value"]: r["est_freq"] for r in agg.point_estimates(tiny_df, probes).collect()}
    toks = all_tokens(tiny_pdf)
    for p in probes.tolist():
        exact = int((toks == p).sum())
        assert est[p] >= exact
        assert est[p] <= exact + 0.001 * len(toks)


def test_bloom_spark_matches_numpy_oracle(spark, tiny_df, tiny_pdf):
    agg = BloomAggregator(m_log2=16, k=5, key_cols=[], value_col="tokens")
    row = agg.merged(tiny_df).collect()[0]
    got = BloomFilter.from_bytes(bytes(row["sketch"]))
    oracle = BloomFilter.empty(16, 5)
    oracle.update_batch(all_tokens(tiny_pdf))
    assert np.array_equal(got.bits, oracle.bits)


def test_bloom_membership_df(spark, tiny_df, tiny_pdf):
    agg = BloomAggregator(m_log2=18, k=7, key_cols=[], value_col="tokens")
    present_tokens = all_tokens(tiny_pdf)[:50]
    rows = agg.membership(tiny_df, present_tokens).collect()
    assert all(r["present"] for r in rows)  # no false negatives, ever


def test_kll_quantiles_within_bound(spark, tiny_df, tiny_pdf):
    agg = KllAggregator(k=200, key_cols=[], value_col="n_tok", value_kind="int32")
    qs = [0.1, 0.5, 0.9]
    got = {r["q"]: r["value"] for r in agg.quantiles(tiny_df, qs).collect()}
    n_tok = tiny_pdf["n_tok"].to_numpy()
    for q in qs:
        rank = (n_tok <= got[q]).mean()
        assert abs(rank - q) < 0.04, (q, got[q], rank)


def test_kll_per_key_quantiles(spark, tiny_df, tiny_pdf):
    agg = KllAggregator(k=200, key_cols=["source"], value_col="n_tok", value_kind="int32")
    rows = agg.quantiles(tiny_df, [0.5]).collect()
    by_src = {r["source"]: r["value"] for r in rows}
    grp = tiny_pdf.groupby("source")["n_tok"]
    for src, med in by_src.items():
        vals = grp.get_group(src).to_numpy()
        rank = (vals <= med).mean()
        assert abs(rank - 0.5) < 0.12, (src, med, rank, len(vals))


def test_tdigest_quantiles_within_bound(spark, tiny_df, tiny_pdf):
    agg = TDigestAggregator(delta=200, key_cols=[], value_col="n_tok", value_kind="int32")
    qs = [0.05, 0.5, 0.95]
    got = {r["q"]: r["value"] for r in agg.quantiles(tiny_df, qs).collect()}
    n_tok = tiny_pdf["n_tok"].to_numpy()
    for q in qs:
        rank = (n_tok <= got[q]).mean()
        assert abs(rank - q) < 0.04, (q, got[q], rank)


def test_cms_partitioning_invariance(spark, tiny_pdf):
    """Exact-merge sketches must be byte-identical at any partitioning."""
    agg = CmsAggregator(width_log2=10, depth=3, key_cols=[], value_col="tokens")
    a_df = spark.createDataFrame(tiny_pdf, schema=SEQUENCES_SCHEMA).repartition(2)
    b_df = spark.createDataFrame(tiny_pdf, schema=SEQUENCES_SCHEMA).repartition(13)
    a = bytes(agg.merged(a_df).collect()[0]["sketch"])
    b = bytes(agg.merged(b_df).collect()[0]["sketch"])
    assert a == b


def test_cms_heavy_hitters_on_zipf(spark):
    """Candidate-tracked top-k matches exact top-k on a skewed stream."""
    import pandas as pd
    from pyspark.sql import types as T

    rng = np.random.default_rng(3)
    tokens = np.minimum(rng.zipf(1.4, 200_000), 10_000).astype(np.int32)
    rows = np.array_split(tokens, 500)
    pdf = pd.DataFrame({"doc_id": [f"d{i}" for i in range(500)], "tokens": rows})
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        ]
    )
    df = spark.createDataFrame(pdf, schema=schema).repartition(6)
    agg = CmsAggregator(width_log2=16, depth=5, key_cols=[], value_col="tokens")
    got = [r["value"] for r in agg.heavy_hitters(df, topk=10).collect()]
    uniq, cnt = np.unique(tokens, return_counts=True)
    order = np.lexsort((uniq, -cnt))
    exact_top10 = uniq[order][:10].tolist()
    # zipf head is heavily skewed: top-10 sets must agree; CMS est ordering
    # may swap near-ties, so compare as sets
    assert set(got) == set(exact_top10), (got, exact_top10)


def test_cms_heavy_hitters_per_key(spark):
    """Per-key heavy hitters: distributed candidate+score path per group."""
    import pandas as pd
    from pyspark.sql import types as T

    rng = np.random.default_rng(9)
    rows = []
    for key, shift in [("g1", 0), ("g2", 5000)]:
        toks = (np.minimum(rng.zipf(1.5, 50_000), 2_000) + shift).astype(np.int32)
        for chunk in np.array_split(toks, 100):
            rows.append((key, chunk))
    pdf = pd.DataFrame({"grp": [r[0] for r in rows], "tokens": [r[1] for r in rows]})
    schema = T.StructType(
        [
            T.StructField("grp", T.StringType(), False),
            T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        ]
    )
    df = spark.createDataFrame(pdf, schema=schema).repartition(5)
    agg = CmsAggregator(width_log2=16, depth=5, key_cols=["grp"], value_col="tokens")
    got = {}
    for r in agg.heavy_hitters(df, topk=5).collect():
        got.setdefault(r["grp"], []).append(r["value"])
    for key, shift in [("g1", 0), ("g2", 5000)]:
        toks = np.concatenate(pdf[pdf.grp == key]["tokens"].to_list())
        uniq, cnt = np.unique(toks, return_counts=True)
        exact_top5 = set(uniq[np.lexsort((uniq, -cnt))][:5].tolist())
        assert set(got[key]) == exact_top5, (key, got[key], exact_top5)
        # heavy hitters stay within their own group's token space
        assert all((v >= shift) and (v < shift + 2001) for v in got[key])
