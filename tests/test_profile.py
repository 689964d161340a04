"""Composite profile sketch: component-wise merge laws, round-trip, and the
one-scan distributed profile (single Exchange, single parquet scan)."""

import numpy as np

from sketchlib.profile import ProfileSketch


def _sketch_of(token_rows, p=12, k=200):
    s = ProfileSketch.empty(p, k)
    for row in token_rows:
        s.update_values(np.asarray(row, dtype=np.int32))
    s.update_row_lengths(np.array([len(r) for r in token_rows], dtype=np.int64))
    return s


def test_roundtrip_preserves_both_components():
    rows = [np.arange(i % 50 + 1) for i in range(500)]
    s = _sketch_of(rows)
    r = ProfileSketch.from_bytes(s.to_bytes())
    assert r.distinct_values() == s.distinct_values()
    assert r.length_quantile(0.5) == s.length_quantile(0.5)
    assert np.array_equal(r.hll.registers, s.hll.registers)
    assert r.kll.n == s.kll.n


def test_merge_matches_single_build():
    rows_a = [np.arange(i % 40 + 1) for i in range(300)]
    rows_b = [np.arange(20, 20 + i % 60 + 1) for i in range(300)]
    a, b = _sketch_of(rows_a), _sketch_of(rows_b)
    whole = _sketch_of(rows_a + rows_b)
    a.merge(b)
    # HLL component is order-exact
    assert np.array_equal(a.hll.registers, whole.hll.registers)
    # KLL component: statistically equivalent (same n, bounded quantiles)
    assert a.kll.n == whole.kll.n
    for q in (0.1, 0.5, 0.9):
        assert abs(a.kll.rank(whole.kll.quantile(q)) - q) < 0.05


def test_estimates_accurate():
    rng = np.random.default_rng(7)
    lengths = rng.integers(1, 200, 2000)
    rows = [rng.integers(0, 30_000, n).astype(np.int32) for n in lengths]
    s = _sketch_of(rows, p=14)
    flat = np.concatenate(rows)
    exact = len(np.unique(flat))
    assert abs(s.distinct_values() / exact - 1.0) < 0.03
    med = s.length_quantile(0.5)
    assert abs((lengths <= med).mean() - 0.5) < 0.05


def test_spark_profile_one_scan_one_shuffle(spark, tmp_path):
    from pyspark.sql import functions as F

    from sketchlib.agg import ProfileAggregator
    from sketchlib.data import sequences_parquet

    path = sequences_parquet(spark, 2_000, cache_root=str(tmp_path))
    df = spark.read.parquet(path)
    agg = ProfileAggregator(p=12, key_cols=["source"])
    merged = agg.merged(df)
    plan = merged._sc._jvm.PythonSQLUtils.explainString(
        merged._jdf.queryExecution(), "formatted"
    )
    # the whole per-key composite build: ONE scan, ONE shuffle of blob rows
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    prof = agg.profile(df, qs=(0.5, 0.9))
    rows = {r["source"]: r for r in prof.collect()}
    exact = {
        r["source"]: r
        for r in df.select("source", F.explode("tokens").alias("t"))
        .groupBy("source")
        .agg(F.countDistinct("t").alias("d"))
        .collect()
    }
    base = {
        r["source"]: r
        for r in df.groupBy("source")
        .agg(F.count("*").alias("n_rows"), F.sum("n_tok").alias("n_items"))
        .collect()
    }
    for src, r in rows.items():
        assert r["n_rows"] == base[src]["n_rows"]
        assert r["n_items"] == base[src]["n_items"]
        assert abs(r["est_distinct"] / exact[src]["d"] - 1.0) < 0.05, src
        ranks = df.where(F.col("source") == src).agg(
            (F.sum((F.col("n_tok") <= r["len_p50"]).cast("long")) / F.count("*")).alias("r50")
        ).collect()[0]
        assert abs(ranks["r50"] - 0.5) < 0.05, src


def test_profile_byte_identical_across_parallelism(spark, tmp_path):
    """With per-shard partials and the canonical sorted-blob merge, the
    merged composite sketch is a pure function of the input file layout —
    byte-identical at any task parallelism (KLL component included)."""
    from sketchlib.agg import ProfileAggregator
    from sketchlib.data import sequences_parquet

    path = sequences_parquet(spark, 2_000, cache_root=str(tmp_path))
    agg = ProfileAggregator(p=12, key_cols=["source"])
    blobs = {}
    for par in (2, 7):
        parts = agg.partials_from_parquet(spark, path, parallelism=par, per_shard=True)
        rows = agg.merged(parts, is_partials=True).collect()
        blobs[par] = {r["source"]: bytes(r["sketch"]) for r in rows}
    assert blobs[2] == blobs[7]
