"""Frequent-items (Misra–Gries) sketch: two-sided bound laws, guaranteed
retention above the error line, topology-independent bulk merge, codec
round-trip, and distributed byte-determinism across parallelism.

Reference parity note: the reference library (ascv/HyperLogLog) has no
frequency sketch — this is part of the beyond-reference §2C family, held to
the same mergeable-sketch laws as CMS/KLL/KMV (SURVEY.md §4.3)."""

import numpy as np
import pytest

from sketchlib.fi import FrequentItemsSketch


def _zipf_stream(n=60_000, n_items=5_000, seed=7):
    rng = np.random.default_rng(seed)
    # deterministic skewed stream: a handful of true heavy hitters over a
    # long uniform tail
    head = np.repeat(np.arange(10, dtype=np.int64), n // 40)
    tail = rng.integers(10, n_items, n - len(head), dtype=np.int64)
    out = np.concatenate([head, tail])
    rng.shuffle(out)
    return out


def _exact_counts(vals):
    uniq, cnt = np.unique(vals, return_counts=True)
    return dict(zip(uniq.tolist(), cnt.tolist()))


def test_exact_when_small_domain():
    # distinct count stays below the trim threshold: counts are EXACT
    vals = np.tile(np.arange(100, dtype=np.int64), 50)
    s = FrequentItemsSketch.empty(capacity=128)
    s.update_batch(vals)
    assert s.error == 0
    assert s.total == len(vals)
    got = dict(s.top_items())
    assert got == {i: 50 for i in range(100)}


def test_two_sided_bounds_and_error_law():
    vals = _zipf_stream()
    s = FrequentItemsSketch.empty(capacity=64)
    for chunk in np.array_split(vals, 13):
        s.update_batch(chunk)
    exact = _exact_counts(vals)
    assert s.total == len(vals)
    assert s.error <= s.total // (s.capacity + 1)
    lower = s.estimate_batch(np.array(list(exact.keys()), dtype=np.int64))
    for (item, true_cnt), lo in zip(exact.items(), lower):
        assert lo <= true_cnt <= lo + s.error, (item, lo, true_cnt, s.error)


def test_guaranteed_retention_above_error_line():
    vals = _zipf_stream()
    s = FrequentItemsSketch.empty(capacity=64)
    s.update_batch(vals)
    retained = {item for item, _ in s.top_items()}
    for item, cnt in _exact_counts(vals).items():
        if cnt > s.error:
            assert item in retained, (item, cnt, s.error)


def test_merge_blobs_is_permutation_invariant():
    """merge_blobs is a pure function of the blob MULTISET: any ordering of
    the same partials gives byte-identical results (the partial multiset
    itself is fixed by the data layout via per-shard partials — pinned in
    the Spark tests below). Pairwise textbook MG merging would fail this."""
    vals = _zipf_stream()
    blobs = []
    for p in np.array_split(vals, 9):
        s = FrequentItemsSketch.empty(capacity=64)
        s.update_batch(p)
        blobs.append(s.to_bytes())
    ref = FrequentItemsSketch.merge_blobs(blobs, 64).to_bytes()
    rng = np.random.default_rng(0)
    for _ in range(5):
        perm = [blobs[i] for i in rng.permutation(len(blobs))]
        assert FrequentItemsSketch.merge_blobs(perm, 64).to_bytes() == ref


def test_merge_bounds_hold_at_any_split():
    """Different data splits yield different partial multisets (each partial
    trims its own view), so merged BYTES may differ — but the two-sided
    bound and the error law hold at every split."""
    vals = _zipf_stream()
    exact = _exact_counts(vals)
    probe = np.array(list(exact.keys()), dtype=np.int64)
    for n_parts in (1, 4, 32):
        blobs = []
        for p in np.array_split(vals, n_parts):
            s = FrequentItemsSketch.empty(capacity=64)
            s.update_batch(p)
            blobs.append(s.to_bytes())
        m = FrequentItemsSketch.merge_blobs(blobs, 64)
        assert m.total == len(vals)
        assert m.error <= m.total // (m.capacity + 1)
        lower = m.estimate_batch(probe)
        for (item, true_cnt), lo in zip(exact.items(), lower):
            assert lo <= true_cnt <= lo + m.error, (n_parts, item)


def test_merge_blobs_bounds_still_hold():
    vals = _zipf_stream(n=80_000)
    blobs = []
    for p in np.array_split(vals, 16):
        s = FrequentItemsSketch.empty(capacity=64)
        s.update_batch(p)
        blobs.append(s.to_bytes())
    m = FrequentItemsSketch.merge_blobs(blobs, 64)
    exact = _exact_counts(vals)
    assert m.total == len(vals)
    assert m.error <= m.total // (m.capacity + 1)
    lower = m.estimate_batch(np.array(list(exact.keys()), dtype=np.int64))
    for (item, true_cnt), lo in zip(exact.items(), lower):
        assert lo <= true_cnt <= lo + m.error
    retained = {item for item, _ in m.top_items()}
    for item, cnt in exact.items():
        if cnt > m.error:
            assert item in retained


def test_pairwise_merge_bounds():
    vals = _zipf_stream()
    a, b = np.array_split(vals, 2)
    sa = FrequentItemsSketch.empty(capacity=64)
    sa.update_batch(a)
    sb = FrequentItemsSketch.empty(capacity=64)
    sb.update_batch(b)
    sa.merge(sb)
    exact = _exact_counts(vals)
    assert sa.total == len(vals)
    assert sa.error <= sa.total // (sa.capacity + 1)
    lower = sa.estimate_batch(np.array(list(exact.keys()), dtype=np.int64))
    for (item, true_cnt), lo in zip(exact.items(), lower):
        assert lo <= true_cnt <= lo + sa.error


def test_merge_rejects_config_mismatch():
    with pytest.raises(ValueError):
        FrequentItemsSketch.empty(64).merge(FrequentItemsSketch.empty(128))
    with pytest.raises(ValueError):
        FrequentItemsSketch.empty(64).merge(
            FrequentItemsSketch.empty(64, item_kind="string")
        )
    with pytest.raises(ValueError):
        FrequentItemsSketch.merge_blobs(
            [FrequentItemsSketch.empty(64).to_bytes()], 128
        )


def test_roundtrip_bytes_int64():
    s = FrequentItemsSketch.empty(capacity=32)
    s.update_batch(_zipf_stream(n=20_000))
    r = FrequentItemsSketch.from_bytes(s.to_bytes())
    assert (r.capacity, r.item_kind, r.error, r.total) == (
        s.capacity,
        s.item_kind,
        s.error,
        s.total,
    )
    # same retained multiset (in-memory order is insertion order; the blob
    # is canonical) and identical canonical bytes
    assert dict(zip(r.items.tolist(), r.counts.tolist())) == dict(
        zip(s.items.tolist(), s.counts.tolist())
    )
    assert r.to_bytes() == s.to_bytes()


def test_roundtrip_bytes_string():
    s = FrequentItemsSketch.empty(capacity=16, item_kind="string")
    words = [f"w{i % 25:03d}" for i in range(4000)] + ["héllo", "héllo"]
    s.update_batch(words, kind="string")
    r = FrequentItemsSketch.from_bytes(s.to_bytes())
    assert r.item_kind == "string"
    assert dict(zip(r.items, r.counts.tolist())) == dict(
        zip(s.items, s.counts.tolist())
    )
    assert r.to_bytes() == s.to_bytes()
    assert dict(s.top_items())["héllo"] >= 1


def test_empty_sketch():
    s = FrequentItemsSketch.empty(8)
    assert s.top_items() == []
    assert s.total == 0 and s.error == 0
    r = FrequentItemsSketch.from_bytes(s.to_bytes())
    assert r.top_items() == [] and r.total == 0
    assert FrequentItemsSketch.merge_blobs([s.to_bytes()], 8).top_items() == []
    assert list(s.estimate_batch(np.array([1, 2], dtype=np.int64))) == [0, 0]


def test_weighted_updates():
    s = FrequentItemsSketch.empty(16)
    s.update_batch(
        np.array([1, 2, 1], dtype=np.int64),
        weights=np.array([10, 3, 5], dtype=np.int64),
    )
    assert s.total == 18
    assert dict(s.top_items()) == {1: 15, 2: 3}
    with pytest.raises(TypeError):
        s.update_batch(np.array([1]), weights=np.array([1.5]))
    with pytest.raises(ValueError):
        s.update_batch(np.array([1]), weights=np.array([-1]))


def test_weighted_updates_exact_past_2_53():
    # the int64 np.add.at accumulator: bincount(weights=)'s float64 path
    # would silently round 2^53 + 1 -> 2^53 (review finding)
    s = FrequentItemsSketch.empty(16)
    s.update_batch(
        np.array([7, 7], dtype=np.int64),
        weights=np.array([1 << 53, 1], dtype=np.int64),
    )
    assert dict(s.top_items()) == {7: (1 << 53) + 1}


def test_zero_weight_is_no_sighting():
    # weight-0 items must not occupy retained slots or perturb canonical
    # bytes (review finding)
    s = FrequentItemsSketch.empty(16)
    s.update_batch(np.array([5, 6], dtype=np.int64), weights=np.array([0, 4]))
    assert dict(s.top_items()) == {6: 4}
    assert s.total == 4
    empty = FrequentItemsSketch.empty(16)
    empty.update_batch(np.array([6], dtype=np.int64), weights=np.array([4]))
    assert s.to_bytes() == empty.to_bytes()
    all_zero = FrequentItemsSketch.empty(16)
    all_zero.update_batch(np.array([1, 2], dtype=np.int64), weights=np.array([0, 0]))
    assert all_zero.to_bytes() == FrequentItemsSketch.empty(16).to_bytes()


def test_ctor_normalizes_list_inputs():
    s = FrequentItemsSketch(capacity=8, items=[1, 2], counts=[3, 4])
    assert s.top_items() == [(2, 4), (1, 3)]
    assert FrequentItemsSketch.from_bytes(s.to_bytes()).top_items() == s.top_items()


def test_aggregator_rejects_double_kind():
    pytest.importorskip("pyspark")
    from sketchlib.agg import FiAggregator

    with pytest.raises(ValueError, match="double"):
        FiAggregator(value_kind="double", value_col="price")


def test_canonical_bytes_independent_of_build_history():
    # same final retained state reached by different chunkings while the
    # domain stays small (exact regime) -> identical bytes
    vals = np.tile(np.arange(50, dtype=np.int64), 20)
    a = FrequentItemsSketch.empty(256)
    a.update_batch(vals)
    b = FrequentItemsSketch.empty(256)
    for chunk in np.array_split(vals, 7):
        b.update_batch(chunk)
    assert a.to_bytes() == b.to_bytes()


def test_top_items_ordering_and_k():
    s = FrequentItemsSketch.empty(32)
    s.update_batch(np.array([5] * 9 + [3] * 9 + [7] * 2, dtype=np.int64))
    assert s.top_items() == [(3, 9), (5, 9), (7, 2)]  # count desc, item asc
    assert s.top_items(k=2) == [(3, 9), (5, 9)]


def test_capacity_validation():
    with pytest.raises(ValueError):
        FrequentItemsSketch.empty(0)
    with pytest.raises(ValueError):
        FrequentItemsSketch.empty(1 << 25)
    with pytest.raises(ValueError):
        FrequentItemsSketch(capacity=8, item_kind="bytes")


# -- distributed -----------------------------------------------------------------


def test_spark_fi_bounds_vs_exact_any_partitioning(spark):
    from pyspark.sql import functions as F

    from sketchlib.agg import FiAggregator
    from sketchlib.data import SEQUENCES_SCHEMA, gen_sequences_pandas

    pdf = gen_sequences_pandas(2000)
    df = spark.createDataFrame(pdf, schema=SEQUENCES_SCHEMA)
    agg = FiAggregator(capacity=128, key_cols=["source"])
    exact = {
        (r["source"], r["t"]): r["cnt"]
        for r in df.select("source", F.explode("tokens").alias("t"))
        .groupBy("source", "t")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    totals = {}
    for (src, _t), c in exact.items():
        totals[src] = totals.get(src, 0) + c
    # the bound laws hold at ANY partitioning (byte-identity needs the
    # layout-determined partial grain — next test)
    for parts in (3, 17):
        rows = agg.merged(df.repartition(parts)).collect()
        for r in rows:
            src = r["source"]
            s = FrequentItemsSketch.from_bytes(bytes(r["sketch"]))
            assert s.total == totals[src]
            assert s.error <= s.total // (s.capacity + 1)
            items = np.array([t for (s2, t) in exact if s2 == src], dtype=np.int64)
            lower = s.estimate_batch(items)
            for t, lo in zip(items.tolist(), lower):
                assert lo <= exact[(src, t)] <= lo + s.error


def test_spark_fi_per_shard_byte_identical_across_parallelism(spark, tmp_path):
    """Layout-determined partials (per row group) + multiset-pure merge ->
    merged bytes invariant to task parallelism, the same law KLL/t-digest
    pin in test_determinism.py."""
    from sketchlib.agg import FiAggregator
    from sketchlib.data import SEQUENCES_SCHEMA, gen_sequences_pandas

    path = str(tmp_path / "seqs.parquet")
    spark.createDataFrame(
        gen_sequences_pandas(4000), schema=SEQUENCES_SCHEMA
    ).repartition(6).write.parquet(path)
    agg = FiAggregator(capacity=64, key_cols=["source"])
    results = []
    for par in (2, 32):
        partials = agg.partials_from_parquet(spark, path, parallelism=par, per_shard=True)
        merged = agg.merged(partials, is_partials=True)
        results.append({r["source"]: bytes(r["sketch"]) for r in merged.collect()})
    assert results[0] and results[0] == results[1]


def test_spark_fi_salted_merge_byte_identical_to_flat(spark, tmp_path):
    """The salted stage-1 uses the exact untrimmed intermediate merge, so
    the two-stage tree is byte-identical to the flat merge — the property
    that makes axis-A skew handling free of estimate drift for MG."""
    from sketchlib.agg import FiAggregator
    from sketchlib.data import SEQUENCES_SCHEMA, gen_sequences_pandas

    path = str(tmp_path / "seqs.parquet")
    spark.createDataFrame(
        gen_sequences_pandas(4000), schema=SEQUENCES_SCHEMA
    ).repartition(6).write.parquet(path)
    agg = FiAggregator(capacity=64, key_cols=["source"])

    def run(salt):
        partials = agg.partials_from_parquet(spark, path, per_shard=True)
        merged = agg.merged(partials, is_partials=True, salt=salt)
        return {r["source"]: bytes(r["sketch"]) for r in merged.collect()}

    flat, salted = run(None), run(4)
    assert flat and flat == salted
