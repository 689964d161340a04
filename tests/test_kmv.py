"""KMV/theta sketch: exactness below k, published error bound above it,
order-exact (byte-identical) merges, native intersection/Jaccard accuracy,
codec round-trip, and distributed byte-determinism across parallelism."""

import numpy as np
import pytest

from sketchlib.kmv import KmvSketch


def _sketch_of(values, k=1024, seed=314):
    s = KmvSketch.empty(k, seed)
    s.update_batch(np.asarray(values, dtype=np.int32))
    return s


def test_exact_below_k():
    vals = np.arange(700, dtype=np.int32)
    s = _sketch_of(vals, k=1024)
    assert s.estimate() == 700


def test_duplicates_do_not_inflate():
    vals = np.tile(np.arange(500, dtype=np.int32), 40)
    s = _sketch_of(vals, k=1024)
    assert s.estimate() == 500


def test_estimate_within_published_bound():
    k = 1024
    n = 200_000
    s = _sketch_of(np.arange(n, dtype=np.int32), k=k)
    rel = abs(s.estimate() / n - 1.0)
    assert rel <= 3 * KmvSketch.std_error(k), rel


def test_merge_equals_single_build_bytes():
    a = _sketch_of(np.arange(0, 60_000, dtype=np.int32))
    b = _sketch_of(np.arange(30_000, 90_000, dtype=np.int32))
    whole = _sketch_of(np.arange(0, 90_000, dtype=np.int32))
    a.merge(b)
    assert a.to_bytes() == whole.to_bytes()


def test_merge_laws():
    xs = [
        _sketch_of(np.arange(i * 7_000, (i + 2) * 7_000, dtype=np.int32), k=256)
        for i in range(4)
    ]

    def merged(order):
        out = KmvSketch.empty(256, 314)
        for i in order:
            out.merge(xs[i])
        return out.to_bytes()

    assert merged([0, 1, 2, 3]) == merged([3, 1, 0, 2])  # commutative/associative
    twice = KmvSketch.empty(256, 314)
    twice.merge(xs[0]).merge(xs[0])
    assert twice.to_bytes() == xs[0].to_bytes()  # idempotent
    with_empty = KmvSketch.empty(256, 314)
    with_empty.merge(xs[0]).merge(KmvSketch.empty(256, 314))
    assert with_empty.to_bytes() == xs[0].to_bytes()  # identity


def test_merge_rejects_config_mismatch():
    with pytest.raises(ValueError):
        KmvSketch.empty(256, 314).merge(KmvSketch.empty(512, 314))
    with pytest.raises(ValueError):
        KmvSketch.empty(256, 314).merge(KmvSketch.empty(256, 999))


def test_roundtrip_bytes():
    s = _sketch_of(np.arange(50_000, dtype=np.int32), k=777)
    r = KmvSketch.from_bytes(s.to_bytes())
    assert (r.k, r.seed) == (s.k, s.seed)
    assert np.array_equal(r.values, s.values)
    assert r.estimate() == s.estimate()
    assert r.to_bytes() == s.to_bytes()


def test_jaccard_and_intersection_accuracy():
    k = 2048
    n = 120_000
    overlap = 40_000  # true jaccard = 40k / 200k = 0.2
    a = _sketch_of(np.arange(0, n, dtype=np.int32), k=k)
    b = _sketch_of(np.arange(n - overlap, 2 * n - overlap, dtype=np.int32), k=k)
    true_union = 2 * n - overlap
    true_j = overlap / true_union
    j = KmvSketch.jaccard(a, b)
    # binomial std of the K_cap/k ratio + union-estimate error
    assert abs(j - true_j) <= 4 * np.sqrt(true_j * (1 - true_j) / k) + 1e-9, (j, true_j)
    inter = KmvSketch.intersection_estimate(a, b)
    bound = 4 * np.sqrt(true_j * (1 - true_j) / k) * true_union + 3 * KmvSketch.std_error(
        k
    ) * overlap
    assert abs(inter - overlap) <= bound, (inter, overlap, bound)
    u = KmvSketch.union(a, b)
    assert abs(u.estimate() / true_union - 1.0) <= 3 * KmvSketch.std_error(k)


def test_disjoint_and_identical_sets():
    a = _sketch_of(np.arange(0, 50_000, dtype=np.int32), k=512)
    b = _sketch_of(np.arange(50_000, 100_000, dtype=np.int32), k=512)
    assert KmvSketch.jaccard(a, a) == 1.0
    # disjoint sets: hash collisions aside, no shared minima
    assert KmvSketch.jaccard(a, b) <= 0.02
    empty = KmvSketch.empty(512, 314)
    assert KmvSketch.jaccard(empty, empty) == 1.0
    assert KmvSketch.union(a, empty).to_bytes() == a.to_bytes()


def test_string_and_int64_kinds():
    s = KmvSketch.empty(256, 314)
    s.update_batch([f"doc{i}" for i in range(5000)], kind="string")
    assert abs(s.estimate() / 5000 - 1.0) <= 3 * KmvSketch.std_error(256)
    t = KmvSketch.empty(256, 314)
    t.update_batch(np.arange(5000, dtype=np.int64) << 33, kind="int64")
    assert abs(t.estimate() / 5000 - 1.0) <= 3 * KmvSketch.std_error(256)


# -- distributed -----------------------------------------------------------------


def test_spark_kmv_matches_exact_and_is_parallelism_invariant(spark):
    from pyspark.sql import functions as F

    from sketchlib.agg import KmvAggregator
    from sketchlib.data import SEQUENCES_SCHEMA, gen_sequences_pandas

    pdf = gen_sequences_pandas(3000)
    df = spark.createDataFrame(pdf, schema=SEQUENCES_SCHEMA)
    agg = KmvAggregator(k=2048, key_cols=["source"])
    blobs = {}
    for parts in (3, 17):
        rows = agg.merged(df.repartition(parts)).collect()
        blobs[parts] = {r["source"]: bytes(r["sketch"]) for r in rows}
    # byte-identical sketches at both partitionings (order-exact algebra)
    assert blobs[3] == blobs[17]
    exact = {
        r["source"]: r["exact"]
        for r in df.select("source", F.explode("tokens").alias("t"))
        .groupBy("source")
        .agg(F.countDistinct("t").alias("exact"))
        .collect()
    }
    from sketchlib.kmv import KmvSketch as S

    for src, blob in blobs[3].items():
        est = S.from_bytes(blob).estimate()
        assert abs(est / exact[src] - 1.0) <= 3 * S.std_error(2048), (src, est, exact[src])


def test_delta_codec_roundtrip_and_determinism():
    """FOR/delta at-rest encoding: exact roundtrip in every regime, auto
    mode picks the smaller blob, legacy raw blobs parse unchanged, and
    bytes stay a pure function of sketch state (the distributed
    byte-identity law is encoding-independent)."""
    import numpy as np

    from sketchlib.kmv import KmvSketch, values_from_blobs

    rng = np.random.default_rng(9)
    for k, n_items in ((64, 10), (256, 100_000), (4096, 500_000), (1024, 0)):
        s = KmvSketch(k=k)
        if n_items:
            s.update_batch(rng.integers(0, 1 << 31, n_items, dtype=np.int64).astype(np.int32))
        for mode in (None, "raw", "delta"):
            r = KmvSketch.from_bytes(s.to_bytes(mode=mode))
            assert (r.k, r.seed) == (s.k, s.seed)
            assert np.array_equal(r.values, s.values), (k, n_items, mode)
        assert len(s.to_bytes()) <= len(s.to_bytes(mode="raw"))
        vals, _, _ = values_from_blobs([s.to_bytes(mode="raw"), s.to_bytes(mode="delta")])
        assert all(np.array_equal(v, s.values) for v in vals)
    # same value set -> same bytes regardless of build path
    a, b = KmvSketch(k=512), KmvSketch(k=512)
    x = rng.integers(0, 500_000, 50_000).astype(np.int32)
    a.update_batch(x)
    for chunk in np.array_split(x, 7):
        b.update_batch(chunk)
    assert a.to_bytes() == b.to_bytes()


def test_difference_estimate_accuracy_and_laws():
    k = 2048
    n = 120_000
    overlap = 40_000  # |A\B| = |B\A| = 80k
    a = _sketch_of(np.arange(0, n, dtype=np.int32), k=k)
    b = _sketch_of(np.arange(n - overlap, 2 * n - overlap, dtype=np.int32), k=k)
    true_d = n - overlap
    true_union = 2 * n - overlap
    frac = true_d / true_union
    d_ab = KmvSketch.difference_estimate(a, b)
    bound = 4 * np.sqrt(frac * (1 - frac) / k) * true_union + 3 * KmvSketch.std_error(
        k
    ) * true_d
    assert abs(d_ab - true_d) <= bound, (d_ab, true_d, bound)
    # self-consistency: A\B + B\A + A∩B share the union denominator, so the
    # three estimates sum to (+-1 rounding each) the union estimate
    parts = (
        d_ab
        + KmvSketch.difference_estimate(b, a)
        + KmvSketch.intersection_estimate(a, b)
    )
    assert abs(parts - KmvSketch.union(a, b).estimate()) <= 3
    # identities
    assert KmvSketch.difference_estimate(a, a) == 0
    empty = KmvSketch.empty(k, 314)
    assert KmvSketch.difference_estimate(empty, a) == 0
    assert KmvSketch.difference_estimate(empty, empty) == 0
    assert abs(KmvSketch.difference_estimate(a, empty) / n - 1.0) <= 3 * KmvSketch.std_error(k)
    with pytest.raises(ValueError):
        KmvSketch.difference_estimate(a, KmvSketch.empty(k, 999))


def test_pair_set_algebra_difference_matches_methods():
    from sketchlib.kmv import pair_set_algebra

    k = 512
    sketches = [
        _sketch_of(np.arange(i * 10_000, (i + 3) * 10_000, dtype=np.int32), k=k)
        for i in range(4)
    ]
    a_vals = [s.values for s in sketches]
    b_vals = [sketches[(i + 1) % 4].values for i in range(4)]
    _, _, _, ed = pair_set_algebra(a_vals, b_vals, k)
    for i in range(4):
        assert ed[i] == KmvSketch.difference_estimate(sketches[i], sketches[(i + 1) % 4])
