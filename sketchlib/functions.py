"""SQL-facing UDF registration.

``register(spark)`` exposes the sketch finalizers/algebra as SQL functions so
checkpoint tables (BinaryType sketch columns) are queryable in pure SQL::

    SELECT source, hll_estimate(sketch) FROM parquet.`.../partials`
    GROUP BY source ...  -- after hll_merge aggregation

All functions are Arrow-batched pandas UDFs (no per-row Python dispatch
beyond the blob decode itself, which is the payload).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bloom import BloomFilter
from .cms import CountMinSketch
from .hll import HllSketch
from .kll import KllSketch
from .kmv import KmvSketch
from .tdigest import TDigest


def register(spark: SparkSession, prefix: str = "") -> None:
    """Register sketch SQL functions (optionally name-prefixed)."""

    @F.pandas_udf(T.LongType())
    def hll_estimate(blobs: pd.Series) -> pd.Series:
        return blobs.map(lambda b: HllSketch.from_bytes(bytes(b)).cardinality()).astype("int64")

    @F.pandas_udf(T.BinaryType())
    def hll_merge_pair(a: pd.Series, b: pd.Series) -> pd.Series:
        def m(x, y):
            if x is None:
                return bytes(y)
            if y is None:
                return bytes(x)
            return HllSketch.from_bytes(bytes(x)).merge(HllSketch.from_bytes(bytes(y))).to_bytes()

        return pd.Series([m(x, y) for x, y in zip(a, b)])

    @F.pandas_udf(T.DoubleType())
    def kll_median(blobs: pd.Series) -> pd.Series:
        return blobs.map(lambda b: KllSketch.from_bytes(bytes(b)).quantile(0.5))

    @F.pandas_udf(T.DoubleType())
    def tdigest_p99(blobs: pd.Series) -> pd.Series:
        return blobs.map(lambda b: TDigest.from_bytes(bytes(b)).quantile(0.99))

    @F.pandas_udf(T.LongType())
    def cms_total(blobs: pd.Series) -> pd.Series:
        return blobs.map(lambda b: CountMinSketch.from_bytes(bytes(b)).total).astype("int64")

    @F.pandas_udf(T.DoubleType())
    def bloom_fpp(blobs: pd.Series) -> pd.Series:
        return blobs.map(lambda b: BloomFilter.from_bytes(bytes(b)).fpp_estimate())

    # two-argument set-algebra UDFs NULL-guard both sides: the natural
    # consumer is a FULL OUTER JOIN of two per-key sketch tables, where a
    # key present on one side only yields a NULL blob — the result is then
    # SQL NULL, same convention as built-in binary functions. A one-sided
    # NULL union degrades to the present side's estimate (union with the
    # empty set), matching hll_merge_pair.

    @F.pandas_udf(T.LongType())
    def hll_union_estimate(a: pd.Series, b: pd.Series) -> pd.Series:
        def one(x, y):
            if x is None and y is None:
                return None
            if x is None:
                return HllSketch.from_bytes(bytes(y)).cardinality()
            if y is None:
                return HllSketch.from_bytes(bytes(x)).cardinality()
            return HllSketch.union_estimate(
                HllSketch.from_bytes(bytes(x)), HllSketch.from_bytes(bytes(y))
            )

        return pd.Series([one(x, y) for x, y in zip(a, b)], dtype="Int64")

    @F.pandas_udf(T.LongType())
    def hll_intersection_estimate(a: pd.Series, b: pd.Series) -> pd.Series:
        def one(x, y):
            if x is None or y is None:
                # intersection with an absent key's (empty) set is 0; both
                # NULL stays NULL
                return None if (x is None and y is None) else 0
            sa, sb = HllSketch.from_bytes(bytes(x)), HllSketch.from_bytes(bytes(y))
            return HllSketch.intersection_estimate(sa, sb)

        return pd.Series([one(x, y) for x, y in zip(a, b)], dtype="Int64")

    @F.pandas_udf(T.LongType())
    def cms_inner_product(a: pd.Series, b: pd.Series) -> pd.Series:
        def one(x, y):
            if x is None or y is None:
                return None
            return CountMinSketch.inner_product(
                CountMinSketch.from_bytes(bytes(x)), CountMinSketch.from_bytes(bytes(y))
            )

        return pd.Series([one(x, y) for x, y in zip(a, b)], dtype="Int64")

    @F.pandas_udf(T.DoubleType())
    def kll_quantile(blobs: pd.Series, qs: pd.Series) -> pd.Series:
        return pd.Series(
            [KllSketch.from_bytes(bytes(b)).quantile(float(q)) for b, q in zip(blobs, qs)]
        )

    @F.pandas_udf(T.DoubleType())
    def tdigest_quantile(blobs: pd.Series, qs: pd.Series) -> pd.Series:
        return pd.Series(
            [TDigest.from_bytes(bytes(b)).quantile(float(q)) for b, q in zip(blobs, qs)]
        )

    @F.pandas_udf(T.LongType())
    def cms_point(blobs: pd.Series, values: pd.Series) -> pd.Series:
        return pd.Series(
            [
                int(CountMinSketch.from_bytes(bytes(b)).query_batch([int(v)], kind="int64")[0])
                for b, v in zip(blobs, values)
            ]
        ).astype("int64")

    @F.pandas_udf(T.LongType())
    def kmv_estimate(blobs: pd.Series) -> pd.Series:
        return blobs.map(lambda b: KmvSketch.from_bytes(bytes(b)).estimate()).astype("int64")

    # KMV set algebra carries the same NULL convention as the HLL pair UDFs
    # above: one-sided NULL = algebra with the empty set, both NULL = NULL.

    @F.pandas_udf(T.DoubleType())
    def kmv_jaccard(a: pd.Series, b: pd.Series) -> pd.Series:
        def one(x, y):
            if x is None and y is None:
                return None
            if x is None or y is None:
                # one-sided NULL = jaccard against the EMPTY set, computed
                # literally so an empty non-null sketch still gives 1.0
                # (two empty sets are identical), matching blob-vs-blob
                s = KmvSketch.from_bytes(bytes(x if x is not None else y))
                return KmvSketch.jaccard(s, KmvSketch.empty(s.k, s.seed))
            return KmvSketch.jaccard(
                KmvSketch.from_bytes(bytes(x)), KmvSketch.from_bytes(bytes(y))
            )

        return pd.Series([one(x, y) for x, y in zip(a, b)], dtype="float64")

    @F.pandas_udf(T.LongType())
    def kmv_intersection_estimate(a: pd.Series, b: pd.Series) -> pd.Series:
        def one(x, y):
            if x is None or y is None:
                return None if (x is None and y is None) else 0
            return KmvSketch.intersection_estimate(
                KmvSketch.from_bytes(bytes(x)), KmvSketch.from_bytes(bytes(y))
            )

        return pd.Series([one(x, y) for x, y in zip(a, b)], dtype="Int64")

    @F.pandas_udf(T.LongType())
    def kmv_union_estimate(a: pd.Series, b: pd.Series) -> pd.Series:
        def one(x, y):
            if x is None and y is None:
                return None
            if x is None:
                return KmvSketch.from_bytes(bytes(y)).estimate()
            if y is None:
                return KmvSketch.from_bytes(bytes(x)).estimate()
            return KmvSketch.union(
                KmvSketch.from_bytes(bytes(x)), KmvSketch.from_bytes(bytes(y))
            ).estimate()

        return pd.Series([one(x, y) for x, y in zip(a, b)], dtype="Int64")

    @F.pandas_udf(T.DoubleType())
    def minhash_jaccard(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        from .minhash import jaccard_from_blob_batches

        if len(a) == 0:
            return pd.Series(np.empty(0))
        return pd.Series(jaccard_from_blob_batches(a, b))

    @F.pandas_udf(T.IntegerType())
    def simhash_hamming(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        x = a.to_numpy(dtype=np.int64).view(np.uint64) ^ b.to_numpy(
            dtype=np.int64
        ).view(np.uint64)
        # vectorized popcount: sum the bit table of each byte
        table = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
        cnt = table[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1)
        return pd.Series(cnt.astype("int32"))

    for name, fn in [
        ("hll_estimate", hll_estimate),
        ("hll_merge_pair", hll_merge_pair),
        ("hll_union_estimate", hll_union_estimate),
        ("hll_intersection_estimate", hll_intersection_estimate),
        ("cms_inner_product", cms_inner_product),
        ("kll_median", kll_median),
        ("kll_quantile", kll_quantile),
        ("tdigest_p99", tdigest_p99),
        ("tdigest_quantile", tdigest_quantile),
        ("cms_total", cms_total),
        ("cms_point", cms_point),
        ("bloom_fpp", bloom_fpp),
        ("kmv_estimate", kmv_estimate),
        ("kmv_jaccard", kmv_jaccard),
        ("kmv_intersection_estimate", kmv_intersection_estimate),
        ("kmv_union_estimate", kmv_union_estimate),
        ("minhash_jaccard", minhash_jaccard),
        ("simhash_hamming", simhash_hamming),
    ]:
        spark.udf.register(prefix + name, fn)
