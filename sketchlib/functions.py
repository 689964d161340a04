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

    for name, fn in [
        ("hll_estimate", hll_estimate),
        ("hll_merge_pair", hll_merge_pair),
        ("kll_median", kll_median),
        ("tdigest_p99", tdigest_p99),
        ("cms_total", cms_total),
        ("bloom_fpp", bloom_fpp),
    ]:
        spark.udf.register(prefix + name, fn)
