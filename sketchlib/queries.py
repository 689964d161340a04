"""Named queries — the library's user-facing query surface.

Each function takes (spark, sf_dir) and returns a DataFrame; these are wired
into ``__spark_entry__.queries()`` and ``bench.py``. Approximate (sketch)
results are driver-checked rows-only; exact companions carry full DuckDB
oracles. Column aliases here are load-bearing: they must match the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .agg import HllAggregator
from .data import load_table, rows_for_sf_dir, sequences_parquet
from .hll import HllSketch

DEFAULT_P = 14


def sequences_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialized canonical sequences table at this scale."""
    return sequences_parquet(spark, rows_for_sf_dir(sf_dir))


def sequences_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical sequences table as a DataFrame (generic Spark path)."""
    return spark.read.parquet(sequences_path(spark, sf_dir))


# ---- HLL: distinct tokens over the canonical sequences table -----------------


def hll_tokens_per_source(spark: SparkSession, sf_dir: str, p: int = DEFAULT_P) -> DataFrame:
    """Approximate distinct tokens per source (the flagship sketch query).

    Uses the direct-parquet scan path: task-local pyarrow row-group reads
    feed the numpy kernel with zero JVM->Arrow re-encode of token arrays.
    """
    agg = HllAggregator(p=p, key_cols=["source"], value_col="tokens", value_kind="tokens")
    return agg.estimates(sequences_path(spark, sf_dir), spark=spark).orderBy("source")


def hll_tokens_global(spark: SparkSession, sf_dir: str, p: int = DEFAULT_P) -> DataFrame:
    """Approximate distinct tokens over the whole table (keyless rollup)."""
    agg = HllAggregator(p=p, key_cols=[], value_col="tokens", value_kind="tokens")
    return agg.estimates(sequences_path(spark, sf_dir), salt=8, spark=spark)


def exact_distinct_tokens_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact oracle companion of hll_tokens_per_source (small scales only —

    this explodes every token; the thing the sketch exists to avoid)."""
    seqs = sequences_for(spark, sf_dir)
    return (
        seqs.select("source", F.explode("tokens").alias("tok"))
        .groupBy("source")
        .agg(F.countDistinct("tok").alias("distinct_tokens"))
        .orderBy("source")
    )


def hll_tokens_accuracy(spark: SparkSession, sf_dir: str, p: int = DEFAULT_P) -> DataFrame:
    """Per-source sketch estimate vs exact, with the published-bound check.

    within_3sigma asserts |est/exact - 1| <= 3 * 1.04/sqrt(2^p): an
    SQL-expressible correctness statement about an approximate result.
    """
    est = hll_tokens_per_source(spark, sf_dir, p).select("source", "est_distinct")
    exact = exact_distinct_tokens_per_source(spark, sf_dir)
    bound = 3.0 * HllSketch.std_error(p)
    return (
        exact.join(est, "source")
        .select(
            "source",
            "distinct_tokens",
            (
                F.abs(F.col("est_distinct") / F.col("distinct_tokens") - 1.0) <= F.lit(bound)
            ).alias("within_3sigma"),
        )
        .orderBy("source")
    )


# ---- HLL over driver-provided tables -----------------------------------------


def hll_users_per_event_type(spark: SparkSession, sf_dir: str, p: int = DEFAULT_P) -> DataFrame:
    """Approximate distinct user_id per event_type (int64 keys)."""
    events = load_table(spark, sf_dir, "events")
    agg = HllAggregator(p=p, key_cols=["event_type"], value_col="user_id", value_kind="int64")
    return agg.estimates(events).orderBy("event_type")


def hll_users_accuracy(spark: SparkSession, sf_dir: str, p: int = DEFAULT_P) -> DataFrame:
    """Estimate-vs-exact bound check on the events table (oracle-checkable)."""
    events = load_table(spark, sf_dir, "events")
    exact = (
        events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    est = hll_users_per_event_type(spark, sf_dir, p).select("event_type", "est_distinct")
    bound = 3.0 * HllSketch.std_error(p)
    return (
        exact.join(est, "event_type")
        .select(
            "event_type",
            "exact_users",
            (F.abs(F.col("est_distinct") / F.col("exact_users") - 1.0) <= F.lit(bound)).alias(
                "within_3sigma"
            ),
        )
        .orderBy("event_type")
    )


def exact_distinct_parts_per_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct l_partkey per l_returnflag (built-in Spark agg path)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("distinct_parts"))
        .orderBy("l_returnflag")
    )


def hll_parts_accuracy(spark: SparkSession, sf_dir: str, p: int = DEFAULT_P) -> DataFrame:
    """Bound check for distinct l_partkey per l_returnflag via the sketch."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = HllAggregator(p=p, key_cols=["l_returnflag"], value_col="l_partkey", value_kind="int64")
    est = agg.estimates(li).select("l_returnflag", "est_distinct")
    exact = exact_distinct_parts_per_returnflag(spark, sf_dir)
    bound = 3.0 * HllSketch.std_error(p)
    return (
        exact.join(est, "l_returnflag")
        .select(
            "l_returnflag",
            "distinct_parts",
            (F.abs(F.col("est_distinct") / F.col("distinct_parts") - 1.0) <= F.lit(bound)).alias(
                "within_3sigma"
            ),
        )
        .orderBy("l_returnflag")
    )
