"""SparkSession factory tuned for this library.

Local-mode defaults mirror what we'd set on a real cluster: AQE on (runtime
coalesce + skew handling), shuffle partitions sized to cores (not 200), Arrow
transfer on with self-destruct to cut copies. On a multi-executor cluster the
same code runs unchanged via ``spark-submit --py-files sketchlib.zip``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "sketchlib",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # joins: let the planner use shuffled-hash when its size conditions
        # fit (sort-merge stays the fallback — it spills gracefully), and
        # let AQE rewrite SMJ->SHJ at runtime when every post-shuffle
        # partition is small (optimization guide §3.1/§9). Both are
        # size-gated, so the behavior scales with data, not with local mode.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.selfDestruct.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SKETCHLIB_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def release(df) -> bool:
    """Release the block-manager storage behind an eager ``localCheckpoint``
    result (the library returns these from e.g. ``dedup.near_dup_pairs`` so
    intermediate caches can be dropped before the caller consumes the small
    result).

    ``DataFrame.unpersist()`` is a no-op for checkpointed results — the
    blocks are RDD-level persists outside the SQL cache manager — so this
    reaches the ``LogicalRDD``'s underlying RDD and unpersists it.  Returns
    True when a checkpointed RDD was found and released.  Safe to skip: the
    blocks are MEMORY_AND_DISK and evicted under pressure; releasing just
    frees them deterministically in long-lived sessions.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
        return True
    except Exception:
        return False  # not a LogicalRDD-backed result; nothing to release
