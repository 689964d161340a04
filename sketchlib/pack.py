"""Training-data mixture sampling and sequence packing.

Two operators a large-scale LLM training pipeline runs after curation:

- **temperature mixture sampling** (``mixture_budgets`` + ``select_mixture``):
  allocate a global token budget across sources proportional to
  ``available_tokens ** alpha`` (the multilingual-sampling recipe — alpha<1
  flattens the head so low-resource sources are over-represented), then take
  each source's docs in a deterministic pseudo-random order until its budget
  fills. Selection is the exact prefix rule: a doc enters iff the tokens
  accumulated before it (within its source, in priority order) are below the
  source budget.
- **concat-and-chunk packing** (``pack_offsets``): lay the selected docs
  end-to-end in priority order and cut fixed-length training sequences; each
  doc gets its global token offset and the [first_seq, last_seq] span of
  sequence ids it touches.

Spark-first scale shape — the whole pipeline avoids the classic
scale-killer (a global ``Window.orderBy`` cumsum collapses onto ONE
partition): both the per-source and the global running sums use a
**two-phase distributed prefix-sum** over a range-partitioned,
within-partition-sorted layout:

  1. one ``repartitionByRange(prio).sortWithinPartitions(prio)`` shuffle
     fixes a total order that is ALSO a per-partition local order;
  2. pass A (mapInPandas) emits per-(partition, source) token sums — a
     ``num_partitions x num_sources`` matrix, collected to the driver
     (bounded by the partition count times the source registry, never by
     corpus size);
  3. the driver turns the matrix into exclusive offsets and broadcasts
     them back; pass B computes exact global running sums locally.

Every quantity is integer arithmetic (budgets use ``isqrt``-style integer
weights, priorities a multiplicative hash) so the result is bit-reproducible
across engines and partitionings — the DuckDB oracle reproduces it with
window functions, and partition-count invariance is a tested law.

Determinism: priority = (doc_id * 2654435761) mod 2^64-bucket — the odd
multiplier makes the map injective over doc_id < 2^32, so the order is
total (no ties) wherever doc ids are unique.
"""

from __future__ import annotations

import math
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PRIO_MULT = 2654435761  # Knuth multiplicative hash constant (odd -> injective)
PRIO_MOD = 2**32


def doc_priority(doc_id_col: F.Column) -> F.Column:
    """Deterministic pseudo-random total order over docs (injective for
    doc_id in [0, 2^32) because the multiplier is odd)."""
    return F.pmod(doc_id_col.cast("long") * F.lit(PRIO_MULT), F.lit(PRIO_MOD))


def mixture_budgets(
    source_tokens: dict[str, int], budget_frac_num: int = 1, budget_frac_den: int = 2
) -> dict[str, int]:
    """Integer temperature-mixture allocation (alpha = 0.5).

    Global budget B = total_tokens * num // den; source s gets
    ``B * isqrt(tokens_s) // sum(isqrt(tokens))``. Pure integer arithmetic —
    identical in any engine, no float summation-order hazards.
    """
    total = sum(source_tokens.values())
    budget = total * budget_frac_num // budget_frac_den
    weights = {s: math.isqrt(int(t)) for s, t in source_tokens.items()}
    wsum = sum(weights.values())
    if wsum == 0:
        return {s: 0 for s in source_tokens}
    return {s: budget * w // wsum for s, w in weights.items()}


def _range_sorted(df: DataFrame, num_partitions: int) -> DataFrame:
    """One shuffle that fixes the total priority order as a partition-local
    order: range-partition on prio, sort within each partition."""
    return df.repartitionByRange(num_partitions, "prio").sortWithinPartitions("prio")


def _partition_source_sums(layout: DataFrame) -> pd.DataFrame:
    """Pass A of the prefix-sum: per-(partition, source) token sums.

    Output is num_partitions x num_sources rows — bounded by cluster and
    registry size, never corpus size — safe to collect.
    """

    def sums(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        parts = []
        for pdf in pdfs:
            if len(pdf):
                parts.append(pdf.groupby("source", sort=False)["n_tok"].sum())
        if parts:
            tot = pd.concat(parts).groupby(level=0).sum()
            yield pd.DataFrame(
                {"pid": pid, "source": tot.index.astype(str), "sum_tok": tot.to_numpy()}
            )

    out = layout.mapInPandas(sums, "pid int, source string, sum_tok long")
    return out.toPandas()


def select_mixture(
    spark: SparkSession,
    docs: DataFrame,
    budgets: "dict[str, int] | Callable[[dict[str, int]], dict[str, int]]",
    num_partitions: int | None = None,
    return_budgets: bool = False,
):
    """Exact prefix-rule mixture selection without a per-source Window.

    ``docs`` needs columns (doc_id, source, n_tok); rows with n_tok <= 0 are
    dropped (they carry no training signal and would degenerate the packing
    spans). Returns the selected rows with their within-source exclusive
    running sum ``src_before`` (or ``(selected, budgets)`` when
    ``return_budgets=True``).

    ``budgets`` may be a callable ``source_totals -> budgets`` (e.g.
    ``mixture_budgets``): the per-source totals are then derived from the
    prefix-sum pass-A matrix this function already collects, so the budget
    allocation costs ZERO extra Spark jobs — at corpus scale that removes a
    full scan+tokenize+groupBy pass that a separate totals query would run.

    A ``Window.partitionBy(source)`` would sort EACH SOURCE on a single
    partition — a 30 TB source becomes one task. The two-phase prefix-sum
    keeps every partition range-bounded regardless of source skew.
    """
    num_partitions = num_partitions or docs.sparkSession.sparkContext.defaultParallelism
    base = (
        docs.where(F.col("n_tok") > 0)
        .select("doc_id", "source", "n_tok", doc_priority(F.col("doc_id")).alias("prio"))
    )
    layout = _range_sorted(base, num_partitions).persist()
    try:
        mat = _partition_source_sums(layout)
        if callable(budgets):
            totals = {
                str(s): int(t)
                for s, t in mat.groupby("source", sort=False)["sum_tok"].sum().items()
            }
            budgets = budgets(totals)
        # exclusive offset of partition pid within source s = sum of sums
        # over partitions strictly before pid (partition ranges follow the
        # global prio order, so partition order IS priority order)
        offsets: dict[tuple[int, str], int] = {}
        for src, grp in mat.sort_values("pid").groupby("source", sort=False):
            run = 0
            for pid, s in zip(grp["pid"], grp["sum_tok"]):
                offsets[(int(pid), str(src))] = run
                run += int(s)
        b_off = spark.sparkContext.broadcast(offsets)
        b_bud = spark.sparkContext.broadcast(dict(budgets))

        def select(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            # running per-source totals, seeded with this partition's global
            # exclusive offsets; carried ACROSS Arrow batches — mapInPandas
            # splits one partition into many pdf chunks, so a per-chunk
            # cumsum alone would silently reset at every batch boundary
            carry = {s: v for (p, s), v in b_off.value.items() if p == pid}
            bud = b_bud.value
            for pdf in pdfs:
                if not len(pdf):
                    continue
                cum = pdf.groupby("source", sort=False)["n_tok"].cumsum() - pdf["n_tok"]
                start = pdf["source"].map(carry).fillna(0).astype("int64")
                src_before = cum + start
                budget = pdf["source"].map(bud).fillna(0).astype("int64")
                keep = src_before < budget
                out = pdf.loc[keep, ["doc_id", "source", "n_tok", "prio"]].copy()
                out["src_before"] = src_before[keep]
                for s, v in pdf.groupby("source", sort=False)["n_tok"].sum().items():
                    carry[s] = carry.get(s, 0) + int(v)
                yield out

        schema = "doc_id long, source string, n_tok long, prio long, src_before long"
        # eager checkpoint: the selection is consumed by pass A of the
        # packing prefix-sum AND the final projection — compute it once
        selected = layout.mapInPandas(select, schema).localCheckpoint(eager=True)
        return (selected, dict(budgets)) if return_budgets else selected
    finally:
        layout.unpersist()


def pack_offsets(
    spark: SparkSession,
    selected: DataFrame,
    seq_len: int,
    num_partitions: int | None = None,
    layout_sorted: bool = False,
) -> DataFrame:
    """Concat-and-chunk packing: global token offset per selected doc.

    Adds ``tok_before`` (exclusive global running sum in priority order),
    ``first_seq``/``last_seq`` (the fixed-length training sequences the doc's
    tokens land in). Same two-phase prefix-sum as the selection — the global
    cumsum never touches a single-partition sort.

    ``layout_sorted=True`` declares that ``selected`` is ALREADY in the
    prefix-sum layout (prio-range-partitioned, prio-sorted within
    partitions) — true for ``select_mixture`` output, whose mapInPandas
    preserves the layout it was computed over. That skips re-shuffling the
    selected set: at corpus scale this removes one full shuffle+sort of
    every selected row from the pipeline.
    """
    num_partitions = num_partitions or selected.sparkSession.sparkContext.defaultParallelism
    if layout_sorted:
        # the caller guarantees the layout; selected is typically already
        # checkpointed by select_mixture, so no extra persist is needed —
        # the two passes below re-read materialized blocks
        layout = selected
    else:
        layout = _range_sorted(selected, num_partitions).persist()
    try:
        def sums(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            tot = 0
            for pdf in pdfs:
                tot += int(pdf["n_tok"].sum())
            yield pd.DataFrame({"pid": [pid], "sum_tok": [tot]})

        mat = layout.mapInPandas(sums, "pid int, sum_tok long").toPandas()
        run, offsets = 0, {}
        for pid, s in zip(mat.sort_values("pid")["pid"], mat.sort_values("pid")["sum_tok"]):
            offsets[int(pid)] = run
            run += int(s)
        b_off = spark.sparkContext.broadcast(offsets)

        def offset(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            # running total carried across Arrow batches (one partition
            # arrives as many chunks; the cumsum must not reset per chunk)
            run = b_off.value.get(pid, 0)
            for pdf in pdfs:
                if not len(pdf):
                    continue
                out = pdf.copy()
                out["tok_before"] = pdf["n_tok"].cumsum() - pdf["n_tok"] + run
                out["first_seq"] = out["tok_before"] // seq_len
                out["last_seq"] = (out["tok_before"] + out["n_tok"] - 1) // seq_len
                run += int(pdf["n_tok"].sum())
                yield out

        schema = (
            "doc_id long, source string, n_tok long, prio long, src_before long, "
            "tok_before long, first_seq long, last_seq long"
        )
        packed = layout.mapInPandas(offset, schema).localCheckpoint(eager=True)
        return packed
    finally:
        if not layout_sorted:
            layout.unpersist()


def emit_sequences(packed: DataFrame, seq_len: int) -> DataFrame:
    """Materialize the packed training sequences as doc-slice rows.

    Input is ``pack_offsets`` output (one row per selected doc with its
    global ``tok_before`` and the [first_seq, last_seq] span). Output is one
    row per (sequence, doc) slice::

        seq_id | doc_id | doc_start | seq_start | slice_len

    where the slice is tokens [doc_start, doc_start + slice_len) of the doc,
    landing at offset ``seq_start`` of sequence ``seq_id``. Laws (tested):
    slices tile every sequence exactly (sum of slice_len per seq_id ==
    seq_len, except the final partial sequence) and tile every doc exactly
    (sum of slice_len per doc_id == n_tok).

    Entirely built-in expressions — sequence() + explode + arithmetic; no
    Python, no window, no extra shuffle beyond the explode's narrow
    dependency. At 100 TB this is the map-side projection a training-data
    writer runs right before grouping slices into shard files.
    """
    span = F.explode(F.sequence(F.col("first_seq"), F.col("last_seq"))).alias("seq_id")
    out = packed.select("doc_id", "n_tok", "tok_before", span)
    seq_floor = F.col("seq_id") * F.lit(seq_len)
    doc_start = F.greatest(F.lit(0), seq_floor - F.col("tok_before"))
    doc_end = F.least(
        F.col("n_tok"), seq_floor + F.lit(seq_len) - F.col("tok_before")
    )
    return out.select(
        "doc_id",
        F.col("seq_id").cast("long").alias("seq_id"),
        doc_start.cast("long").alias("doc_start"),
        (F.col("tok_before") + doc_start - seq_floor).cast("long").alias("seq_start"),
        (doc_end - doc_start).cast("long").alias("slice_len"),
    )
