"""Streaming incremental sketches: micro-batch updates converge to the exact

batch-build answer (stream/batch parity)."""

import os

import numpy as np
import pytest

from sketchlib.data import SEQUENCES_SCHEMA, gen_sequences_pandas
from sketchlib.hll import HllSketch
from sketchlib.streaming import hll_streaming_estimates

P = 12


def test_streaming_matches_batch_oracle(spark, tmp_path):
    pdf = gen_sequences_pandas(2_000)
    b1, b2 = pdf.iloc[:1_000], pdf.iloc[1_000:]
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(b1, schema=SEQUENCES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    stream = (
        spark.readStream.schema(SEQUENCES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    est = hll_streaming_estimates(stream, p=P)
    q = (
        est.writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {
            r["source"]: r
            for r in spark.sql(
                "select * from hll_stream"
            ).collect()
        }
        for src, grp in b1.groupby("source"):
            oracle = HllSketch.empty(P)
            oracle.update_batch(np.concatenate(grp["tokens"].to_list()).astype(np.int32))
            assert got1[src]["est_distinct"] == oracle.cardinality(), f"batch1 {src}"
            assert got1[src]["n_rows"] == len(grp)

        # second micro-batch arrives; state must accumulate
        spark.createDataFrame(b2, schema=SEQUENCES_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        q.processAllAvailable()
        rows = spark.sql("select * from hll_stream").collect()
        # latest emission per source = the one with max n_rows
        latest = {}
        for r in rows:
            if r["source"] not in latest or r["n_rows"] > latest[r["source"]]["n_rows"]:
                latest[r["source"]] = r
        for src, grp in pdf.groupby("source"):
            oracle = HllSketch.empty(P)
            oracle.update_batch(np.concatenate(grp["tokens"].to_list()).astype(np.int32))
            assert latest[src]["est_distinct"] == oracle.cardinality(), f"cumulative {src}"
            assert latest[src]["n_rows"] == len(grp)
            assert latest[src]["n_items"] == int(grp["n_tok"].sum())
    finally:
        q.stop()
