"""Checkpoint/resume: interrupted builds resume to byte-identical answers."""

import numpy as np
import pytest

from sketchlib.agg import HllAggregator
from sketchlib.data import sequences_parquet
from sketchlib.hll import HllSketch
from sketchlib.io import CheckpointedBuild, enumerate_shards


@pytest.fixture(scope="module")
def seq_path(spark, tmp_path_factory):
    return sequences_parquet(
        spark, 20_000, cache_root=str(tmp_path_factory.mktemp("seqcache"))
    )


def test_resume_produces_identical_sketches(spark, seq_path, tmp_path):
    agg = HllAggregator(p=12, key_cols=["source"])
    direct = {r["source"]: bytes(r["sketch"]) for r in agg.merged(seq_path, spark=spark).collect()}

    ckpt = CheckpointedBuild(agg, str(tmp_path), run_id="t1")
    n_shards = len(enumerate_shards(seq_path))
    assert n_shards > 1
    # simulate interruption: one shard at a time across separate invocations
    done1 = ckpt.run(spark, seq_path, max_shards=1)
    assert done1 == 1
    assert len(ckpt.pending_shards(spark, seq_path)) == n_shards - 1
    total = ckpt.run_to_completion(spark, seq_path)
    assert total == n_shards - 1
    # idempotent: nothing pending on re-run
    assert ckpt.run(spark, seq_path) == 0

    resumed = {r["source"]: bytes(r["sketch"]) for r in ckpt.merged(spark).collect()}
    assert resumed == direct


def test_lineage_metrics(spark, seq_path, tmp_path):
    agg = HllAggregator(p=10, key_cols=["source"])
    ckpt = CheckpointedBuild(agg, str(tmp_path), run_id="t2")
    ckpt.run_to_completion(spark, seq_path)
    m = ckpt.metrics(spark).collect()[0]
    assert m["shards"] == len(enumerate_shards(seq_path))
    assert m["rows"] == 20_000
    assert m["items"] > 0 and m["sketch_build_secs"] > 0
    # lineage present per partial row
    cols = set(ckpt.partials(spark).columns)
    assert {"shard_id", "wall_secs", "sketch", "n_rows", "n_items", "source"} <= cols


def test_checkpointed_estimates_match_oracle(spark, seq_path, tmp_path):
    import pandas as pd

    agg = HllAggregator(p=12, key_cols=[])
    ckpt = CheckpointedBuild(agg, str(tmp_path), run_id="t3")
    ckpt.run_to_completion(spark, seq_path)
    est = ckpt.merged(spark, salt=4).collect()[0]
    pdf = pd.read_parquet(seq_path)
    oracle = HllSketch.empty(12)
    oracle.update_batch(np.concatenate(pdf["tokens"].to_list()).astype(np.int32))
    got = HllSketch.from_bytes(bytes(est["sketch"]))
    assert np.array_equal(got.registers, oracle.registers)


def test_iceberg_probe_and_parquet_fallback(spark, tmp_path):
    """No Iceberg jar in this sandbox: the probe must say so and
    append_partials must take the parquet path; with a jar + catalog the
    same call switches to writeTo().append() (dual-path contract)."""
    from sketchlib.io import append_partials, iceberg_available

    assert iceberg_available(spark) is False
    df = spark.range(5).selectExpr("cast(id as string) AS shard_id", "id AS n")
    sink = append_partials(df, str(tmp_path / "partials"), spark)
    assert sink == "parquet"
    assert spark.read.parquet(str(tmp_path / "partials")).count() == 5


def test_table_target_without_catalog_raises(spark):
    """A '/'-free (table-identifier) checkpoint target with no Iceberg
    catalog must fail LOUDLY: a silent parquet fallback would desync writes
    from read_partials(spark.table), so completed_shards() stays empty and
    every resume re-appends duplicate partials."""
    import pytest as _pytest

    from sketchlib.io import append_partials

    df = spark.range(3).selectExpr("cast(id as string) AS shard_id", "id AS n")
    with _pytest.raises(ValueError, match="catalog"):
        append_partials(df, "db.ckpt_no_catalog", spark)


def test_checkpoint_is_aggregator_generic_kmv_and_profile(spark, seq_path, tmp_path):
    """The resume machinery is sketch-agnostic: a KMV build interrupted
    after one shard resumes to BYTE-identical per-source sketches
    (order-exact algebra), and a composite ProfileSketch build checkpoints
    and answers through the same path."""
    from sketchlib.agg import KmvAggregator, ProfileAggregator
    from sketchlib.kmv import KmvSketch
    from sketchlib.profile import ProfileSketch

    kagg = KmvAggregator(k=1024, key_cols=["source"])
    direct = {
        r["source"]: bytes(r["sketch"]) for r in kagg.merged(seq_path, spark=spark).collect()
    }
    ckpt = CheckpointedBuild(kagg, str(tmp_path / "kmv"), run_id="k1")
    assert ckpt.run(spark, seq_path, max_shards=1) == 1
    ckpt.run_to_completion(spark, seq_path)
    resumed = {r["source"]: bytes(r["sketch"]) for r in ckpt.merged(spark).collect()}
    assert resumed == direct
    # sanity: the resumed sketch answers
    est = KmvSketch.from_bytes(next(iter(resumed.values()))).estimate()
    assert est > 0

    pagg = ProfileAggregator(p=12, key_cols=["source"])
    pck = CheckpointedBuild(pagg, str(tmp_path / "prof"), run_id="p1")
    pck.run_to_completion(spark, seq_path)
    rows = {r["source"]: r for r in pck.merged(spark).collect()}
    for src, r in rows.items():
        s = ProfileSketch.from_bytes(bytes(r["sketch"]))
        assert s.distinct_values() > 0
        assert s.kll.n == r["n_rows"]  # every row's length landed in the KLL
