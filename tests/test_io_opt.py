"""Round-6 optimization internals: input-skew rescue gating + scratch dirs."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import sketchlib.data as D
from sketchlib.io import scratch_dir


def _write_single_rg(path: str, n_rows: int) -> None:
    """One parquet file, ONE row group — the driver-table layout."""
    t = pa.table({"x": np.arange(n_rows, dtype=np.int64), "y": np.ones(n_rows)})
    pq.write_table(t, path, row_group_size=max(n_rows, 1), compression="none")


def test_load_table_rescue_gating(spark, tmp_path):
    par = spark.sparkContext.defaultParallelism

    # big-enough single-row-group file + opt-in -> repartitioned to cores
    _write_single_rg(str(tmp_path / "big.parquet"), 40_000)  # ~640 KB raw
    assert os.path.getsize(tmp_path / "big.parquet") >= 256 * 1024
    df = D.load_table(spark, str(tmp_path), "big", parallelize=True)
    assert df.rdd.getNumPartitions() == par
    # ... and the rescue preserves every row
    assert df.count() == 40_000

    # without opt-in (and below the unconditional floor): plain scan
    plain = D.load_table(spark, str(tmp_path), "big")
    assert plain.rdd.getNumPartitions() < par or par == 1

    # tiny file: below the opt-in size floor -> no exchange even when asked
    _write_single_rg(str(tmp_path / "tiny.parquet"), 100)
    tiny = D.load_table(spark, str(tmp_path), "tiny", parallelize=True)
    assert tiny.rdd.getNumPartitions() < par or par == 1

    # well-split file (row groups >= cores/2): rescue is a no-op by design
    t = pa.table({"x": np.arange(40_000, dtype=np.int64)})
    pq.write_table(t, str(tmp_path / "split.parquet"), row_group_size=40_000 // (par * 2) + 1)
    n_rg = pq.ParquetFile(str(tmp_path / "split.parquet")).metadata.num_row_groups
    assert n_rg * 2 > par
    split = D.load_table(spark, str(tmp_path), "split", parallelize=True)
    # not round-robin-repartitioned: partition count follows the file splits
    assert "RoundRobinPartitioning" not in split._jdf.queryExecution().toString()


def test_load_table_unconditional_tier(spark, tmp_path, monkeypatch):
    """A single-row-group file past the auto floor rescues EVERY consumer."""
    _write_single_rg(str(tmp_path / "huge.parquet"), 50_000)
    monkeypatch.setattr(D, "_AUTO_RESCUE_BYTES", 100_000)  # test-sized floor
    df = D.load_table(spark, str(tmp_path), "huge")  # no opt-in
    assert df.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert df.count() == 50_000


def test_scratch_dir_fresh_and_overridable(tmp_path, monkeypatch):
    a, b = scratch_dir(prefix="t_"), scratch_dir(prefix="t_")
    assert a != b and os.path.isdir(a) and os.path.isdir(b)
    probe = os.path.join(a, "probe")
    open(probe, "w").write("x")  # writable
    assert os.path.exists(probe)
    monkeypatch.setenv("SKETCHLIB_SCRATCH", str(tmp_path / "override"))
    c = scratch_dir(prefix="t_")
    assert c.startswith(str(tmp_path / "override"))
