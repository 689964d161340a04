"""Iceberg checkpoint sink, end-to-end through a REAL table.

The canonical production input/checkpoint store is Iceberg (SURVEY.md §1.2,
BASELINE north rule). This sandbox ships no iceberg-spark-runtime jar, so
the whole module skips unless one is on the classpath — but the test is
complete: with the jar present it configures a local hadoop catalog at
runtime, drives CheckpointedBuild through `writeTo().append()` snapshot
commits, interrupts + resumes, and proves byte-identity with the parquet
checkpoint path. The parquet fallback of the same protocol is covered
unconditionally in tests/test_checkpoint.py.
"""

import glob
import os
import tempfile
import uuid

import pytest

from sketchlib.agg import HllAggregator
from sketchlib.io import CheckpointedBuild, enumerate_shards, iceberg_available


def _iceberg_jar_on_classpath() -> bool:
    spark_home = os.environ.get("SPARK_HOME")
    roots = []
    if spark_home:
        roots.append(os.path.join(spark_home, "jars"))
    try:
        import pyspark

        roots.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except ImportError:
        pass
    return any(
        glob.glob(os.path.join(r, "iceberg-spark-runtime*.jar")) for r in roots
    )


pytestmark = pytest.mark.skipif(
    not _iceberg_jar_on_classpath(),
    reason="iceberg-spark-runtime jar not on the Spark classpath",
)


@pytest.fixture()
def iceberg_catalog(spark, tmp_path):
    """Configure a local hadoop catalog at runtime (Iceberg catalogs are
    lazily instantiated from SQL conf, so no session restart is needed —
    only the jar must be on the JVM classpath)."""
    name = f"ic{uuid.uuid4().hex[:6]}"
    spark.conf.set(f"spark.sql.catalog.{name}", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set(f"spark.sql.catalog.{name}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{name}.warehouse", str(tmp_path / "warehouse"))
    assert iceberg_available(spark)
    yield name
    for k in ("", ".type", ".warehouse"):
        spark.conf.unset(f"spark.sql.catalog.{name}{k}")


def test_checkpoint_append_and_resume_through_iceberg_table(spark, iceberg_catalog, tmp_path):
    from sketchlib.data import SEQUENCES_SCHEMA, gen_sequences_pandas

    path = str(tmp_path / "seqs.parquet")
    pdf = gen_sequences_pandas(4_000)
    spark.createDataFrame(pdf, schema=SEQUENCES_SCHEMA).repartition(6).write.parquet(path)

    agg = HllAggregator(p=12, key_cols=["source"])
    table = f"{iceberg_catalog}.db.ckpt_{uuid.uuid4().hex[:8]}"
    ckpt = CheckpointedBuild(agg, table=table)

    n_shards = len(enumerate_shards(path))
    # interrupt after one shard -> one snapshot; resume -> second snapshot
    assert ckpt.run(spark, path, max_shards=1) == 1
    assert ckpt.run_to_completion(spark, path) == n_shards - 1
    assert ckpt.run(spark, path) == 0  # no-op: lineage says all shards done

    # snapshot lineage: at least two appends recorded in table history
    snaps = spark.sql(f"SELECT * FROM {table}.snapshots").count()
    assert snaps >= 2

    # answers from the Iceberg checkpoint == uninterrupted parquet-path build
    via_iceberg = {
        r["source"]: bytes(r["sketch"]) for r in ckpt.merged(spark).collect()
    }
    direct = {
        r["source"]: bytes(r["sketch"])
        for r in agg.merged(path, spark=spark).collect()
    }
    assert via_iceberg == direct

    m = ckpt.metrics(spark).collect()[0]
    assert m["shards"] == n_shards and m["items"] > 0
