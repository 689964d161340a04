"""Multimodal plumbing: binary payload round-trip, deterministic decode,

frame sampling shape, stubbed codecs fail loudly."""

import numpy as np
import pytest

from sketchlib.multimodal import (
    FEATURE_DIM,
    decode_features,
    embeddings_as_assets,
    frame_sample,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def assets(spark):
    return embeddings_as_assets(spark.read.parquet(f"{SF}/embeddings.parquet")).cache()


def test_payload_roundtrip(spark, assets):
    emb = {r["vec_id"]: r["embedding"] for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()}
    row = assets.where("asset_id = 0").collect()[0]
    got = np.frombuffer(bytes(row["payload"]), dtype=np.float32)
    assert np.allclose(got, np.array(emb[0], dtype=np.float32))
    assert row["kind"] == "embedding-f32" and row["meta"]["dtype"] == "float32"


def test_decode_features_deterministic(spark, assets):
    a = {r["asset_id"]: r["features"] for r in decode_features(assets).collect()}
    b = {r["asset_id"]: r["features"] for r in decode_features(assets.repartition(7)).collect()}
    assert a == b
    assert all(len(v) == FEATURE_DIM for v in a.values())
    # matches the numpy definition
    row = assets.where("asset_id = 1").collect()[0]
    vec = np.frombuffer(bytes(row["payload"]), dtype=np.float32).astype(np.float64)
    pooled = vec.reshape(FEATURE_DIM, -1).mean(axis=1)
    assert np.allclose(a[1], pooled)


def test_frame_sample_shape(spark, assets):
    from pyspark.sql import functions as F

    sub = assets.limit(10).withColumn("kind", F.lit("bytes-hist"))
    rows = frame_sample(sub, n_frames=4).collect()
    assert len(rows) == 40
    frames = {(r["asset_id"], r["frame"]) for r in rows}
    assert len(frames) == 40
    for r in rows:
        assert len(r["features"]) == FEATURE_DIM
        assert abs(sum(r["features"]) - 1.0) < 1e-9  # L1-normalized histogram


def test_stubbed_codec_raises(spark, assets):
    from pyspark.sql import functions as F
    from py4j.protocol import Py4JJavaError

    jpeg = assets.limit(2).withColumn("kind", F.lit("image/jpeg"))
    with pytest.raises(Exception) as exc:
        decode_features(jpeg).collect()
    assert "no image/jpeg codec" in str(exc.value)


def test_unknown_kind_raises(spark, assets):
    from pyspark.sql import functions as F

    odd = assets.limit(2).withColumn("kind", F.lit("hologram/raw"))
    with pytest.raises(Exception) as exc:
        decode_features(odd).collect()
    assert "no decoder registered" in str(exc.value)


def test_custom_decoder_registration(spark, assets):
    def length_decoder(payload: bytes, meta: dict) -> np.ndarray:
        return np.full(FEATURE_DIM, float(len(payload)))

    from pyspark.sql import functions as F

    jpeg = assets.limit(3).withColumn("kind", F.lit("image/jpeg"))
    rows = decode_features(jpeg, decoders={"image/jpeg": length_decoder}).collect()
    assert all(r["features"][0] == 64 * 4 for r in rows)  # 64 float32 = 256 bytes
