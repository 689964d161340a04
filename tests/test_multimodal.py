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


def _make_wav(freq_hz=440.0, seconds=0.25, rate=8000, width=2, channels=1):
    import io
    import wave

    import numpy as np

    t = np.arange(int(rate * seconds)) / rate
    wavef = np.sin(2 * np.pi * freq_hz * t)
    if width == 2:
        data = (wavef * 32000).astype(np.int16)
    else:
        data = ((wavef * 100) + 128).astype(np.uint8)
    if channels == 2:
        data = np.repeat(data, 2)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(data.tobytes())
    return buf.getvalue()


def _make_bmp(width=8, height=6, seed=3):
    import struct

    import numpy as np

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (height, width, 3), dtype=np.uint8)  # BGR
    row_bytes = (width * 3 + 3) & ~3
    body = b""
    for r in range(height - 1, -1, -1):  # bottom-up
        row = px[r].tobytes()
        body += row + b"\x00" * (row_bytes - len(row))
    data_off = 14 + 40
    size = data_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body, px


def test_wav_decoder_real_stdlib_decode(spark):
    """Real RIFF/WAVE PCM decode: a pure tone's RMS envelope is flat, and
    the Spark pipeline output matches the local numpy decode exactly."""
    import numpy as np

    from sketchlib.multimodal import ASSET_SCHEMA, _decode_wav_pcm, decode_features

    wav16 = _make_wav(width=2)
    wav8 = _make_wav(width=1)
    wav_st = _make_wav(width=2, channels=2)
    rows = [
        (1, "audio/wav", bytearray(wav16), {"rate": "8000"}),
        (2, "audio/wav", bytearray(wav8), {}),
        (3, "audio/wav", bytearray(wav_st), {}),
    ]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    got = {r["asset_id"]: np.array(r["features"]) for r in decode_features(df).collect()}
    for aid, blob in [(1, wav16), (2, wav8), (3, wav_st)]:
        exp = _decode_wav_pcm(blob, {})
        assert np.allclose(got[aid], exp), aid
    # constant-amplitude tone -> near-flat normalized envelope
    env = got[1]
    assert env.std() / env.mean() < 0.1


def test_bmp_decoder_real_stdlib_decode(spark):
    import numpy as np

    from sketchlib.multimodal import ASSET_SCHEMA, _decode_bmp, decode_features

    blob, px = _make_bmp()
    df = spark.createDataFrame([(9, "image/bmp", bytearray(blob), {})], ASSET_SCHEMA)
    got = np.array(decode_features(df).collect()[0]["features"])
    exp = _decode_bmp(blob, {})
    assert np.allclose(got, exp)
    # histogram is a distribution over the true pixel population
    assert abs(got.sum() - 1.0) < 1e-9
    gray = 0.114 * px[..., 0] + 0.587 * px[..., 1] + 0.299 * px[..., 2]
    manual = np.bincount((gray.astype(np.uint8) >> 4).ravel(), minlength=16)
    assert np.allclose(got, manual / manual.sum())


def test_remaining_stubs_still_raise():
    import pytest as _pytest

    from sketchlib.multimodal import DEFAULT_DECODERS

    for kind in ("image/jpeg", "image/png", "video/mp4"):
        with _pytest.raises(NotImplementedError):
            DEFAULT_DECODERS[kind](b"x", {})
