"""Multimodal asset columns: binary payloads + typed metadata.

Real Spark plumbing — schema, partitioning, Arrow batch shapes, UDF
signatures — with the actual media codecs STUBBED (this container ships no
image/audio libraries): registering a real decoder is a one-line swap. The
deterministic built-in decoders ("bytes-hist", "embedding-f32") make the
pipeline testable end-to-end: same payload bytes -> same features, always.

Asset table shape:

    asset_id: long, kind: string, payload: binary, meta: map<string,string>
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_DIM = 16


def _decode_bytes_hist(payload: bytes, meta: dict) -> np.ndarray:
    """Deterministic fake 'image decode': 16-bin byte-value histogram,

    L1-normalized. Stands in for decode→resize→feature-extract."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float64)
    hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype(np.float64)
    return hist / hist.sum()


def _decode_embedding_f32(payload: bytes, meta: dict) -> np.ndarray:
    """Reinterpret payload as float32 vector, mean-pool to FEATURE_DIM."""
    vec = np.frombuffer(payload, dtype=np.float32).astype(np.float64)
    if len(vec) < FEATURE_DIM:
        vec = np.pad(vec, (0, FEATURE_DIM - len(vec)))
    pooled = vec[: len(vec) // FEATURE_DIM * FEATURE_DIM].reshape(FEATURE_DIM, -1).mean(axis=1)
    return pooled


def _decode_wav_pcm(payload: bytes, meta: dict) -> np.ndarray:
    """REAL audio decode, stdlib only: RIFF/WAVE container via `wave`,
    PCM samples via numpy. Feature = FEATURE_DIM-segment RMS energy
    envelope (the classic cheap audio fingerprint), L2-normalized.
    Supports 8/16/32-bit PCM, any channel count (channel-mean)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        width = w.getsampwidth()
        n_ch = w.getnchannels()
        raw = w.readframes(w.getnframes())
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise ValueError(f"unsupported PCM sample width {width}")
    samples = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if width == 1:
        samples -= 128.0  # 8-bit WAV is unsigned
    if n_ch > 1:
        samples = samples[: len(samples) // n_ch * n_ch].reshape(-1, n_ch).mean(axis=1)
    if len(samples) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float64)
    seg = max(1, len(samples) // FEATURE_DIM)
    trimmed = samples[: seg * FEATURE_DIM]
    if len(trimmed) < seg * FEATURE_DIM:
        trimmed = np.pad(trimmed, (0, seg * FEATURE_DIM - len(trimmed)))
    rms = np.sqrt((trimmed.reshape(FEATURE_DIM, -1) ** 2).mean(axis=1))
    norm = np.linalg.norm(rms)
    return rms / norm if norm else rms


def _decode_bmp(payload: bytes, meta: dict) -> np.ndarray:
    """REAL image decode, stdlib only: uncompressed 24-bit BMP
    (BITMAPINFOHEADER) parsed with struct + numpy — header, bottom-up rows,
    4-byte row padding, BGR order. Feature = FEATURE_DIM-bin grayscale
    histogram, L1-normalized."""
    import struct as _struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = _struct.unpack_from("<I", payload, 10)
    header_size, width, height = _struct.unpack_from("<Iii", payload, 14)
    (bpp,) = _struct.unpack_from("<H", payload, 28)
    (compression,) = _struct.unpack_from("<I", payload, 30)
    if header_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    px = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * height, offset=data_off)
    rows = px.reshape(height, row_bytes)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    bgr = rows.astype(np.float64)
    gray = 0.114 * bgr[..., 0] + 0.587 * bgr[..., 1] + 0.299 * bgr[..., 2]
    hist = np.bincount(
        (gray.astype(np.uint8) >> 4).ravel(), minlength=FEATURE_DIM
    ).astype(np.float64)
    return hist / hist.sum() if hist.sum() else hist


def _stub(kind: str) -> Callable:
    def decoder(payload: bytes, meta: dict) -> np.ndarray:
        raise NotImplementedError(
            f"no {kind} codec in this environment — register a real decoder "
            f"with decode_features(..., decoders={{{kind!r}: fn}})"
        )

    return decoder


DEFAULT_DECODERS: dict[str, Callable] = {
    "bytes-hist": _decode_bytes_hist,
    "embedding-f32": _decode_embedding_f32,
    # REAL stdlib decoders: no external codec needed for these formats
    "audio/wav": _decode_wav_pcm,
    "image/bmp": _decode_bmp,
    # kinds that genuinely need external codecs stay stubbed
    # (NotImplementedError names the one-line fix)
    "image/jpeg": _stub("image/jpeg"),
    "image/png": _stub("image/png"),
    "video/mp4": _stub("video/mp4"),
}


def synth_wav_pcm16(amplitude: int, n_samples: int = 1600, rate: int = 8000) -> bytes:
    """Constant-amplitude square-wave PCM16 WAV (stdlib `wave`): every RMS
    segment equals the amplitude, so the decoded FEATURE_DIM-segment
    envelope L2-normalizes to uniformly 1/sqrt(FEATURE_DIM) — an
    analytically-known decode oracle for ANY amplitude >= 1."""
    import io
    import wave

    data = np.full(n_samples, int(amplitude), dtype=np.int16)
    data[1::2] *= -1
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(data.tobytes())
    return buf.getvalue()


def synth_bmp_solid(gray: int, width: int = 8, height: int = 6) -> bytes:
    """Solid-gray uncompressed 24-bit BMP (stdlib struct): the grayscale
    histogram concentrates in exactly ONE bin, so the decoded feature is a
    one-hot vector — an analytically-known decode oracle for any gray."""
    import struct as _s

    gray = int(gray) & 0xFF
    row = bytes([gray, gray, gray]) * width
    row += b"\x00" * ((-len(row)) % 4)
    rows = row * height
    data_off = 54
    hdr = b"BM" + _s.pack("<IHHI", data_off + len(rows), 0, 0, data_off)
    info = _s.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return hdr + info + rows


def decode_features(
    df: DataFrame,
    decoders: dict[str, Callable] | None = None,
    feature_dim: int = FEATURE_DIM,
) -> DataFrame:
    """(asset_id, kind, features array<double>) via batched mapInPandas.

    Arrow moves the binary payloads in batches; the decoder runs per asset
    inside the batch (media decoding is inherently per-item CPU work — the
    parallelism axis is assets-per-task, which Spark scales out).
    """
    table = {**DEFAULT_DECODERS, **(decoders or {})}
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType(), False), False),
        ]
    )

    def decode(batches):
        for pdf in batches:
            feats = []
            for payload, kind, meta in zip(pdf["payload"], pdf["kind"], pdf["meta"]):
                fn = table.get(kind)
                if fn is None:
                    raise ValueError(f"no decoder registered for kind {kind!r}")
                feats.append(fn(bytes(payload), meta or {}).tolist())
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "kind": pdf["kind"], "features": feats}
            )

    return df.select("asset_id", "kind", "payload", "meta").mapInPandas(decode, out_schema)


def frame_sample(
    df: DataFrame, n_frames: int = 4, decoders: dict[str, Callable] | None = None
) -> DataFrame:
    """Video-style frame sampling plumbing: split each payload into n_frames

    equal chunks, one feature row per (asset, frame). The chunking stands in
    for keyframe extraction; the schema and explode shape are the real ones.
    """
    table = {**DEFAULT_DECODERS, **(decoders or {})}
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("frame", T.IntegerType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType(), False), False),
        ]
    )

    def decode(batches):
        for pdf in batches:
            ids, frames, feats = [], [], []
            for aid, payload, kind, meta in zip(
                pdf["asset_id"], pdf["payload"], pdf["kind"], pdf["meta"]
            ):
                fn = table.get(kind)
                if fn is None:
                    raise ValueError(f"no decoder registered for kind {kind!r}")
                raw = bytes(payload)
                step = max(1, len(raw) // n_frames)
                for i in range(n_frames):
                    chunk = raw[i * step : (i + 1) * step]
                    ids.append(aid)
                    frames.append(i)
                    feats.append(fn(chunk, meta or {}).tolist())
            yield pd.DataFrame({"asset_id": ids, "frame": frames, "features": feats})

    return df.select("asset_id", "kind", "payload", "meta").mapInPandas(decode, out_schema)


def embeddings_as_assets(emb_df: DataFrame) -> DataFrame:
    """Deterministic asset table from the embeddings fixture: payload =

    raw little-endian float32 bytes of the vector (real binary plumbing)."""

    @F.pandas_udf(T.BinaryType())
    def pack(embs: pd.Series) -> pd.Series:
        return embs.map(lambda v: np.asarray(v, dtype=np.float32).tobytes())

    return emb_df.select(
        F.col("vec_id").alias("asset_id"),
        F.lit("embedding-f32").alias("kind"),
        pack(F.col("embedding")).alias("payload"),
        F.create_map(F.lit("dtype"), F.lit("float32")).alias("meta"),
    )
