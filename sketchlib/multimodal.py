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
    # real media kinds are stubbed (NotImplementedError names the fix)
    "image/jpeg": _stub("image/jpeg"),
    "image/png": _stub("image/png"),
    "audio/wav": _stub("audio/wav"),
    "video/mp4": _stub("video/mp4"),
}


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
