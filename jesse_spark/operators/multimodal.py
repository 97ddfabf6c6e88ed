"""Multimodal (image / audio / video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata
struct; transforms run as Arrow-batched ``mapInPandas`` stages.  The
actual pixel/sample decoding for image/video formats requires codec
libraries not present in this container, so the decode kernels are
STUBBED (deterministic fake derived from the payload hash, clearly
marked) — the Spark-side contract (schema, batching, partitioning,
column pruning) is real and tested.  Audio is NOT stubbed — see
jesse_spark.functions.audio for the real G.711/PCM implementation.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("media_type", T.StringType()),      # image|audio|video
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("sr_hz", T.IntegerType()),
])

FEATURE_DIM = 64


def _fake_decode(payload: bytes, shape: tuple[int, ...]) -> np.ndarray:
    """Deterministic stand-in for a real codec decode: pseudo-pixels
    seeded by the payload hash.  STUB — replace with PIL/ffmpeg kernels
    on a cluster image that has them."""
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


def decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    try:
        import PIL.Image  # noqa: F401  (not in this container)
    except ImportError:
        return _fake_decode(payload, (height, width, 3))
    raise NotImplementedError("real image decode path requires PIL kernels")


def image_features(df: DataFrame, *, payload_col: str = "payload") -> DataFrame:
    """payload → fixed-dim feature vector, Arrow-batched.  Only the
    payload + dims cross the boundary (column pruning)."""
    out_schema = "media_id string, feature array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = []
            for _, row in b.iterrows():
                px = decode_image(row[payload_col], int(row["width"] or 8),
                                  int(row["height"] or 8))
                hist, _ = np.histogram(px, bins=FEATURE_DIM, range=(0, 256))
                v = hist.astype(np.float32)
                feats.append((v / max(v.sum(), 1)).tolist())
            yield pd.DataFrame({"media_id": b["media_id"], "feature": feats})

    return df.select("media_id", payload_col, "width", "height").mapInPandas(
        run, schema=out_schema)


def image_resize(df: DataFrame, *, width: int, height: int,
                 payload_col: str = "payload") -> DataFrame:
    """Resize plumbing: decode → nearest-neighbor resample → re-emit
    bytes.  Decode is the stub; the resample math is real."""
    out_schema = "media_id string, payload binary, width int, height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = []
            for _, row in b.iterrows():
                px = decode_image(row[payload_col], int(row["width"] or 8),
                                  int(row["height"] or 8))
                ys = (np.arange(height) * px.shape[0] // height)
                xs = (np.arange(width) * px.shape[1] // width)
                payloads.append(px[np.ix_(ys, xs)].tobytes())
            yield pd.DataFrame({
                "media_id": b["media_id"], "payload": payloads,
                "width": width, "height": height})

    return df.select("media_id", payload_col, "width", "height").mapInPandas(
        run, schema=out_schema)


def video_frame_sample(df: DataFrame, *, every_n: int = 30,
                       payload_col: str = "payload") -> DataFrame:
    """Frame-sampling plumbing: emits (media_id, frame_idx, frame) rows;
    the per-frame decode is the stub."""
    out_schema = "media_id string, frame_idx int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, idxs, frames = [], [], []
            for _, row in b.iterrows():
                n = int(row["n_frames"] or 0)
                for i in range(0, n, every_n):
                    ids.append(row["media_id"])
                    idxs.append(i)
                    frames.append(_fake_decode(
                        (row[payload_col] or b"") + i.to_bytes(4, "little"),
                        (8, 8, 3)).tobytes())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select("media_id", payload_col, "n_frames").mapInPandas(
        run, schema=out_schema)
