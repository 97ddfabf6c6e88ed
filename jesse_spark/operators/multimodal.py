"""Multimodal (image / audio / video) column operators.

Media payloads are opaque ``binary`` columns with a typed metadata
struct; transforms run as Arrow-batched ``mapInPandas`` stages so only
the payload + the columns a stage needs cross the JVM↔Python boundary
(column pruning keeps the bytes out of every other stage — same
discipline as the clips ``bytes`` column).

Decode kernels are REAL for the dependency-free formats implemented in
:mod:`jesse_spark.functions.media_codecs`:

- images: BMP (24-bit BI_RGB) and PPM (P6) — exact spec implementations;
- video: Y4M (YUV4MPEG2 C420) — random-access frame extraction +
  BT.601 YUV→RGB;
- audio: WAV (RIFF) over the bit-exact G.711/PCM16 sample codecs.

Compressed formats (JPEG/H.264/...) need codec libraries absent
from this container; for those payloads the decode FALLS BACK to a
clearly-marked deterministic fake (`_fake_decode`, seeded by the
payload hash) so the Spark-side plumbing stays testable — replace by
installing PIL/ffmpeg on the cluster image.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from jesse_spark.functions import media_codecs as mc

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
    """Deterministic stand-in for codec-library decode of COMPRESSED
    formats this container can't decode (progressive JPEG, WebP, ...):
    pseudo-pixels seeded by the payload hash.  STUB — BMP/PPM/PNG/
    baseline-JPEG/Y4M/WAV payloads never reach this (they decode for
    real in media_codecs)."""
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


def decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """(H, W, 3) uint8 RGB.  BMP/PPM/PNG/baseline-JPEG decode for real
    (media_codecs, pure numpy+stdlib); anything else tries PIL and
    falls back to the documented fake."""
    if payload and (payload[:2] in (b"BM", b"P6", b"\xff\xd8")
                    or payload[:8] == mc._PNG_MAGIC):
        try:
            return mc.image_decode(payload)
        except ValueError:
            if payload[:2] != b"\xff\xd8":
                raise
            # non-baseline JPEG (progressive/arithmetic): PIL or fake
    try:
        import io

        import PIL.Image

        return np.asarray(PIL.Image.open(io.BytesIO(payload)).convert("RGB"))
    except Exception:
        return _fake_decode(payload, (max(height, 1), max(width, 1), 3))


def image_features(df: DataFrame, *, payload_col: str = "payload") -> DataFrame:
    """payload → fixed-dim feature vector (normalized 64-bin luminance
    histogram), Arrow-batched.  Only payload + dims cross the boundary."""
    out_schema = "media_id string, feature array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = []
            for _, row in b.iterrows():
                try:
                    px = decode_image(row[payload_col], int(row["width"] or 8),
                                      int(row["height"] or 8))
                    hist, _ = np.histogram(px, bins=FEATURE_DIM, range=(0, 256))
                    v = hist.astype(np.float32)
                    feats.append((v / max(v.sum(), 1)).tolist())
                except Exception:
                    feats.append(None)   # corrupt payload: null feature,
                    # never a task failure (one bad row must not 4x-fail
                    # the whole job)
            yield pd.DataFrame({"media_id": b["media_id"], "feature": feats})

    return df.select("media_id", payload_col, "width", "height").mapInPandas(
        run, schema=out_schema)


def image_resize(df: DataFrame, *, width: int, height: int,
                 payload_col: str = "payload") -> DataFrame:
    """Decode → nearest-neighbor resample → re-encode as PPM (a real
    image container, so downstream stages can decode the output)."""
    out_schema = "media_id string, payload binary, width int, height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = []
            for _, row in b.iterrows():
                try:
                    px = decode_image(row[payload_col], int(row["width"] or 8),
                                      int(row["height"] or 8))
                    ys = (np.arange(height) * px.shape[0] // height)
                    xs = (np.arange(width) * px.shape[1] // width)
                    payloads.append(mc.ppm_encode(px[np.ix_(ys, xs)]))
                except Exception:
                    payloads.append(None)  # corrupt payload: null output
            yield pd.DataFrame({
                "media_id": b["media_id"], "payload": payloads,
                "width": width, "height": height})

    return df.select("media_id", payload_col, "width", "height").mapInPandas(
        run, schema=out_schema)


def video_frame_sample(df: DataFrame, *, every_n: int = 30,
                       payload_col: str = "payload") -> DataFrame:
    """Every n-th frame as (media_id, frame_idx, frame PPM bytes).
    Y4M payloads use real random-access frame decode (fixed C420 frame
    size → offset arithmetic, no full-stream scan); unknown containers
    fall back to the fake."""
    out_schema = "media_id string, frame_idx int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, idxs, frames = [], [], []
            for _, row in b.iterrows():
                payload = row[payload_col] or b""
                if payload[:9] == b"YUV4MPEG2":
                    try:
                        _, _, n = mc.y4m_info(payload)
                        for i in range(0, n, every_n):
                            ids.append(row["media_id"])
                            idxs.append(i)
                            frames.append(mc.ppm_encode(mc.y4m_frame(payload, i)))
                    except Exception:
                        # corrupt stream: emit one null-frame marker row
                        ids.append(row["media_id"])
                        idxs.append(-1)
                        frames.append(None)
                else:
                    for i in range(0, int(row["n_frames"] or 0), every_n):
                        ids.append(row["media_id"])
                        idxs.append(i)
                        frames.append(mc.ppm_encode(_fake_decode(
                            payload + i.to_bytes(4, "little"), (8, 8, 3))))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select("media_id", payload_col, "n_frames").mapInPandas(
        run, schema=out_schema)


def audio_stats(df: DataFrame, *, payload_col: str = "payload") -> DataFrame:
    """WAV payloads → (media_id, sr_hz, codec, n_samples, rms, peak):
    real RIFF parse + G.711/PCM decode, vectorized stats per clip."""
    out_schema = ("media_id string, sr_hz int, codec string, "
                  "n_samples long, rms double, peak int")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, row in b.iterrows():
                try:
                    pcm, sr, codec = mc.wav_decode(row[payload_col])
                except Exception:
                    rows.append((row["media_id"], None, None, None, None, None))
                    continue
                x = pcm.astype(np.float64)
                rows.append((row["media_id"], sr, codec, len(pcm),
                             float(np.sqrt(np.mean(x * x))) if len(pcm) else 0.0,
                             int(np.max(np.abs(pcm))) if len(pcm) else 0))
            yield pd.DataFrame(rows, columns=["media_id", "sr_hz", "codec",
                                              "n_samples", "rms", "peak"])

    return df.select("media_id", payload_col).mapInPandas(run, schema=out_schema)
