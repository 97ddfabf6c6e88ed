"""Real, dependency-free media container/codec kernels (pure numpy).

These are honest implementations of simple but REAL formats — no
external codec libraries needed, so nothing here is stubbed:

- **BMP** (Windows bitmap, 24-bit uncompressed BI_RGB): header parse,
  4-byte row-stride padding, bottom-up row order, BGR channel order.
- **PPM** (Netpbm P6, maxval 255): ASCII header + raw RGB.
- **Y4M** (YUV4MPEG2): plain-text stream header, per-frame ``FRAME``
  markers, C420 planar payload; frames convert to RGB with the
  BT.601 full-range matrix.
- **WAV** (RIFF/WAVE): chunk walk to ``fmt ``/``data``; sample decode
  delegates to the bit-exact G.711 µ-law/A-law/PCM16 kernels in
  :mod:`jesse_spark.functions.audio` (format tags 1/6/7).

The reference has no media layer at all (jesse validates JSON); this
is north-star "training-data pipeline" surface: the formats were
chosen because their full spec is implementable exactly, which keeps
the multimodal operators real end-to-end instead of stubbed.
Compressed formats (JPEG/H.264/...) still require cluster images with
PIL/ffmpeg — see operators/multimodal.py for the gated fallback.
"""

from __future__ import annotations

import struct

import numpy as np

from jesse_spark.functions import audio as _audio


# ---------------------------------------------------------------------------
# BMP — 24-bit uncompressed (BITMAPINFOHEADER, BI_RGB)
# ---------------------------------------------------------------------------
def bmp_encode(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit BMP bytes (bottom-up, BGR, padded
    rows) — the exact layout every BMP reader expects."""
    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    img = np.zeros((h, stride), dtype=np.uint8)
    bgr = rgb[::-1, :, ::-1]                     # bottom-up rows, BGR
    img[:, : w * 3] = bgr.reshape(h, w * 3)
    data = img.tobytes()
    file_size = 14 + 40 + len(data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + data


def bmp_decode(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes → (H, W, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    img = np.frombuffer(payload, dtype=np.uint8,
                        count=stride * h, offset=data_off)
    img = img.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        img = img[::-1]
    return img[:, :, ::-1].copy()               # BGR → RGB


# ---------------------------------------------------------------------------
# PPM — Netpbm P6 (binary RGB, maxval 255)
# ---------------------------------------------------------------------------
def ppm_encode(rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.astype(np.uint8).tobytes()


def ppm_decode(payload: bytes) -> np.ndarray:
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace/comment-
    # separated tokens, then a single whitespace before the raster
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":      # comment to end of line
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1                                     # single ws before raster
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                         offset=pos).reshape(h, w, 3).copy()


def image_decode(payload: bytes) -> np.ndarray:
    """Sniff + decode any supported raw image container."""
    if payload[:2] == b"BM":
        return bmp_decode(payload)
    if payload[:2] == b"P6":
        return ppm_decode(payload)
    raise ValueError("unknown image container (supported: BMP 24-bit, PPM P6)")


# ---------------------------------------------------------------------------
# Y4M — YUV4MPEG2 (C420 planar), frames → RGB via BT.601 full-range
# ---------------------------------------------------------------------------
def y4m_encode(frames_rgb: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """(N, H, W, 3) uint8 RGB → YUV4MPEG2 C420 stream (real format;
    plays in ffmpeg/mpv).  H and W must be even (420 subsampling)."""
    n, h, w, _ = frames_rgb.shape
    out = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420\n" % (w, h, *fps)]
    for f in frames_rgb:
        y, u, v = _rgb_to_yuv420(f)
        out.append(b"FRAME\n" + y.tobytes() + u.tobytes() + v.tobytes())
    return b"".join(out)


def y4m_info(payload: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) from the stream header + frame count."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = None
    for tok in payload[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C" and tok != b"C420":
            raise ValueError(f"unsupported chroma {tok!r} (only C420)")
    frame_bytes = w * h + 2 * (w // 2) * (h // 2)
    n = (len(payload) - nl - 1) // (len(b"FRAME\n") + frame_bytes)
    return w, h, n


def y4m_frame(payload: bytes, idx: int) -> np.ndarray:
    """Decode frame ``idx`` to (H, W, 3) uint8 RGB — random access by
    offset arithmetic (fixed frame size in C420), no full-stream scan."""
    w, h, n = y4m_info(payload)
    if not 0 <= idx < n:
        raise IndexError(f"frame {idx} out of range (n={n})")
    nl = payload.index(b"\n")
    frame_bytes = w * h + 2 * (w // 2) * (h // 2)
    off = nl + 1 + idx * (len(b"FRAME\n") + frame_bytes)
    if payload[off : off + 5] != b"FRAME":
        raise ValueError("corrupt Y4M frame marker")
    off = payload.index(b"\n", off) + 1
    y = np.frombuffer(payload, np.uint8, w * h, off).reshape(h, w)
    u = np.frombuffer(payload, np.uint8, (w // 2) * (h // 2),
                      off + w * h).reshape(h // 2, w // 2)
    v = np.frombuffer(payload, np.uint8, (w // 2) * (h // 2),
                      off + w * h + (w // 2) * (h // 2)).reshape(h // 2, w // 2)
    return _yuv420_to_rgb(y, u, v)


def _rgb_to_yuv420(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    f = rgb.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    u = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2] + 128
    v = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2] + 128
    # 2x2 box subsample of the chroma planes
    u = u.reshape(u.shape[0] // 2, 2, u.shape[1] // 2, 2).mean(axis=(1, 3))
    v = v.reshape(v.shape[0] // 2, 2, v.shape[1] // 2, 2).mean(axis=(1, 3))
    clip = lambda p: np.clip(np.round(p), 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(u), clip(v)


def _yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    uu = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1).astype(np.float64) - 128
    vv = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1).astype(np.float64) - 128
    yy = y.astype(np.float64)
    r = yy + 1.402 * vv
    g = yy - 0.344136 * uu - 0.714136 * vv
    b = yy + 1.772 * uu
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# WAV — RIFF/WAVE container over the audio.py sample codecs
# ---------------------------------------------------------------------------
_WAV_FMT_TAGS = {1: "pcm_s16le", 6: "alaw", 7: "ulaw"}
_WAV_TAG_OF = {v: k for k, v in _WAV_FMT_TAGS.items()}


def wav_encode(pcm: np.ndarray, sr_hz: int, codec: str = "pcm_s16le") -> bytes:
    """int16 PCM → WAV bytes in the given wire codec (PCM16/µ-law/A-law)."""
    body = _audio.encode(pcm, codec)
    tag = _WAV_TAG_OF[codec]
    bits = 16 if codec == "pcm_s16le" else 8
    block = bits // 8
    fmt = struct.pack("<HHIIHH", tag, 1, sr_hz, sr_hz * block, block, bits)
    chunks = (b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(body)) + body)
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def wav_decode(payload: bytes) -> tuple[np.ndarray, int, str]:
    """WAV bytes → (int16 PCM, sr_hz, codec) via a real RIFF chunk walk
    (handles extra chunks like LIST/fact in any order)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)             # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, sr_hz = fmt[0], fmt[1], fmt[2]
    if channels != 1:
        raise ValueError(f"only mono supported, got {channels} channels")
    codec = _WAV_FMT_TAGS.get(tag)
    if codec is None:
        raise ValueError(f"unsupported WAV format tag {tag}")
    return _audio.decode(data, codec), sr_hz, codec
