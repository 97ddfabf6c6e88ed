"""Real media codec kernels (BMP/PPM/PNG/baseline-JPEG/Y4M/WAV) +
multimodal operators over the deterministic media fixture — nothing
here touches the stubbed compressed-format fallback."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jesse_spark.functions import audio
from jesse_spark.functions import media_codecs as mc


@pytest.fixture
def rgb():
    rng = np.random.default_rng(3)
    return rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)  # odd width → padding


def test_bmp_roundtrip_exact(rgb):
    assert np.array_equal(mc.bmp_decode(mc.bmp_encode(rgb)), rgb)


def test_bmp_row_padding():
    # width 5 → stride 16 (not 15): padding bytes must be skipped
    img = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(3, 5, 3)
    payload = mc.bmp_encode(img)
    assert len(payload) == 54 + 16 * 3
    assert np.array_equal(mc.bmp_decode(payload), img)


def test_ppm_roundtrip_and_comments(rgb):
    assert np.array_equal(mc.ppm_decode(mc.ppm_encode(rgb)), rgb)
    # hand-built header with a comment line
    raw = b"P6\n# a comment\n5 6\n255\n" + rgb.tobytes()
    assert np.array_equal(mc.ppm_decode(raw), rgb)


def test_image_decode_sniffs(rgb):
    assert np.array_equal(mc.image_decode(mc.bmp_encode(rgb)), rgb)
    assert np.array_equal(mc.image_decode(mc.ppm_encode(rgb)), rgb)
    with pytest.raises(ValueError):
        mc.image_decode(b"\x89PNG....")


def test_y4m_info_and_random_access():
    rng = np.random.default_rng(5)
    # mid-range pixels: no RGB clipping, so the luminance identity
    # lum(recon) == Y holds up to rounding (chroma terms cancel exactly
    # in the BT.601 matrix product)
    frames = rng.integers(64, 192, size=(4, 8, 10, 3), dtype=np.uint8)
    payload = mc.y4m_encode(frames)
    assert payload.startswith(b"YUV4MPEG2 W10 H8")
    assert mc.y4m_info(payload) == (10, 8, 4)
    # random access: frame 2 decodes without touching frames 0-1
    got = mc.y4m_frame(payload, 2)
    assert got.shape == (8, 10, 3)
    lum = lambda a: (0.299 * a[..., 0] + 0.587 * a[..., 1]  # noqa: E731
                     + 0.114 * a[..., 2])
    assert np.abs(lum(got.astype(float)) - lum(frames[2].astype(float))).max() <= 3.0
    with pytest.raises(IndexError):
        mc.y4m_frame(payload, 4)


def test_y4m_gray_roundtrip_near_exact():
    # gray frames have flat chroma (u=v=128): 4:2:0 loses nothing
    rng = np.random.default_rng(6)
    g = rng.integers(0, 256, size=(2, 8, 10, 1), dtype=np.uint8)
    frames = np.repeat(g, 3, axis=3)
    payload = mc.y4m_encode(frames)
    for i in range(2):
        got = mc.y4m_frame(payload, i).astype(int)
        assert np.abs(got - frames[i].astype(int)).max() <= 2


def test_wav_roundtrips():
    pcm = audio.synth_pcm("wavtest", 8000, 1600)
    dec, sr, codec = mc.wav_decode(mc.wav_encode(pcm, 8000, "pcm_s16le"))
    assert sr == 8000 and codec == "pcm_s16le"
    assert np.array_equal(dec, pcm)
    for c in ("ulaw", "alaw"):
        dec, sr, codec = mc.wav_decode(mc.wav_encode(pcm, 8000, c))
        assert codec == c and audio.snr_db(pcm, dec) >= audio.SNR_THRESHOLD_DB


def test_wav_chunk_walk_with_extra_chunks():
    pcm = audio.synth_pcm("wavtest2", 8000, 800)
    payload = mc.wav_encode(pcm, 8000, "pcm_s16le")
    # splice a LIST chunk between fmt and data (odd size → word align)
    import struct

    fmt_end = payload.index(b"data")
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = payload[:fmt_end] + extra + payload[fmt_end:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    dec, sr, codec = mc.wav_decode(spliced)
    assert np.array_equal(dec, pcm)


# ---------------------------------------------------------------------------
# operators over the deterministic media fixture (real decode end-to-end)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def media(spark):
    from jesse_spark.sources.fixtures import media_df

    return media_df(spark, 16).cache()


def test_media_fixture_deterministic(spark):
    from jesse_spark.sources.fixtures import media_df

    a = media_df(spark, 12).orderBy("media_id").toPandas()
    b = media_df(spark, 12, partitions=5).orderBy("media_id").toPandas()
    assert list(a["media_id"]) == list(b["media_id"])
    assert all(bytes(x) == bytes(y) for x, y in zip(a["payload"], b["payload"]))


def test_image_features_match_numpy_golden(media):
    from jesse_spark.operators.multimodal import FEATURE_DIM, image_features
    from jesse_spark.sources.fixtures import _gen_media_row

    rows = {r["media_id"]: r["feature"] for r in
            image_features(media.filter(F.col("media_type") == "image")).collect()}
    assert rows
    for i in (0, 1, 2, 3, 6):   # image kinds in the 6-cycle (bmp/ppm/png/jpeg)
        mid, payload = _gen_media_row(i)[0], _gen_media_row(i)[1]
        px = mc.image_decode(payload)
        hist, _ = np.histogram(px, bins=FEATURE_DIM, range=(0, 256))
        exp = hist.astype(np.float32) / max(hist.sum(), 1)
        assert np.allclose(rows[mid], exp, atol=1e-6)


def test_image_resize_real_output(media):
    from jesse_spark.operators.multimodal import image_resize

    out = image_resize(media.filter(F.col("media_type") == "image"),
                       width=4, height=4).collect()
    assert out
    for r in out:
        px = mc.ppm_decode(bytes(r["payload"]))   # output is a REAL image
        assert px.shape == (4, 4, 3)


def test_video_frames_match_y4m_golden(media):
    from jesse_spark.operators.multimodal import video_frame_sample
    from jesse_spark.sources.fixtures import _gen_media_row

    vids = media.filter(F.col("media_type") == "video")
    frames = video_frame_sample(vids, every_n=2).collect()
    by = {(r["media_id"], r["frame_idx"]): bytes(r["frame"]) for r in frames}
    row = _gen_media_row(4)                       # first video kind index
    payload, n = row[1], row[6]
    assert {(m, i) for (m, i) in by if m == row[0]} == {
        (row[0], i) for i in range(0, n, 2)}
    for i in range(0, n, 2):
        exp = mc.ppm_encode(mc.y4m_frame(payload, i))
        assert by[(row[0], i)] == exp


def test_audio_stats_real_wav(media):
    from jesse_spark.operators.multimodal import audio_stats
    from jesse_spark.sources.fixtures import _gen_media_row

    rows = {r["media_id"]: r for r in
            audio_stats(media.filter(F.col("media_type") == "audio")).collect()}
    assert rows
    row = _gen_media_row(5)                       # first audio kind index
    pcm, sr, codec = mc.wav_decode(row[1])
    got = rows[row[0]]
    assert got["sr_hz"] == 8000 and got["n_samples"] == len(pcm)
    assert abs(got["rms"] - float(np.sqrt(np.mean(pcm.astype(float) ** 2)))) < 1e-9


def test_png_roundtrip_rgb_rgba_gray():
    """png_encode/png_decode round-trip for every supported color type
    (non-interlaced, depth 8) — real stdlib-zlib decode, no fake."""
    rng = np.random.default_rng(11)
    for shape in [(7, 5, 3), (7, 5, 4), (7, 5), (1, 1, 3), (40, 33, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        dec = mc.png_decode(mc.png_encode(img))
        exp = img[:, :, None] if img.ndim == 2 else img
        assert dec.dtype == np.uint8 and np.array_equal(dec, exp), shape


def test_png_all_scanline_filters():
    """Reconstruction of Sub/Up/Average/Paeth-filtered scanlines (a
    real encoder picks filters per row; filter-0-only would silently
    corrupt such files)."""
    import struct
    import zlib

    rng = np.random.default_rng(3)
    w, h, bpp = 6, 5, 3
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    flat = img.reshape(h, -1).astype(np.int64)
    lines, prev = [], np.zeros(w * bpp, dtype=np.int64)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        raw = np.zeros_like(cur)
        for x in range(w * bpp):
            a = cur[x - bpp] if x >= bpp else 0
            b, c = prev[x], (prev[x - bpp] if x >= bpp else 0)
            pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1}.get(f)
            if pred is None:  # paeth
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            raw[x] = (cur[x] - pred) % 256
        lines.append(bytes([f]) + bytes(raw.astype(np.uint8)))
        prev = cur

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(b"".join(lines)))
           + chunk(b"IEND", b""))
    assert np.array_equal(mc.png_decode(png), img)


def test_png_through_image_decode_and_multimodal():
    """image_decode sniffs PNG and returns RGB (alpha dropped, gray
    replicated); the multimodal decode path uses the REAL decoder, not
    _fake_decode."""
    from jesse_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(5)
    rgba = rng.integers(0, 256, size=(4, 6, 4), dtype=np.uint8)
    assert np.array_equal(mc.image_decode(mc.png_encode(rgba)),
                          rgba[:, :, :3])
    gray = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
    assert np.array_equal(mc.image_decode(mc.png_encode(gray)),
                          np.repeat(gray[:, :, None], 3, axis=2))
    rgb = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(mc.png_encode(rgb), 6, 4), rgb)


def test_png_rejects_malformed():
    with pytest.raises(ValueError):
        mc.png_decode(b"\x89PNG\r\n\x1a\nnot-a-chunk")
    with pytest.raises(ValueError):
        mc.png_decode(b"BM123456")


def test_jpeg_roundtrip_tolerance():
    """Baseline SOF0 encode→decode stays within DCT-quantization
    tolerance: solid colors (DC-only) are exact, smooth gradients are
    within ±2 at q92, and worst-case noise is bounded at q95.  Offline
    caveat: no libjpeg in this container to cross-check bitstreams; the
    DC-exactness and structural tests below pin the semantics that a
    shared encoder/decoder bug could not cancel out."""
    # solid color: every AC coefficient is 0 → round-trips exactly
    solid = np.full((16, 24, 3), [200, 30, 90], dtype=np.uint8)
    assert np.array_equal(mc.jpeg_decode(mc.jpeg_encode(solid, 90)), solid)
    yy, xx = np.mgrid[0:40, 0:56]
    grad = np.stack([np.clip(yy * 4, 0, 255), np.clip(xx * 3, 0, 255),
                     np.clip(120 + yy, 0, 255)], axis=2).astype(np.uint8)
    d = np.abs(mc.jpeg_decode(mc.jpeg_encode(grad, 92)).astype(int)
               - grad.astype(int))
    assert d.max() <= 2 and d.mean() < 1.0, (d.max(), d.mean())
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    d = np.abs(mc.jpeg_decode(mc.jpeg_encode(noise, 95)).astype(int)
               - noise.astype(int))
    assert d.max() <= 32, d.max()


def test_jpeg_subsampled_and_gray_and_odd_dims():
    yy, xx = np.mgrid[0:33, 0:47]
    grad = np.stack([np.clip(yy * 4, 0, 255), np.clip(xx * 3, 0, 255),
                     np.clip(120 + yy, 0, 255)], axis=2).astype(np.uint8)
    # 4:2:0: chroma box-downsampled then nearest-upsampled — wider
    # tolerance, exact output dims (MCU padding cropped)
    dec = mc.jpeg_decode(mc.jpeg_encode(grad, 92, subsample=True))
    assert dec.shape == grad.shape
    d = np.abs(dec.astype(int) - grad.astype(int))
    assert d.max() <= 8, d.max()
    # 4:2:2 (horizontal-only chroma): mixed sampling factors (2,1)
    # exercise the non-square MCU block loops in both codec directions
    dec = mc.jpeg_decode(mc.jpeg_encode(grad, 92, subsample="422"))
    assert dec.shape == grad.shape
    assert np.abs(dec.astype(int) - grad.astype(int)).max() <= 6
    # grayscale single-component
    g = np.clip(yy * 5, 0, 255).astype(np.uint8)
    dec = mc.jpeg_decode(mc.jpeg_encode(g, 90))
    assert dec.shape == (33, 47, 1)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 2
    # non-MCU-multiple dims incl. 1x1
    rng = np.random.default_rng(1)
    for shape in [(1, 1, 3), (9, 7, 3), (17, 16, 3)]:
        im = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert mc.jpeg_decode(mc.jpeg_encode(im, 97)).shape == shape


def test_jpeg_restart_intervals():
    """DRI/RSTn: predictors reset and the reader re-aligns at every
    marker — decode must be IDENTICAL to the no-restart stream's
    (restart only changes entropy framing, not coefficients)."""
    yy, xx = np.mgrid[0:33, 0:47]
    grad = np.stack([np.clip(yy * 4, 0, 255), np.clip(xx * 3, 0, 255),
                     np.clip(120 + yy, 0, 255)], axis=2).astype(np.uint8)
    base = mc.jpeg_decode(mc.jpeg_encode(grad, 92))
    for ri in (1, 2, 5):
        dec = mc.jpeg_decode(mc.jpeg_encode(grad, 92, restart_interval=ri))
        assert np.array_equal(dec, base), ri
    dec = mc.jpeg_decode(
        mc.jpeg_encode(grad, 92, subsample=True, restart_interval=3))
    assert np.array_equal(
        dec, mc.jpeg_decode(mc.jpeg_encode(grad, 92, subsample=True)))


def test_jpeg_through_image_decode_and_multimodal():
    """image_decode sniffs JPEG; the multimodal decode path uses the
    REAL decoder (gray replicated to RGB), not _fake_decode."""
    from jesse_spark.operators.multimodal import decode_image

    yy, xx = np.mgrid[0:16, 0:24]
    grad = np.stack([np.clip(yy * 8, 0, 255)] * 3, axis=2).astype(np.uint8)
    payload = mc.jpeg_encode(grad, 95)
    assert np.abs(mc.image_decode(payload).astype(int)
                  - grad.astype(int)).max() <= 3
    assert np.abs(decode_image(payload, 24, 16).astype(int)
                  - grad.astype(int)).max() <= 3
    g = np.clip(yy * 9, 0, 255).astype(np.uint8)
    rgb = mc.image_decode(mc.jpeg_encode(g, 95))
    assert rgb.shape == (16, 24, 3)
    assert np.array_equal(rgb[:, :, 0], rgb[:, :, 1])


def test_jpeg_corruption_fuzz_only_valueerror():
    """Random byte-level corruption of a valid stream must surface as
    ValueError (or decode to SOME array — bit flips in entropy data can
    still be decodable) — never struct.error/IndexError/KeyError
    leaking from the marker walk or huffman reader.  Deterministic
    seeds; the pipeline's per-clip try/except depends on this
    contract."""
    rng = np.random.default_rng(17)
    base = bytearray(mc.jpeg_encode(
        rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8), 90))
    for trial in range(200):
        buf = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            op = rng.integers(0, 3)
            pos = int(rng.integers(2, len(buf)))
            if op == 0:                      # flip a byte
                buf[pos] = int(rng.integers(0, 256))
            elif op == 1:                    # truncate
                buf = buf[:pos]
            else:                            # duplicate a slice
                end = min(len(buf), pos + int(rng.integers(1, 32)))
                buf = buf[:end] + buf[pos:end] + buf[end:]
        try:
            out = mc.jpeg_decode(bytes(buf))
            assert isinstance(out, np.ndarray)
        except ValueError:
            pass    # the documented rejection path


def test_png_corruption_fuzz_only_valueerror():
    """Same contract as the JPEG fuzz: corrupt PNG bytes raise
    ValueError or decode — no leaked zlib/struct/numpy internals."""
    rng = np.random.default_rng(29)
    base = bytearray(mc.png_encode(
        rng.integers(0, 256, size=(12, 9, 3), dtype=np.uint8)))
    for trial in range(200):
        buf = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            op = rng.integers(0, 3)
            pos = int(rng.integers(8, max(len(buf), 9)))
            if op == 0 and pos < len(buf):
                buf[pos] = int(rng.integers(0, 256))
            elif op == 1:
                buf = buf[:pos]
            else:
                end = min(len(buf), pos + int(rng.integers(1, 32)))
                buf = buf[:end] + buf[pos:end] + buf[end:]
        try:
            out = mc.png_decode(bytes(buf))
            assert isinstance(out, np.ndarray)
        except ValueError:
            pass


def test_jpeg_rejects_malformed():
    with pytest.raises(ValueError, match="SOI"):
        mc.jpeg_decode(b"hello")
    with pytest.raises(ValueError, match="baseline"):
        # SOF2 (progressive)
        mc.jpeg_decode(b"\xff\xd8\xff\xc2\x00\x04\x00\x00")
    with pytest.raises(ValueError):
        # truncated scan: valid headers, no entropy data
        full = mc.jpeg_encode(np.zeros((8, 8, 3), dtype=np.uint8))
        sos = full.index(b"\xff\xda")
        mc.jpeg_decode(full[:sos + 14])


def test_jpeg_zero_sampling_factor_is_valueerror():
    """ADVICE r5 (medium): a flipped SOF sampling-factor byte must
    surface as ValueError, not leak ZeroDivisionError out of the
    MCU-grid math."""
    full = bytearray(mc.jpeg_encode(np.zeros((8, 8, 3), dtype=np.uint8)))
    sof = bytes(full).index(b"\xff\xc0")
    # component 0 sampling byte: SOF body = prec(1) h(2) w(2) nc(1),
    # then per component id, sampling, tq
    full[sof + 4 + 6 + 1] = 0x00
    with pytest.raises(ValueError, match="sampling"):
        mc.jpeg_decode(bytes(full))


def test_jpeg_fill_bytes_and_standalone_markers_accepted():
    """ADVICE r5 (low): optional 0xFF fill bytes before a marker code
    and standalone TEM markers are legal (T.81 §B.1.1.2) and must not
    abort the marker walk."""
    img = np.full((8, 8, 3), 128, dtype=np.uint8)
    full = mc.jpeg_encode(img)
    ref = mc.jpeg_decode(full)
    # inject a fill byte + a TEM marker right after SOI
    padded = full[:2] + b"\xff" + full[2:]          # ff d8 ff ff db ...
    with_tem = full[:2] + b"\xff\x01" + full[2:]    # ff d8 ff 01 ff db ...
    for variant in (padded, with_tem):
        out = mc.jpeg_decode(variant)
        assert out.shape == ref.shape and np.array_equal(out, ref)


def test_png_corrupt_raises_valueerror_not_internal():
    """Corrupt input surfaces as ValueError per the BMP/PPM decoder
    convention — never struct.error (truncated IHDR body) or zlib.error
    (missing/garbage IDAT) leaking from the internals (ADVICE r4 #1)."""
    import struct
    import zlib

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    magic = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    # IHDR + IEND but no IDAT at all
    with pytest.raises(ValueError, match="IDAT"):
        mc.png_decode(magic + chunk(b"IHDR", ihdr) + chunk(b"IEND", b""))
    # truncated IHDR body (struct.error path)
    with pytest.raises(ValueError):
        mc.png_decode(magic + chunk(b"IHDR", ihdr[:5])
                      + chunk(b"IDAT", zlib.compress(b"\0" * 14))
                      + chunk(b"IEND", b""))
    # garbage IDAT stream (zlib.error path)
    with pytest.raises(ValueError, match="IDAT"):
        mc.png_decode(magic + chunk(b"IHDR", ihdr)
                      + chunk(b"IDAT", b"\xff\xfe\xfd\xfc")
                      + chunk(b"IEND", b""))
