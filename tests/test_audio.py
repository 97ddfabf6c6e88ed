"""Codec roundtrips + SNR math (pure numpy, no Spark)."""

import numpy as np
import pytest

from jesse_spark.functions import audio


@pytest.fixture
def pcm():
    rng = np.random.default_rng(7)
    t = np.arange(8000) / 8000.0
    x = 0.6 * np.sin(2 * np.pi * 440 * t) + 0.2 * rng.standard_normal(8000)
    return np.clip(np.round(x * 32767), -32768, 32767).astype(np.int16)


def test_pcm16_roundtrip(pcm):
    assert np.array_equal(audio.pcm16_decode(audio.pcm16_encode(pcm)), pcm)


def test_ulaw_roundtrip_snr(pcm):
    dec = audio.ulaw_decode(audio.ulaw_encode(pcm))
    snr = audio.snr_db(pcm, dec)
    assert snr >= audio.SNR_THRESHOLD_DB, snr


def test_alaw_roundtrip_snr(pcm):
    dec = audio.alaw_decode(audio.alaw_encode(pcm))
    snr = audio.snr_db(pcm, dec)
    assert snr >= audio.SNR_THRESHOLD_DB, snr


def test_ulaw_known_values():
    # 0 encodes to 0xFF, decodes back to 0 (G.711 table identities)
    assert audio.ulaw_encode(np.array([0], dtype=np.int16))[0] == 0xFF
    assert audio.ulaw_decode(np.array([0xFF], dtype=np.uint8))[0] == 0


def test_alaw_idempotent_on_decoded(pcm):
    """encode∘decode is idempotent: decoded values are codec fixpoints."""
    once = audio.alaw_decode(audio.alaw_encode(pcm))
    twice = audio.alaw_decode(audio.alaw_encode(once))
    assert np.array_equal(once, twice)


def test_snr_detects_corruption(pcm):
    raw = bytearray(audio.pcm16_encode(pcm))
    for i in range(1, len(raw), 8):  # flip high bytes (little-endian)
        raw[i] ^= 0xFF
    dec = audio.pcm16_decode(bytes(raw))
    assert audio.snr_db(pcm, dec) < audio.SNR_THRESHOLD_DB


def test_synth_deterministic():
    a = audio.synth_pcm("abc123", 16000, 1600)
    b = audio.synth_pcm("abc123", 16000, 1600)
    c = audio.synth_pcm("abc124", 16000, 1600)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert audio.reference_transcript("x") == audio.reference_transcript("x")
    assert 1 <= len(audio.reference_transcript("x")) <= 200


def test_synth_batch_bit_identical_to_per_clip():
    """synth_pcm_batch must reproduce synth_pcm SAMPLE-FOR-SAMPLE for
    mixed (sr, n) inputs, both f32 (short) and f64 (>4 s) paths (it is
    deliberately a per-clip loop — see its docstring for the
    measurements that killed the matrix formulations)."""
    import numpy as np

    from jesse_spark.functions.audio import synth_pcm, synth_pcm_batch

    cases = [
        (f"clip-{i:04x}", sr, n)
        for i, (sr, n) in enumerate([
            (8000, 1600), (8000, 1600), (16000, 1600), (8000, 0),
            (8000, 40000),              # 5 s @ 8 kHz → f64 path
            (16000, 16000), (8000, 1600), (16000, 70000),  # 4.375 s f64
        ])
    ]
    batch = synth_pcm_batch([c[0] for c in cases], [c[1] for c in cases],
                            [c[2] for c in cases])
    for (cid, sr, n), got in zip(cases, batch):
        exp = synth_pcm(cid, sr, n)
        assert got.dtype == np.int16 and len(got) == n
        assert np.array_equal(got, exp), (cid, sr, n)


def test_synth_batch_realistic_length_distribution():
    """Bit-identity over a realistic near-unique length distribution
    (the case that exposed the reduceat accumulation-order mismatch in
    the killed matrix formulation)."""
    import numpy as np

    import jesse_spark.functions.audio as A

    rng = np.random.default_rng(0)
    srs = rng.choice([8000, 16000], size=40)
    lens = (srs * rng.uniform(0.2, 2.0, size=40)).astype(int)
    cids = [f"clip-{i:08x}" for i in range(40)]
    batch = A.synth_pcm_batch(cids, srs, lens)
    for cid, sr, n, got in zip(cids, srs, lens, batch):
        assert np.array_equal(got, A.synth_pcm(cid, int(sr), int(n)))
