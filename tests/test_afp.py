"""Audio fingerprint tests: codec invariance (WAV == FLAC of the same
samples), gain invariance, noise robustness, discrimination of
unrelated recordings, and the Spark kernel + banded pair join."""

import numpy as np

from spdb_spark.functions.afp import (
    afp_doc_signature,
    audio_fingerprint_frames,
    audio_fingerprints,
    audio_neardup_pairs,
    band_energies,
)

SR = 16000


def _melody(notes, seed=None, gain=1.0):
    """Non-stationary fixture: 0.25 s notes with attack/decay envelopes
    (stationary tones make the time-difference bits pure noise — a
    known property of the method, so fixtures must have structure)."""
    segs = []
    for f in notes:
        t = np.arange(int(SR * 0.25)) / SR
        env = np.minimum(1, 10 * t) * np.exp(-3 * t)
        segs.append(env * np.sin(2 * np.pi * f * t))
    x = np.concatenate(segs) * gain
    if seed is not None:
        x = x + np.random.default_rng(seed).normal(0, 0.005, len(x))
    return (x / np.abs(x).max() * 20000).astype(np.int16)


N1 = [440, 494, 554, 587, 659, 740, 831, 880, 740, 659, 587, 554]
N2 = [523, 466, 415, 392, 349, 311, 277, 262, 311, 349, 392, 415]


def _sig(pcm):
    return afp_doc_signature(band_energies(pcm, SR))


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_signature_invariances_and_discrimination():
    base = _sig(_melody(N1))
    assert _ham(base, _sig(_melody(N1, gain=0.4))) == 0  # gain-exact
    assert _ham(base, _sig(_melody(N1, seed=1))) <= 3  # light noise
    assert _ham(base, _sig(_melody(N2))) > 10  # unrelated
    rng = np.random.default_rng(7)
    for _ in range(6):
        notes = list(262 * 2 ** (rng.integers(0, 13, 12) / 12))
        assert _ham(base, _sig(_melody(notes))) > 3


def test_frame_ber_separation():
    fa = audio_fingerprint_frames(_melody(N1), SR)
    fb = audio_fingerprint_frames(_melody(N1, seed=1), SR)
    fc = audio_fingerprint_frames(_melody(N2), SR)
    assert len(fa) > 50

    def ber(p, q):
        return (
            sum(bin((int(x) ^ int(y)) & 0xFFFFFFFF).count("1") for x, y in zip(p, q))
            / (32 * len(p))
        )

    assert ber(fa, fb) < 0.35  # the published match threshold
    assert ber(fa, fc) > ber(fa, fb)


def test_short_audio_edges():
    assert afp_doc_signature(band_energies(np.zeros(10, np.int16), SR)) is None
    assert len(audio_fingerprint_frames(np.zeros(2048, np.int16), SR)) == 0


def test_spark_kernel_codec_invariance_and_pairs(spark):
    from spdb_spark.functions.audio import wav_encode
    from spdb_spark.functions.flac import flac_encode

    a = _melody(N1)
    b = _melody(N2)
    rows = [
        (1, bytearray(wav_encode(a))),
        (2, bytearray(flac_encode(a.reshape(-1, 1)))),  # same samples, FLAC
        (3, bytearray(wav_encode(_melody(N1, seed=2)))),  # noisy re-record
        (4, bytearray(wav_encode(b))),  # unrelated
        (5, bytearray(b"not audio at all" * 3)),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    fp = audio_fingerprints(media)
    got = {r["media_id"]: r for r in fp.collect()}
    assert got[5]["status"] == "stub" and got[5]["afp_sig"] is None
    assert all(got[i]["status"] == "ok" for i in (1, 2, 3, 4))
    # WAV and FLAC of the same samples: identical signature AND frames
    assert got[1]["afp_sig"] == got[2]["afp_sig"]
    assert got[1]["frame_hashes"] == got[2]["frame_hashes"]

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audio_neardup_pairs(fp).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 3
    assert not any(4 in p or 5 in p for p in pairs)


def _hostile_flac() -> bytes:
    """Valid fLaC + STREAMINFO declaring 2^36-1 total samples x 8
    channels: flac_decode's check_total_budget refuses before any
    amplification."""
    bits = []

    def w(v, n):
        bits.extend(((v >> (n - 1 - i)) & 1) for i in range(n))

    w(4096, 16), w(4096, 16), w(0, 24), w(0, 24)
    w(44100, 20), w(7, 3), w(15, 5)
    w((1 << 36) - 1, 36)
    body = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for b in bits[i : i + 8]:
            byte = (byte << 1) | b
        body.append(byte)
    body += b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + bytes(body)


def test_budget_refusal_is_error_not_stub(spark):
    """PixelBudgetError subclasses ValueError; the kernel must record a
    budget refusal as an error row, never downgrade it to 'stub'
    (mirrors image_phash/video_phashes)."""
    media = spark.createDataFrame(
        [(1, bytearray(_hostile_flac()))], "media_id long, payload binary"
    )
    row = audio_fingerprints(media).collect()[0]
    assert row["status"].startswith("error:"), row["status"]
    assert "budget" in row["status"]
    assert row["afp_sig"] is None and row["n_frames"] == 0
