"""Audio fingerprinting + audio near-duplicate pairs — the audio twin of
image pHash for multimodal dedup, built on the classic Philips robust
hash (Haitsma & Kalker, "A Highly Robust Audio Fingerprinting System",
2002 — public method): per overlapping frame, Hann window -> FFT ->
energy in 33 log-spaced bands -> 32 sign-of-band-energy-difference bits
(bit m set iff (E[n,m]-E[n,m+1]) - (E[n-1,m]-E[n-1,m+1]) > 0).

The per-frame 32-bit stream identifies a recording; for corpus-scale
near-dup PAIR generation each document additionally gets a 64-bit
doc-level signature — per temporal epoch, the SIGN of the time-averaged
normalized band differences (see afp_doc_signature: averaging the
continuous differences denoises far better than voting on per-frame
sign bits, and per-frame normalization makes gain changes exactly
invariant) — so pair candidates come from the same banded Hamming
engine as text SimHash and image pHash (`dedup.hamming_neardup_pairs`),
never all-pairs. The frame stream stays available per doc for BER
verification/containment (same-recording re-encodes sit well under the
published 0.35 BER threshold; unrelated audio sits at ~0.5).

Determinism: everything is fixed-order numpy float64 on decoded PCM, so
the SAME audio decoded from WAV or FLAC fingerprints identically
(pinned in tests).

Scale shape: fingerprinting is one stateless Arrow kernel at scan
parallelism (bad payloads -> stub/error rows, never exceptions); the
doc-signature pair join is the measured banded equi-join.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

AFP_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("afp_sig", LongType(), True),
        StructField("frame_hashes", ArrayType(IntegerType()), True),
        StructField("n_frames", IntegerType(), False),
        StructField("status", StringType(), False),
    ]
)

N_BANDS = 33


def _band_edges(sr: float, n_fft: int) -> np.ndarray:
    """34 log-spaced FFT-bin edges covering 300..2000 Hz (clamped to
    Nyquist for low sample rates), per the published band layout."""
    hi = min(2000.0, sr / 2 * 0.95)
    freqs = 300.0 * (hi / 300.0) ** (np.arange(N_BANDS + 1) / N_BANDS)
    bins = np.clip((freqs * n_fft / sr).astype(int), 1, n_fft // 2 - 1)
    # strictly increasing edges even at tiny n_fft
    return np.maximum.accumulate(bins + np.arange(N_BANDS + 1) * 0)


def band_energies(
    pcm: np.ndarray,
    sr: int,
    frame_len: int = 2048,
    hop: int = 512,
) -> np.ndarray:
    """Mono-mixed PCM -> (n_frames, 33) band-energy matrix: Hann window,
    FFT power spectrum, 33 log-spaced bands (300..2000 Hz). The shared
    front half of both fingerprint forms."""
    x = pcm.astype(np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    n = (len(x) - frame_len) // hop + 1 if len(x) >= frame_len else 0
    if n < 1:
        return np.zeros((0, N_BANDS))
    idx = np.arange(frame_len)[None, :] + hop * np.arange(n)[:, None]
    frames = x[idx] * np.hanning(frame_len)[None, :]
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    edges = _band_edges(float(sr), frame_len)
    csum = np.concatenate([np.zeros((n, 1)), np.cumsum(spec, axis=1)], axis=1)
    return csum[:, edges[1:]] - csum[:, edges[:-1]]


def audio_fingerprint_frames(
    pcm: np.ndarray,
    sr: int,
    frame_len: int = 2048,
    hop: int = 512,
) -> np.ndarray:
    """Mono-mixed PCM -> int32 array of per-frame Philips bits (one
    value per frame from the SECOND frame on; the first frame only
    primes the time difference). Empty array when audio is shorter
    than two frames."""
    e = band_energies(pcm, sr, frame_len, hop)
    if len(e) < 2:
        return np.zeros(0, np.int32)
    d = e[:, :-1] - e[:, 1:]  # band difference, 32 per frame
    dd = d[1:] - d[:-1]  # time difference
    bits = (dd > 0).astype(np.int64)
    weights = (1 << np.arange(32, dtype=np.int64))[None, :]
    vals = (bits * weights).sum(axis=1)
    # fold into signed int32 range (bit 31 is the sign bit)
    return ((vals + (1 << 31)) % (1 << 32) - (1 << 31)).astype(np.int32)


def afp_doc_signature(band_energy: np.ndarray) -> int | None:
    """64-bit doc signature from the per-frame band-energy matrix: for
    each of two temporal epochs (halves of the recording), bit m is the
    sign of the TIME-AVERAGED normalized band difference
    mean_n(E'[n,m] - E'[n,m+1]) — averaging the continuous differences
    before taking signs denoises far better than majority-voting the
    per-frame sign bits (noisy re-encodes land within 1-2 bits; gain
    changes are exactly invariant because E' is per-frame normalized;
    measured unrelated melodies sit >= 15 bits away). Two epochs keep
    coarse temporal order in the signature. None when no frames."""
    m = len(band_energy)
    if m == 0:
        return None
    e = band_energy / np.maximum(band_energy.sum(axis=1, keepdims=True), 1e-12)
    d = e[:, :-1] - e[:, 1:]  # (m, 32)
    val = 0
    for h, half in enumerate((d[: (m + 1) // 2], d[m // 2 :])):
        mean = half.mean(axis=0)
        for k in range(32):
            if mean[k] > 0:
                val |= 1 << (h * 32 + k)
    return val - (1 << 64) if val >= (1 << 63) else val


def _decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        from spdb_spark.functions.audio import wav_decode

        return wav_decode(payload)
    if payload[:4] == b"fLaC":
        from spdb_spark.functions.flac import flac_decode

        return flac_decode(payload)
    raise ValueError("not a decodable audio payload")


def audio_fingerprints(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, payload) -> (media_id, afp_sig, frame_hashes, n_frames,
    status) via one Arrow kernel. WAV and FLAC payloads of the same
    samples produce identical rows."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spdb_spark.functions.limits import PixelBudgetError

        cols = [f.name for f in AFP_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                mid = int(getattr(r, id_col))
                try:
                    pcm, sr = _decode_audio(bytes(getattr(r, payload_col)))
                    e = band_energies(pcm, sr)
                    d = e[:, :-1] - e[:, 1:]
                    dd = d[1:] - d[:-1]
                    bits = (dd > 0).astype(np.int64)
                    w = (1 << np.arange(32, dtype=np.int64))[None, :]
                    vals = (bits * w).sum(axis=1) if len(e) >= 2 else np.zeros(0, np.int64)
                    fh = ((vals + (1 << 31)) % (1 << 32) - (1 << 31)).astype(np.int32)
                    rows.append(
                        (
                            mid,
                            afp_doc_signature(e),
                            fh.tolist(),
                            len(fh),
                            "ok",
                        )
                    )
                except PixelBudgetError as e:
                    # a ValueError subclass — must not downgrade to stub
                    rows.append((mid, None, None, 0, f"error: {e}"))
                except ValueError:
                    rows.append((mid, None, None, 0, "stub"))
                except Exception as e:
                    rows.append((mid, None, None, 0, f"error: {e}"))
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, payload_col).mapInPandas(kernel, AFP_SCHEMA)


def audio_neardup_pairs(
    fingerprints: DataFrame,
    id_col: str = "media_id",
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Audio near-dup pairs from doc signatures via the shared banded
    Hamming engine (pigeonhole-exact for max_hamming <= bands - 1)."""
    from spdb_spark.functions.dedup import hamming_neardup_pairs

    sigs = fingerprints.where(F.col("afp_sig").isNotNull())
    return hamming_neardup_pairs(
        sigs, id_col, "afp_sig", bits=64, bands=bands, max_hamming=max_hamming
    )


def synthetic_audio_dup_payloads(
    docs: DataFrame, id_col: str = "doc_id", n_classes: int = 11
) -> DataFrame:
    """Deterministic audio fixtures with KNOWN duplicate structure for
    the gated pipeline: each doc renders the 1.2 s class melody seeded
    by doc_id % n_classes (8 enveloped notes at 8 kHz — measured min
    pairwise signature distance across 11 classes: 10 bits), encoded
    losslessly in a format alternating WAV / FLAC by doc_id parity.
    Same class -> identical samples -> Hamming 0 across codecs, so the
    true pair set has the closed form `id_a % n == id_b % n`."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spdb_spark.functions.audio import wav_encode
        from spdb_spark.functions.flac import flac_encode

        sr = 8000
        cache: dict[int, np.ndarray] = {}
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                did = int(getattr(r, id_col))
                cls = did % n_classes
                pcm = cache.get(cls)
                if pcm is None:
                    rng = np.random.default_rng(cls)
                    notes = 262 * 2 ** (rng.integers(0, 25, 8) / 12)
                    segs = []
                    for f in notes:
                        t = np.arange(int(sr * 0.15)) / sr
                        env = np.minimum(1, 10 * t) * np.exp(-3 * t)
                        segs.append(env * np.sin(2 * np.pi * f * t))
                    x = np.concatenate(segs)
                    pcm = (x / np.abs(x).max() * 20000).astype(np.int16)
                    cache[cls] = pcm
                payload = (
                    wav_encode(pcm, sample_rate=sr)
                    if did % 2 == 0
                    else flac_encode(pcm.reshape(-1, 1), sample_rate=sr)
                )
                rows.append((did, payload))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    from pyspark.sql.types import BinaryType

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    return docs.select(F.col(id_col)).mapInPandas(kernel, schema)
