"""Perceptual image hashing (pHash) + image near-duplicate pairs — the
image twin of text SimHash for multimodal training-data dedup: re-saves,
format conversions, and mild brightness/noise edits of the same picture
collide, unrelated pictures don't.

Algorithm (the classic DCT pHash, public method): decode -> grayscale ->
nearest-neighbor resize to 32x32 -> orthonormal 2-D DCT-II -> keep the
8x8 low-frequency block -> zero the DC coefficient -> threshold each
coefficient against the median of the remaining 63 -> 64-bit signature
(bit k = coefficient k above median; DC contributes a constant 0 bit).
Every step is deterministic numpy, so the hash is a pure function of
the decoded pixels — the SAME image re-encoded as PNG/QOI/TGA/BMP
hashes identically (pinned in tests).

Scale shape: hashing is one stateless Arrow kernel over the payload
scan (decode parallelism = scan parallelism, undecodable payloads yield
status='stub'/'error' rows, never exceptions); pair generation reuses
`dedup.hamming_neardup_pairs` — the banded equi-join + verify-in-join
engine measured at 500k items (35 s), never all-pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("phash", LongType(), True),
        StructField("status", StringType(), False),
    ]
)

_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II matrix (rows = basis vectors)."""
    global _DCT32
    if n == 32 and _DCT32 is not None:
        return _DCT32
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    if n == 32:
        _DCT32 = m
    return m


def phash64(img: np.ndarray) -> int:
    """Decoded image (gray (H,W) or (H,W,C), uint8/uint16) -> 64-bit
    perceptual hash as a signed int64 (Spark LongType-compatible)."""
    from spdb_spark.functions.multimodal import resize_image_array

    gray = (
        img.astype(np.float64).mean(axis=2) if img.ndim == 3 else img.astype(np.float64)
    )
    if img.dtype == np.uint16:
        gray /= 257.0  # same dynamic range for 8- and 16-bit sources
    small = resize_image_array(gray, 32, 32)
    d = _dct_matrix(32)
    block = (d @ small @ d.T)[:8, :8].copy()
    block[0, 0] = 0.0
    flat = block.ravel()
    med = np.median(flat[1:])
    bits = flat > med
    val = 0
    for k in range(64):
        if bits[k]:
            val |= 1 << k
    # two's-complement fold into signed int64 for Spark LongType
    return val - (1 << 64) if val >= (1 << 63) else val


def decode_image_any(payload: bytes) -> np.ndarray:
    """Decode ANY in-repo image codec by magic (PNG/JPEG/GIF/BMP/TIFF/
    PNM/QOI/farbfeld/ICO/WebP-lossless, TGA by its 2.0 footer) -> pixel
    array. ValueError for non-image/undecodable payloads."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from spdb_spark.operators.render import png_decode

        return png_decode(payload)
    if payload[:2] == b"\xff\xd8":
        from spdb_spark.functions.jpeg import jpeg_decode

        return jpeg_decode(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from spdb_spark.functions.gif import gif_decode

        return gif_decode(payload)
    if payload[:2] == b"BM":
        from spdb_spark.functions.bmp import bmp_decode

        return bmp_decode(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from spdb_spark.functions.tiff import tiff_decode

        return tiff_decode(payload)
    if payload[:2] in (b"P4", b"P5", b"P6") and payload[2:3].isspace():
        from spdb_spark.functions.pnm import pnm_decode

        return pnm_decode(payload)
    if payload[:4] == b"qoif":
        from spdb_spark.functions.qoi import qoi_decode

        return qoi_decode(payload)
    if payload[:8] == b"farbfeld":
        from spdb_spark.functions.farbfeld import farbfeld_decode

        return farbfeld_decode(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from spdb_spark.functions.webp import webp_decode

        return webp_decode(payload)
    if payload[:4] == b"\x00\x00\x01\x00":
        from spdb_spark.functions.ico import ico_decode

        return ico_decode(payload)
    from spdb_spark.functions.tga import tga_decode, tga_sniff

    if tga_sniff(payload):
        return tga_decode(payload)
    raise ValueError("not a decodable image payload")


def image_phash(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, payload) -> (media_id, phash, status) via one Arrow kernel.
    status: 'ok' (hashed), 'stub' (recognized container, undecodable
    variant — e.g. H.264), 'error: ...' (corrupt). A budget refusal
    (PixelBudgetError) is an error row, not an exception."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spdb_spark.functions.limits import PixelBudgetError

        out_cols = [f.name for f in PHASH_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                mid = int(getattr(r, id_col))
                try:
                    img = decode_image_any(bytes(getattr(r, payload_col)))
                    rows.append((mid, phash64(img), "ok"))
                except PixelBudgetError as e:
                    # a ValueError subclass — must not downgrade to stub
                    rows.append((mid, None, f"error: {e}"))
                except ValueError:
                    rows.append((mid, None, "stub"))
                except Exception as e:  # hostile headers
                    rows.append((mid, None, f"error: {e}"))
            yield pd.DataFrame(rows, columns=out_cols)

    return media.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(kernel, PHASH_SCHEMA)


def phash_neardup_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    phash_col: str = "phash",
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Image near-dup pairs from pHash signatures: banded candidate
    join + exact Hamming verify via `dedup.hamming_neardup_pairs`
    (pigeonhole-exact recall for max_hamming <= bands - 1). Null
    signatures (stub/error rows) are excluded."""
    from spdb_spark.functions.dedup import hamming_neardup_pairs

    sigs = hashes.where(F.col(phash_col).isNotNull())
    return hamming_neardup_pairs(
        sigs, id_col, phash_col, bits=64, bands=bands, max_hamming=max_hamming
    )


def synthetic_image_dup_payloads(
    docs: DataFrame, id_col: str = "doc_id", n_classes: int = 17
) -> DataFrame:
    """Deterministic image fixtures with KNOWN duplicate structure for
    the gated pipeline: each doc renders the class image seeded by
    doc_id % n_classes (a coarse random field upsampled 12x — measured
    min pairwise pHash distance across 17 classes: 24 bits), encoded
    losslessly in a format rotated by doc_id % 3 (PNG/QOI/TGA). Same
    class -> identical pixels -> Hamming 0 across formats; different
    classes are >> max_hamming apart — so the true near-dup pair set has
    the closed form `id_a % n == id_b % n` a SQL oracle can replay."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spdb_spark.functions.qoi import qoi_encode
        from spdb_spark.functions.tga import tga_encode
        from spdb_spark.operators.render import png_encode

        encoders = (png_encode, qoi_encode, tga_encode)
        cache: dict[int, np.ndarray] = {}
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                did = int(getattr(r, id_col))
                cls = did % n_classes
                img = cache.get(cls)
                if img is None:
                    rng = np.random.default_rng(cls)
                    coarse = rng.integers(0, 256, (8, 8)).astype(np.float64)
                    img = (
                        np.repeat(np.repeat(coarse, 12, axis=0), 12, axis=1)
                        .clip(0, 255)
                        .astype(np.uint8)
                    )
                    cache[cls] = img
                rows.append((did, encoders[did % 3](img)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    return docs.select(F.col(id_col)).mapInPandas(kernel, schema)


def cross_hamming_pairs(
    new_sigs: DataFrame,
    corpus_sigs: DataFrame,
    id_col: str = "media_id",
    sig_col: str = "phash",
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Hamming pairs BETWEEN two signature sets (new batch x existing
    corpus) — the incremental probe under streaming image dedup. The
    corpus is never re-paired with itself: only (corpus_id, new_id)
    pairs emerge, via the same banded equi-join + verify-in-join shape
    as `dedup.hamming_neardup_pairs`. The new side is batch-bounded and
    broadcast; the corpus side never shuffles."""
    if bits % bands:
        raise ValueError("cross_hamming_pairs: bands must divide bits")
    width = bits // bands
    mask = (1 << width) - 1

    def banded(df: DataFrame, out_id: str, out_sig: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(sig_col).alias(out_sig),
            F.explode(
                F.sequence(F.lit(0), F.lit(bands - 1)).cast("array<int>")
            ).alias("band"),
        ).withColumn(
            "band_key",
            F.expr(f"shiftrightunsigned({out_sig}, band * {width})").bitwiseAND(
                F.lit(mask)
            ),
        )

    corpus = banded(
        corpus_sigs.where(F.col(sig_col).isNotNull()), "corpus_id", "sig_a"
    )
    new = banded(new_sigs.where(F.col(sig_col).isNotNull()), "new_id", "sig_b")
    return (
        corpus.join(F.broadcast(new), ["band", "band_key"])
        .select(
            "corpus_id",
            "new_id",
            F.expr("bit_count(sig_a ^ sig_b)").cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["corpus_id", "new_id"])
    )


def _animation_canvases(payload: bytes) -> list[np.ndarray] | None:
    """Composited frame canvases for the non-AVI animated containers the
    repo decodes (animated GIF / APNG / animated WebP VP8L), or None
    when the payload is not one of them. Canvases collapse to grayscale
    exactly like the feature pipeline so a lossless container re-encode
    of the same clip hashes identically."""
    from spdb_spark.functions.gif import _collapse_gray

    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from spdb_spark.functions.gif import gif_frames

        return [_collapse_gray(f) for f in gif_frames(payload)]
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from spdb_spark.functions.apng import apng_frames, is_apng

        if not is_apng(payload):
            return None
        return [_collapse_gray(f) for f in apng_frames(payload)]
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from spdb_spark.functions.webp import is_animated_webp, webp_frames

        if not is_animated_webp(payload):
            return None
        return [_collapse_gray(f) for f in webp_frames(payload)]
    return None


def video_phash_frames(payload: bytes, n_samples: int = 8) -> list[int]:
    """Video-ish payload -> per-sampled-frame pHashes (evenly sampled via
    the video feature schedule). AVI carries PNG/MJPG/DIB frame codecs
    (the same decode set as video_frame_features); animated GIF / APNG /
    animated WebP hash their COMPOSITED canvases, so the same clip
    re-packed across animated containers votes to the same signature.
    ValueError on foreign frame codecs."""
    from spdb_spark.functions.jpeg import jpeg_decode
    from spdb_spark.functions.video import (
        _dib_frame_decode,
        avi_frames,
        avi_stream_format,
        sample_frame_indices,
    )
    from spdb_spark.operators.render import png_decode

    canvases = _animation_canvases(payload)
    if canvases is not None:
        if not canvases:
            raise ValueError("video: no frames")
        return [
            phash64(canvases[i])
            for i in sample_frame_indices(
                len(canvases), min(n_samples, len(canvases))
            )
        ]
    frames = avi_frames(payload)
    if not frames:
        raise ValueError("video: no frames")
    dib = None
    out = []
    for idx in sample_frame_indices(len(frames), min(n_samples, len(frames))):
        blob = frames[idx]
        if blob[:8] == b"\x89PNG\r\n\x1a\n":
            img = png_decode(blob)
        elif blob[:2] == b"\xff\xd8":
            img = jpeg_decode(blob)
        else:
            if dib is None:
                dib = avi_stream_format(payload)
            w, h, bpp, fourcc, palette = dib
            if fourcc != b"DIB " or bpp not in (8, 24, 32):
                raise ValueError("non-PNG/JPEG/DIB frame codec")
            img = _dib_frame_decode(blob, w, h, bpp, palette)
        out.append(phash64(img))
    return out


def video_signature(frame_hashes: list[int]) -> int | None:
    """64-bit video signature: per-bit MAJORITY over the sampled frame
    pHashes. Frame pHashes are stable bits (unlike raw audio sign bits),
    so voting is the right aggregator here: a lossless container
    re-encode votes identically (Hamming 0), per-frame edits flip only
    the bits they win. None when no frames."""
    if not frame_hashes:
        return None
    u = [h & ((1 << 64) - 1) for h in frame_hashes]
    n = len(u)
    val = 0
    for k in range(64):
        if sum((h >> k) & 1 for h in u) * 2 > n:
            val |= 1 << k
    return val - (1 << 64) if val >= (1 << 63) else val


def video_phashes(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_samples: int = 8,
) -> DataFrame:
    """(id, payload) -> (media_id, phash, status) for video-ish payloads
    (AVI, animated GIF/APNG/WebP) — the video analogue of image_phash,
    so `phash_neardup_pairs` serves both modalities unchanged."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spdb_spark.functions.limits import PixelBudgetError

        cols = [f.name for f in PHASH_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                mid = int(getattr(r, id_col))
                try:
                    fh = video_phash_frames(
                        bytes(getattr(r, payload_col)), n_samples
                    )
                    rows.append((mid, video_signature(fh), "ok"))
                except PixelBudgetError as e:
                    rows.append((mid, None, f"error: {e}"))
                except ValueError:
                    rows.append((mid, None, "stub"))
                except Exception as e:
                    rows.append((mid, None, f"error: {e}"))
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, payload_col).mapInPandas(kernel, PHASH_SCHEMA)


def synthetic_video_dup_payloads(
    docs: DataFrame, id_col: str = "doc_id", n_classes: int = 7
) -> DataFrame:
    """Deterministic video fixtures with KNOWN duplicate structure: each
    doc renders the 4-frame class clip seeded by doc_id % n_classes,
    packed in a container alternating MPNG / uncompressed-DIB AVI by
    doc_id parity (measured min pairwise signature distance across the
    classes: 19 bits; same class -> identical pixels -> Hamming 0
    across containers)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spdb_spark.functions.video import avi_encode_dib, avi_encode_mpng
        from spdb_spark.operators.render import png_encode

        cache: dict[int, list[np.ndarray]] = {}
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                did = int(getattr(r, id_col))
                cls = did % n_classes
                frames = cache.get(cls)
                if frames is None:
                    rng = np.random.default_rng(1000 + cls)
                    frames = []
                    for _ in range(4):
                        coarse = rng.integers(0, 256, (8, 8)).astype(np.float64)
                        frames.append(
                            np.repeat(np.repeat(coarse, 12, 0), 12, 1)
                            .clip(0, 255)
                            .astype(np.uint8)
                        )
                    cache[cls] = frames
                if did % 2 == 0:
                    h, w = frames[0].shape[:2]
                    payload = avi_encode_mpng(
                        [png_encode(f) for f in frames], w, h
                    )
                else:
                    payload = avi_encode_dib(frames)
                rows.append((did, payload))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    return docs.select(F.col(id_col)).mapInPandas(kernel, schema)
