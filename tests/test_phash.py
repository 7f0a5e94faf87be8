"""Perceptual hash tests: format-invariance (same pixels, different
codecs -> identical hash), robustness to mild edits, discrimination of
unrelated images, and the Spark kernel + banded pair join."""

import numpy as np
import pytest

from spdb_spark.functions.phash import (
    decode_image_any,
    image_phash,
    phash64,
    phash_neardup_pairs,
)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _photo(seed: int) -> np.ndarray:
    """Smooth 'natural' image: random low-frequency fields upsampled."""
    rng = np.random.default_rng(seed)
    coarse = rng.integers(0, 256, (8, 8)).astype(np.float64)
    rows = np.repeat(coarse, 12, axis=0)
    img = np.repeat(rows, 12, axis=1)
    return img.clip(0, 255).astype(np.uint8)


def test_format_invariance():
    from spdb_spark.functions.bmp import bmp_encode
    from spdb_spark.functions.qoi import qoi_encode
    from spdb_spark.functions.tga import tga_encode
    from spdb_spark.operators.render import png_encode

    img = _photo(1)
    hashes = {
        phash64(decode_image_any(enc(img)))
        for enc in (png_encode, bmp_encode, qoi_encode, tga_encode)
    }
    assert len(hashes) == 1  # identical pixels -> identical hash


def test_robust_to_mild_edits_discriminates_unrelated():
    img = _photo(2)
    base = phash64(img)
    brighter = (img.astype(np.int32) + 14).clip(0, 255).astype(np.uint8)
    assert _hamming(base, phash64(brighter)) <= 3
    noisy = (
        img.astype(np.int32)
        + np.random.default_rng(0).integers(-4, 5, img.shape)
    ).clip(0, 255).astype(np.uint8)
    assert _hamming(base, phash64(noisy)) <= 6
    dists = [_hamming(base, phash64(_photo(s))) for s in range(10, 30)]
    assert min(dists) > 12  # unrelated images live far away


def test_uint16_matches_uint8_source():
    img = _photo(3)
    assert phash64(img) == phash64(img.astype(np.uint16) * 257)


def test_spark_kernel_and_pairs(spark):
    from spdb_spark.functions.qoi import qoi_encode
    from spdb_spark.operators.render import png_encode

    img_a, img_b = _photo(4), _photo(5)
    bright_a = (img_a.astype(np.int32) + 10).clip(0, 255).astype(np.uint8)
    rows = [
        (1, bytearray(png_encode(img_a))),
        (2, bytearray(qoi_encode(img_a))),      # exact re-encode of 1
        (3, bytearray(png_encode(bright_a))),   # mild edit of 1
        (4, bytearray(png_encode(img_b))),      # unrelated
        (5, bytearray(b"\x00\x01garbage" * 5)),  # undecodable
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    hashed = image_phash(media)
    got = {r["media_id"]: (r["phash"], r["status"]) for r in hashed.collect()}
    assert got[5][1] == "stub" and got[5][0] is None
    assert all(got[i][1] == "ok" for i in (1, 2, 3, 4))
    assert got[1][0] == got[2][0]

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_neardup_pairs(hashed, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 3
    assert not any(4 in p or 5 in p for p in pairs)


def test_bomb_payload_is_error_row(spark):
    import struct

    bomb = (
        b"qoif" + struct.pack(">II", 1 << 16, 1 << 16) + bytes((3, 0))
        + b"\x00" * 7 + b"\x01"
    )
    media = spark.createDataFrame(
        [(9, bytearray(bomb))], "media_id long, payload binary"
    )
    row = image_phash(media).collect()[0]
    assert row["phash"] is None and row["status"].startswith("error")


def _clip(cls, n=4):
    rng = np.random.default_rng(1000 + cls)
    out = []
    for _ in range(n):
        coarse = rng.integers(0, 256, (8, 8)).astype(np.float64)
        out.append(
            np.repeat(np.repeat(coarse, 12, 0), 12, 1).clip(0, 255).astype(np.uint8)
        )
    return out


def test_video_signature_container_invariance_and_pairs(spark):
    from spdb_spark.functions.phash import (
        video_phash_frames,
        video_phashes,
        video_signature,
    )
    from spdb_spark.functions.video import avi_encode_dib, avi_encode_mpng
    from spdb_spark.operators.render import png_encode

    def mpng(frames):
        h, w = frames[0].shape[:2]
        return avi_encode_mpng([png_encode(f) for f in frames], w, h)

    fr = _clip(0)
    s1 = video_signature(video_phash_frames(mpng(fr)))
    s2 = video_signature(video_phash_frames(avi_encode_dib(fr)))
    assert s1 == s2  # same pixels, different container

    rows = [
        (1, bytearray(mpng(_clip(1)))),
        (2, bytearray(avi_encode_dib(_clip(1)))),   # container twin of 1
        (3, bytearray(mpng(_clip(2)))),             # unrelated clip
        (4, bytearray(b"RIFF\x10\x00\x00\x00AVI " + b"\x07" * 24)),  # corrupt
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    hashed = video_phashes(media)
    got = {r["media_id"]: (r["phash"], r["status"]) for r in hashed.collect()}
    assert got[1][1] == got[2][1] == got[3][1] == "ok"
    assert got[1][0] == got[2][0]
    assert got[4][1] == "stub" and got[4][0] is None

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_neardup_pairs(hashed).collect()
    }
    assert pairs == {(1, 2): 0}


def test_media_clusters_compose_with_text_machinery(spark):
    """Perceptual pairs feed the SAME transitive-closure clustering as
    text dedup (dup_clusters is pair-generic): a class duplicated across
    formats collapses to one cluster keyed by its min media_id."""
    from spdb_spark.functions.dedup import dup_clusters
    from spdb_spark.functions.phash import (
        image_phash,
        phash_neardup_pairs,
        synthetic_image_dup_payloads,
    )
    from pyspark.sql import functions as F

    ids = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    media = synthetic_image_dup_payloads(ids, "doc_id", n_classes=3)
    pairs = phash_neardup_pairs(image_phash(media))
    clusters = {
        r["id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()
    }
    assert len(clusters) == 12
    for i in range(12):
        assert clusters[i] == i % 3  # min member of each class
    keepers = {v for v in clusters.values()}
    assert keepers == {0, 1, 2}


def test_video_signature_invariant_across_animated_containers():
    # the SAME gray clip packed as AVI-MPNG, animated GIF, APNG, and
    # animated WebP must vote to the IDENTICAL 64-bit video signature
    # (all four containers are lossless on these frames)
    import numpy as np

    from spdb_spark.functions.apng import apng_encode
    from spdb_spark.functions.gif import gif_encode_frames
    from spdb_spark.functions.phash import video_phash_frames, video_signature
    from spdb_spark.functions.video import avi_encode_mpng
    from spdb_spark.functions.webp import webp_encode_animation
    from spdb_spark.operators.render import png_encode

    rng = np.random.default_rng(21)
    frames = [rng.integers(0, 256, (40, 48), dtype=np.uint8) for _ in range(4)]
    payloads = {
        "avi": avi_encode_mpng([png_encode(f) for f in frames], 48, 40),
        "gif": gif_encode_frames(frames),
        "apng": apng_encode(frames),
        "webp": webp_encode_animation(frames),
    }
    sigs = {
        k: video_signature(video_phash_frames(p, 4))
        for k, p in payloads.items()
    }
    assert len(set(sigs.values())) == 1, sigs


def test_video_phashes_kernel_accepts_animated_webp(spark):
    import numpy as np

    from spdb_spark.functions.phash import video_phashes
    from spdb_spark.functions.webp import webp_encode_animation

    rng = np.random.default_rng(4)
    rows = []
    for mid in range(6):
        frames = [
            rng.integers(0, 256, (16, 16), dtype=np.uint8) for _ in range(3)
        ]
        rows.append((mid, bytearray(webp_encode_animation(frames))))
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = video_phashes(media).collect()
    assert len(out) == 6
    assert all(r["status"] == "ok" and r["phash"] is not None for r in out)
