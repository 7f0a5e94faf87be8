"""Baseline JPEG codec (functions/jpeg.py): encode/decode round-trips
within quantization error, edge shapes, unsupported-stream rejection, and
the multimodal pipeline treating JPEG as a REAL decode (status='ok')."""

import numpy as np
import pytest

from spdb_spark.functions.jpeg import jpeg_decode, jpeg_encode


def _smooth_gray(h, w):
    x = np.linspace(0, 4 * np.pi, w)
    y = np.linspace(0, 3 * np.pi, h)
    return ((np.sin(y)[:, None] * np.cos(x)[None, :]) * 100 + 128).astype(np.uint8)


class TestCodec:
    def test_gray_roundtrip_within_quant_error(self):
        img = _smooth_gray(64, 64)
        out = jpeg_decode(jpeg_encode(img, quality=90))
        assert out.shape == img.shape and out.dtype == np.uint8
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 8

    def test_rgb_roundtrip_within_quant_error(self):
        r = np.tile(np.linspace(0, 255, 48, dtype=np.uint8), (40, 1))
        g = np.tile(np.linspace(255, 0, 48, dtype=np.uint8), (40, 1))
        b = ((r.astype(int) + g.astype(int)) // 2).astype(np.uint8)
        rgb = np.stack([r, g, b], axis=2)
        out = jpeg_decode(jpeg_encode(rgb, quality=90))
        assert out.shape == rgb.shape
        assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 12

    def test_non_multiple_of_8_dims(self):
        img = _smooth_gray(37, 45)
        out = jpeg_decode(jpeg_encode(img, quality=95))
        assert out.shape == (37, 45)
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 3

    def test_quality_tradeoff(self):
        img = _smooth_gray(64, 64)
        small = jpeg_encode(img, quality=30)
        big = jpeg_encode(img, quality=95)
        assert len(small) < len(big)
        err_small = np.abs(
            jpeg_decode(small).astype(int) - img.astype(int)
        ).mean()
        err_big = np.abs(jpeg_decode(big).astype(int) - img.astype(int)).mean()
        assert err_big <= err_small

    def test_deterministic(self):
        img = _smooth_gray(32, 32)
        assert jpeg_encode(img) == jpeg_encode(img)

    def test_progressive_gray_pixel_exact_vs_baseline(self):
        """SOF2 is a REAL decode now (round-6): progressive encode uses
        the same quantized coefficients as baseline, so both streams
        must decode to IDENTICAL pixels."""
        for h, w in ((64, 64), (37, 45), (8, 8), (1, 1), (9, 70)):
            img = _smooth_gray(h, w)
            base = jpeg_decode(jpeg_encode(img, quality=85))
            prog = jpeg_decode(jpeg_encode(img, quality=85, progressive=True))
            assert np.array_equal(base, prog), (h, w)

    def test_progressive_rgb_pixel_exact_vs_baseline(self):
        rng = np.random.default_rng(3)
        for q in (10, 50, 85, 95):
            img = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
            base = jpeg_decode(jpeg_encode(img, quality=q))
            prog = jpeg_decode(jpeg_encode(img, quality=q, progressive=True))
            assert np.array_equal(base, prog), q

    def test_progressive_stream_is_sof2_with_multiple_scans(self):
        blob = jpeg_encode(_smooth_gray(24, 24), progressive=True)
        assert b"\xff\xc2" in blob and b"\xff\xc0" not in blob
        assert blob.count(b"\xff\xda") >= 5  # DC first/refine + banded AC

    def test_sparse_and_dense_spectra_roundtrip(self):
        """Flat blocks (pure EOB paths) and noise (dense refinement with
        ZRL + correction bits) both survive the progressive round-trip."""
        rng = np.random.default_rng(5)
        flat = np.full((48, 40), 130, np.uint8)
        noise = rng.integers(0, 256, (48, 40), dtype=np.uint8)
        for img in (flat, noise):
            base = jpeg_decode(jpeg_encode(img, quality=30))
            prog = jpeg_decode(jpeg_encode(img, quality=30, progressive=True))
            assert np.array_equal(base, prog)

    def test_progressive_restart_markers_pixel_exact(self):
        """DRI + RSTn in every progressive scan (predictor/EOB-state
        resets + bit realignment) — the decoder restart path, exercised
        at aggressive intervals down to every MCU."""
        rng = np.random.default_rng(17)
        img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
        base = jpeg_decode(jpeg_encode(img, quality=80))
        for ri in (1, 3, 7):
            blob = jpeg_encode(
                img, quality=80, progressive=True, restart_interval=ri
            )
            assert b"\xff\xdd" in blob  # DRI present
            assert any(bytes([0xFF, 0xD0 + n]) in blob for n in range(8))
            assert np.array_equal(jpeg_decode(blob), base), ri

    def test_420_subsampling_baseline_and_progressive(self):
        """4:2:0 (what real-world JPEGs actually use): both decoders'
        subsampled paths — MCU-structured baseline scan, interleaved
        2x2+1+1 progressive DC, non-interleaved chroma grids that DIFFER
        from the MCU-padded grid — cross-pinned pixel-exact against each
        other, and close to the source on smooth input."""
        rng = np.random.default_rng(23)
        for h, w in ((48, 64), (33, 47), (17, 15), (8, 8)):
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            blob_b = jpeg_encode(img, quality=85, subsampling="4:2:0")
            blob_p = jpeg_encode(
                img, quality=85, subsampling="4:2:0", progressive=True
            )
            db, dp = jpeg_decode(blob_b), jpeg_decode(blob_p)
            assert db.shape == img.shape
            assert np.array_equal(db, dp), (h, w)
        # smooth gradient: 4:2:0 loses only chroma detail
        x, y = np.meshgrid(np.arange(64), np.arange(48))
        img = np.stack([(x * 3) % 256, (y * 3) % 256, np.full_like(x, 128)], 2).astype(
            np.uint8
        )
        d = jpeg_decode(jpeg_encode(img, quality=95, subsampling="4:2:0"))
        assert np.abs(d.astype(int) - img.astype(int)).mean() < 3

    def test_422_subsampling_baseline_and_progressive(self):
        rng = np.random.default_rng(27)
        for h, w in ((48, 64), (33, 47), (9, 9)):
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            db = jpeg_decode(jpeg_encode(img, quality=85, subsampling="4:2:2"))
            dp = jpeg_decode(
                jpeg_encode(img, quality=85, subsampling="4:2:2", progressive=True)
            )
            assert db.shape == img.shape and np.array_equal(db, dp), (h, w)

    def test_baseline_restart_markers(self):
        rng = np.random.default_rng(29)
        img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
        plain = jpeg_decode(jpeg_encode(img, quality=80))
        blob = jpeg_encode(img, quality=80, restart_interval=3)
        assert b"\xff\xdd" in blob
        assert np.array_equal(jpeg_decode(blob), plain)

    def test_arithmetic_coded_rejected(self):
        # flip SOF0 (FFC0) to SOF9 (FFC9, arithmetic sequential)
        blob = bytearray(jpeg_encode(_smooth_gray(16, 16)))
        idx = bytes(blob).find(b"\xff\xc0")
        blob[idx + 1] = 0xC9
        with pytest.raises(ValueError, match="baseline/progressive"):
            jpeg_decode(bytes(blob))

    def test_garbage_rejected(self):
        with pytest.raises(ValueError):
            jpeg_decode(b"\xff\xd8not a real jpeg stream at all")


class TestMultimodalJpeg:
    def test_frame_features_real_and_ok(self, spark):
        from spdb_spark.functions.multimodal import (
            _image_frame_features,
            extract_frame_features,
        )

        img = _smooth_gray(32, 48)
        blob = jpeg_encode(img, quality=95)
        media = spark.createDataFrame(
            [(1, bytearray(blob))], "media_id long, payload binary"
        )
        rows = extract_frame_features(media, n_frames=4, dim=8).collect()
        assert len(rows) == 4 and all(r.status == "ok" for r in rows)
        got = np.array(
            [r.feature for r in sorted(rows, key=lambda r: r.frame_idx)]
        )
        expect = _image_frame_features(jpeg_decode(blob), 4, 8)
        np.testing.assert_array_equal(got.astype(np.float32), expect)

    def test_resize_emits_real_jpeg(self, spark):
        from spdb_spark.functions.multimodal import resize_image_array, resize_images

        img = _smooth_gray(40, 56)
        blob = jpeg_encode(img, quality=95)
        media = spark.createDataFrame(
            [(9, bytearray(blob))], "media_id long, payload binary"
        )
        (row,) = resize_images(media, 16, 12).collect()
        assert row.status == "ok"
        out = jpeg_decode(bytes(row.payload))
        assert out.shape == (12, 16)
        want = resize_image_array(jpeg_decode(blob), 16, 12)
        assert np.abs(out.astype(int) - want.astype(int)).max() <= 8

    def test_progressive_payload_decodes_real_ok(self, spark):
        """SOF2 payloads flow through the pipeline as REAL decodes now:
        same features as the baseline encoding of the same image,
        status='ok'."""
        from spdb_spark.functions.multimodal import extract_frame_features

        img = _smooth_gray(32, 48)
        media = spark.createDataFrame(
            [
                (1, bytearray(jpeg_encode(img, quality=95))),
                (2, bytearray(jpeg_encode(img, quality=95, progressive=True))),
            ],
            "media_id long, payload binary",
        )
        rows = extract_frame_features(media, n_frames=3, dim=8).collect()
        assert len(rows) == 6 and all(r.status == "ok" for r in rows)
        by_id = {}
        for r in rows:
            by_id.setdefault(r.media_id, {})[r.frame_idx] = list(r.feature)
        assert by_id[1] == by_id[2]  # identical pixels -> identical features

    def test_arithmetic_payload_labeled_stub(self, spark):
        from spdb_spark.functions.multimodal import extract_frame_features

        blob = bytearray(jpeg_encode(_smooth_gray(16, 16)))
        idx = bytes(blob).find(b"\xff\xc0")
        blob[idx + 1] = 0xC9  # SOF9: arithmetic -> honest stub
        media = spark.createDataFrame(
            [(1, bytearray(bytes(blob)))], "media_id long, payload binary"
        )
        rows = extract_frame_features(media, n_frames=2, dim=4).collect()
        assert rows and all(r.status == "stub" for r in rows)


def test_avi_mjpeg_video_decodes_for_real(spark):
    """AVI carrying Motion-JPEG frames (what OpenCV's 'MJPG' writer
    emits): the video leg must decode the sampled frames for real and
    report status='ok'."""
    from spdb_spark.functions.multimodal import (
        _image_frame_features,
        extract_frame_features,
    )
    from spdb_spark.functions.video import avi_encode_mpng

    frames = []
    for i in range(6):
        img = ((_smooth_gray(24, 24).astype(int) + 7 * i) % 256).astype(np.uint8)
        frames.append(jpeg_encode(img, quality=95))
    payload = avi_encode_mpng(frames, 24, 24)  # container is codec-agnostic
    media = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    rows = extract_frame_features(media, n_frames=3, dim=4).collect()
    assert len(rows) == 3 and all(r.status == "ok" for r in rows)
    # frame 0 features equal the directly-decoded first frame's
    got0 = np.array(
        [r.feature for r in rows if r.frame_idx == 0][0], dtype=np.float32
    )
    want0 = _image_frame_features(jpeg_decode(frames[0]), 1, 4)[0]
    np.testing.assert_array_equal(got0, want0)


def test_corrupt_progressive_scan_header_raises_valueerror():
    """Review r6: a corrupt SOS Se byte must raise ValueError (the
    multimodal stub-fallback contract), never IndexError."""
    blob = bytearray(
        jpeg_encode(_smooth_gray(16, 16), progressive=True)
    )
    # find the first AC SOS (ns=1) and corrupt its Se byte to 200
    i = 0
    found = False
    while True:
        i = bytes(blob).find(b"\xff\xda", i + 1)
        if i < 0:
            break
        ns = blob[i + 4]
        if ns == 1:
            se_idx = i + 4 + 1 + 2 * ns + 1
            blob[se_idx] = 200
            found = True
            break
    assert found
    with pytest.raises(ValueError, match="scan header"):
        jpeg_decode(bytes(blob))
    # and the pipeline labels it stub instead of dying
    from spdb_spark.functions.multimodal import decode_features_status

    _feats, status = decode_features_status(bytes(blob), 2, 4)
    assert status == "stub"


def test_idct_summation_order_parity_regression():
    """Review r6: einsum's accumulation order differed ~1e-11 from the
    per-block matmul and flipped .5 rounding ties (65x75, coarse values,
    q5) — both decode paths now share the gemm-per-slice order."""
    rng = np.random.default_rng(42)
    img = (rng.integers(0, 256, (65, 75, 3)) // 32 * 32).astype(np.uint8)
    for sub in ("4:4:4", "4:2:0", "4:2:2"):
        b = jpeg_decode(jpeg_encode(img, quality=5, subsampling=sub))
        p = jpeg_decode(
            jpeg_encode(img, quality=5, subsampling=sub, progressive=True)
        )
        assert np.array_equal(b, p), sub
