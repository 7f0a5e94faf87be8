"""WebP VP8L codec (functions/webp.py): pixel-exact round-trips through
every spec mechanism (transforms, color cache, LZ77 with both distance
stylings, simple/normal prefix codes, pixel bundling), container
dispatch, honest-stub behavior for lossy VP8, budget guard, and
corruption fuzz."""

import numpy as np
import pytest

from spdb_spark.functions.limits import PixelBudgetError
from spdb_spark.functions.webp import (
    BitWriter,
    vp8l_decode,
    vp8l_encode,
    webp_decode,
)


def _rgba(img: np.ndarray) -> np.ndarray:
    """Expected decode: RGB for fully-opaque inputs (qoi convention),
    RGBA when any alpha < 255."""
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.shape[-1] == 4 and (img[..., 3] == 255).all():
        img = img[..., :3]
    return img


def _roundtrip(img, **kw):
    out = webp_decode(vp8l_encode(img, **kw))
    assert np.array_equal(out, _rgba(np.asarray(img))), kw


RNG = np.random.default_rng(1234)
NOISE = RNG.integers(0, 256, (13, 17, 3), dtype=np.uint8)
RUNS = np.repeat(RNG.integers(0, 256, (9, 4, 3), dtype=np.uint8), 7, axis=1)


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"subtract_green": True},
        {"cache_bits": 4},
        {"color_elem": (40, 200, 17)},
        {"subtract_green": True, "cache_bits": 6},
    ],
)
def test_roundtrip_options(kw):
    _roundtrip(NOISE, **kw)


@pytest.mark.parametrize("mode", list(range(14)))
def test_roundtrip_every_predictor_mode(mode):
    _roundtrip(NOISE, predictor=mode)


@pytest.mark.parametrize("style", ["map", "raw"])
def test_roundtrip_lz77(style):
    # runs exercise length/distance prefix-coded values; "map" goes
    # through the 120-entry neighborhood table, "raw" through plain
    # distances (code 120+d)
    _roundtrip(RUNS, lz77_runs=True, dist_style=style)
    _roundtrip(RUNS, lz77_runs=True, dist_style=style, cache_bits=5)


@pytest.mark.parametrize("n_colors,width_bits", [(2, 3), (4, 2), (16, 1), (200, 0)])
def test_roundtrip_palette_bundling(n_colors, width_bits):
    # color-indexing transform incl. sub-byte pixel bundling for small
    # palettes (8/4/2 indices per green byte)
    vals = np.linspace(0, 255, n_colors).astype(np.uint8)
    img = vals[RNG.integers(0, n_colors, (11, 29))]
    _roundtrip(img, palette=True)


def test_roundtrip_rgba_and_edge_sizes():
    _roundtrip(RNG.integers(0, 256, (6, 6, 4), dtype=np.uint8))
    _roundtrip(np.array([[[9, 8, 7]]], dtype=np.uint8))  # 1x1
    _roundtrip(RNG.integers(0, 256, (1, 64, 3), dtype=np.uint8))  # single row
    _roundtrip(RNG.integers(0, 256, (64, 1, 3), dtype=np.uint8))  # single col


def test_long_runs_split_at_max_length():
    # > 4096 identical pixels force multiple copy ops
    img = np.full((70, 70, 3), 123, np.uint8)
    _roundtrip(img, lz77_runs=True)


def test_lossy_vp8_raises_and_stubs():
    import struct

    sync = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 16, 16)
    chunk = b"VP8 " + struct.pack("<I", len(sync)) + sync
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    with pytest.raises(ValueError):
        webp_decode(payload)
    from spdb_spark.functions.multimodal import decode_features_status

    feats, status = decode_features_status(payload, 2, 4)
    assert status == "stub" and feats.shape == (2, 4)


def test_webp_feature_dispatch_is_real():
    from spdb_spark.functions.multimodal import decode_features_status

    img = np.full((16, 16), 200, np.uint8)
    payload = vp8l_encode(img, subtract_green=True, lz77_runs=True)
    feats, status = decode_features_status(payload, 2, 4)
    assert status == "ok"
    assert np.allclose(feats, 200 / 255)


def test_phash_dispatch():
    from spdb_spark.functions.phash import decode_image_any

    img = RNG.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    out = decode_image_any(vp8l_encode(img))
    assert np.array_equal(out, _rgba(img))


def test_pixel_budget_guard():
    bw = BitWriter()
    bw.write(0x2F, 8)
    bw.write(16383, 14)  # width 16384
    bw.write(16383, 14)  # height 16384
    bw.write(0, 1)
    bw.write(0, 3)
    data = bw.getvalue() + b"\x00" * 8
    with pytest.raises(PixelBudgetError):
        vp8l_decode(data)


def test_corruption_never_hangs_or_crashes():
    # bit flips and truncations must raise ValueError (or decode to
    # SOME image), never crash with other exceptions
    base = bytearray(vp8l_encode(NOISE, subtract_green=True, cache_bits=4))
    rng = np.random.default_rng(7)
    for _ in range(80):
        buf = bytearray(base)
        pos = int(rng.integers(20, len(buf)))  # keep RIFF header intact
        buf[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            webp_decode(bytes(buf))
        except ValueError:
            pass
    for cut in (21, len(base) // 2, len(base) - 3):
        try:
            webp_decode(bytes(base[:cut]))
        except ValueError:
            pass


def test_meta_prefix_codes_roundtrip():
    # two prefix-code groups selected per tile through the entropy
    # image; halves use disjoint value ranges so the groups' code
    # tables genuinely differ
    rng = np.random.default_rng(5)
    img = np.concatenate(
        [
            rng.integers(0, 60, (12, 10, 3), dtype=np.uint8),
            rng.integers(180, 256, (12, 11, 3), dtype=np.uint8),
        ],
        axis=1,
    )
    _roundtrip(img, meta_split=True)
    _roundtrip(img, meta_split=True, subtract_green=True)


def test_kraft_completeness_rejected():
    # over-subscribed: three 1-bit codes can't coexist; incomplete:
    # three 2-bit codes leave a reachable-but-unmapped code. libwebp
    # rejects both; silent table overwrites would decode wrong pixels.
    from spdb_spark.functions.webp import PrefixDecoder

    with pytest.raises(ValueError, match="over-subscribed|incomplete"):
        PrefixDecoder([1, 1, 1])
    with pytest.raises(ValueError, match="over-subscribed|incomplete"):
        PrefixDecoder([2, 2, 2])
    PrefixDecoder([1, 2, 2])  # exactly complete: fine
    PrefixDecoder([0, 5, 0])  # single-symbol zero-bit code: exempt


def test_code_length_code_depth_capped_by_halving():
    # exponentially-skewed histograms would push plain Huffman past the
    # ceiling; the halving retry must land every length within it
    from spdb_spark.functions.webp import _huffman_lengths

    freqs = {s: 1 << (2 * s) for s in range(16)}
    capped = _huffman_lengths(freqs, 19, max_len=7)
    assert max(capped) <= 7
    # and the result is still a usable complete code
    from spdb_spark.functions.webp import PrefixDecoder

    PrefixDecoder(capped)


def test_unsupported_vs_corrupt_webp_status():
    import struct

    from spdb_spark.functions.multimodal import decode_features_status
    from spdb_spark.functions.webp import UnsupportedWebPError

    # intentional stub surface: lossy VP8 and chunk-less payloads
    sync = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 16, 16)
    chunk = b"VP8 " + struct.pack("<I", len(sync)) + sync
    lossy = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    with pytest.raises(UnsupportedWebPError):
        webp_decode(lossy)
    assert decode_features_status(lossy, 2, 4)[1] == "stub"

    # a corrupt VP8L stream is an ERROR, not a stub: real signal
    good = bytearray(vp8l_encode(NOISE, cache_bits=4))
    corrupt = bytes(good[: len(good) // 2])
    try:
        webp_decode(corrupt)
    except UnsupportedWebPError:  # pragma: no cover - must not happen
        raise AssertionError("truncated VP8L mislabeled as unsupported")
    except ValueError:
        pass
    feats, status = decode_features_status(corrupt, 2, 4)
    assert status in ("error", "ok") and feats.shape == (2, 4)


def test_animation_roundtrip_and_composition():
    from spdb_spark.functions.apng import _blend_over
    from spdb_spark.functions.webp import (
        is_animated_webp,
        webp_encode_animation,
        webp_frames,
    )

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
    sub = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)

    # no-blend replacement at an offset rect
    p = webp_encode_animation([base, sub], offsets=[(0, 0), (4, 2)])
    assert is_animated_webp(p) and not is_animated_webp(vp8l_encode(base))
    fr = webp_frames(p)
    exp0 = np.dstack([base, np.full((12, 16), 255, np.uint8)])
    assert np.array_equal(fr[0], exp0)
    exp1 = exp0.copy()
    exp1[2:8, 4:12, :3] = sub
    assert np.array_equal(fr[1], exp1)

    # alpha blending of a semi-transparent overlay
    ov = np.zeros((4, 4, 4), np.uint8)
    ov[..., 0], ov[..., 3] = 200, 128
    fr2 = webp_frames(
        webp_encode_animation([base, ov], offsets=[(0, 0), (0, 0)], blends=[False, True])
    )
    assert np.array_equal(fr2[1][:4, :4], _blend_over(exp0[:4, :4].copy(), ov))

    # dispose-to-background feeds the NEXT frame's canvas
    bg = (10, 20, 30, 255)
    fr3 = webp_frames(
        webp_encode_animation(
            [base, sub], offsets=[(0, 0), (0, 0)], disposes=[True, False],
            background=bg,
        )
    )
    assert tuple(fr3[1][10, 12]) == bg

    # a still decodes through webp_frames as its single canvas
    assert np.array_equal(webp_frames(vp8l_encode(base))[0], exp0)


def test_animation_vp8x_alpha_flag_covers_composited_transparency():
    """The VP8X alpha bit (0x10) must be set whenever the COMPOSITED
    canvas can be transparent, not only when a frame pixel is: a first
    frame smaller than the canvas exposes the transparent canvas start,
    and dispose-to-transparent-background paints alpha<255 — strict
    external decoders trust the flag."""
    from spdb_spark.functions.webp import webp_encode_animation

    def vp8x_flags(payload: bytes) -> int:
        i = payload.index(b"VP8X")
        return payload[i + 8]

    rng = np.random.default_rng(7)
    full = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    small = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)

    # opaque frames covering the canvas, no dispose: flag clear
    assert not vp8x_flags(webp_encode_animation([full, full])) & 0x10
    # first frame smaller than the canvas (canvas = union of rects):
    # transparent canvas shows through -> flag set
    assert vp8x_flags(
        webp_encode_animation([small, full], offsets=[(0, 0), (0, 0)])
    ) & 0x10
    # dispose to a transparent background -> flag set
    assert vp8x_flags(
        webp_encode_animation(
            [full, full], disposes=[True, False], background=(0, 0, 0, 0)
        )
    ) & 0x10
    # dispose to an OPAQUE background keeps the flag clear
    assert not vp8x_flags(
        webp_encode_animation(
            [full, full], disposes=[True, False], background=(1, 2, 3, 255)
        )
    ) & 0x10


def test_animation_features_match_png_twin():
    from spdb_spark.functions.multimodal import decode_features_status
    from spdb_spark.functions.webp import webp_encode_animation

    img = np.full((16, 16), 93, np.uint8)
    p = webp_encode_animation([img, img[:8, :8]], offsets=[(0, 0), (4, 4)])
    feats, status = decode_features_status(p, 2, 4)
    assert status == "ok" and np.allclose(feats, 93 / 255)


def test_animation_corruption_and_validation():
    from spdb_spark.functions.webp import webp_encode_animation, webp_frames

    img = np.full((10, 10), 5, np.uint8)
    with pytest.raises(ValueError, match="even"):
        webp_encode_animation([img, img], offsets=[(0, 0), (3, 0)])
    base = bytearray(webp_encode_animation([img, img[:4, :4]]))
    rng = np.random.default_rng(3)
    for _ in range(60):
        buf = bytearray(base)
        pos = int(rng.integers(20, len(buf)))
        buf[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            webp_frames(bytes(buf))
        except ValueError:  # incl. UnsupportedWebPError
            pass
    for cut in (30, len(base) // 2, len(base) - 3):
        try:
            webp_frames(bytes(base[:cut]))
        except ValueError:
            pass
