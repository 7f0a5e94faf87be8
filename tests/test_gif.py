"""GIF codec tests: LZW anchored against a hand-assembled spec-exact
stream, container decode/encode round-trips, interlace, transparency,
animation disposal semantics, and the multimodal dispatch integration.

The decode anchor is independent of the encoder: the fixture GIF below is
assembled byte-by-byte from the GIF89a spec (codes 4,1,2,2 at 3 bits then
0,5 at 4 bits, LSB-first => 8C 04 05), so a self-consistent-but-wrong
codec cannot pass.
"""

import struct

import numpy as np
import pytest

from spdb_spark.functions.gif import (
    _sub_blocks,
    gif_decode,
    gif_encode,
    gif_encode_frames,
    gif_frame_features,
    gif_frames,
    lzw_decode,
    lzw_encode,
)

# 4x1 image, 4-color global palette, pixels [red, green, green, black].
# LZW data hand-computed: CLEAR(4),1,2,2 at width 3; 0,EOI(5) at width 4.
PALETTE = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
HAND_GIF = (
    b"GIF89a"
    + struct.pack("<HHBBB", 4, 1, 0x91, 0, 0)
    + bytes(v for c in PALETTE for v in c)
    + b"\x2c"
    + struct.pack("<HHHHB", 0, 0, 4, 1, 0)
    + bytes([2])  # LZW minimum code size
    + bytes([3, 0x8C, 0x04, 0x05, 0])
    + b"\x3b"
)


def test_hand_assembled_gif_decodes_spec_exact():
    frames = gif_frames(HAND_GIF)
    assert len(frames) == 1
    f = frames[0]
    assert f.shape == (1, 4, 4)
    expected = np.array(
        [[PALETTE[1], PALETTE[2], PALETTE[2], PALETTE[0]]], np.uint8
    )
    assert (f[..., :3] == expected).all()
    assert (f[..., 3] == 255).all()


def test_hand_assembled_lzw_stream():
    assert lzw_decode(bytes([0x8C, 0x04, 0x05]), 2, 4) == bytes([1, 2, 2, 0])


def test_lzw_roundtrip_crosses_width_boundaries_and_table_reset():
    rng = np.random.default_rng(7)
    # ~20k random bytes force the table through 512/1024/2048/4096 and a
    # mid-stream CLEAR reset at the 4096 frontier.
    data = rng.integers(0, 256, 20_000, dtype=np.uint8).tobytes()
    assert lzw_decode(lzw_encode(data, 8), 8, len(data)) == data
    # Small alphabet exercises the low code widths.
    data2 = rng.integers(0, 4, 5_000, dtype=np.uint8).tobytes()
    assert lzw_decode(lzw_encode(data2, 2), 2, len(data2)) == data2


def test_lzw_truncation_and_bad_code_raise():
    enc = lzw_encode(b"\x00\x01\x02\x03" * 8, 2)
    with pytest.raises(ValueError, match="truncated"):
        lzw_decode(enc[:2], 2, 32)
    # A code past the table frontier: width 3 after CLEAR, code 7 first.
    # CLEAR=4 (100), then 7 (111): bits 0,0,1,1,1,1 -> byte 0b00111100.
    with pytest.raises(ValueError, match="root|frontier"):
        lzw_decode(bytes([0b00111100]), 2, 4)


def test_gray_roundtrip():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (23, 31), dtype=np.uint8)
    out = gif_decode(gif_encode(img))
    assert out.shape == img.shape and (out == img).all()


def test_rgb_roundtrip_and_color_limit():
    rng = np.random.default_rng(2)
    # 200 distinct colors, tiled.
    colors = rng.integers(0, 256, (200, 3), dtype=np.uint8)
    idx = rng.integers(0, 200, (17, 19))
    img = colors[idx]
    out = gif_decode(gif_encode(img))
    assert out.shape == (17, 19, 4)
    assert (out[..., :3] == img).all() and (out[..., 3] == 255).all()

    too_many = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert len(np.unique(too_many.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError, match="quantize"):
        gif_encode(too_many)


def test_binary_alpha_roundtrip_and_partial_alpha_refuses():
    rng = np.random.default_rng(3)
    colors = rng.integers(0, 256, (50, 3), dtype=np.uint8)
    img = np.zeros((11, 13, 4), np.uint8)
    img[..., :3] = colors[rng.integers(0, 50, (11, 13))]
    img[..., 3] = 255
    mask = rng.random((11, 13)) < 0.3
    img[mask] = 0  # transparent pixels are (0,0,0,0) => exact roundtrip
    out = gif_decode(gif_encode(img))
    assert out.shape == img.shape and (out == img).all()

    partial = img.copy()
    partial[0, 0, 3] = 128
    with pytest.raises(ValueError, match="alpha"):
        gif_encode(partial)


def test_interlace_roundtrip():
    rng = np.random.default_rng(4)
    for h in (1, 2, 5, 8, 16, 33):
        img = rng.integers(0, 256, (h, 9), dtype=np.uint8)
        assert (gif_decode(gif_encode(img, interlace=True)) == img).all()


def test_animation_full_rect_frames_roundtrip():
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (8, 10), dtype=np.uint8) for _ in range(5)]
    payload = gif_encode_frames(frames)
    decoded = gif_frames(payload)
    assert len(decoded) == 5
    for orig, dec in zip(frames, decoded):
        assert (dec[..., 0] == orig).all()
        assert (dec[..., 0] == dec[..., 1]).all()
        assert (dec[..., 3] == 255).all()


def _sub_rect_gif(disposal: int) -> bytes:
    """Two-frame GIF: frame 1 fills 4x4 with color 1; frame 2 draws a 2x2
    rect of color 2 at (1,1) with the given disposal set ON FRAME 2, plus
    a third full-rect frame of color 3 drawn only at row 0 so the canvas
    after disposal is observable in frame 3's snapshot."""
    pal = bytes([0, 0, 0, 10, 10, 10, 20, 20, 20, 30, 30, 30])
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x91, 0, 0) + pal

    def image(left, top, w, h, color):
        block = bytearray()
        block += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
        block.append(2)
        block += _sub_blocks(lzw_encode(bytes([color]) * (w * h), 2))
        return bytes(block)

    out += image(0, 0, 4, 4, 1)
    # GCE with the disposal applying to frame 2
    out += b"\x21\xf9\x04" + bytes([(disposal & 7) << 2]) + b"\x00\x00\x00\x00"
    out += image(1, 1, 2, 2, 2)
    out += image(0, 0, 4, 1, 3)
    out += b"\x3b"
    return bytes(out)


def test_disposal_none_keeps_overlay():
    f = gif_frames(_sub_rect_gif(1))
    assert (f[1][1:3, 1:3, 0] == 10 * 2).all()  # overlay color 2
    # frame 3: overlay persists outside the new row-0 draw
    assert (f[2][1:3, 1:3, 0] == 20).all()
    assert (f[2][0, :, 0] == 30).all()


def test_disposal_background_clears_rect():
    f = gif_frames(_sub_rect_gif(2))
    assert (f[1][1:3, 1:3, 0] == 20).all()
    # after frame 2, its rect restores to transparent
    assert (f[2][1:3, 1:3, 3] == 0).all()
    assert (f[2][3, :, 0] == 10).all()  # rest of frame 1 untouched


def test_disposal_previous_restores_canvas():
    f = gif_frames(_sub_rect_gif(3))
    assert (f[1][1:3, 1:3, 0] == 20).all()
    # after frame 2, the canvas reverts to frame 1 everywhere
    assert (f[2][1:3, 1:3, 0] == 10).all()
    assert (f[2][0, :, 0] == 30).all()


def test_still_gif_features_match_png_twin():
    from spdb_spark.functions.multimodal import (
        _image_frame_features,
        decode_features_status,
    )
    from spdb_spark.operators.render import png_encode

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    via_gif, st_g = decode_features_status(gif_encode(img), 4, 16)
    via_png, st_p = decode_features_status(png_encode(img), 4, 16)
    assert st_g == "ok" and st_p == "ok"
    assert (via_gif == via_png).all()
    assert (via_gif == _image_frame_features(img, 4, 16)).all()


def test_animated_gif_features_sample_frames():
    frames = [np.full((8, 8), v, np.uint8) for v in (0, 60, 120, 180, 240)]
    feats = gif_frame_features(gif_encode_frames(frames), 5, 3)
    assert feats.shape == (5, 3)
    expected = np.array([0, 60, 120, 180, 240], np.float64) / 255.0
    assert np.allclose(feats, expected[:, None], atol=1e-6)


def test_resize_gif_real_path(spark):
    from spdb_spark.functions.multimodal import resize_images

    rng = np.random.default_rng(8)
    imgs = {i: rng.integers(0, 256, (16, 16), dtype=np.uint8) for i in range(4)}
    media = spark.createDataFrame(
        [(i, bytearray(gif_encode(img))) for i, img in imgs.items()],
        "media_id long, payload binary",
    )
    rows = resize_images(media, width=8, height=8).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.status == "ok"
        out = gif_decode(bytes(r.payload))
        # nearest-neighbor on a 2x downscale picks every other pixel
        assert (out == imgs[r.media_id][::2, ::2]).all()
