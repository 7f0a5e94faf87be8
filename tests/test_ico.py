"""ICO codec tests: PNG-member round-trip, hand-assembled DIB members
(doubled height + AND mask, the legacy favicon form), largest-entry
selection, and dispatch/probe integration."""

import struct

import numpy as np
import pytest

from spdb_spark.functions.ico import ico_decode, ico_encode, ico_entries


def test_png_member_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    out = ico_decode(ico_encode(img))
    assert (out == img).all()
    rgba = rng.integers(0, 256, (16, 16, 4), dtype=np.uint8)
    assert (ico_decode(ico_encode(rgba)) == rgba).all()


def _dib_member(img: np.ndarray, transparent_mask: np.ndarray) -> bytes:
    """Hand-assemble a 24bpp DIB icon member: header with DOUBLED height,
    bottom-up BGR rows, then the bottom-up 1-bit AND mask."""
    h, w = img.shape[:2]
    xor_stride = (w * 3 + 3) & ~3
    body = bytearray()
    body += struct.pack("<IiiHHIIiiII", 40, w, h * 2, 1, 24, 0, 0, 0, 0, 0, 0)
    for r in range(h - 1, -1, -1):
        row = img[r, :, ::-1].tobytes()
        body += row + b"\x00" * (xor_stride - len(row))
    and_stride = ((w + 7) // 8 + 3) & ~3
    for r in range(h - 1, -1, -1):
        bits = np.zeros(and_stride * 8, np.uint8)
        bits[:w] = transparent_mask[r].astype(np.uint8)
        body += np.packbits(bits).tobytes()
    return bytes(body)


def _ico(members: list[tuple[int, int, bytes]]) -> bytes:
    out = bytearray(b"\x00\x00\x01\x00" + struct.pack("<H", len(members)))
    off = 6 + 16 * len(members)
    for w, h, blob in members:
        out += struct.pack("<BBBBHHII", w % 256, h % 256, 0, 0, 1, 24,
                           len(blob), off)
        off += len(blob)
    for _w, _h, blob in members:
        out += blob
    return bytes(out)


def test_dib_member_with_and_mask():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (10, 7, 3), dtype=np.uint8)
    mask = rng.random((10, 7)) < 0.3
    payload = _ico([(7, 10, _dib_member(img, mask))])
    out = ico_decode(payload)
    assert out.shape == (10, 7, 4)
    assert (out[..., :3] == img).all()
    assert (out[..., 3] == np.where(mask, 0, 255)).all()


def test_largest_entry_wins():
    rng = np.random.default_rng(2)
    small = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    big = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    nomask = np.zeros((16, 16), bool)
    payload = _ico([
        (4, 4, _dib_member(small, np.zeros((4, 4), bool))),
        (16, 16, _dib_member(big, nomask)),
    ])
    out = ico_decode(payload)
    assert out.shape == (16, 16, 4) and (out[..., :3] == big).all()
    assert len(ico_entries(payload)) == 2


def test_dispatch_and_probe():
    from spdb_spark.functions.multimodal import decode_features_status
    from spdb_spark.functions.probe import probe_payload

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    payload = ico_encode(img)
    feats, status = decode_features_status(payload, 2, 4)
    assert status == "ok"
    container, f = probe_payload(payload)
    assert container == "ico" and (f["width"], f["height"]) == (24, 24)
    assert f["n_frames"] == 1
    # garbage with the weak magic falls to the stub, not an exception
    _, st = decode_features_status(b"\x00\x00\x01\x00" + b"\x07" * 40, 2, 4)
    assert st == "stub"


def test_size_limit():
    with pytest.raises(ValueError, match="256"):
        ico_encode(np.zeros((300, 300), np.uint8))


def test_dib_member_with_optimization_palette_for_24bpp():
    """Review r6b-2: biClrUsed may carry a color table even at 24bpp —
    its bytes must be skipped or pixels shift."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    mask = np.zeros((6, 5), bool)
    blob = bytearray(_dib_member(img, mask))
    # declare a 16-entry optimization palette and splice it in
    struct.pack_into("<I", blob, 32, 16)
    blob[40:40] = bytes(range(64))
    payload = _ico([(5, 6, bytes(blob))])
    out = ico_decode(payload)
    assert (out[..., :3] == img).all() and (out[..., 3] == 255).all()
