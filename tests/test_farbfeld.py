"""Farbfeld codec tests: round-trips, a hand-assembled spec fixture,
truncation/bomb rejection, and dispatch/probe integration."""

import struct

import numpy as np
import pytest

from spdb_spark.functions.farbfeld import farbfeld_decode, farbfeld_encode
from spdb_spark.functions.limits import PixelBudgetError


def test_roundtrips():
    rng = np.random.default_rng(31)
    img16 = rng.integers(0, 65536, (7, 9, 4), np.uint16)
    assert (farbfeld_decode(farbfeld_encode(img16)) == img16).all()
    img8 = rng.integers(0, 256, (5, 4, 4), np.uint8)
    assert (
        farbfeld_decode(farbfeld_encode(img8))
        == img8.astype(np.uint16) * 257
    ).all()
    rgb = rng.integers(0, 256, (3, 3, 3), np.uint8)
    out = farbfeld_decode(farbfeld_encode(rgb))
    assert (out[..., :3] == rgb.astype(np.uint16) * 257).all()
    assert (out[..., 3] == 65535).all()


def test_hand_assembled():
    # 1x2: (65535,0,0,65535) over (0,257,514,771) — big-endian u16
    px = struct.pack(">8H", 65535, 0, 0, 65535, 0, 257, 514, 771)
    d = farbfeld_decode(b"farbfeld" + struct.pack(">II", 1, 2) + px)
    assert d.shape == (2, 1, 4)
    assert tuple(d[0, 0]) == (65535, 0, 0, 65535)
    assert tuple(d[1, 0]) == (0, 257, 514, 771)


def test_rejection_and_bomb():
    with pytest.raises(ValueError):
        farbfeld_decode(b"farbfel?" + b"\x00" * 20)
    with pytest.raises(ValueError):  # truncated raster
        farbfeld_decode(b"farbfeld" + struct.pack(">II", 4, 4) + b"\x00" * 8)
    with pytest.raises(ValueError):  # zero dim
        farbfeld_decode(b"farbfeld" + struct.pack(">II", 0, 4))
    with pytest.raises(PixelBudgetError):
        farbfeld_decode(b"farbfeld" + struct.pack(">II", 1 << 16, 1 << 16))


def test_dispatch_and_probe():
    from spdb_spark.functions.multimodal import decode_features_status
    from spdb_spark.functions.probe import probe_payload

    rng = np.random.default_rng(32)
    img = rng.integers(0, 256, (12, 10, 3), np.uint8)
    payload = farbfeld_encode(img)
    feats, status = decode_features_status(payload, 2, 4)
    assert status == "ok"
    container, f = probe_payload(payload)
    assert container == "farbfeld" and (f["width"], f["height"]) == (10, 12)
    _, st = decode_features_status(payload[:20], 2, 4)
    assert st == "stub"
