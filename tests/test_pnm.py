"""Netpbm codec tests: hand-assembled fixtures from the public format
description, round-trips, comment handling, dispatch, probe, bombs."""

import numpy as np
import pytest

from spdb_spark.functions.limits import PixelBudgetError
from spdb_spark.functions.pnm import pnm_decode, pnm_encode


def test_hand_assembled_p5_with_comments():
    payload = b"P5\n# a comment\n3 2\n# another\n255\n" + bytes(
        [10, 20, 30, 40, 50, 60]
    )
    out = pnm_decode(payload)
    assert (out == np.array([[10, 20, 30], [40, 50, 60]], np.uint8)).all()


def test_hand_assembled_p4_bitmap():
    # 10x2: '1' bits are BLACK (0); rows pad to whole bytes MSB-first
    payload = b"P4\n10 2\n" + bytes([0b10101010, 0b10000000, 0xFF, 0xC0])
    out = pnm_decode(payload)
    assert out.shape == (2, 10)
    assert (out[0] == np.array([0, 255] * 5)).all()
    assert (out[1] == 0).all()


def test_p6_and_16bit_roundtrips():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    assert (pnm_decode(pnm_encode(rgb)) == rgb).all()
    g16 = rng.integers(0, 65536, (4, 9), dtype=np.uint16)
    out = pnm_decode(pnm_encode(g16))
    assert out.dtype == np.uint16 and (out == g16).all()
    gray = rng.integers(0, 256, (11, 13), dtype=np.uint8)
    assert (pnm_decode(pnm_encode(gray)) == gray).all()


def test_malformed_and_bombs():
    with pytest.raises(ValueError):
        pnm_decode(b"P5\nabc def\n255\nxx")
    with pytest.raises(ValueError, match="truncated"):
        pnm_decode(b"P5\n4 4\n255\n" + b"\x00" * 5)
    with pytest.raises(PixelBudgetError):
        pnm_decode(b"P5\n60000 60000\n255\n")
    with pytest.raises(ValueError):
        pnm_decode(b"P5\n3 2\n0\n" + b"\x00" * 6)  # maxval 0


def test_dispatch_probe_and_png_twin():
    from spdb_spark.functions.multimodal import decode_features_status
    from spdb_spark.functions.probe import probe_payload
    from spdb_spark.operators.render import png_encode

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    via_pnm, st = decode_features_status(pnm_encode(img), 3, 5)
    via_png, _ = decode_features_status(png_encode(img), 3, 5)
    assert st == "ok" and (via_pnm == via_png).all()
    container, meta = probe_payload(pnm_encode(img))
    assert container == "pnm" and meta["codec"] == "pnm/gray8"
    assert (meta["width"], meta["height"]) == (24, 24)
    # ASCII P2 is not in the binary surface: stub, not a crash
    _f, st2 = decode_features_status(b"P2\n2 2\n255\n1 2 3 4\n", 3, 5)
    assert st2 == "stub"
