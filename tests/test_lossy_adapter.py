"""The external lossy-codec adapter seam (functions/lossy.py): the
labeled stub branches route through a registered decoder and nothing
else does; the real-library paths (Pillow/PyAV) are exercised only
where those libraries exist (skipped in this container — the seam
itself is what's pinned here)."""

import struct

import numpy as np
import pytest

from spdb_spark.functions import lossy


@pytest.fixture(autouse=True)
def _clean_registry():
    yield
    for kind in ("webp_vp8", "video", "mp3"):
        lossy.register_decoder(kind, None)


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _fake_vp8_payload() -> bytes:
    body = _chunk(b"VP8 ", b"\x00" * 20)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def test_registry_validates_kind():
    with pytest.raises(ValueError, match="unknown decoder kind"):
        lossy.register_decoder("gif", lambda p: p)
    assert lossy.get_decoder("webp_vp8") is None


def test_webp_vp8_routes_through_registered_decoder():
    from spdb_spark.functions.webp import (
        UnsupportedWebPError,
        webp_decode,
        webp_frames,
    )

    payload = _fake_vp8_payload()
    # unset: the labeled stub raises, exactly as before
    with pytest.raises(UnsupportedWebPError, match="lossy VP8"):
        webp_decode(payload)
    fake = np.zeros((4, 6, 4), np.uint8)
    fake[..., 2], fake[..., 3] = 200, 255
    seen = []

    def dec(p):
        seen.append(p)
        return fake

    lossy.register_decoder("webp_vp8", dec)
    out = webp_decode(payload)
    assert np.array_equal(out, fake) and seen == [payload]
    frames = webp_frames(payload)
    assert len(frames) == 1 and np.array_equal(frames[0], fake)


def test_vp8l_path_never_consults_registry():
    """Registering a decoder must not perturb the exact pure-Python
    path — gated results are codec-exact and stay so."""
    from spdb_spark.functions.webp import vp8l_encode, webp_decode

    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    want = webp_decode(vp8l_encode(img))

    def boom(p):
        raise AssertionError("VP8L payload hit the external adapter")

    lossy.register_decoder("webp_vp8", boom)
    assert np.array_equal(webp_decode(vp8l_encode(img)), want)


def test_video_routes_through_registered_decoder():
    from spdb_spark.functions.video import avi_encode_dib, video_frame_features

    imgs = [np.full((8, 8, 3), v, np.uint8) for v in (10, 200)]
    payload = avi_encode_dib(imgs)
    # flip strf's biCompression from BI_RGB to a foreign fourcc so the
    # DIB branch refuses -> stub path (avi_stream_format reads comp, not
    # the strh handler string)
    idx = payload.find(b"strf")
    broken = bytearray(payload)
    broken[idx + 24 : idx + 28] = b"H264"
    broken = bytes(broken)
    with pytest.raises(ValueError, match="pure-Python decode"):
        video_frame_features(broken, 2, 8)

    def dec(p, n):
        assert p == broken and n == 2
        return [np.full((8, 8, 3), 10, np.uint8), np.full((8, 8, 3), 200, np.uint8)]

    lossy.register_decoder("video", dec)
    ext = video_frame_features(broken, 2, 8)
    want = video_frame_features(payload, 2, 8)  # DIB path, same pixels
    assert ext.shape == (2, 8) and np.array_equal(ext, want)


def test_enable_helpers_report_availability():
    """In this container neither Pillow nor PyAV is installed: the
    enable helpers must return False and leave the registry empty (a
    deployment with the libraries flips them to True — the swap)."""
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    try:
        import av  # noqa: F401

        has_av = True
    except ImportError:
        has_av = False
    assert lossy.enable_pillow() is has_pil
    assert lossy.enable_pyav() is has_av
    if not has_pil:
        assert lossy.get_decoder("webp_vp8") is None
    if not has_av:
        assert lossy.get_decoder("video") is None


def test_pillow_roundtrip_if_available():
    """Real-library drive: encode a lossy WebP with Pillow, decode it
    through webp_decode via the adapter, pixels within lossy tolerance.
    SKIPPED where Pillow is absent (this container) — the deployment
    acceptance test."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    from spdb_spark.functions.webp import webp_decode

    img = np.zeros((16, 16, 3), np.uint8)
    img[:8] = (255, 0, 0)
    buf = io.BytesIO()
    PIL.fromarray(img).save(buf, format="WEBP", lossless=False, quality=90)
    assert lossy.enable_pillow()
    out = webp_decode(buf.getvalue())
    assert out.shape == (16, 16, 4)
    assert abs(int(out[0, 0, 0]) - 255) < 30 and int(out[0, 0, 3]) == 255
