"""External lossy-codec adapter — the documented swap seam for the
three decode capabilities this repo deliberately does NOT reimplement
in pure Python (PLANS.md "Lossy VP8 — explicit deferral"): lossy-WebP
(VP8) pixels, H.264/VP9-class video frames, and mp3 audio. ~2,000 spec
constants recalled from memory would round-trip in-repo while decoding
real crawl bytes wrong — silently; the honest production answer is the
battle-tested native decoder (libwebp via Pillow, ffmpeg/PyAV), plugged
in HERE so a deployment flips one symbol and every Spark-side plan
(probe-prune, Arrow kernel batching, feature schema) stays identical.

Registry, not imports: the container has none of these libraries, so
the seam is a per-kind decoder registry. `enable_pillow()` /
`enable_pyav()` wire the standard libraries when importable (no-op
install detection is the caller's job); `register_decoder` accepts any
callable for custom builds. The pure-Python paths NEVER consult this
registry for formats they decode exactly (VP8L, PNG, GIF, MJPG, ...) —
only the labeled stub branches route here, so registering a decoder
widens coverage without changing a single gated result.

Kinds and contracts:
  "webp_vp8":  payload bytes -> HxWx4 RGBA uint8 ndarray (full canvas)
  "video":     (payload bytes, n_frames int) -> list of HxWx{3,4}
               uint8 ndarrays, sampled evenly over the stream
  "mp3":       payload bytes -> (pcm int16 ndarray [n, channels], rate)
"""

from __future__ import annotations

_KINDS = ("webp_vp8", "video", "mp3")
_DECODERS: dict[str, object] = {}


def register_decoder(kind: str, fn) -> None:
    """Install `fn` as the external decoder for `kind` (see module
    docstring for each kind's contract). Pass None to uninstall."""
    if kind not in _KINDS:
        raise ValueError(f"lossy: unknown decoder kind {kind!r} ({_KINDS})")
    if fn is None:
        _DECODERS.pop(kind, None)
    else:
        _DECODERS[kind] = fn


def get_decoder(kind: str):
    """The registered decoder for `kind`, or None (callers keep their
    labeled-stub behavior when unset)."""
    return _DECODERS.get(kind)


def enable_pillow() -> bool:
    """Wire Pillow (libwebp-backed) as the lossy-WebP decoder if
    importable. Returns whether it was enabled. The adapter converts to
    the same RGBA canvas contract the pure VP8L path produces, so
    downstream features/pHash see one shape regardless of codec."""
    try:
        import io

        import numpy as np
        from PIL import Image
    except ImportError:
        return False

    def _pil_webp(payload: bytes):
        img = Image.open(io.BytesIO(payload))
        return np.asarray(img.convert("RGBA"))

    register_decoder("webp_vp8", _pil_webp)
    return True


def enable_pyav() -> bool:
    """Wire PyAV (ffmpeg-backed) as the video + mp3 decoder if
    importable. Returns whether it was enabled."""
    try:
        import io

        import av
        import numpy as np
    except ImportError:
        return False

    def _av_video(payload: bytes, n_frames: int):
        with av.open(io.BytesIO(payload)) as c:
            frames = [f.to_ndarray(format="rgb24") for f in c.decode(video=0)]
        if not frames:
            raise ValueError("lossy: no decodable video frames")
        from spdb_spark.functions.video import sample_frame_indices

        return [frames[i] for i in sample_frame_indices(len(frames), n_frames)]

    def _av_mp3(payload: bytes):
        with av.open(io.BytesIO(payload)) as c:
            chunks = [f.to_ndarray() for f in c.decode(audio=0)]
            rate = c.streams.audio[0].rate
        pcm = np.concatenate(chunks, axis=1).T
        return (pcm * 32767).astype(np.int16) if pcm.dtype.kind == "f" else pcm, rate

    register_decoder("video", _av_video)
    register_decoder("mp3", _av_mp3)
    return True
