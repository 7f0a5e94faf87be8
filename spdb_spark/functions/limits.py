"""Shared decode-resource guard for the media codecs.

Image decoders allocate output buffers from HEADER-declared dimensions
before any pixel data is validated, so without a cap a ~30-byte payload
claiming 65535x65535 would allocate ~17 GB inside an executor — one
crafted or corrupt record could OOM a task at corpus scale. The Arrow
decode kernels convert the ValueError into an error-labeled row, so the
job survives and the payload is quarantined, not silently skipped.

The default budget (2^27 pixels = 134 M, a 11585x11585 square; 512 MB as
RGBA) is far above real training-corpus imagery. Raise MAX_PIXELS
process-wide if a pipeline genuinely ingests gigapixel assets.
"""

from __future__ import annotations

MAX_PIXELS = 1 << 27


class PixelBudgetError(ValueError):
    """Raised when a header declares dimensions past the decode budget.

    A distinct type so dispatch code that downgrades ValueError to an
    honest stub (unsupported-variant semantics) can still let budget
    refusals surface as error rows — fabricating stub features for a
    corrupt/hostile payload would mislabel it as merely foreign-codec."""


def check_pixel_budget(width: int, height: int, codec: str) -> None:
    if width < 0 or height < 0 or width * height > MAX_PIXELS:
        raise PixelBudgetError(
            f"{codec}: declared dimensions {width}x{height} exceed the "
            f"decode pixel budget ({MAX_PIXELS}); refusing to allocate"
        )


# Audio gets its own (larger) budget: samples are 2 bytes, not 4-byte
# RGBA pixels, and legitimate corpus audio runs long — 2^28 samples is
# ~50 min of stereo 44.1 kHz (536 MB as int16), far above real training
# clips but still refusing the KB->GB amplification bombs. Raise it
# process-wide for pipelines that genuinely ingest long-form audio.
MAX_AUDIO_SAMPLES = 1 << 28


def check_total_budget(
    total_units: int, codec: str, what: str = "pixels", budget: int = MAX_PIXELS
) -> None:
    """Cap CUMULATIVE decode output (animation frames x canvas, audio
    samples x channels) — per-image caps don't stop a tiny payload from
    amplifying through many frames/blocks."""
    if total_units > budget:
        raise PixelBudgetError(
            f"{codec}: decoded output exceeds the budget of {budget} "
            f"{what}; refusing to amplify further"
        )
