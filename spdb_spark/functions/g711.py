"""G.711 companding: µ-law and A-law <-> 16-bit linear PCM, vectorized.

Built from the public ITU-T G.711 recommendation (the classic CCITT /
Sun `ulaw.c` formulation): µ-law uses bias 0x84 (132) with complemented
code bytes and a 32124 peak; A-law XORs 0x55 with a 32256 peak and no
zero-exponent bias shift. Both directions are table-free closed forms
over numpy arrays — no per-sample Python in the decode hot path.

Self-checks pinned in tests: full 256-code encode(decode(c)) == c
idempotence (every code is a quantizer fixed point), decode(encode(x))
within one quantization step for every int16, odd symmetry, and the
published peak magnitudes.
"""

from __future__ import annotations

import numpy as np

_ULAW_BIAS = 0x84  # 132
_ULAW_CLIP = 32635  # 0x7FFF - bias headroom, the canonical clip


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """µ-law bytes -> int16 linear samples."""
    u = (~np.asarray(codes, np.uint8)).astype(np.int32)
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    magnitude = (((mantissa << 3) + _ULAW_BIAS) << exponent) - _ULAW_BIAS
    return np.where(sign != 0, -magnitude, magnitude).astype(np.int16)


def ulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear samples -> µ-law bytes."""
    x = np.asarray(samples, np.int32)
    sign = x < 0
    mag = np.where(sign, -x, x)
    mag = np.minimum(mag, _ULAW_CLIP) + _ULAW_BIAS
    # exponent = floor(log2(mag)) - 7, clamped to [0, 7]
    exponent = np.clip((np.floor(np.log2(mag)).astype(np.int32)) - 7, 0, 7)
    mantissa = (mag >> (exponent + 3)) & 0x0F
    code = (np.where(sign, 0x80, 0) | (exponent << 4) | mantissa).astype(np.uint8)
    return ~code


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """A-law bytes -> int16 linear samples."""
    a = (np.asarray(codes, np.uint8) ^ 0x55).astype(np.int32)
    sign = a & 0x80
    exponent = (a >> 4) & 0x07
    mantissa = a & 0x0F
    magnitude = np.where(
        exponent == 0,
        (mantissa << 4) + 8,
        ((mantissa << 4) + 0x108) << np.maximum(exponent - 1, 0),
    )
    return np.where(sign != 0, magnitude, -magnitude).astype(np.int16)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear samples -> A-law bytes."""
    x = np.asarray(samples, np.int32)
    positive = x >= 0
    mag = np.minimum(np.where(positive, x, -x - 1), 0x7FFF)
    # exponent: 0 when mag < 256, else MSB position - 7 (1..7)
    top = np.zeros_like(mag)
    m = mag >> 8
    for _ in range(7):  # 7 doubling steps resolve any 15-bit magnitude
        top = np.where(m > 0, top + 1, top)
        m >>= 1
    exponent = top
    mantissa = np.where(
        exponent == 0, mag >> 4, (mag >> (exponent + 3)) & 0x0F
    )
    code = (np.where(positive, 0x80, 0) | (exponent << 4) | mantissa).astype(
        np.uint8
    )
    return code ^ 0x55
