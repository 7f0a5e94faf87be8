"""Dependency-free WebP VP8L (lossless) codec.

WebP is the most common real-crawl image format after JPEG/PNG/GIF; its
LOSSLESS coding mode (VP8L) is a fully public bitstream (RFC 9649 /
the "WebP Lossless Bitstream Specification"), built from pieces this
repo already speaks: canonical prefix codes (as in DEFLATE/flac.py),
LZ77 backward references, and small per-image transforms. This module
implements:

- `webp_decode` / `vp8l_decode`: RIFF walk + full VP8L decode — all
  four transforms (predictor with the complete 14-mode set, color,
  subtract-green, color-indexing incl. sub-byte pixel bundling), meta
  prefix codes (entropy image), color cache, simple and normal prefix
  codes, LZ77 with both the 120-entry distance neighborhood map and
  plain distances. Lossy VP8 payloads raise ValueError (the arithmetic
  coder stays an honest stub, like arithmetic JPEG).
- `vp8l_encode`: a fixture encoder producing REAL, spec-conformant
  VP8L streams (literals + optional run-length LZ77 + optional color
  cache + any single uniform transform), so decode tests pin
  pixel-exact round-trips the way jpeg.py's SOF2 fixtures do.

Bit conventions per the spec: the stream after the 1-byte signature is
read LSB-first; prefix CODES within it are read bit-by-bit MSB-of-code
first with DEFLATE-style canonical assignment.

Scale posture: decoding is sequential per payload (LZ77 state), so the
kernel is a per-image Python loop — images are independent, decode
parallelism is scan parallelism, and dimensions are budget-checked
before any allocation (functions/limits.py).
"""

from __future__ import annotations

import struct

import numpy as np

from spdb_spark.functions.limits import check_pixel_budget

# --------------------------------------------------------------------------
# bit I/O (LSB-first within bytes)
# --------------------------------------------------------------------------


class BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.byte >= len(self.data):
                raise ValueError("vp8l: bitstream truncated")
            v |= ((self.data[self.byte] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_code_bit(self) -> int:
        return self.read(1)


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.cur |= ((value >> i) & 1) << self.nbits
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def write_code(self, code: int, length: int) -> None:
        # prefix codes are written MSB-of-code first
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def getvalue(self) -> bytes:
        out = bytes(self.out) + (
            bytes([self.cur]) if self.nbits else b""
        )
        return out


# --------------------------------------------------------------------------
# canonical prefix codes (DEFLATE-style assignment; spec section on
# prefix coding)
# --------------------------------------------------------------------------

_MAX_CODE_LEN = 15

# order in which code-length-code lengths are stored (spec constant)
_CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) under the canonical assignment: shorter
    codes first, ties broken by symbol order (identical to DEFLATE)."""
    pairs = sorted(
        (l, s) for s, l in enumerate(lengths) if l > 0
    )
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for l, s in pairs:
        code <<= l - prev_len
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class PrefixDecoder:
    """Bit-by-bit canonical prefix decoder. A code with exactly one
    used symbol consumes ZERO bits per read (spec: zero-length code)."""

    def __init__(self, lengths: list[int]):
        used = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise ValueError("vp8l: empty prefix code")
        if len(used) == 1:
            self.single: int | None = used[0][1]
            self.table: dict[tuple[int, int], int] = {}
            return
        self.single = None
        # Kraft completeness: a canonical prefix code must be exactly
        # complete (sum of 2^(maxlen-l) == 2^maxlen). Over-subscribed
        # length sets would silently overwrite table entries and decode
        # corrupt payloads to wrong pixels; incomplete sets leave
        # unreachable codes. libwebp rejects both — so do we.
        max_len = max(l for l, _ in used)
        kraft = sum(1 << (max_len - l) for l, _ in used)
        if kraft != 1 << max_len:
            raise ValueError("vp8l: incomplete or over-subscribed prefix code")
        self.table = {
            (l, c): s for s, (c, l) in _canonical_codes(lengths).items()
        }

    def read(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, _MAX_CODE_LEN + 1):
            code = (code << 1) | br.read_code_bit()
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("vp8l: invalid prefix code in stream")


def _read_prefix_code(br: BitReader, alphabet_size: int) -> PrefixDecoder:
    lengths = [0] * alphabet_size
    if br.read(1):  # simple code: 1 or 2 symbols, lengths 0/1
        num_symbols = br.read(1) + 1
        first_8bits = br.read(1)
        sym0 = br.read(8 if first_8bits else 1)
        if sym0 >= alphabet_size:
            raise ValueError("vp8l: simple-code symbol out of range")
        lengths[sym0] = 1
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym1 >= alphabet_size:
                raise ValueError("vp8l: simple-code symbol out of range")
            lengths[sym1] = 1
        return PrefixDecoder(lengths)
    # normal code: code-length code, then run-length-coded lengths
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_dec = PrefixDecoder(cl_lengths)
    if br.read(1):  # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        cl = cl_dec.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            rep, val = 3 + br.read(2), prev_len
            for _ in range(rep):
                if symbol >= alphabet_size:
                    raise ValueError("vp8l: code-length repeat overflow")
                lengths[symbol] = val
                symbol += 1
        else:
            rep = (3 + br.read(3)) if cl == 17 else (11 + br.read(7))
            for _ in range(rep):
                if symbol >= alphabet_size:
                    raise ValueError("vp8l: code-length repeat overflow")
                lengths[symbol] = 0
                symbol += 1
    return PrefixDecoder(lengths)


# --------------------------------------------------------------------------
# LZ77 prefix-coded values and the distance neighborhood map (spec 4.2.2)
# --------------------------------------------------------------------------


def _read_prefix_coded_value(br: BitReader, code: int) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_code_of_value(value: int) -> tuple[int, int, int]:
    """value -> (symbol_code, extra_bits_value, extra_bits_count)."""
    u = value - 1
    if u < 4:
        return u, 0, 0
    e = u.bit_length() - 2
    b = (u >> e) & 1
    offset = (2 + b) << e
    return 2 + 2 * e + b, u - offset, e


# (xoffset, yoffset) pairs for distance codes 1..120; scan-line distance
# = xoffset + yoffset * width (min 1). Spec constant.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


def _plane_distance(dist_code: int, width: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _DIST_MAP[dist_code - 1]
    return max(1, dx + dy * width)


def _cache_key(argb: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


# --------------------------------------------------------------------------
# image-stream decoding (spec: optional transforms at level 0, optional
# color cache, optional meta prefix codes at level 0, LZ77-coded data)
# --------------------------------------------------------------------------

_NUM_LENGTH_CODES = 24
_NUM_DIST_CODES = 40
_ARGB_BLACK = 0xFF000000


def _read_code_group(br: BitReader, cache_size: int) -> list[PrefixDecoder]:
    return [
        _read_prefix_code(br, 256 + _NUM_LENGTH_CODES + cache_size),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, _NUM_DIST_CODES),
    ]


def _decode_image_data(
    br: BitReader,
    width: int,
    height: int,
    groups: list[list[PrefixDecoder]],
    meta: tuple[np.ndarray, int] | None,
    cache_bits: int,
) -> np.ndarray:
    n = width * height
    out = np.zeros(n, dtype=np.uint32)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    g = groups[0]
    i = 0
    while i < n:
        if meta is not None:
            ent, hbits = meta
            x, y = i % width, i // width
            g = groups[ent[(y >> hbits) * ((width + (1 << hbits) - 1) >> hbits) + (x >> hbits)]]
        s = g[0].read(br)
        if s < 256:
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[i] = px
            if cache is not None:
                cache[_cache_key(px, cache_bits)] = px
            i += 1
        elif s < 256 + _NUM_LENGTH_CODES:
            length = _read_prefix_coded_value(br, s - 256)
            dist_code = g[4].read(br)
            dist = _plane_distance(
                _read_prefix_coded_value(br, dist_code), width
            )
            if dist > i:
                raise ValueError("vp8l: backward reference before start")
            if i + length > n:
                raise ValueError("vp8l: backward reference past end")
            for _ in range(length):
                px = int(out[i - dist])
                out[i] = px
                if cache is not None:
                    cache[_cache_key(px, cache_bits)] = px
                i += 1
        else:
            if cache is None:
                raise ValueError("vp8l: cache symbol without color cache")
            idx = s - 256 - _NUM_LENGTH_CODES
            if idx >= len(cache):
                raise ValueError("vp8l: cache index out of range")
            out[i] = cache[idx]
            i += 1
    return out


def _decode_entropy_image(
    br: BitReader, width: int, height: int
) -> np.ndarray:
    """A non-level-0 image stream: optional cache, ONE group (no meta),
    LZ77 data."""
    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits and not 1 <= cache_bits <= 11:
        raise ValueError("vp8l: bad cache bits")
    groups = [_read_code_group(br, (1 << cache_bits) if cache_bits else 0)]
    return _decode_image_data(br, width, height, groups, None, cache_bits)


def _div_round_up(a: int, b: int) -> int:
    return (a + b - 1) // b


def vp8l_decode(data: bytes) -> np.ndarray:
    """VP8L chunk payload (starting at the 0x2F signature byte) ->
    (h, w, 4) RGBA uint8."""
    if not data or data[0] != 0x2F:
        raise ValueError("vp8l: bad signature")
    br = BitReader(data, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha_is_used hint
    if br.read(3) != 0:
        raise ValueError("vp8l: unsupported version")
    check_pixel_budget(w, h, "webp")

    # transforms (level 0 only), in stream order
    transforms: list[tuple[int, object]] = []
    cur_w = w
    seen: set[int] = set()
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("vp8l: duplicate transform")
        seen.add(ttype)
        if ttype in (0, 1):  # PREDICTOR / COLOR: tile subimage
            size_bits = br.read(3) + 2
            tw = _div_round_up(cur_w, 1 << size_bits)
            th = _div_round_up(h, 1 << size_bits)
            tiles = _decode_entropy_image(br, tw, th)
            transforms.append((ttype, (size_bits, tiles, cur_w)))
        elif ttype == 2:  # SUBTRACT_GREEN
            transforms.append((2, None))
        else:  # COLOR_INDEXING
            table_size = br.read(8) + 1
            pal = _decode_entropy_image(br, table_size, 1)
            # palette entries are delta-coded per channel
            pal = pal.view(np.uint8).reshape(-1, 4)
            pal = np.cumsum(pal.astype(np.uint32), axis=0).astype(np.uint8)
            pal = pal.reshape(-1, 4).copy().view(np.uint32).reshape(-1)
            if table_size <= 2:
                width_bits = 3
            elif table_size <= 4:
                width_bits = 2
            elif table_size <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append((3, (pal, width_bits, cur_w)))
            cur_w = _div_round_up(cur_w, 1 << width_bits)

    # color cache
    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits and not 1 <= cache_bits <= 11:
        raise ValueError("vp8l: bad cache bits")
    cache_size = (1 << cache_bits) if cache_bits else 0

    # meta prefix codes (entropy image)
    meta = None
    n_groups = 1
    if br.read(1):
        hbits = br.read(3) + 2
        ew = _div_round_up(cur_w, 1 << hbits)
        eh = _div_round_up(h, 1 << hbits)
        ent = _decode_entropy_image(br, ew, eh)
        ent = (((ent >> 16) & 0xFF) << 8) | ((ent >> 8) & 0xFF)
        ent = ent.astype(np.int64)
        n_groups = int(ent.max()) + 1
        meta = (ent, hbits)

    groups = [_read_code_group(br, cache_size) for _ in range(n_groups)]
    argb = _decode_image_data(br, cur_w, h, groups, meta, cache_bits)

    # inverse transforms, reverse stream order
    for ttype, tdata in reversed(transforms):
        if ttype == 3:
            argb = _inv_color_indexing(argb, h, tdata)
        elif ttype == 2:
            argb = _inv_subtract_green(argb)
        elif ttype == 1:
            argb = _inv_color_transform(argb, h, tdata)
        else:
            argb = _inv_predictor(argb, h, tdata)

    rgba = np.empty((h, w, 4), np.uint8)
    a = argb.reshape(h, w)
    rgba[..., 0] = (a >> 16) & 0xFF
    rgba[..., 1] = (a >> 8) & 0xFF
    rgba[..., 2] = a & 0xFF
    rgba[..., 3] = (a >> 24) & 0xFF
    # qoi_decode's channel convention: fully-opaque images come back as
    # RGB so channel-mean features keep their closed form
    if (rgba[..., 3] == 255).all():
        return rgba[..., :3].copy()
    return rgba


# --------------------------------------------------------------------------
# inverse transforms
# --------------------------------------------------------------------------


def _inv_color_indexing(argb: np.ndarray, h: int, tdata) -> np.ndarray:
    pal, width_bits, orig_w = tdata
    packed_w = _div_round_up(orig_w, 1 << width_bits)
    idx = ((argb >> 8) & 0xFF).reshape(h, packed_w)
    if width_bits:
        ppb = 1 << width_bits  # sub-pixels per packed pixel
        bpp = 8 >> width_bits  # bits per sub-pixel
        sub = np.arange(orig_w) % ppb
        cols = np.arange(orig_w) // ppb
        idx = (idx[:, cols] >> (sub * bpp)) & ((1 << bpp) - 1)
    out = np.zeros((h, orig_w), np.uint32)
    valid = idx < len(pal)
    out[valid] = pal[idx[valid]]
    return out.reshape(-1)


def _inv_subtract_green(argb: np.ndarray) -> np.ndarray:
    g = (argb >> 8) & 0xFF
    r = (((argb >> 16) & 0xFF) + g) & 0xFF
    b = ((argb & 0xFF) + g) & 0xFF
    return (argb & 0xFF00FF00) | (r << 16) | b


def _ct_delta(t: int, c: int) -> int:
    # both interpreted as signed 8-bit; product arithmetic-shifted by 5
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inv_color_transform(argb: np.ndarray, h: int, tdata) -> np.ndarray:
    size_bits, tiles, width = tdata
    tw = _div_round_up(width, 1 << size_bits)
    out = argb.copy()
    for i in range(len(out)):
        x, y = i % width, i // width
        elem = int(tiles[(y >> size_bits) * tw + (x >> size_bits)])
        g2r = elem & 0xFF
        g2b = (elem >> 8) & 0xFF
        r2b = (elem >> 16) & 0xFF
        px = int(out[i])
        green = (px >> 8) & 0xFF
        red = ((px >> 16) & 0xFF) + _ct_delta(g2r, green)
        red &= 0xFF
        blue = (px & 0xFF) + _ct_delta(g2b, green) + _ct_delta(r2b, red)
        blue &= 0xFF
        out[i] = (px & 0xFF00FF00) | (red << 16) | blue
    return out


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | ((((a & 0xFF) + (b & 0xFF)) >> 1))
    )


def _select(left: int, top: int, top_left: int) -> int:
    p_l = p_t = 0
    for sh in (24, 16, 8, 0):
        lc = (left >> sh) & 0xFF
        tc = (top >> sh) & 0xFF
        tlc = (top_left >> sh) & 0xFF
        p = lc + tc - tlc
        p_l += abs(p - lc)
        p_t += abs(p - tc)
    return left if p_l < p_t else top


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= _clamp(((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)) << sh
    return out


def _trunc_div2(v: int) -> int:
    # C-style truncation toward zero, matching the reference decoder's
    # integer (a - b) / 2
    return v // 2 if v >= 0 else -((-v) // 2)


def _clamp_add_sub_half(a: int, b: int, c: int) -> int:
    # average of a,b pushed away from c by half the gap, clamped
    out = 0
    for sh in (24, 16, 8, 0):
        ave = (((a >> sh) & 0xFF) + ((b >> sh) & 0xFF)) >> 1
        out |= _clamp(ave + _trunc_div2(ave - ((c >> sh) & 0xFF))) << sh
    return out


def _add_pixels(a: int, b: int) -> int:
    # per-channel mod-256 add
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8
        | ((((a & 0xFF) + (b & 0xFF)) & 0xFF))
    )


def _predict(mode: int, L: int, T: int, TL: int, TR: int) -> int:
    if mode == 0:
        return _ARGB_BLACK
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:
        return _select(L, T, TL)
    if mode == 12:
        return _clamp_add_sub_full(L, T, TL)
    if mode == 13:
        return _clamp_add_sub_half(L, T, TL)
    raise ValueError(f"vp8l: bad predictor mode {mode}")


def _inv_predictor(argb: np.ndarray, h: int, tdata) -> np.ndarray:
    size_bits, tiles, width = tdata
    tw = _div_round_up(width, 1 << size_bits)
    out = argb.copy()
    for i in range(len(out)):
        x, y = i % width, i // width
        if x == 0 and y == 0:
            pred = _ARGB_BLACK
        elif y == 0:
            pred = int(out[i - 1])
        elif x == 0:
            pred = int(out[i - width])
        else:
            mode = (int(tiles[(y >> size_bits) * tw + (x >> size_bits)]) >> 8) & 0xFF
            L = int(out[i - 1])
            T = int(out[i - width])
            TL = int(out[i - width - 1])
            # at the row end TR wraps to the current row's first pixel
            # (contiguous-buffer semantics, matching the reference
            # decoder's top[1] read)
            TR = int(out[i - width + 1])
            pred = _predict(mode, L, T, TL, TR)
        out[i] = _add_pixels(int(out[i]), pred)
    return out


# --------------------------------------------------------------------------
# RIFF container
# --------------------------------------------------------------------------


class UnsupportedWebPError(ValueError):
    """Raised for WebP payloads we INTENTIONALLY don't decode (lossy
    VP8, payloads with no VP8L chunk) — the documented stub surface.
    Mid-stream VP8L failures stay plain ValueError so consumers can
    tell a corrupt crawl payload from a deliberate stub."""


def webp_decode(payload: bytes) -> np.ndarray:
    """WebP file -> (h, w, 4) RGBA uint8 for lossless (VP8L) payloads,
    including VP8L inside an extended (VP8X) container. Lossy VP8 and
    chunk-less payloads raise UnsupportedWebPError (honest stub
    downstream); corrupt VP8L streams raise plain ValueError."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("webp: not a RIFF/WEBP payload")
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"VP8L":
            return vp8l_decode(body)
        if cid == b"VP8 ":
            # the external-adapter seam (functions/lossy.py): a deployment
            # with libwebp registers a "webp_vp8" decoder and this branch
            # decodes instead of stubbing — the pure VP8L path above never
            # consults the registry, so gated results are unchanged
            from spdb_spark.functions.lossy import get_decoder

            ext = get_decoder("webp_vp8")
            if ext is not None:
                return ext(payload)
            raise UnsupportedWebPError("webp: lossy VP8 decode not supported")
        pos += 8 + size + (size & 1)
    raise UnsupportedWebPError("webp: no VP8L chunk")


# --------------------------------------------------------------------------
# animation (VP8X + ANIM + ANMF, container spec)
# --------------------------------------------------------------------------


def _iter_chunks(payload: bytes):
    """Yield (chunk_id, body) over a RIFF/WEBP container."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("webp: not a RIFF/WEBP payload")
    pos = 12
    end = min(8 + struct.unpack_from("<I", payload, 4)[0], len(payload))
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        yield cid, payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)


def is_animated_webp(payload: bytes) -> bool:
    """VP8X container with the animation flag set and an ANIM chunk."""
    try:
        flags = None
        for cid, body in _iter_chunks(payload):
            if cid == b"VP8X" and len(body) >= 10:
                flags = body[0]
            elif cid == b"ANIM":
                return flags is not None and bool(flags & 0x02)
        return False
    except (ValueError, struct.error):
        return False


def _to_rgba(img: np.ndarray) -> np.ndarray:
    """vp8l_decode output ((h,w,3) for opaque, (h,w,4) else) -> RGBA."""
    if img.shape[-1] == 4:
        return img
    out = np.empty((*img.shape[:2], 4), np.uint8)
    out[..., :3] = img
    out[..., 3] = 255
    return out


def webp_frames(payload: bytes) -> list[np.ndarray]:
    """Animated (or still) WebP -> list of composited (H, W, 4) RGBA
    uint8 canvases, one per frame. A still VP8L yields its single image.

    Composition follows the container spec: the canvas starts fully
    transparent; each ANMF frame's sub-image lands at its (even-pixel)
    offset rect either by alpha blending (flag bit 1 clear) or plain
    replacement (bit 1 set); after output, dispose-to-background (flag
    bit 0 set) fills the frame rect with the ANIM background color
    (stored BGRA). Frames must be VP8L — lossy VP8 frames raise
    UnsupportedWebPError like their still counterparts."""
    from spdb_spark.functions.limits import check_pixel_budget, check_total_budget

    canvas_wh = None
    background = (0, 0, 0, 0)
    anim = False
    frames: list[bytes] = []
    for cid, body in _iter_chunks(payload):
        if cid == b"VP8X" and len(body) >= 10:
            canvas_wh = (
                1 + int.from_bytes(body[4:7], "little"),
                1 + int.from_bytes(body[7:10], "little"),
            )
        elif cid == b"ANIM" and len(body) >= 6:
            # background color is stored B, G, R, A
            background = (body[2], body[1], body[0], body[3])
            anim = True
        elif cid == b"ANMF":
            frames.append(body)
        elif cid == b"VP8L" and not anim:
            return [_to_rgba(vp8l_decode(body))]
        elif cid == b"VP8 " and not anim:
            from spdb_spark.functions.lossy import get_decoder

            ext = get_decoder("webp_vp8")
            if ext is not None:
                return [_to_rgba(np.asarray(ext(payload)))]
            raise UnsupportedWebPError("webp: lossy VP8 decode not supported")
    if not anim or canvas_wh is None:
        raise UnsupportedWebPError("webp: no VP8L chunk")
    if not frames:
        raise ValueError("webp: animation without ANMF frames")
    w, h = canvas_wh
    check_pixel_budget(w, h, "webp")
    check_total_budget((len(frames) + 1) * w * h, "webp")

    canvas = np.zeros((h, w, 4), np.uint8)
    out: list[np.ndarray] = []
    for body in frames:
        if len(body) < 16:
            raise ValueError("webp: truncated ANMF header")
        fx = 2 * int.from_bytes(body[0:3], "little")
        fy = 2 * int.from_bytes(body[3:6], "little")
        fw = 1 + int.from_bytes(body[6:9], "little")
        fh = 1 + int.from_bytes(body[9:12], "little")
        flags = body[15]
        if fx + fw > w or fy + fh > h:
            raise ValueError("webp: frame rect outside canvas")
        src = None
        pos = 16
        while pos + 8 <= len(body):
            scid = body[pos : pos + 4]
            (ssize,) = struct.unpack("<I", body[pos + 4 : pos + 8])
            sbody = body[pos + 8 : pos + 8 + ssize]
            if scid == b"VP8L":
                src = _to_rgba(vp8l_decode(sbody))
                break
            if scid == b"VP8 ":
                raise UnsupportedWebPError(
                    "webp: lossy VP8 animation frames not supported"
                )
            pos += 8 + ssize + (ssize & 1)
        if src is None:
            raise ValueError("webp: ANMF frame without VP8L data")
        if src.shape[:2] != (fh, fw):
            raise ValueError("webp: frame data does not match ANMF rect")
        region = (slice(fy, fy + fh), slice(fx, fx + fw))
        if flags & 0x02:  # do-not-blend: plain replacement
            canvas[region] = src
        else:
            from spdb_spark.functions.apng import _blend_over

            canvas[region] = _blend_over(canvas[region], src)
        out.append(canvas.copy())
        if flags & 0x01:  # dispose to background color
            canvas[region] = np.array(background, np.uint8)
    return out


def webp_frame_features(payload: bytes, n_frames: int, dim: int) -> np.ndarray:
    """(n_frames, dim) band features on the GIF/video schedule: a still
    (or single-frame animation) featurizes exactly like its PNG twin; an
    animation samples n_frames composited frames evenly (mirror of
    apng.apng_frame_features)."""
    from spdb_spark.functions.gif import _collapse_gray
    from spdb_spark.functions.multimodal import _image_frame_features
    from spdb_spark.functions.video import sample_frame_indices

    frames = webp_frames(payload)
    if len(frames) == 1:
        return _image_frame_features(_collapse_gray(frames[0]), n_frames, dim)
    out = np.zeros((n_frames, dim), dtype=np.float32)
    for row, i in enumerate(sample_frame_indices(len(frames), n_frames)):
        out[row] = _image_frame_features(_collapse_gray(frames[i]), 1, dim)[0]
    return out


def _extract_vp8l_chunk(webp_file: bytes) -> bytes:
    """The VP8L chunk body of a still .webp produced by vp8l_encode."""
    for cid, body in _iter_chunks(webp_file):
        if cid == b"VP8L":
            return body
    raise ValueError("webp: no VP8L chunk")


def _chunk(cid: bytes, body: bytes) -> bytes:
    out = cid + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        out += b"\x00"
    return out


def webp_encode_animation(
    frames: list[np.ndarray],
    offsets: list[tuple[int, int]] | None = None,
    durations: int | list[int] = 100,
    blends: list[bool] | None = None,
    disposes: list[bool] | None = None,
    background: tuple[int, int, int, int] = (0, 0, 0, 0),
    loop: int = 0,
    **vp8l_kw,
) -> bytes:
    """Fixture encoder: gray8/RGB/RGBA uint8 frames -> an animated .webp
    (VP8X + ANIM + ANMF x N, each frame a REAL VP8L stream through
    vp8l_encode). offsets are canvas positions (must be even per the
    spec's /2 storage); blends[i]=True alpha-blends frame i onto the
    canvas (flag bit 1 CLEAR), False replaces; disposes[i]=True fills
    the rect with `background` (RGBA) after output. The canvas is the
    bounding box of all frame rects."""
    if not frames:
        raise ValueError("webp encode: no frames")
    offsets = offsets or [(0, 0)] * len(frames)
    blends = blends if blends is not None else [False] * len(frames)
    disposes = disposes if disposes is not None else [False] * len(frames)
    if isinstance(durations, int):
        durations = [durations] * len(frames)
    shapes = [np.asarray(f).shape[:2] for f in frames]
    for (x, y) in offsets:
        if x % 2 or y % 2:
            raise ValueError("webp encode: frame offsets must be even")
    cw = max(x + s[1] for (x, y), s in zip(offsets, shapes))
    ch = max(y + s[0] for (x, y), s in zip(offsets, shapes))
    if not (1 <= cw <= 16777216 and 1 <= ch <= 16777216):
        raise ValueError("webp encode: canvas out of range")
    has_alpha = any(
        np.asarray(f).ndim == 3
        and np.asarray(f).shape[-1] == 4
        and (np.asarray(f)[..., 3] != 255).any()
        for f in frames
    )
    # the composited canvas can be transparent even when no frame pixel
    # is: a rect smaller than the canvas leaves the (transparent-start)
    # canvas showing, and dispose-to-background paints background alpha —
    # strict external decoders trust the VP8X flag, so set it for those
    # cases too (conservative: the flag means "may contain alpha")
    first_covers = offsets[0] == (0, 0) and shapes[0] == (ch, cw)
    has_alpha = has_alpha or not first_covers or (
        any(disposes) and background[3] != 255
    )
    vp8x = bytes(
        [0x02 | (0x10 if has_alpha else 0), 0, 0, 0]
    ) + (cw - 1).to_bytes(3, "little") + (ch - 1).to_bytes(3, "little")
    r, g, b, a = background
    anim = bytes([b, g, r, a]) + struct.pack("<H", loop)
    body = _chunk(b"VP8X", vp8x) + _chunk(b"ANIM", anim)
    for f, (x, y), dur, blend, dispose in zip(
        frames, offsets, durations, blends, disposes
    ):
        fh, fw = np.asarray(f).shape[:2]
        vp8l = _chunk(b"VP8L", _extract_vp8l_chunk(vp8l_encode(f, **vp8l_kw)))
        hdr = (
            (x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + (fw - 1).to_bytes(3, "little")
            + (fh - 1).to_bytes(3, "little")
            + int(dur).to_bytes(3, "little")
            + bytes([(0 if blend else 0x02) | (0x01 if dispose else 0)])
        )
        body += _chunk(b"ANMF", hdr + vp8l)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def _riff_wrap(vp8l_payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(vp8l_payload)) + vp8l_payload
    if len(vp8l_payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# --------------------------------------------------------------------------
# fixture encoder
# --------------------------------------------------------------------------


def _huffman_lengths(
    freqs: dict[int, int], alphabet_size: int, max_len: int = _MAX_CODE_LEN
) -> list[int]:
    """Code lengths (<= max_len) for the used symbols; standard Huffman
    with frequency halving if the depth limit is exceeded. The
    code-length code (over the 19 length symbols) uses max_len=7, the
    spec's 3-bit-length ceiling."""
    import heapq
    import itertools

    syms = sorted(freqs)
    if not syms:
        raise ValueError("vp8l encode: empty histogram")
    if len(syms) == 1:
        lengths = [0] * alphabet_size
        lengths[syms[0]] = 1
        return lengths
    f = dict(freqs)
    while True:
        counter = itertools.count()
        heap = [(max(1, f[s]), next(counter), [s]) for s in syms]
        heapq.heapify(heap)
        depth = {s: 0 for s in syms}
        while len(heap) > 1:
            fa, _, sa = heapq.heappop(heap)
            fb, _, sb = heapq.heappop(heap)
            for s in sa + sb:
                depth[s] += 1
            heapq.heappush(heap, (fa + fb, next(counter), sa + sb))
        if max(depth.values()) <= max_len:
            lengths = [0] * alphabet_size
            for s, d in depth.items():
                lengths[s] = d
            return lengths
        f = {s: max(1, v // 2) for s, v in f.items()}


def _write_prefix_code(bw: BitWriter, lengths: list[int]) -> None:
    """Emit a prefix code: simple form when possible, else the normal
    (code-length-coded) form with all lengths written explicitly."""
    used = [s for s, l in enumerate(lengths) if l > 0]
    if 1 <= len(used) <= 2 and all(s <= 255 for s in used) and all(
        lengths[s] == 1 for s in used
    ):
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        s0 = used[0]
        if s0 <= 1 and len(used) == 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(s0, 1)
        else:
            bw.write(1, 1)  # 8-bit first symbol
            bw.write(s0, 8)
        if len(used) == 2:
            bw.write(used[1], 8)
        return
    bw.write(0, 1)  # normal form
    # code-length code over the length symbols we emit (0..15, no
    # repeat codes: lengths written one by one)
    cl_freq: dict[int, int] = {}
    for l in lengths:
        cl_freq[l] = cl_freq.get(l, 0) + 1
    if len(cl_freq) == 1:
        # a prefix code needs >= 2 distinct lengths to be written via
        # the code-length code; add a harmless second entry
        only = next(iter(cl_freq))
        cl_freq[0 if only != 0 else 1] = 1
    # the 19 code-length-code lengths are stored in 3 bits each, so the
    # code over them is capped at depth 7 (same halving retry as the
    # 15-bit main-code limit)
    cl_lengths = _huffman_lengths(cl_freq, 19, max_len=7)
    # write all 19 code-length-code lengths (num_code_lengths = 19)
    bw.write(19 - 4, 4)
    for sym in _CODE_LENGTH_ORDER:
        bw.write(cl_lengths[sym], 3)
    bw.write(0, 1)  # no explicit max_symbol: all lengths follow
    cl_codes = _canonical_codes(cl_lengths)
    for l in lengths:
        code, n = cl_codes[l]
        bw.write_code(code, n)


class _GroupEncoder:
    """Two-pass (histogram, emit) encoder over one prefix-code group."""

    def __init__(self, cache_bits: int):
        self.cache_bits = cache_bits
        self.freqs = [dict() for _ in range(5)]
        self.codes: list[dict[int, tuple[int, int]]] | None = None

    def _tally(self, which: int, sym: int) -> None:
        f = self.freqs[which]
        f[sym] = f.get(sym, 0) + 1

    def finalize(self, bw: BitWriter) -> None:
        sizes = [
            256 + _NUM_LENGTH_CODES + ((1 << self.cache_bits) if self.cache_bits else 0),
            256,
            256,
            256,
            _NUM_DIST_CODES,
        ]
        self.codes = []
        for which, size in enumerate(sizes):
            freqs = self.freqs[which] or {0: 1}
            lengths = _huffman_lengths(freqs, size)
            _write_prefix_code(bw, lengths)
            codes = _canonical_codes(lengths)
            if len(codes) == 1:
                # zero-length convention: a single-symbol code consumes
                # (and therefore emits) no bits
                codes = {next(iter(codes)): (0, 0)}
            self.codes.append(codes)

    def emit(self, bw: BitWriter, which: int, sym: int) -> None:
        code, n = self.codes[which][sym]
        if n:
            bw.write_code(code, n)


def _iter_ops(argb: np.ndarray, cache_bits: int, lz77_runs: bool, dist_style: str):
    """Yield coding ops: ("lit", px), ("cache", idx), ("copy", length,
    dist_code_value). Deterministic; shared by both encoder passes."""
    cache = [0] * (1 << cache_bits) if cache_bits else None
    n = len(argb)
    i = 0
    while i < n:
        px = int(argb[i])
        if lz77_runs and i > 0 and px == int(argb[i - 1]):
            run = 1
            # 4096 is the largest length the 24-code prefix scheme spans
            while i + run < n and int(argb[i + run]) == px and run < 4096:
                run += 1
            if run >= 3:
                if cache is not None:
                    cache[_cache_key(px, cache_bits)] = px
                yield ("copy", run, 2 if dist_style == "map" else 121)
                i += run
                continue
        if cache is not None:
            key = _cache_key(px, cache_bits)
            if cache[key] == px and i > 0:
                yield ("cache", key)
                i += 1
                continue
            cache[key] = px
        yield ("lit", px)
        i += 1


def vp8l_encode(
    img: np.ndarray,
    subtract_green: bool = False,
    predictor: int | None = None,
    color_elem: tuple[int, int, int] | None = None,
    palette: bool = False,
    cache_bits: int = 0,
    lz77_runs: bool = False,
    dist_style: str = "map",
    meta_split: bool = False,
) -> bytes:
    """(h, w[, 3|4]) uint8 -> a complete .webp file with a REAL VP8L
    stream. Options exercise each spec mechanism: one uniform transform
    (subtract-green / predictor mode / color-transform element /
    palette with pixel bundling), an optional color cache, optional
    run-length LZ77 via the distance map ("map": neighborhood code) or
    plain distances ("raw": code 120+d), and meta prefix codes
    (meta_split: two code groups selected through an entropy image)."""
    a = np.asarray(img)
    if a.ndim == 2:
        a = np.stack([a, a, a], axis=-1)
    if a.shape[-1] == 3:
        a = np.concatenate(
            [a, np.full(a.shape[:2] + (1,), 255, np.uint8)], axis=-1
        )
    h, w = a.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("vp8l encode: dimensions out of range")
    argb = (
        (a[..., 3].astype(np.uint32) << 24)
        | (a[..., 0].astype(np.uint32) << 16)
        | (a[..., 1].astype(np.uint32) << 8)
        | a[..., 2].astype(np.uint32)
    ).reshape(-1)

    bw = BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if (a[..., 3] != 255).any() else 0, 1)
    bw.write(0, 3)  # version

    cur_w = w
    if palette:
        colors = sorted(set(int(v) for v in argb))
        if len(colors) > 256:
            raise ValueError("vp8l encode: too many colors for a palette")
        lut = {c: i for i, c in enumerate(colors)}
        idx = np.array([lut[int(v)] for v in argb], np.uint32).reshape(h, w)
        size = len(colors)
        width_bits = 3 if size <= 2 else 2 if size <= 4 else 1 if size <= 16 else 0
        bw.write(1, 1)  # transform present
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(size - 1, 8)
        # palette entries delta-coded per channel, as a 1 x size image
        pal = np.array(colors, np.uint32).view(np.uint8).reshape(-1, 4)
        deltas = np.diff(
            np.vstack([np.zeros((1, 4), np.uint16), pal.astype(np.uint16)]),
            axis=0,
        ).astype(np.uint8)
        pal_argb = deltas.copy().view(np.uint32).reshape(-1)
        _encode_entropy_image(bw, pal_argb)
        if width_bits:
            ppb = 1 << width_bits
            bpp = 8 >> width_bits
            packed_w = _div_round_up(w, ppb)
            packed = np.zeros((h, packed_w), np.uint32)
            for x in range(w):
                packed[:, x // ppb] |= idx[:, x] << (bpp * (x % ppb))
            idx = packed
            cur_w = packed_w
        argb = (0xFF000000 | (idx.astype(np.uint32) << 8)).reshape(-1)
    if predictor is not None:
        # residuals computed from ORIGINAL neighbors, scan order
        src = argb.reshape(-1)
        res = np.empty_like(src)
        for i in range(len(src)):
            x, y = i % cur_w, i // cur_w
            if x == 0 and y == 0:
                pred = _ARGB_BLACK
            elif y == 0:
                pred = int(src[i - 1])
            elif x == 0:
                pred = int(src[i - cur_w])
            else:
                pred = _predict(
                    predictor,
                    int(src[i - 1]),
                    int(src[i - cur_w]),
                    int(src[i - cur_w - 1]),
                    int(src[i - cur_w + 1]),
                )
            res[i] = _sub_pixels(int(src[i]), pred)
        bw.write(1, 1)
        bw.write(0, 2)  # PREDICTOR
        size_bits = 7  # one 1024-px tile covers any fixture image
        bw.write(size_bits - 2, 3)
        tw = _div_round_up(cur_w, 1 << size_bits)
        th = _div_round_up(h, 1 << size_bits)
        tile_px = 0xFF000000 | (predictor << 8)
        _encode_entropy_image(
            bw, np.full(tw * th, tile_px, np.uint32)
        )
        argb = res
    if color_elem is not None:
        g2r, g2b, r2b = color_elem
        src = argb.reshape(-1)
        out = np.empty_like(src)
        for i in range(len(src)):
            px = int(src[i])
            green = (px >> 8) & 0xFF
            orig_red = (px >> 16) & 0xFF
            red = (orig_red - _ct_delta(g2r, green)) & 0xFF
            # the r2b delta is taken from the ORIGINAL red — the decoder
            # reconstructs red first, then feeds it into the blue inverse
            blue = (px & 0xFF) - _ct_delta(g2b, green) - _ct_delta(r2b, orig_red)
            blue &= 0xFF
            out[i] = (px & 0xFF00FF00) | (red << 16) | blue
        bw.write(1, 1)
        bw.write(1, 2)  # COLOR
        size_bits = 7
        bw.write(size_bits - 2, 3)
        tw = _div_round_up(cur_w, 1 << size_bits)
        th = _div_round_up(h, 1 << size_bits)
        elem = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
        _encode_entropy_image(bw, np.full(tw * th, elem, np.uint32))
        argb = out
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN
        g = (argb >> 8) & 0xFF
        r = (((argb >> 16) & 0xFF) - g) & 0xFF
        b = ((argb & 0xFF) - g) & 0xFF
        argb = (argb & 0xFF00FF00) | (r << 16) | b
    bw.write(0, 1)  # end of transforms

    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if meta_split:
        if cache_bits or lz77_runs:
            raise ValueError(
                "vp8l encode: meta_split supports literal-only bodies"
            )
        _encode_meta_split_body(bw, argb, cur_w, h)
    else:
        bw.write(0, 1)  # no meta prefix codes
        _encode_lz77_body(bw, argb, cache_bits, lz77_runs, dist_style)
    return _riff_wrap(bw.getvalue())


def _encode_meta_split_body(
    bw: BitWriter, argb: np.ndarray, width: int, height: int
) -> None:
    """Meta prefix codes: the image's left and right tile halves use two
    DIFFERENT prefix-code groups, selected through an entropy image —
    the decoder's per-pixel group lookup is the mechanism under test."""
    hbits = 2  # 4-px tiles
    bw.write(1, 1)  # meta prefix codes present
    bw.write(hbits - 2, 3)
    ew = _div_round_up(width, 1 << hbits)
    eh = _div_round_up(height, 1 << hbits)
    split = max(1, ew // 2)
    ent = np.zeros(ew * eh, np.uint32)
    for ty in range(eh):
        for tx in range(ew):
            group = 1 if tx >= split else 0
            # meta index = (red << 8) | green -> green carries the id
            ent[ty * ew + tx] = 0xFF000000 | (group << 8)
    _encode_entropy_image(bw, ent)

    def group_of(i: int) -> int:
        return 1 if ((i % width) >> hbits) >= split else 0

    encs = [_GroupEncoder(0), _GroupEncoder(0)]
    for i in range(len(argb)):
        px = int(argb[i])
        enc = encs[group_of(i)]
        enc._tally(0, (px >> 8) & 0xFF)
        enc._tally(1, (px >> 16) & 0xFF)
        enc._tally(2, px & 0xFF)
        enc._tally(3, (px >> 24) & 0xFF)
    for enc in encs:
        enc.finalize(bw)
    for i in range(len(argb)):
        px = int(argb[i])
        enc = encs[group_of(i)]
        enc.emit(bw, 0, (px >> 8) & 0xFF)
        enc.emit(bw, 1, (px >> 16) & 0xFF)
        enc.emit(bw, 2, px & 0xFF)
        enc.emit(bw, 3, (px >> 24) & 0xFF)


def _sub_pixels(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) - ((b >> 24) & 0xFF)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF) << 8
        | ((((a & 0xFF) - (b & 0xFF)) & 0xFF))
    )


def _encode_lz77_body(
    bw: BitWriter,
    argb: np.ndarray,
    cache_bits: int,
    lz77_runs: bool,
    dist_style: str,
) -> None:
    enc = _GroupEncoder(cache_bits)
    for op in _iter_ops(argb, cache_bits, lz77_runs, dist_style):
        if op[0] == "lit":
            px = op[1]
            enc._tally(0, (px >> 8) & 0xFF)
            enc._tally(1, (px >> 16) & 0xFF)
            enc._tally(2, px & 0xFF)
            enc._tally(3, (px >> 24) & 0xFF)
        elif op[0] == "cache":
            enc._tally(0, 256 + _NUM_LENGTH_CODES + op[1])
        else:
            lc, _, _ = _prefix_code_of_value(op[1])
            dc, _, _ = _prefix_code_of_value(op[2])
            enc._tally(0, 256 + lc)
            enc._tally(4, dc)
    enc.finalize(bw)
    for op in _iter_ops(argb, cache_bits, lz77_runs, dist_style):
        if op[0] == "lit":
            px = op[1]
            enc.emit(bw, 0, (px >> 8) & 0xFF)
            enc.emit(bw, 1, (px >> 16) & 0xFF)
            enc.emit(bw, 2, px & 0xFF)
            enc.emit(bw, 3, (px >> 24) & 0xFF)
        elif op[0] == "cache":
            enc.emit(bw, 0, 256 + _NUM_LENGTH_CODES + op[1])
        else:
            lc, lx, ln = _prefix_code_of_value(op[1])
            enc.emit(bw, 0, 256 + lc)
            if ln:
                bw.write(lx, ln)
            dc, dx, dn = _prefix_code_of_value(op[2])
            enc.emit(bw, 4, dc)
            if dn:
                bw.write(dx, dn)


def _encode_entropy_image(bw: BitWriter, argb: np.ndarray) -> None:
    """A non-level-0 image stream: no cache, one group, literal body."""
    bw.write(0, 1)  # no color cache
    _encode_lz77_body(bw, argb, 0, False, "map")
