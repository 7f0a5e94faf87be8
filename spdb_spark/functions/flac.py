"""Dependency-free FLAC codec: full decode (CONSTANT / VERBATIM / FIXED /
LPC subframes, Rice and Rice2 residual partitions with escapes, all four
stereo channel assignments, wasted bits, CRC-8 / CRC-16 / streaminfo-MD5
verification) and a lossless encoder (fixed predictors order 0-4 chosen
per block, Rice parameter search, optional left/right/mid-side stereo
decorrelation).

Built from the public FLAC format specification (xiph.org; RFC 9639):
the 14-bit frame sync, UTF-8-coded frame numbers, the blocksize /
sample-rate / sample-size code tables, zigzag Rice residuals, and the
mid/side reconstruction identities. No reference-repo counterpart
(jhuapl-boss/spdb has no audio path); this extends the real-decode
multimodal surface beyond RIFF/WAVE so lossless web audio payloads
produce sample-exact features instead of falling to the labeled stub.

Encode is exact by construction (FLAC is lossless): int8/int16 samples
round-trip bit-for-bit, and the encoder writes the spec MD5 of the raw
samples into STREAMINFO so decode self-verifies end-to-end.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

_BLOCKSIZE = 4096

# ---------------------------------------------------------------------------
# CRCs (FLAC frame polynomials: CRC-8 poly 0x07 init 0, CRC-16 poly 0x8005
# init 0 — both MSB-first, no reflection, no final xor)
# ---------------------------------------------------------------------------


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[(crc >> 8) ^ b]
    return crc


# ---------------------------------------------------------------------------
# Bit I/O (MSB-first, as FLAC frames are laid out)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, bits: int) -> None:
        self._acc = (self._acc << bits) | (value & ((1 << bits) - 1))
        self._n += bits
        while self._n >= 8:
            self._n -= 8
            self.buf.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def write_unary(self, q: int) -> None:
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)

    def bytes(self) -> bytes:
        assert self._n == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, byte_pos: int = 0) -> None:
        self.data = data
        self.pos = byte_pos  # next byte to load
        self._acc = 0
        self._n = 0

    def read(self, bits: int) -> int:
        while self._n < bits:
            if self.pos >= len(self.data):
                raise ValueError("FLAC: bitstream truncated")
            self._acc = (self._acc << 8) | self.data[self.pos]
            self.pos += 1
            self._n += 8
        self._n -= bits
        out = (self._acc >> self._n) & ((1 << bits) - 1)
        self._acc &= (1 << self._n) - 1
        return out

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v & (1 << (bits - 1)) else v

    def read_unary(self) -> int:
        # count leading zeros a buffered word at a time (bit_length finds
        # the first set bit) instead of read(1) per zero — the Rice
        # quotient loop is the decode hot path
        q = 0
        while True:
            if self._n == 0:
                if self.pos >= len(self.data):
                    raise ValueError("FLAC: bitstream truncated")
                self._acc = self.data[self.pos]
                self.pos += 1
                self._n = 8
            top = self._acc.bit_length()
            if top == 0:  # all buffered bits are zeros
                q += self._n
                self._n = 0
                continue
            zeros = self._n - top
            q += zeros
            self._n = top - 1  # consume the zeros AND the terminating one
            self._acc &= (1 << self._n) - 1
            return q

    def align(self) -> None:
        self._n = 0
        self._acc = 0

    def byte_pos(self) -> int:
        assert self._n == 0
        return self.pos


# ---------------------------------------------------------------------------
# Shared tables
# ---------------------------------------------------------------------------

_SAMPLE_SIZE_CODES = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110, 32: 0b111}
_SAMPLE_SIZE_FROM_CODE = {v: k for k, v in _SAMPLE_SIZE_CODES.items()}

# Fixed predictor residual = order-th forward difference; coefficients for
# reconstruction (order: [c1, c2, ...] with pred = sum c_j * x[i-j]).
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _utf8_code(n: int) -> bytes:
    """FLAC's UTF-8-style coding of frame/sample numbers (plain UTF-8
    extended to 36-bit values)."""
    if n < 0x80:
        return bytes([n])
    for nbytes in range(2, 8):
        if n < (1 << (nbytes * 5 + 1)):
            out = [(0xFF << (8 - nbytes)) & 0xFF | (n >> (6 * (nbytes - 1)))]
            for i in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large")


def _read_utf8(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("FLAC: bad UTF-8 frame number")
    n = first & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("FLAC: bad UTF-8 continuation")
        n = (n << 6) | (b & 0x3F)
    return n


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else (-(r << 1) - 1)


def _best_rice_param(resid: list[int]) -> int:
    us = [_zigzag(r) for r in resid]
    best_k, best_bits = 0, None
    for k in range(15):
        bits = sum((u >> k) + 1 + k for u in us)
        if best_bits is None or bits < best_bits:
            best_k, best_bits = k, bits
    return best_k


def _write_residual(w: _BitWriter, resid: list[int]) -> None:
    """Rice method 0, one partition (order 0) — always-valid and within a
    couple percent of multi-partition coding on real audio."""
    w.write(0, 2)
    w.write(0, 4)
    k = _best_rice_param(resid)
    w.write(k, 4)
    for r in resid:
        u = _zigzag(r)
        w.write_unary(u >> k)
        if k:
            w.write(u & ((1 << k) - 1), k)


def _encode_subframe(w: _BitWriter, x: list[int], bps: int) -> None:
    n = len(x)
    if n and all(v == x[0] for v in x):
        w.write(0, 1)
        w.write(0b000000, 6)  # CONSTANT
        w.write(0, 1)
        w.write(x[0] & ((1 << bps) - 1), bps)
        return
    # pick the fixed order with the smallest absolute-residual sum
    arr = np.asarray(x, np.int64)
    best_order, best_cost = 0, None
    for order in range(min(4, n - 1) + 1):
        resid = np.diff(arr, n=order)
        cost = int(np.abs(resid).sum()) if len(resid) else 0
        if best_cost is None or cost < best_cost:
            best_order, best_cost = order, cost
    order = best_order
    w.write(0, 1)
    w.write(0b001000 | order, 6)  # FIXED, given order
    w.write(0, 1)
    for v in x[:order]:
        w.write(v & ((1 << bps) - 1), bps)
    _write_residual(w, [int(v) for v in np.diff(arr, n=order)])


def flac_encode(
    samples: np.ndarray,
    sample_rate: int = 16000,
    channel_mode: str = "independent",
    blocksize: int = _BLOCKSIZE,
) -> bytes:
    """Losslessly encode (n,) or (n, channels) int8/int16 samples (uint8
    accepted and shifted to int8, matching the WAV byte-for-sample
    layout). `channel_mode` for stereo input: independent | left_side |
    right_side | mid_side — all exact; decorrelation is a size choice."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype == np.uint8:
        samples = (samples.astype(np.int16) - 128).astype(np.int8)
    if samples.dtype == np.int8:
        bps = 8
    elif samples.dtype == np.int16:
        bps = 16
    else:
        raise ValueError("FLAC encode supports int8/int16 (or uint8) samples")
    n_total, nch = samples.shape
    if channel_mode != "independent" and nch != 2:
        raise ValueError("stereo decorrelation needs exactly 2 channels")
    if not 1 <= nch <= 8:
        raise ValueError("FLAC supports 1..8 channels")

    md5 = hashlib.md5(
        samples.astype("<i1" if bps == 8 else "<i2").tobytes()
    ).digest()

    # STREAMINFO
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n_total, 36)
    info = si.bytes() + md5

    out = bytearray()
    out += FLAC_MAGIC
    out += bytes([0x80]) + struct.pack(">I", len(info))[1:]  # last block, type 0
    out += info

    arr = samples.astype(np.int64)
    for frame_idx, start in enumerate(range(0, max(n_total, 1), blocksize)):
        block = arr[start : start + blocksize]
        bs = len(block)
        if bs == 0:
            break
        if channel_mode == "independent":
            ch_assign = nch - 1
            chans = [(block[:, c].tolist(), bps) for c in range(nch)]
        else:
            left, right = block[:, 0], block[:, 1]
            side = (left - right).tolist()
            if channel_mode == "left_side":
                ch_assign, chans = 8, [(left.tolist(), bps), (side, bps + 1)]
            elif channel_mode == "right_side":
                ch_assign, chans = 9, [(side, bps + 1), (right.tolist(), bps)]
            elif channel_mode == "mid_side":
                mid = ((left + right) >> 1).tolist()
                ch_assign, chans = 10, [(mid, bps), (side, bps + 1)]
            else:
                raise ValueError(f"unknown channel_mode {channel_mode!r}")

        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed-blocksize strategy: number below is frame index
        w.write(0b0111, 4)  # blocksize: 16-bit value-1 follows the number
        w.write(0b0000, 4)  # sample rate: from STREAMINFO
        w.write(ch_assign, 4)
        w.write(_SAMPLE_SIZE_CODES[bps], 3)
        w.write(0, 1)  # reserved
        for b in _utf8_code(frame_idx):
            w.write(b, 8)
        w.write(bs - 1, 16)
        header = bytes(w.buf)
        w.write(crc8(header), 8)
        for x, ch_bps in chans:
            _encode_subframe(w, x, ch_bps)
        w.align()
        frame = bytes(w.buf)
        out += frame + struct.pack(">H", crc16(frame))
    return bytes(out)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def _read_residual(r: _BitReader, bs: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual method")
    param_bits, escape = (4, 0xF) if method == 0 else (5, 0x1F)
    po = r.read(4)
    if bs % (1 << po):
        raise ValueError("FLAC: partition order does not divide blocksize")
    out: list[int] = []
    for part in range(1 << po):
        n = (bs >> po) - (order if part == 0 else 0)
        if n < 0:
            raise ValueError("FLAC: predictor order exceeds first partition")
        param = r.read(param_bits)
        if param == escape:
            raw = r.read(5)
            for _ in range(n):
                out.append(r.read_signed(raw) if raw else 0)
            continue
        # hot path: the whole Rice loop runs on locals (one method call
        # per PARTITION, not three per sample) — ~2x on real audio
        acc, nb, pos, data = r._acc, r._n, r.pos, r.data
        data_len = len(data)
        append = out.append
        for _ in range(n):
            q = 0
            while True:
                if nb == 0:
                    if pos >= data_len:
                        raise ValueError("FLAC: bitstream truncated")
                    acc = data[pos]
                    pos += 1
                    nb = 8
                top = acc.bit_length()
                if top == 0:
                    q += nb
                    nb = 0
                    continue
                q += nb - top
                nb = top - 1
                acc &= (1 << nb) - 1
                break
            while nb < param:
                if pos >= data_len:
                    raise ValueError("FLAC: bitstream truncated")
                acc = (acc << 8) | data[pos]
                pos += 1
                nb += 8
            nb -= param
            u = (q << param) | (acc >> nb)
            acc &= (1 << nb) - 1
            append((u >> 1) ^ -(u & 1))
        r._acc, r._n, r.pos = acc, nb, pos
    return out


def _decode_subframe(r: _BitReader, bs: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        bps -= wasted

    if ftype == 0b000000:  # CONSTANT
        out = [r.read_signed(bps)] * bs
    elif ftype == 0b000001:  # VERBATIM
        out = [r.read_signed(bps) for _ in range(bs)]
    elif (ftype & 0b111000) == 0b001000 and (ftype & 0b000111) <= 4:  # FIXED
        from itertools import accumulate

        order = ftype & 0b000111
        warmup = [r.read_signed(bps) for _ in range(order)]
        resid = _read_residual(r, bs, order)
        # fixed-order prediction is exactly k-fold integration: the
        # residual is the order-th forward difference, so reconstruct by
        # repeated prefix sums (C-speed accumulate on exact Python ints),
        # seeded from the warmup's difference triangle
        tri = [list(warmup)]
        for j in range(1, order + 1):
            prev_lvl = tri[j - 1]
            tri.append(
                [prev_lvl[i + 1] - prev_lvl[i] for i in range(len(prev_lvl) - 1)]
            )
        seq = resid
        for j in range(order - 1, -1, -1):
            seq = list(accumulate(seq, initial=tri[j][-1]))[1:]
        out = warmup + seq
    elif ftype & 0b100000:  # LPC
        order = (ftype & 0b011111) + 1
        out = [r.read_signed(bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("FLAC: invalid LPC precision")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [r.read_signed(precision) for _ in range(order)]
        resid = _read_residual(r, bs, order)
        for i, e in enumerate(resid):
            pos = order + i
            pred = sum(c * out[pos - 1 - j] for j, c in enumerate(coefs)) >> shift
            out.append(e + pred)
    else:
        raise ValueError(f"FLAC: reserved subframe type {ftype:#08b}")
    if wasted:
        out = [v << wasted for v in out]
    return out


_BLOCKSIZE_FIXED = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}
_SAMPLE_RATE_FIXED = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def flac_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """-> ((n, channels) int16/int32 sample array, sample_rate). Verifies
    every frame's CRC-8 + CRC-16 and the stream MD5 when STREAMINFO
    carries one."""
    if payload[:4] != FLAC_MAGIC:
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC: metadata truncated")
        head = payload[pos]
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + size]
        if head & 0x7F == 0:
            streaminfo = body
        pos += 4 + size
        if head & 0x80:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC: missing STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16)
    si.read(16)
    si.read(24)
    si.read(24)
    si_rate = si.read(20)
    si_nch = si.read(3) + 1
    si_bps = si.read(5) + 1
    total = si.read(36)
    md5 = streaminfo[18:34]

    from spdb_spark.functions.limits import MAX_AUDIO_SAMPLES, check_total_budget

    check_total_budget(total * si_nch, "FLAC", "samples", MAX_AUDIO_SAMPLES)
    # per-channel per-frame numpy chunks: a few bytes per decoded sample
    # instead of a Python int object each
    out_dtype = np.int8 if si_bps <= 8 else np.int16 if si_bps <= 16 else np.int32
    chans: list[list[np.ndarray]] = [[] for _ in range(si_nch)]
    n_out = 0
    r = _BitReader(payload, pos)
    rate = si_rate
    while (total == 0 and r.pos < len(payload)) or (total and n_out < total):
        frame_start = r.byte_pos()
        if r.read(14) != 0x3FFE:
            raise ValueError("FLAC: lost frame sync")
        if r.read(1):
            raise ValueError("FLAC: reserved frame-header bit set")
        r.read(1)  # blocking strategy (number semantics only)
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("FLAC: reserved frame-header bit set")
        _read_utf8(r)
        if bs_code == 0:
            raise ValueError("FLAC: reserved blocksize code")
        elif bs_code in _BLOCKSIZE_FIXED:
            bs = _BLOCKSIZE_FIXED[bs_code]
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 0:
            rate = si_rate
        elif sr_code in _SAMPLE_RATE_FIXED:
            rate = _SAMPLE_RATE_FIXED[sr_code]
        elif sr_code == 12:
            rate = r.read(8) * 1000
        elif sr_code == 13:
            rate = r.read(16)
        elif sr_code == 14:
            rate = r.read(16) * 10
        else:
            raise ValueError("FLAC: invalid sample-rate code")
        bps = si_bps if ss_code == 0 else _SAMPLE_SIZE_FROM_CODE.get(ss_code)
        if bps is None:
            raise ValueError("FLAC: reserved sample-size code")
        header_end = r.byte_pos()
        if r.read(8) != crc8(payload[frame_start:header_end]):
            raise ValueError("FLAC: frame header CRC-8 mismatch")

        if ch_code <= 7:
            nch = ch_code + 1
            sub = [_decode_subframe(r, bs, bps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            nch = 2
            extra = (0, 1) if ch_code == 8 else (1, 0) if ch_code == 9 else (0, 1)
            a = _decode_subframe(r, bs, bps + extra[0])
            b = _decode_subframe(r, bs, bps + extra[1])
            if ch_code == 8:  # left / side
                sub = [a, [left - s for left, s in zip(a, b)]]
            elif ch_code == 9:  # side / right
                sub = [[s + right for s, right in zip(a, b)], b]
            else:  # mid / side
                left, right = [], []
                for m, s in zip(a, b):
                    lr = (m << 1) | (s & 1)
                    left.append((lr + s) >> 1)
                    right.append((lr - s) >> 1)
                sub = [left, right]
        else:
            raise ValueError("FLAC: reserved channel assignment")
        if nch != si_nch:
            raise ValueError("FLAC: frame channel count != STREAMINFO")
        r.align()
        frame_end = r.byte_pos()
        if r.read(16) != crc16(payload[frame_start:frame_end]):
            raise ValueError("FLAC: frame CRC-16 mismatch")
        n_out += bs
        # tiny frames can claim huge blocksizes: budget the CUMULATIVE
        # decoded output, not just the declared total (total=0 streams
        # would otherwise amplify unboundedly)
        check_total_budget(n_out * si_nch, "FLAC", "samples", MAX_AUDIO_SAMPLES)
        info = np.iinfo(out_dtype)
        for c in range(nch):
            try:
                a = np.asarray(sub[c], dtype=np.int64)
            except OverflowError:
                raise ValueError("FLAC: decoded sample overflows") from None
            if len(a) and (a.max() > info.max or a.min() < info.min):
                raise ValueError("FLAC: decoded sample out of range for bps")
            chans[c].append(a.astype(out_dtype))

    # dtype follows bit depth so downstream float normalization (divide by
    # iinfo(dtype).max + 1) agrees bit-for-bit with the WAV twin.
    arr = np.stack(
        [
            np.concatenate(ch) if ch else np.empty(0, out_dtype)
            for ch in chans
        ]
    ).T
    if total:
        arr = arr[:total]
    if md5 != b"\x00" * 16:
        width = (si_bps + 7) // 8
        dtype = {1: "<i1", 2: "<i2", 4: "<i4"}.get(width)
        if dtype and hashlib.md5(arr.astype(dtype).tobytes()).digest() != md5:
            raise ValueError("FLAC: decoded stream MD5 mismatch")
    return arr, rate


def flac_frame_features(payload: bytes, n_frames: int, dim: int) -> np.ndarray:
    """Sample-exact audio features from a FLAC payload — bit-for-bit what
    the WAV twin of the same samples produces (FLAC is lossless and the
    feature kernel is shared with functions/audio.py)."""
    from spdb_spark.functions.audio import _to_float, features_from_waveform

    samples, _rate = flac_decode(payload)
    return features_from_waveform(_to_float(samples), n_frames, dim)
