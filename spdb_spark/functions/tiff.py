"""Dependency-free baseline TIFF 6.0 codec.

Decode: gray 8/16-bit, RGB, RGBA, and palette-color images; both byte
orders (II/MM); stripped AND tiled layouts; chunky and planar (separate
plane) sample order; Compression 1 (none), 32773 (PackBits), and 5 (LZW,
with Predictor 2 horizontal differencing). Encode is lossless: gray8/16 / RGB / RGBA with
selectable compression (none | packbits | lzw), optional predictor,
strip/tile layout, and chunky/planar order.

Built from the public TIFF 6.0 specification (Adobe, 1992): IFD walk,
the PackBits scheme (anchored in tests to the spec's own worked
example), and TIFF-variant LZW — MSB-first bit packing, 9-bit initial
codes, CLEAR=256/EOI=257, and the spec's "early change": code width
increments one code EARLIER than GIF's LZW (at table size 2^n - 1), the
documented off-by-one that became canon (TIFF 6.0 §13; implemented the
same way by every real reader). No reference-repo counterpart; extends
the real-decode multimodal surface.
"""

from __future__ import annotations

import struct

import numpy as np

from spdb_spark.functions.limits import check_pixel_budget

TIFF_MAGICS = (b"II*\x00", b"MM\x00*")

_TABLE_LIMIT = 1 << 12


# ---------------------------------------------------------------------------
# PackBits (TIFF 6.0 section 9)
# ---------------------------------------------------------------------------


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos, n = 0, len(data)
    while len(out) < expected and pos < n:
        ctrl = data[pos]
        pos += 1
        if ctrl < 128:  # literal run of ctrl+1 bytes
            if pos + ctrl + 1 > n:
                raise ValueError("tiff: PackBits literal overruns strip")
            out += data[pos : pos + ctrl + 1]
            pos += ctrl + 1
        elif ctrl > 128:  # repeat next byte 257-ctrl times
            if pos >= n:
                raise ValueError("tiff: PackBits repeat overruns strip")
            out += bytes([data[pos]]) * (257 - ctrl)
            pos += 1
        # ctrl == 128: no-op per spec
    if len(out) < expected:
        raise ValueError("tiff: PackBits strip truncated")
    return bytes(out[:expected])


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find a run
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        # literal: extend until a run of >=3 starts (2-byte runs inside a
        # literal are cheaper left literal)
        j = i + 1
        while j < n and (j - i) < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF LZW (TIFF 6.0 section 13): MSB-first, 9..12-bit codes, early change
# ---------------------------------------------------------------------------

_CLEAR, _EOI = 256, 257


def tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    bits = 9
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    prev: bytes | None = None
    while len(out) < expected:
        while nbits < bits:
            if pos >= n:
                raise ValueError("tiff: LZW stream truncated")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= bits
        code = (acc >> nbits) & ((1 << bits) - 1)
        acc &= (1 << nbits) - 1
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            bits = 9
            prev = None
            continue
        if code == _EOI:
            break
        if prev is None:
            if code >= 256:
                raise ValueError("tiff: LZW first code after CLEAR not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < _TABLE_LIMIT:
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            if len(table) < _TABLE_LIMIT:
                table.append(entry)
        else:
            raise ValueError("tiff: LZW code past table frontier")
        out += entry
        prev = entry
        # EARLY CHANGE: widen one entry before the table reaches 2^bits
        # (TIFF's canonical off-by-one vs GIF).
        if len(table) >= (1 << bits) - 1 and bits < 12:
            bits += 1
    return bytes(out[:expected])


def tiff_lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = _EOI + 1
    bits = 9
    emit(_CLEAR, bits)
    run = b""
    for b in data:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], bits)
        if next_code < _TABLE_LIMIT:
            table[cand] = next_code
            # The decoder appends one code behind, so when it processes
            # the NEXT emitted code its table length equals this
            # next_code; early change fires at 2^bits - 1.
            if next_code >= (1 << bits) - 1 and bits < 12:
                bits += 1
            next_code += 1
        if next_code >= _TABLE_LIMIT:
            emit(_CLEAR, bits)
            table = {bytes([i]): i for i in range(256)}
            next_code = _EOI + 1
            bits = 9
        run = bytes([b])
    if run:
        emit(table[run], bits)
    emit(_EOI, bits)
    if nbits:
        emit(0, 8 - nbits)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------

_T_BYTE, _T_ASCII, _T_SHORT, _T_LONG, _T_RATIONAL = 1, 2, 3, 4, 5
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_ifd(payload: bytes, bo: str) -> dict[int, tuple[int, list[int]]]:
    """First IFD's entries (header-pointer follow)."""
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    return _read_ifd_at(payload, bo, ifd_off)[0]


def ifd_chain(payload: bytes, bo: str, limit: int = 4096) -> list[dict]:
    """Every IFD's entries, following next-IFD pointers. Cycle-proof (a
    crafted chain that revisits an offset stops) and capped at `limit`
    directories so a pointer loop variant can't spin forever."""
    (off,) = struct.unpack_from(bo + "I", payload, 4)
    seen: set[int] = set()
    out: list[dict] = []
    while off and off not in seen and len(out) < limit:
        seen.add(off)
        tags, off = _read_ifd_at(payload, bo, off)
        out.append(tags)
    return out


def _read_ifd_at(
    payload: bytes, bo: str, ifd_off: int
) -> tuple[dict[int, tuple[int, list[int]]], int]:
    if ifd_off + 2 > len(payload):
        raise ValueError("tiff: IFD offset out of range")
    (count,) = struct.unpack_from(bo + "H", payload, ifd_off)
    entries: dict[int, tuple[int, list[int]]] = {}
    for i in range(count):
        epos = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(bo + "HHI", payload, epos)
        if typ not in _TYPE_SIZE:
            continue  # unknown type: skip per spec
        total = _TYPE_SIZE[typ] * cnt
        if total <= 4:
            raw = payload[epos + 8 : epos + 8 + total]
        else:
            (off,) = struct.unpack_from(bo + "I", payload, epos + 8)
            if off + total > len(payload):
                raise ValueError("tiff: tag value out of range")
            raw = payload[off : off + total]
        if typ == _T_BYTE or typ == _T_ASCII:
            vals = list(raw)
        elif typ == _T_SHORT:
            vals = list(struct.unpack(bo + f"{cnt}H", raw))
        elif typ == _T_LONG:
            vals = list(struct.unpack(bo + f"{cnt}I", raw))
        else:  # RATIONAL: keep numerators (unused here)
            vals = list(struct.unpack(bo + f"{2*cnt}I", raw))[::2]
        entries[tag] = (typ, vals)
    next_pos = ifd_off + 2 + 12 * count
    if next_pos + 4 <= len(payload):
        (next_off,) = struct.unpack_from(bo + "I", payload, next_pos)
    else:
        next_off = 0
    return entries, next_off


def tiff_decode(payload: bytes) -> np.ndarray:
    """-> (H,W) gray uint8/uint16, (H,W,3) RGB, or (H,W,4) RGBA uint8
    (palette images expand to RGB via the ColorMap). Handles stripped AND
    tiled layouts (TIFF 6.0 section 15: tiles left-to-right, top-to-bottom,
    right/bottom edge tiles padded to full tile size) in both chunky and
    planar (PlanarConfiguration 2: one plane's segments after another)
    sample orders."""
    if payload[:4] not in TIFF_MAGICS:
        raise ValueError("not a TIFF payload")
    bo = "<" if payload[:2] == b"II" else ">"
    return _decode_page(payload, bo, _read_ifd(payload, bo))


def tiff_pages(payload: bytes) -> list[np.ndarray]:
    """Multi-page decode: one array per IFD in the chain (scanned-
    document TIFFs, burst captures). Cumulative pages x pixels is
    budget-checked from the headers before any page decodes."""
    if payload[:4] not in TIFF_MAGICS:
        raise ValueError("not a TIFF payload")
    bo = "<" if payload[:2] == b"II" else ">"
    chain = ifd_chain(payload, bo)
    if not chain:
        raise ValueError("tiff: no IFDs")
    from spdb_spark.functions.limits import check_total_budget

    total = 0
    for tags in chain:
        if 256 not in tags or 257 not in tags:
            raise ValueError("tiff: page missing dimensions")
        total += tags[256][1][0] * tags[257][1][0]
    check_total_budget(total, "tiff")
    return [_decode_page(payload, bo, tags) for tags in chain]


def _decode_page(
    payload: bytes, bo: str, tags: dict[int, tuple[int, list[int]]]
) -> np.ndarray:
    def one(tag: int, default=None) -> int:
        if tag not in tags:
            if default is None:
                raise ValueError(f"tiff: missing required tag {tag}")
            return default
        return tags[tag][1][0]

    w, h = one(256), one(257)
    check_pixel_budget(w, h, "tiff")
    spp = one(277, 1)
    bits_list = tags.get(258, (_T_SHORT, [1] * spp))[1]
    compression = one(259, 1)
    photometric = one(262)
    predictor = one(317, 1)
    planar = one(284, 1)
    if planar not in (1, 2):
        raise ValueError(f"tiff: planar configuration {planar} unsupported")
    if compression not in (1, 5, 32773):
        raise ValueError(f"tiff: compression {compression} unsupported")
    if len(set(bits_list)) != 1 or bits_list[0] not in (8, 16):
        raise ValueError(f"tiff: bits-per-sample {bits_list} unsupported")
    depth = bits_list[0]
    if depth == 16 and (spp != 1 or photometric not in (0, 1)):
        raise ValueError("tiff: 16-bit supported for grayscale only")
    if predictor not in (1, 2):
        raise ValueError(f"tiff: predictor {predictor} unsupported")
    if predictor == 2 and depth != 8:
        raise ValueError("tiff: predictor 2 on 16-bit samples unsupported")

    unit = depth // 8
    planes = spp if planar == 2 else 1
    seg_spp = 1 if planar == 2 else spp  # samples per pixel in one segment

    def decode_seg(off: int, cnt: int, expected: int) -> bytes:
        if off + cnt > len(payload):
            raise ValueError("tiff: segment out of range")
        seg = payload[off : off + cnt]
        if compression == 1:
            if len(seg) < expected:
                raise ValueError("tiff: segment truncated")
            return seg[:expected]
        if compression == 32773:
            return packbits_decode(seg, expected)
        return tiff_lzw_decode(seg, expected)

    def unpredict(data: bytes, rows: int, width: int) -> bytes:
        if predictor == 1:
            return data
        arr = np.frombuffer(data, np.uint8).reshape(rows, width, seg_spp)
        return np.cumsum(arr, axis=1, dtype=np.uint8).tobytes()

    dtype = np.uint8 if depth == 8 else np.dtype(bo + "u2")
    out = np.zeros((h, w, spp), np.uint8 if depth == 8 else np.uint16)

    if 322 in tags:  # tiled layout
        tw, th = one(322), one(323)
        if tw <= 0 or th <= 0:
            raise ValueError("tiff: bad tile dimensions")
        tiles_x = (w + tw - 1) // tw
        tiles_y = (h + th - 1) // th
        # edge padding can amplify well past ImageWidth x ImageLength
        check_pixel_budget(tiles_x * tw, tiles_y * th, "tiff")
        offsets = tags.get(324, (None, []))[1]
        counts = tags.get(325, (None, []))[1]
        n_tiles = tiles_x * tiles_y * planes
        if len(offsets) < n_tiles or len(counts) < n_tiles:
            raise ValueError("tiff: tile offsets/counts incomplete")
        expected = th * tw * seg_spp * unit
        i = 0
        for p in range(planes):
            for ty in range(tiles_y):
                for tx in range(tiles_x):
                    data = unpredict(
                        decode_seg(offsets[i], counts[i], expected), th, tw
                    )
                    tile = np.frombuffer(data, dtype).reshape(th, tw, seg_spp)
                    ys, xs = ty * th, tx * tw
                    ye, xe = min(ys + th, h), min(xs + tw, w)
                    sel = tile[: ye - ys, : xe - xs]
                    if planar == 2:
                        out[ys:ye, xs:xe, p] = sel[..., 0]
                    else:
                        out[ys:ye, xs:xe] = sel
                    i += 1
    else:  # stripped layout
        offsets = tags.get(273, (None, []))[1]
        counts = tags.get(279, (None, []))[1]
        if not offsets:
            raise ValueError("tiff: missing strip offsets")
        if not counts:
            if compression != 1 or len(offsets) != 1:
                raise ValueError("tiff: missing strip byte counts")
            counts = [h * w * seg_spp * unit]
        rows_per_strip = one(278, h)
        strips_per_plane = (h + rows_per_strip - 1) // rows_per_strip
        if len(offsets) < strips_per_plane * planes:
            raise ValueError("tiff: strips cover fewer rows than ImageLength")
        i = 0
        for p in range(planes):
            rows_done = 0
            for _s in range(strips_per_plane):
                rows_here = min(rows_per_strip, h - rows_done)
                expected = rows_here * w * seg_spp * unit
                data = unpredict(
                    decode_seg(offsets[i], counts[i], expected), rows_here, w
                )
                strip = np.frombuffer(data, dtype).reshape(rows_here, w, seg_spp)
                if planar == 2:
                    out[rows_done : rows_done + rows_here, :, p] = strip[..., 0]
                else:
                    out[rows_done : rows_done + rows_here] = strip
                rows_done += rows_here
                i += 1

    if depth == 16:
        out16 = out[..., 0]
        return (65535 - out16) if photometric == 0 else out16
    arr = out
    if photometric == 3:  # palette
        if spp != 1 or 320 not in tags:
            raise ValueError("tiff: palette image missing ColorMap")
        cmap = tags[320][1]
        n = len(cmap) // 3
        lut = (np.asarray(cmap, np.uint32).reshape(3, n).T >> 8).astype(np.uint8)
        idx = arr[..., 0]
        if idx.max(initial=0) >= n:
            raise ValueError("tiff: palette index out of range")
        return lut[idx]
    if photometric in (0, 1) and spp == 1:
        gray = arr[..., 0]
        return (255 - gray) if photometric == 0 else gray.copy()
    if photometric == 2 and spp in (3, 4):
        return arr.copy()
    raise ValueError(
        f"tiff: photometric {photometric} with {spp} samples unsupported"
    )


def _ifd_entry(bo, tag, typ, vals, heap, heap_base):
    cnt = len(vals)
    fmt = {_T_SHORT: "H", _T_LONG: "I", _T_BYTE: "B"}[typ]
    raw = struct.pack(bo + f"{cnt}{fmt}", *vals)
    if len(raw) <= 4:
        return struct.pack(bo + "HHI", tag, typ, cnt) + raw.ljust(4, b"\x00")
    off = heap_base + len(heap)
    heap += raw
    return struct.pack(bo + "HHII", tag, typ, cnt, off)


def tiff_encode(
    img: np.ndarray,
    compression: str = "none",
    predictor: bool = False,
    rows_per_strip: int | None = None,
    planar: bool = False,
    tile: tuple[int, int] | None = None,
    _base: int = 8,
    _next_off: int = 0,
) -> bytes:
    """Encode gray (H,W) uint8/uint16, RGB (H,W,3) or RGBA (H,W,4) uint8
    losslessly as little-endian TIFF. compression: none|packbits|lzw;
    predictor applies horizontal differencing (LZW only, 8-bit only);
    planar=True writes PlanarConfiguration 2 (plane-contiguous segments);
    tile=(tw, th) writes the tiled layout (edge tiles zero-padded) instead
    of strips. _base/_next_off position one page inside a multi-page
    chain (tiff_encode_pages); the defaults produce a standalone file."""
    if img.ndim == 2 and img.dtype in (np.uint8, np.uint16):
        spp, depth = 1, 8 * img.dtype.itemsize
        photometric = 1
    elif img.ndim == 3 and img.shape[2] in (3, 4) and img.dtype == np.uint8:
        spp, depth, photometric = img.shape[2], 8, 2
    else:
        raise ValueError(
            "tiff encode expects (H,W) uint8/16 or (H,W,3|4) uint8"
        )
    comp_code = {"none": 1, "packbits": 32773, "lzw": 5}[compression]
    if predictor and (compression != "lzw" or depth != 8):
        raise ValueError("tiff: predictor implemented for 8-bit LZW only")
    h, w = img.shape[:2]
    rps = rows_per_strip or h
    px = img.reshape(h, w, spp)
    planes = spp if planar else 1
    seg_spp = 1 if planar else spp

    def finish(rows: np.ndarray) -> bytes:
        """One segment (rows, width, seg_spp) -> predicted+compressed bytes."""
        if predictor:
            rows = np.diff(
                rows,
                axis=1,
                prepend=np.zeros((rows.shape[0], 1, seg_spp), rows.dtype),
            ).astype(np.uint8)
        data = rows.astype("<u2").tobytes() if depth == 16 else rows.tobytes()
        if comp_code == 1:
            return data
        if comp_code == 32773:
            return packbits_encode(data)
        return tiff_lzw_encode(data)

    strips: list[bytes] = []
    if tile is not None:
        tw, th = tile
        for p in range(planes):
            plane = px[..., p : p + 1] if planar else px
            for y0 in range(0, h, th):
                for x0 in range(0, w, tw):
                    t = np.zeros((th, tw, seg_spp), px.dtype)
                    block = plane[y0 : y0 + th, x0 : x0 + tw]
                    t[: block.shape[0], : block.shape[1]] = block
                    strips.append(finish(t))
    else:
        for p in range(planes):
            plane = px[..., p : p + 1] if planar else px
            for r0 in range(0, h, rps):
                strips.append(finish(plane[r0 : r0 + rps]))

    bo = "<"
    ifd_off = _base
    counts = [len(s) for s in strips]

    def build(strip_offs: list[int], heap_base: int):
        """Assemble (entries, heap). Two passes: placeholder offsets size
        the layout (every tag's heap footprint is offset-independent),
        then real offsets produce the final bytes."""
        heap = bytearray()
        entries: list[bytes] = []

        def add(tag, typ, vals):
            entries.append(_ifd_entry(bo, tag, typ, vals, heap, heap_base))

        add(256, _T_LONG, [w])
        add(257, _T_LONG, [h])
        add(258, _T_SHORT, [depth] * spp)
        add(259, _T_SHORT, [comp_code])
        add(262, _T_SHORT, [photometric])
        if tile is None:
            add(273, _T_LONG, strip_offs)
        add(277, _T_SHORT, [spp])
        if tile is None:
            add(278, _T_LONG, [rps])
            add(279, _T_LONG, counts)
        if planar:
            add(284, _T_SHORT, [2])
        if predictor:
            add(317, _T_SHORT, [2])
        if tile is not None:
            add(322, _T_LONG, [tile[0]])
            add(323, _T_LONG, [tile[1]])
            add(324, _T_LONG, strip_offs)
            add(325, _T_LONG, counts)
        if spp == 4:
            add(338, _T_SHORT, [2])  # unassociated alpha
        return entries, heap

    entries, heap = build([0] * len(strips), 0)
    heap_base = ifd_off + 2 + 12 * len(entries) + 4
    data_base = heap_base + len(heap)
    offs, p = [], data_base
    for c in counts:
        offs.append(p)
        p += c
    entries, heap = build(offs, heap_base)

    out = bytearray()
    if _base == 8:  # standalone file (or first page of a chain)
        out += b"II*\x00" + struct.pack(bo + "I", ifd_off)
    out += struct.pack(bo + "H", len(entries))
    for e in entries:
        out += e
    out += struct.pack(bo + "I", _next_off)
    out += heap
    for s in strips:
        out += s
    return bytes(out)


def tiff_encode_pages(imgs: list[np.ndarray], **opts) -> bytes:
    """Multi-page TIFF: each image becomes one IFD in the chain (same
    encode options applied to every page). Two passes: page sizes are
    offset-independent, so a first pass with zero next-pointers measures
    the layout and the second writes the real chain."""
    if not imgs:
        raise ValueError("tiff: need at least one page")
    sizes = []
    base = 8
    for img in imgs:
        blob = tiff_encode(img, **opts, _base=base, _next_off=0)
        if base == 8:
            blob = blob[8:]  # drop the measured header; re-added below
        sizes.append(len(blob))
        base += len(blob)
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    base = 8
    for i, img in enumerate(imgs):
        next_off = base + sizes[i] if i + 1 < len(imgs) else 0
        blob = tiff_encode(img, **opts, _base=base, _next_off=next_off)
        if base == 8:
            blob = blob[8:]
        out += blob
        base += len(blob)
    return bytes(out)


def tiff_frame_features(payload: bytes, n_frames: int, dim: int) -> np.ndarray:
    """(n_frames, dim) band features: a single-page TIFF featurizes as a
    still (bit-for-bit its PNG twin); a multi-page document samples
    n_frames pages evenly on the video schedule, one band each."""
    from spdb_spark.functions.multimodal import _image_frame_features
    from spdb_spark.functions.video import sample_frame_indices

    pages = tiff_pages(payload)
    if len(pages) == 1:
        return _image_frame_features(pages[0], n_frames, dim)
    out = np.zeros((n_frames, dim), dtype=np.float32)
    for row, i in enumerate(sample_frame_indices(len(pages), n_frames)):
        out[row] = _image_frame_features(pages[i], 1, dim)[0]
    return out
