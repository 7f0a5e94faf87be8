"""Metadata probing WITHOUT decoding: container, codec, dimensions,
duration, and frame/sample counts from headers only.

This is the scale-side half of the multimodal story: at 100 TB you prune
by resolution / duration / codec BEFORE spending decode cycles — the
probe reads a few hundred header bytes per payload, so a filter like
`width >= 256 AND duration_ms < 60000` runs at scan speed and the Arrow
decode kernels only ever see survivors. Works for every codec the repo
decodes (PNG, JPEG, GIF, BMP, TIFF, WAV, FLAC, AVI) AND for formats whose
pixel decode is stubbed (MP4/ISO-BMFF via a real box walk) — the
metadata is real even where the codec isn't.

Formats are parsed from their public specifications (ISO 14496-12 box
structure for MP4; the codec headers match the sibling decoder modules).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PROBE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("container", StringType(), False),
        StructField("codec", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("n_frames", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("channels", IntegerType(), True),
    ]
)

_EMPTY = {
    "codec": None, "width": None, "height": None, "duration_ms": None,
    "n_frames": None, "sample_rate": None, "channels": None,
}


def _probe_png(p: bytes) -> dict:
    if len(p) < 33 or p[12:16] != b"IHDR":
        raise ValueError("png: truncated")
    w, h, depth, ctype = struct.unpack_from(">IIBB", p, 16)
    codec = {0: "gray", 2: "rgb", 3: "palette", 4: "gray+alpha", 6: "rgba"}.get(
        ctype, f"type{ctype}"
    )
    # APNG: acTL before IDAT declares frame count — still header-only
    # (the chunk walk reads lengths, never inflates pixel data)
    n_frames = 1
    pos = 8
    while pos + 8 <= len(p):
        (length,) = struct.unpack_from(">I", p, pos)
        tag = p[pos + 4 : pos + 8]
        if tag == b"acTL" and length >= 8:
            n_frames = struct.unpack_from(">I", p, pos + 8)[0]
            break
        if tag in (b"IDAT", b"IEND"):
            break
        pos += 12 + length
    return {**_EMPTY, "codec": f"png/{codec}{depth}", "width": w, "height": h,
            "n_frames": n_frames}


def _probe_jpeg(p: bytes) -> dict:
    pos = 2
    while pos + 4 <= len(p):
        if p[pos] != 0xFF:
            pos += 1
            continue
        marker = p[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", p, pos + 2)
        if marker == 0xDA:  # SOS without a prior SOF: stop, don't walk
            break           # into entropy-coded data
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB):
            h, w = struct.unpack_from(">HH", p, pos + 5)
            kind = {0xC0: "baseline", 0xC1: "extended", 0xC2: "progressive",
                    0xC3: "lossless"}.get(marker, "arithmetic")
            return {**_EMPTY, "codec": f"jpeg/{kind}", "width": w, "height": h,
                    "n_frames": 1}
        pos += 2 + seglen
    raise ValueError("jpeg: no SOF marker")


def _probe_gif(p: bytes) -> dict:
    w, h = struct.unpack_from("<HH", p, 6)
    # count image descriptors without decoding pixel data
    n, pos, npay = 0, 13, len(p)
    if p[10] & 0x80:
        pos += 3 * (2 << (p[10] & 0x07))
    delay_total = 0
    while pos < npay:
        b = p[pos]
        pos += 1
        if b == 0x3B:
            break
        if b == 0x21:
            label = p[pos]
            pos += 1
            if label == 0xF9 and pos < npay and p[pos] >= 4:
                delay_total += struct.unpack_from("<H", p, pos + 2)[0] * 10
            while pos < npay and p[pos]:
                pos += 1 + p[pos]
            pos += 1
        elif b == 0x2C:
            n += 1
            iflags = p[pos + 8]
            pos += 9
            if iflags & 0x80:
                pos += 3 * (2 << (iflags & 0x07))
            pos += 1  # LZW min code size
            while pos < npay and p[pos]:
                pos += 1 + p[pos]
            pos += 1
        else:
            raise ValueError("gif: bad block")
    return {**_EMPTY, "codec": "gif", "width": w, "height": h,
            "n_frames": n or None,
            "duration_ms": delay_total if n > 1 else None}


def _probe_bmp(p: bytes) -> dict:
    w, h = struct.unpack_from("<ii", p, 18)
    bpp = struct.unpack_from("<H", p, 28)[0]
    return {**_EMPTY, "codec": f"bmp/{bpp}", "width": w, "height": abs(h),
            "n_frames": 1}


def _probe_tiff(p: bytes) -> dict:
    from spdb_spark.functions.tiff import ifd_chain

    bo = "<" if p[:2] == b"II" else ">"
    chain = ifd_chain(p, bo)
    if not chain:
        raise ValueError("tiff: no IFDs")
    tags = chain[0]
    w = tags.get(256, (0, [None]))[1][0]
    h = tags.get(257, (0, [None]))[1][0]
    comp = {1: "none", 5: "lzw", 6: "jpeg", 7: "jpeg", 32773: "packbits"}.get(
        tags.get(259, (0, [1]))[1][0], "other"
    )
    return {**_EMPTY, "codec": f"tiff/{comp}", "width": w, "height": h,
            "n_frames": len(chain)}


def _probe_wav(p: bytes) -> dict:
    pos, end = 12, min(8 + struct.unpack_from("<I", p, 4)[0], len(p))
    fmt = data_len = None
    while pos + 8 <= end:
        cid = p[pos : pos + 4]
        size = struct.unpack_from("<I", p, pos + 4)[0]
        if cid == b"fmt ":
            fmt = p[pos + 8 : pos + 8 + size]
        elif cid == b"data":
            data_len = size
        pos += 8 + size + (size & 1)
    if fmt is None:
        raise ValueError("wav: missing fmt")
    code, ch, rate, byte_rate, _ba, bits = struct.unpack("<HHIIHH", fmt[:16])
    name = {1: f"pcm{bits}", 3: f"float{bits}", 6: "alaw", 7: "ulaw"}.get(
        code, f"fmt{code}"
    )
    dur = (data_len * 1000 // byte_rate) if (data_len and byte_rate) else None
    frames = (data_len // (ch * max(bits // 8, 1))) if data_len else None
    return {**_EMPTY, "codec": f"wav/{name}", "duration_ms": dur,
            "n_frames": frames, "sample_rate": rate, "channels": ch}


def _probe_flac(p: bytes) -> dict:
    pos = 4
    while pos + 4 <= len(p):
        head = p[pos]
        size = int.from_bytes(p[pos + 1 : pos + 4], "big")
        if head & 0x7F == 0:
            from spdb_spark.functions.flac import _BitReader

            si = _BitReader(p[pos + 4 : pos + 4 + size])
            si.read(64)  # min/max blocksize + min framesize + 8
            si.read(16)  # rest of max framesize (80 header bits total)
            rate = si.read(20)
            nch = si.read(3) + 1
            bps = si.read(5) + 1
            total = si.read(36)
            return {**_EMPTY, "codec": f"flac/{bps}", "n_frames": total or None,
                    "duration_ms": (total * 1000 // rate) if rate and total else None,
                    "sample_rate": rate, "channels": nch}
        pos += 4 + size
        if head & 0x80:
            break
    raise ValueError("flac: missing STREAMINFO")


def _probe_avi(p: bytes) -> dict:
    # avih is the first chunk of LIST hdrl, fixed offsets in practice
    idx = p.find(b"avih")
    if idx < 0 or idx + 40 > len(p):
        raise ValueError("avi: missing avih")
    us_per_frame, _rate, _pad, _flags, total = struct.unpack_from("<IIIII", p, idx + 8)
    w, h = struct.unpack_from("<II", p, idx + 8 + 32)
    codec_idx = p.find(b"strf")
    codec = None
    if codec_idx > 0 and codec_idx + 32 <= len(p):
        four = p[codec_idx + 24 : codec_idx + 28]
        codec = four.decode("ascii", "replace") if four.strip(b"\x00") else "dib"
    dur = total * us_per_frame // 1000 if us_per_frame else None
    return {**_EMPTY, "codec": f"avi/{codec}", "width": w, "height": h,
            "duration_ms": dur, "n_frames": total}


def _mp4_boxes(p: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", p, pos)
        btype = p[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", p, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("mp4: bad box size")
        yield btype, body, pos + size
        pos += size


def _probe_avif(p: bytes, brand: str) -> dict:
    """AVIF/HEIF still images: same ISO-BMFF walk, but dimensions live in
    item properties — meta (a FullBox: 4 bytes of version/flags precede
    its children) -> iprp -> ipco -> ispe (FullBox: image_width,
    image_height as 32-bit). Files carry one ispe per item including
    alpha planes and thumbnails; without parsing ipma associations the
    max-area ispe is the primary image in practice (thumbs/alpha are
    never larger)."""
    out = {**_EMPTY, "codec": brand, "n_frames": None if brand == "avis" else 1}
    best = None

    def walk(s, e):
        nonlocal best
        for t, b, be in _mp4_boxes(p, s, e):
            if t in (b"iprp", b"ipco"):
                walk(b, be)
            elif t == b"ispe":
                w, h = struct.unpack_from(">II", p, b + 4)
                if best is None or w * h > best[0] * best[1]:
                    best = (w, h)

    for btype, body, bend in _mp4_boxes(p, 0, len(p)):
        if btype == b"meta":
            walk(body + 4, bend)
    if best:
        out["width"], out["height"] = best
    return out


def _probe_mp4(p: bytes) -> dict:
    """Real ISO-BMFF box walk, scoped PER TRACK so multi-track files
    don't mix fields: mvhd movie duration; the VIDEO track (hdlr 'vide')
    supplies codec/dims/frame count; the first AUDIO track (hdlr 'soun')
    supplies sample_rate from its mdhd timescale. No codec decode."""
    out = {**_EMPTY, "codec": "mp4"}

    def parse_trak(start, end) -> dict:
        trk = {"handler": None, "fourcc": None, "w": None, "h": None,
               "count": None, "timescale": None}

        def walk(s, e):
            for btype, body, bend in _mp4_boxes(p, s, e):
                t = btype.decode("latin1")
                if t in ("mdia", "minf", "stbl"):
                    walk(body, bend)
                elif t == "hdlr":
                    trk["handler"] = p[body + 8 : body + 12].decode("latin1")
                elif t == "tkhd":
                    ver = p[body]
                    # after version+flags and the v0/v1 times/id/duration
                    # run, 52 fixed bytes (reserved/layer/volume/matrix)
                    # precede the 16.16 width/height
                    base = body + (24 if ver == 0 else 36)
                    w16, h16 = struct.unpack_from(">II", p, base + 52)
                    if w16 and h16:
                        trk["w"], trk["h"] = w16 >> 16, h16 >> 16
                elif t == "stsd":
                    n = struct.unpack_from(">I", p, body + 4)[0]
                    if n:
                        trk["fourcc"] = p[body + 12 : body + 16].decode(
                            "latin1"
                        )
                        # a video sample entry carries dims at offset 32
                        if bend - body >= 44 and trk["w"] is None:
                            w, h = struct.unpack_from(">HH", p, body + 8 + 32)
                            if w and h:
                                trk["w"], trk["h"] = w, h
                elif t == "stsz":
                    trk["count"] = struct.unpack_from(">I", p, body + 8)[0]
                elif t == "mdhd":
                    ver = p[body]
                    off = 20 if ver == 1 else 12
                    trk["timescale"] = struct.unpack_from(">I", p, body + off)[0]

        walk(start, end)
        return trk

    traks = []
    for btype, body, bend in _mp4_boxes(p, 0, len(p)):
        if btype != b"moov":
            continue
        for ityp, ibody, ibend in _mp4_boxes(p, body, bend):
            if ityp == b"mvhd":
                ver = p[ibody]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", p, ibody + 20)
                else:
                    ts, dur = struct.unpack_from(">II", p, ibody + 12)
                if ts:
                    out["duration_ms"] = dur * 1000 // ts
            elif ityp == b"trak":
                traks.append(parse_trak(ibody, ibend))

    video = next(
        (t for t in traks if t["handler"] == "vide" or t["w"] is not None), None
    )
    # audio: prefer the declared handler, but fall back to a dimensionless
    # trak with a timescale (some muxers omit the spec-required hdlr)
    audio = next((t for t in traks if t["handler"] == "soun"), None) or next(
        (
            t
            for t in traks
            if t is not video and t["w"] is None and t["timescale"]
        ),
        None,
    )
    if video:
        if video["fourcc"]:
            out["codec"] = f"mp4/{video['fourcc']}"
        out["width"], out["height"] = video["w"], video["h"]
        out["n_frames"] = video["count"]
    elif traks and traks[0]["fourcc"]:
        out["codec"] = f"mp4/{traks[0]['fourcc']}"
        out["n_frames"] = traks[0]["count"]
    if audio:
        out["sample_rate"] = audio["timescale"]
    return out


def probe_payload(payload: bytes) -> tuple[str, dict]:
    """-> (container, fields). Raises ValueError on unrecognized bytes."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png", _probe_png(payload)
    if payload[:2] == b"\xff\xd8":
        return "jpeg", _probe_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif", _probe_gif(payload)
    if payload[:2] == b"BM":
        return "bmp", _probe_bmp(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff", _probe_tiff(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav", _probe_wav(payload)
    if payload[:4] == b"fLaC":
        return "flac", _probe_flac(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi", _probe_avi(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp", _probe_webp(payload)
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        brand = payload[8:12].decode("latin1")
        if brand in ("avif", "avis"):
            return "avif", _probe_avif(payload, brand)
        if brand in ("heic", "heix", "mif1", "msf1"):
            return "heif", _probe_avif(payload, brand)
        return "mp4", _probe_mp4(payload)
    if payload[:4] == b"OggS":
        return "ogg", _probe_ogg(payload)
    if payload[:2] in (b"P4", b"P5", b"P6") and payload[2:3].isspace():
        from spdb_spark.functions.pnm import _header_tokens

        n = 2 if payload[:2] == b"P4" else 3
        vals, _ = _header_tokens(payload, n)
        depth = 1 if payload[:2] == b"P4" else (16 if vals[2] > 255 else 8)
        kind = {b"P4": "bitmap", b"P5": "gray", b"P6": "rgb"}[payload[:2]]
        return "pnm", {**_EMPTY, "codec": f"pnm/{kind}{depth}",
                       "width": vals[0], "height": vals[1], "n_frames": 1}
    if payload[:4] == b"qoif" and len(payload) >= 14:
        import struct as _struct

        w, h = _struct.unpack(">II", payload[4:12])
        return "qoi", {**_EMPTY, "codec": f"qoi/rgb{'a' if payload[12] == 4 else ''}",
                       "width": w, "height": h, "n_frames": 1}
    if payload[:8] == b"farbfeld" and len(payload) >= 16:
        import struct as _struct

        w, h = _struct.unpack(">II", payload[8:16])
        return "farbfeld", {**_EMPTY, "codec": "farbfeld/rgba16",
                            "width": w, "height": h, "n_frames": 1}
    if payload[:4] == b"\x00\x00\x01\x00":
        from spdb_spark.functions.ico import ico_entries

        entries = ico_entries(payload)
        w, h, _o, _s = max(entries, key=lambda e: e[0] * e[1])
        return "ico", {**_EMPTY, "codec": "ico", "width": w, "height": h,
                       "n_frames": len(entries)}
    if payload[:3] == b"ID3" or (
        len(payload) >= 4
        and payload[0] == 0xFF
        and (payload[1] & 0xE0) == 0xE0
    ):
        return "mp3", _probe_mp3(payload)
    # TGA carries no leading magic; its 2.0 footer is the signature
    # (checked last, like other weak-magic formats)
    from spdb_spark.functions.tga import tga_sniff

    if tga_sniff(payload):
        import struct as _struct

        img_type, w, h, depth = (
            payload[2],
            _struct.unpack("<H", payload[12:14])[0],
            _struct.unpack("<H", payload[14:16])[0],
            payload[16],
        )
        return "tga", {**_EMPTY, "codec": f"tga/{img_type}-{depth}",
                       "width": w, "height": h, "n_frames": 1}
    raise ValueError("unrecognized container")


def probe_media(media: DataFrame) -> DataFrame:
    """(media_id, payload) -> PROBE_SCHEMA rows via an Arrow-batched
    kernel. Unrecognized/corrupt payloads probe as container='unknown'
    (all fields null) — never an exception, so the probe can front a
    100 TB scan as the cheap pruning stage before any decode."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    container, f = probe_payload(bytes(r.payload))
                except Exception:
                    container, f = "unknown", dict(_EMPTY)
                rows.append(
                    (int(r.media_id), container, f["codec"], f["width"],
                     f["height"], f["duration_ms"], f["n_frames"],
                     f["sample_rate"], f["channels"])
                )
            yield pd.DataFrame(rows, columns=[x.name for x in PROBE_SCHEMA])

    return media.select("media_id", "payload").mapInPandas(kernel, PROBE_SCHEMA)


def synthetic_probe_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic mixed-container payloads whose PROBE fields have
    closed forms an external SQL oracle can replay: per id d, an image of
    width 8 + d%16 and height 8 + (d//2)%8 encoded as PNG / baseline JPEG
    / GIF / BMP / TIFF-PackBits (d%6 in 0..4), or a mono 1 kHz int16 WAV
    of 100 + d%50 samples (d%6 == 5, so duration_ms == n_frames ==
    100 + d%50). Arrow-batched like real ingest."""
    from spdb_spark.functions.audio import wav_encode
    from spdb_spark.functions.bmp import bmp_encode
    from spdb_spark.functions.gif import gif_encode
    from spdb_spark.functions.jpeg import jpeg_encode
    from spdb_spark.functions.multimodal import MEDIA_BUILD_SCHEMA
    from spdb_spark.functions.tiff import tiff_encode
    from spdb_spark.operators.render import png_encode

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                cls = mid % 6
                if cls == 5:
                    blob = wav_encode(
                        np.zeros(100 + mid % 50, np.int16), sample_rate=1000
                    )
                else:
                    img = np.full((8 + (mid // 2) % 8, 8 + mid % 16), 7, np.uint8)
                    enc = (
                        png_encode,
                        lambda x: jpeg_encode(x, quality=90),
                        gif_encode,
                        bmp_encode,
                        lambda x: tiff_encode(x, compression="packbits"),
                    )[cls]
                    blob = enc(img)
                out.append((mid, blob))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return df.select(F.col(id_col).alias("media_id")).mapInPandas(
        kernel, MEDIA_BUILD_SCHEMA
    )


_MP3_BITRATES_V1L3 = (
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
_MP3_BITRATES_V2L3 = (
    0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
)
_MP3_RATES_V1 = (44100, 48000, 32000)


def _probe_mp3(p: bytes) -> dict:
    """MPEG-1/2/2.5 Layer III frame-header probe (decode stays stubbed —
    the synthesis filterbank isn't in pure-Python reach, but the header
    fields are). Skips ID3v2, reads the first frame header, and prefers
    the Xing/Info frame count (exact even for VBR) over the CBR
    size/bitrate estimate."""
    pos = 0
    if p[:3] == b"ID3" and len(p) > 10:
        size = ((p[6] & 0x7F) << 21) | ((p[7] & 0x7F) << 14) \
            | ((p[8] & 0x7F) << 7) | (p[9] & 0x7F)
        pos = 10 + size
    n = len(p)
    while pos + 4 <= n:
        if p[pos] == 0xFF and (p[pos + 1] & 0xE0) == 0xE0:
            break
        pos += 1
    else:
        raise ValueError("mp3: no frame sync")
    b1, b2, b3 = p[pos + 1], p[pos + 2], p[pos + 3]
    version = (b1 >> 3) & 0x03  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (b1 >> 1) & 0x03    # 1 = Layer III
    if version == 1 or layer != 1:
        raise ValueError("mp3: reserved version or not layer III")
    br_idx = (b2 >> 4) & 0x0F
    sr_idx = (b2 >> 2) & 0x03
    if br_idx in (0, 15) or sr_idx == 3:
        raise ValueError("mp3: free-form/reserved header")
    kbps = (_MP3_BITRATES_V1L3 if version == 3 else _MP3_BITRATES_V2L3)[br_idx]
    rate = _MP3_RATES_V1[sr_idx] >> {3: 0, 2: 1, 0: 2}[version]
    mono = ((b3 >> 6) & 0x03) == 3
    samples_per_frame = 1152 if version == 3 else 576
    dur = None
    frames = None
    # Xing/Info header: exact frame count for VBR streams
    side_info = (17 if mono else 32) if version == 3 else (9 if mono else 17)
    tag_at = pos + 4 + side_info
    if p[tag_at : tag_at + 4] in (b"Xing", b"Info"):
        flags = struct.unpack_from(">I", p, tag_at + 4)[0]
        if flags & 1:
            frames = struct.unpack_from(">I", p, tag_at + 8)[0]
            dur = frames * samples_per_frame * 1000 // rate
    if dur is None:
        dur = (n - pos) * 8 // kbps if kbps else None  # bytes*8/kbps == ms
        frames = (dur * rate // (samples_per_frame * 1000)) if dur else None
    return {**_EMPTY, "codec": f"mp3/v{ {3: 1, 2: 2, 0: 2.5}[version] }l3",
            "duration_ms": dur, "n_frames": frames, "sample_rate": rate,
            "channels": 1 if mono else 2}


def _probe_ogg(p: bytes) -> dict:
    """Ogg container probe: first-packet codec id (Vorbis / Opus /
    Theora), channels + rate from the id header, duration from the last
    page's granule position (Vorbis: PCM samples; Opus: 48 kHz ticks)."""
    if p[:4] != b"OggS":
        raise ValueError("ogg: bad capture pattern")
    nsegs = p[26]
    first = p[27 + nsegs : 27 + nsegs + 64]
    out = {**_EMPTY, "codec": "ogg"}
    gran_rate = None
    if first[:7] == b"\x01vorbis":
        out["codec"] = "ogg/vorbis"
        out["channels"] = first[11]
        out["sample_rate"] = struct.unpack_from("<I", first, 12)[0]
        gran_rate = out["sample_rate"]
    elif first[:8] == b"OpusHead":
        out["codec"] = "ogg/opus"
        out["channels"] = first[9]
        out["sample_rate"] = struct.unpack_from("<I", first, 12)[0]
        gran_rate = 48000  # Opus granules are always 48 kHz ticks
    elif first[1:7] == b"theora":
        out["codec"] = "ogg/theora"
    last = p.rfind(b"OggS")
    if gran_rate and last >= 0 and last + 14 <= len(p):
        granule = struct.unpack_from("<q", p, last + 6)[0]
        if granule > 0:
            out["duration_ms"] = granule * 1000 // gran_rate
            out["n_frames"] = granule
    return out


def _probe_webp(p: bytes) -> dict:
    """WebP dims from the public chunk layouts — VP8X canvas (24-bit
    minus-one fields), VP8L (14-bit minus-one pairs after the 0x2F
    signature byte), lossy VP8 (sync 9D 01 2A then 14-bit LE dims).
    Lossless (VP8L) pixels decode for real via functions/webp.py; lossy
    VP8 pixels stay stubbed (the arithmetic coder is out of scope) —
    the metadata is real either way so resolution pruning covers WebP."""
    out = {**_EMPTY, "codec": "webp", "n_frames": 1}
    pos, end = 12, min(8 + struct.unpack_from("<I", p, 4)[0], len(p))
    while pos + 8 <= end:
        cid = p[pos : pos + 4]
        size = struct.unpack_from("<I", p, pos + 4)[0]
        body = p[pos + 8 : pos + 8 + size]
        if cid == b"VP8X" and len(body) >= 10:
            out["codec"] = "webp/vp8x"
            out["width"] = 1 + int.from_bytes(body[4:7], "little")
            out["height"] = 1 + int.from_bytes(body[7:10], "little")
            if body[0] & 0x02:  # animation: count ANMF chunks, still
                # header-only (frame payloads are skipped, not parsed)
                n = 0
                apos = pos + 8 + size + (size & 1)
                while apos + 8 <= end:
                    acid = p[apos : apos + 4]
                    asize = struct.unpack_from("<I", p, apos + 4)[0]
                    if acid == b"ANMF":
                        n += 1
                    apos += 8 + asize + (asize & 1)
                out["n_frames"] = n if n else None
            return out
        if cid == b"VP8L" and len(body) >= 5 and body[0] == 0x2F:
            bits = int.from_bytes(body[1:5], "little")
            out["codec"] = "webp/lossless"
            out["width"] = (bits & 0x3FFF) + 1
            out["height"] = ((bits >> 14) & 0x3FFF) + 1
            return out
        if cid == b"VP8 " and len(body) >= 10 and body[3:6] == b"\x9d\x01\x2a":
            out["codec"] = "webp/lossy"
            out["width"] = struct.unpack_from("<H", body, 6)[0] & 0x3FFF
            out["height"] = struct.unpack_from("<H", body, 8)[0] & 0x3FFF
            return out
        pos += 8 + size + (size & 1)
    raise ValueError("webp: no image chunk")
