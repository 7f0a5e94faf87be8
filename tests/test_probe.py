"""Metadata-probe tests: every codec's probe agrees with its encoder's
ground truth, the MP4 box walk is anchored to a hand-assembled ISO-BMFF
fixture (no mp4 encoder exists in-repo, so the fixture IS the spec
layout), and the Spark kernel prunes by metadata without decoding."""

import struct

import numpy as np

from spdb_spark.functions.probe import probe_media, probe_payload


def test_image_probes_match_encoders():
    from spdb_spark.functions.bmp import bmp_encode
    from spdb_spark.functions.gif import gif_encode, gif_encode_frames
    from spdb_spark.functions.jpeg import jpeg_encode
    from spdb_spark.functions.tiff import tiff_encode
    from spdb_spark.operators.render import png_encode

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (17, 23), dtype=np.uint8)
    for payload, codec in (
        (png_encode(img), "png/gray8"),
        (jpeg_encode(img, quality=90), "jpeg/baseline"),
        (jpeg_encode(img, quality=90, progressive=True), "jpeg/progressive"),
        (gif_encode(img), "gif"),
        (bmp_encode(img), "bmp/8"),
        (tiff_encode(img, compression="lzw"), "tiff/lzw"),
    ):
        container, f = probe_payload(payload)
        assert (f["width"], f["height"]) == (23, 17), codec
        assert f["codec"] == codec
        assert f["n_frames"] == 1

    frames = [np.full((8, 8), v, np.uint8) for v in (0, 100, 200)]
    _, f = probe_payload(gif_encode_frames(frames, delay_cs=5))
    assert f["n_frames"] == 3
    assert f["duration_ms"] == 150  # 3 frames x 5 cs


def test_audio_probes():
    from spdb_spark.functions.audio import wav_encode
    from spdb_spark.functions.flac import flac_encode

    rng = np.random.default_rng(1)
    x = rng.integers(-32768, 32768, (8000, 2), dtype=np.int16)
    _, f = probe_payload(wav_encode(x, sample_rate=16000))
    assert f["codec"] == "wav/pcm16" and f["sample_rate"] == 16000
    assert f["channels"] == 2 and f["n_frames"] == 8000
    assert f["duration_ms"] == 500
    _, f = probe_payload(wav_encode(x, companding="ulaw", sample_rate=8000))
    assert f["codec"] == "wav/ulaw" and f["duration_ms"] == 1000
    _, f = probe_payload(flac_encode(x, sample_rate=16000))
    assert f["codec"] == "flac/16" and f["n_frames"] == 8000
    assert f["duration_ms"] == 500 and f["channels"] == 2


def test_avi_probe():
    from spdb_spark.functions.video import avi_encode_mpng
    from spdb_spark.operators.render import png_encode

    frames = [png_encode(np.full((12, 16), v, np.uint8)) for v in (1, 2, 3, 4)]
    payload = avi_encode_mpng(frames, 16, 12, fps=20)
    _, f = probe_payload(payload)
    assert (f["width"], f["height"]) == (16, 12)
    assert f["n_frames"] == 4
    assert f["duration_ms"] == 200  # 4 frames at 20 fps


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _hand_mp4() -> bytes:
    """Minimal ISO-BMFF: ftyp + moov(mvhd, trak(tkhd, mdia(mdhd, minf(
    stbl(stsd avc1 + stsz))))) — durations/dims chosen to be checkable."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    # mvhd v0: timescale 1000, duration 7500 -> 7500 ms
    mvhd = _box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
        + struct.pack(">II", 1000, 7500) + b"\x00" * 80,
    )
    # tkhd v0: width 640.0, height 360.0 as 16.16 after 52 fixed bytes
    tkhd = _box(
        b"tkhd",
        b"\x00\x00\x00\x07" + struct.pack(">IIIII", 0, 0, 1, 0, 7500)
        + b"\x00" * 52 + struct.pack(">II", 640 << 16, 360 << 16),
    )
    mdhd = _box(
        b"mdhd",
        b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
        + struct.pack(">II", 90000, 675000) + struct.pack(">HH", 0x55C4, 0),
    )
    # avc1 video sample entry: dims at entry offset 32
    avc1_body = (
        b"\x00" * 6 + struct.pack(">H", 1)      # reserved + data_ref_index
        + b"\x00" * 16                           # pre_defined/reserved
        + struct.pack(">HH", 640, 360)           # width, height
        + b"\x00" * 50                           # resolution/frame_count/name/depth
    )
    stsd = _box(
        b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1) + _box(b"avc1", avc1_body)
    )
    stsz = _box(
        b"stsz", b"\x00\x00\x00\x00" + struct.pack(">II", 0, 180)
    )
    stbl = _box(b"stbl", stsd + stsz)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + moov


def test_mp4_box_walk_hand_assembled():
    container, f = probe_payload(_hand_mp4())
    assert container == "mp4"
    assert f["codec"] == "mp4/avc1"
    assert (f["width"], f["height"]) == (640, 360)
    assert f["duration_ms"] == 7500
    assert f["n_frames"] == 180


def test_mp4_largesize_and_bad_boxes():
    # 64-bit largesize box wrapping the moov still walks
    payload = _hand_mp4()
    ftyp_len = struct.unpack(">I", payload[:4])[0]
    moov = payload[ftyp_len:]
    large = struct.pack(">I", 1) + moov[4:8] + struct.pack(">Q", 8 + len(moov) - 8 + 8) + moov[8:]
    container, f = probe_payload(payload[:ftyp_len] + large)
    assert f["duration_ms"] == 7500
    # corrupt size must raise (kernel converts to container='unknown')
    bad = payload[:ftyp_len] + struct.pack(">I", 3) + b"moov"
    try:
        probe_payload(bad)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_probe_kernel_prunes_without_decode(spark):
    """The 100TB shape: probe -> filter -> decode only survivors. The
    H.264-stubbed MP4 still yields real metadata."""
    from spdb_spark.functions.audio import wav_encode
    from spdb_spark.functions.gif import gif_encode
    from spdb_spark.operators.render import png_encode

    rng = np.random.default_rng(2)
    rows = [
        (0, bytearray(png_encode(rng.integers(0, 256, (300, 300), dtype=np.uint8)))),
        (1, bytearray(png_encode(rng.integers(0, 256, (16, 16), dtype=np.uint8)))),
        (2, bytearray(gif_encode(rng.integers(0, 256, (128, 256), dtype=np.uint8)))),
        (3, bytearray(_hand_mp4())),
        (4, bytearray(wav_encode(np.zeros(100, np.int16)))),
        (5, bytearray(b"not media at all")),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    probed = probe_media(media)
    got = {r.media_id: r for r in probed.collect()}
    assert got[0].width == 300 and got[1].width == 16
    assert got[2].container == "gif" and got[2].height == 128
    assert got[3].codec == "mp4/avc1" and got[3].duration_ms == 7500
    assert got[4].container == "wav"
    assert got[5].container == "unknown" and got[5].codec is None
    big = probed.where("width >= 100").select("media_id")
    assert {r.media_id for r in big.collect()} == {0, 2, 3}


def _box_mp3_frame_v1l3(bitrate_idx=9, sr_idx=0, mono=True) -> bytes:
    """Hand-assembled MPEG-1 Layer III header: sync, version 3, layer 1,
    no CRC, then bitrate/samplerate/channel fields per the public frame
    layout."""
    b1 = 0xE0 | (3 << 3) | (1 << 1) | 1  # version MPEG1, layer III, no CRC
    b2 = (bitrate_idx << 4) | (sr_idx << 2)
    b3 = 0xC0 if mono else 0x00
    return bytes([0xFF, b1, b2, b3])


def test_mp3_probe_cbr_and_xing():
    # CBR estimate: 128 kbps -> 1 second of payload is 16000 bytes
    frame = _box_mp3_frame_v1l3(bitrate_idx=9, sr_idx=0, mono=True)  # 128k, 44100
    payload = frame + b"\x00" * (16000 - 4)
    container, f = probe_payload(payload)
    assert container == "mp3" and f["codec"] == "mp3/v1l3"
    assert f["sample_rate"] == 44100 and f["channels"] == 1
    assert f["duration_ms"] == 1000
    # Xing header overrides with the exact frame count (mono MPEG1:
    # side info 17 bytes after the 4-byte header)
    xing = frame + b"\x00" * 17 + b"Xing" + struct.pack(">II", 1, 100)
    payload = xing + b"\x00" * 4000
    _, f = probe_payload(payload)
    assert f["n_frames"] == 100
    assert f["duration_ms"] == 100 * 1152 * 1000 // 44100
    # ID3v2 tag is skipped (syncsafe size)
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"\x00" * 10
    _, f = probe_payload(id3 + payload)
    assert f["n_frames"] == 100


def _ogg_page(packet: bytes, granule: int = 0, header_type: int = 2) -> bytes:
    segs = []
    n = len(packet)
    while n >= 255:
        segs.append(255)
        n -= 255
    segs.append(n)
    return (
        b"OggS\x00" + bytes([header_type]) + struct.pack("<q", granule)
        + struct.pack("<III", 1, 0, 0) + bytes([len(segs)]) + bytes(segs)
        + packet
    )


def test_ogg_probe_vorbis_and_opus():
    vorbis_id = (
        b"\x01vorbis" + struct.pack("<IB", 0, 2) + struct.pack("<I", 44100)
        + b"\x00" * 16
    )
    payload = _ogg_page(vorbis_id) + _ogg_page(b"\x05data", granule=44100 * 3)
    container, f = probe_payload(payload)
    assert container == "ogg" and f["codec"] == "ogg/vorbis"
    assert f["channels"] == 2 and f["sample_rate"] == 44100
    assert f["duration_ms"] == 3000

    opus_id = b"OpusHead\x01" + bytes([1]) + struct.pack("<HI", 312, 16000) + b"\x00\x00"
    payload = _ogg_page(opus_id) + _ogg_page(b"x", granule=96000)
    _, f = probe_payload(payload)
    assert f["codec"] == "ogg/opus" and f["channels"] == 1
    assert f["sample_rate"] == 16000
    assert f["duration_ms"] == 2000  # granules are 48 kHz ticks


def test_avi_dib_frames_decode_and_probe():
    """Uncompressed (BI_RGB) AVI: raw gray and RGB frames decode through
    the DIB path with pixel-exact features; probe labels codec avi/dib."""
    import numpy as np

    from spdb_spark.functions.multimodal import (
        _image_frame_features,
        decode_features_status,
    )
    from spdb_spark.functions.video import avi_encode_dib

    rng = np.random.default_rng(11)
    gray = [rng.integers(0, 256, (9, 13), dtype=np.uint8) for _ in range(4)]
    payload = avi_encode_dib(gray, fps=5)
    feats, status = decode_features_status(payload, 4, 6)
    assert status == "ok"
    for i in range(4):
        assert (feats[i] == _image_frame_features(gray[i], 1, 6)[0]).all()
    _, f = probe_payload(payload)
    assert f["codec"] == "avi/dib" and f["n_frames"] == 4
    assert f["duration_ms"] == 800

    rgb = [rng.integers(0, 256, (6, 7, 3), dtype=np.uint8) for _ in range(3)]
    feats, status = decode_features_status(avi_encode_dib(rgb), 3, 4)
    assert status == "ok"
    for i in range(3):
        assert (feats[i] == _image_frame_features(rgb[i], 1, 4)[0]).all()


def test_mp3_subsecond_duration_not_truncated():
    # review r6b: duration was floored to whole seconds
    frame = _box_mp3_frame_v1l3(bitrate_idx=9, sr_idx=0, mono=True)  # 128 kbps
    payload = frame + b"\x00" * (46400 - 4)  # 2.9 s at 128 kbps
    _, f = probe_payload(payload)
    assert f["duration_ms"] == 2900


def test_mp4_multitrack_scoping():
    """Review r6b: a video+audio MP4 must take n_frames from the video
    track and sample_rate from the audio track's mdhd, not mix them."""
    def trak(handler, fourcc, count, timescale, dims=None):
        tkhd_body = (
            b"\x00\x00\x00\x07" + struct.pack(">IIIII", 0, 0, 1, 0, 0)
            + b"\x00" * 52
            + struct.pack(">II", (dims[0] << 16) if dims else 0,
                          (dims[1] << 16) if dims else 0)
        )
        hdlr = _box(b"hdlr", b"\x00" * 8 + handler + b"\x00" * 12)
        mdhd = _box(
            b"mdhd",
            b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, timescale * 4)
            + struct.pack(">HH", 0x55C4, 0),
        )
        entry_body = b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16 + (
            struct.pack(">HH", *dims) if dims else b"\x00" * 4
        ) + b"\x00" * 50
        stsd = _box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1)
                    + _box(fourcc, entry_body))
        stsz = _box(b"stsz", b"\x00" * 4 + struct.pack(">II", 0, count))
        stbl = _box(b"stbl", stsd + stsz)
        return _box(
            b"trak",
            _box(b"tkhd", tkhd_body)
            + _box(b"mdia", mdhd + hdlr + _box(b"minf", stbl)),
        )

    mvhd = _box(b"mvhd", b"\x00" * 4 + struct.pack(">II", 0, 0)
                + struct.pack(">II", 1000, 12000) + b"\x00" * 80)
    moov = _box(b"moov", mvhd
                + trak(b"vide", b"avc1", 300, 90000, dims=(1280, 720))
                + trak(b"soun", b"mp4a", 4000, 44100))
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    _, f = probe_payload(ftyp + moov)
    assert f["codec"] == "mp4/avc1"
    assert (f["width"], f["height"]) == (1280, 720)
    assert f["n_frames"] == 300          # video frames, not audio packets
    assert f["sample_rate"] == 44100     # audio timescale, not video's
    assert f["duration_ms"] == 12000


def test_avi_topdown_dib_not_flipped():
    """Review r6b: negative strf biHeight (top-down raw capture) must not
    decode vertically flipped."""
    import numpy as np

    from spdb_spark.functions.multimodal import (
        _image_frame_features,
        decode_features_status,
    )
    from spdb_spark.functions.video import avi_encode_dib

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (10, 8), dtype=np.uint8)
    payload = bytearray(avi_encode_dib([img], fps=5))
    # flip the stored rows to TOP-DOWN order and negate strf biHeight
    idx = bytes(payload).find(b"strf")
    struct.pack_into("<i", payload, idx + 8 + 8, -10)
    movi = bytes(payload).find(b"00db")
    stride = 8
    rows = [bytes(payload[movi + 8 + r * stride : movi + 8 + (r + 1) * stride])
            for r in range(10)]
    payload[movi + 8 : movi + 8 + 10 * stride] = b"".join(reversed(rows))
    feats, status = decode_features_status(bytes(payload), 1, 4)
    assert status == "ok"
    assert (feats[0] == _image_frame_features(img, 1, 4)[0]).all()


def test_webp_probe_all_three_chunk_forms():
    """WebP dims from hand-assembled VP8X / VP8L / lossy-VP8 chunks per
    the public bit layouts; VP8L pixels decode for real (test_webp.py),
    VP8X/lossy stay metadata-only."""
    def riff(chunk):
        body = b"WEBP" + chunk
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    vp8x = chunk(b"VP8X", bytes([0, 0, 0, 0])
                 + (639).to_bytes(3, "little") + (359).to_bytes(3, "little"))
    _, f = probe_payload(riff(vp8x))
    assert f["codec"] == "webp/vp8x" and (f["width"], f["height"]) == (640, 360)

    bits = (99) | (49 << 14)  # 100x50 minus-one fields
    vp8l = chunk(b"VP8L", bytes([0x2F]) + struct.pack("<I", bits))
    _, f = probe_payload(riff(vp8l))
    assert f["codec"] == "webp/lossless" and (f["width"], f["height"]) == (100, 50)

    vp8 = chunk(b"VP8 ", b"\x00\x00\x00\x9d\x01\x2a"
                + struct.pack("<HH", 320, 240) + b"\x00" * 4)
    _, f = probe_payload(riff(vp8))
    assert f["codec"] == "webp/lossy" and (f["width"], f["height"]) == (320, 240)

    from spdb_spark.functions.multimodal import decode_features_status
    _feats, status = decode_features_status(riff(vp8), 2, 3)
    assert status == "stub"  # honest: no pure-Python VP8 pixel decode


def test_mp4_audio_without_hdlr_still_yields_sample_rate():
    """Review r6b-2: some muxers omit hdlr; a dimensionless trak with a
    timescale still supplies sample_rate."""
    def trak_no_hdlr(fourcc, count, timescale):
        tkhd_body = (b"\x00\x00\x00\x07" + struct.pack(">IIIII", 0, 0, 1, 0, 0)
                     + b"\x00" * 52 + struct.pack(">II", 0, 0))
        mdhd = _box(b"mdhd", b"\x00" * 4 + struct.pack(">II", 0, 0)
                    + struct.pack(">II", timescale, timescale)
                    + struct.pack(">HH", 0, 0))
        entry = b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70
        stsd = _box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1)
                    + _box(fourcc, entry))
        stsz = _box(b"stsz", b"\x00" * 4 + struct.pack(">II", 0, count))
        return _box(b"trak", _box(b"tkhd", tkhd_body)
                    + _box(b"mdia", mdhd + _box(b"minf", _box(b"stbl", stsd + stsz))))

    mvhd = _box(b"mvhd", b"\x00" * 4 + struct.pack(">II", 0, 0)
                + struct.pack(">II", 1000, 5000) + b"\x00" * 80)
    moov = _box(b"moov", mvhd + trak_no_hdlr(b"mp4a", 2000, 22050))
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    _, f = probe_payload(ftyp + moov)
    assert f["sample_rate"] == 22050 and f["duration_ms"] == 5000


def test_avif_heif_probe():
    """Fixtures hand-assembled from the ISO-BMFF layout (meta and ispe
    are FullBoxes — the 4 version/flags bytes are the classic trap)."""
    import struct

    from spdb_spark.functions.probe import probe_payload

    def box(tag, body):
        return struct.pack(">I", 8 + len(body)) + tag + body

    ispe_main = box(b"ispe", b"\x00\x00\x00\x00" + struct.pack(">II", 640, 480))
    ispe_alpha = box(b"ispe", b"\x00\x00\x00\x00" + struct.pack(">II", 640, 480))
    ispe_thumb = box(b"ispe", b"\x00\x00\x00\x00" + struct.pack(">II", 64, 48))
    ipco = box(b"ipco", ispe_thumb + ispe_main + ispe_alpha)
    meta = box(b"meta", b"\x00\x00\x00\x00" + box(b"iprp", ipco))
    ftyp = box(b"ftyp", b"avif" + b"\x00\x00\x00\x00" + b"avifmif1")
    container, m = probe_payload(ftyp + meta)
    assert container == "avif" and m["codec"] == "avif"
    assert (m["width"], m["height"]) == (640, 480)
    assert m["n_frames"] == 1
    # heic brand routes to heif; animated avis leaves frame count unknown
    heic = box(b"ftyp", b"heic" + b"\x00\x00\x00\x00") + meta
    assert probe_payload(heic)[0] == "heif"
    avis = box(b"ftyp", b"avis" + b"\x00\x00\x00\x00") + meta
    assert probe_payload(avis)[1]["n_frames"] is None
    # plain mp4 brands still take the movie path
    mp4 = box(b"ftyp", b"isom" + b"\x00\x00\x00\x00")
    assert probe_payload(mp4)[0] == "mp4"


def test_webp_probe_animated_frame_count():
    """Animated VP8X: n_frames = ANMF chunk count, still header-only
    (frame payloads are skipped, never parsed)."""
    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    vp8x = chunk(b"VP8X", bytes([0x02, 0, 0, 0])
                 + (639).to_bytes(3, "little") + (359).to_bytes(3, "little"))
    frames = b"".join(chunk(b"ANMF", b"\x00" * 16) for _ in range(3))
    body = b"WEBP" + vp8x + frames
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    _, f = probe_payload(payload)
    assert f["codec"] == "webp/vp8x"
    assert f["n_frames"] == 3
