"""Property-based fuzzing (hypothesis) of the round-6 media codecs: GIF,
FLAC, and BMP round-trips over randomized shapes/contents, plus the
no-crash contract of the Arrow decode kernel on corrupted payloads —
corrupt bytes must yield an error/stub row, never an exception."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spdb_spark.functions.bmp import bmp_decode, bmp_encode
from spdb_spark.functions.flac import flac_decode, flac_encode
from spdb_spark.functions.gif import gif_decode, gif_encode, gif_frames

dims = st.integers(min_value=1, max_value=40)


@settings(max_examples=25, deadline=None)
@given(dims, dims, st.booleans(), st.integers(0, 2**32 - 1))
def test_gif_gray_roundtrip(h, w, interlace, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    assert (gif_decode(gif_encode(img, interlace=interlace)) == img).all()


@settings(max_examples=25, deadline=None)
@given(dims, dims, st.integers(2, 12), st.integers(0, 2**32 - 1))
def test_gif_animation_roundtrip(h, w, n, seed):
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(n)]
    decoded = gif_frames(gif_encode_frames_cached(frames))
    assert len(decoded) == n
    for orig, dec in zip(frames, decoded):
        assert (dec[..., 0] == orig).all()


def gif_encode_frames_cached(frames):
    from spdb_spark.functions.gif import gif_encode_frames

    return gif_encode_frames(frames)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 3000),
    st.sampled_from([1, 2, 3]),
    st.sampled_from([np.int16, np.uint8]),
    st.integers(0, 2**32 - 1),
    st.sampled_from([192, 576, 1000, 4096]),
)
def test_flac_roundtrip(n, nch, dtype, seed, blocksize):
    rng = np.random.default_rng(seed)
    if dtype is np.int16:
        x = rng.integers(-32768, 32768, (n, nch), dtype=np.int16)
        expect = x
    else:
        x = rng.integers(0, 256, (n, nch), dtype=np.uint8)
        expect = x.astype(np.int16) - 128
    out, _ = flac_decode(flac_encode(x, blocksize=blocksize))
    assert (out.astype(np.int16) == expect).all()


@settings(max_examples=25, deadline=None)
@given(dims, dims, st.sampled_from([2, 3, 4]), st.integers(0, 2**32 - 1))
def test_bmp_roundtrip(h, w, depth, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w) if depth == 2 else (h, w, depth)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    assert (bmp_decode(bmp_encode(img)) == img).all()


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=200), st.integers(0, 2**32 - 1))
def test_decode_kernel_never_raises_on_garbage(prefix_seed, seed):
    """decode_features_status either decodes, stubs, or raises ValueError
    (which the Arrow kernel converts to an error row) — any other
    exception type would kill a 100TB ingest job on one bad payload."""
    from spdb_spark.functions.multimodal import decode_features_status

    rng = np.random.default_rng(seed)
    # garbage wearing each codec's magic so every dispatch branch runs
    from spdb_spark.functions.tga import TGA_FOOTER_SIG

    for magic in (
        b"GIF89a", b"fLaC", b"BM", b"\x89PNG\r\n\x1a\n", b"\xff\xd8",
        b"II*\x00", b"MM\x00*", b"\x00\x00\x01\x00", b"qoif",
        b"RIFF" + b"\x10\x00\x00\x00" + b"WAVE",
        b"RIFF" + b"\x10\x00\x00\x00" + b"AVI ",
    ):
        payload = magic + rng.bytes(100) + prefix_seed
        try:
            _feats, status = decode_features_status(payload, 2, 4)
            assert status in ("ok", "stub")
        except ValueError:
            pass  # the kernel's contract: ValueError -> error row
    # TGA sniffs from the TRAILING footer signature, not a leading magic
    for payload in (rng.bytes(60) + b"\x00" * 8 + TGA_FOOTER_SIG,):
        try:
            _feats, status = decode_features_status(payload, 2, 4)
            assert status in ("ok", "stub")
        except ValueError:
            pass  # the kernel's contract: ValueError -> error row


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 500), st.integers(0, 2**32 - 1), st.integers(0, 199))
def test_flac_bitflip_never_passes_silently(n, seed, flip_at):
    """Any single corrupted byte inside a FLAC stream either still decodes
    to the EXACT original samples (flip hit padding) or raises — CRC-8,
    CRC-16, and the stream MD5 leave no silent-corruption window."""
    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32768, n, dtype=np.int16)
    payload = bytearray(flac_encode(x))
    payload[flip_at % len(payload)] ^= 1 + (seed % 255)
    try:
        out, _ = flac_decode(bytes(payload))
        assert (out[:, 0] == x).all()
    except ValueError:
        pass


def test_header_allocation_bombs_refused():
    """A tiny payload whose header declares 65535x65535 must raise
    ValueError BEFORE allocating the ~17 GB output buffer."""
    import struct
    import zlib

    # GIF logical screen 65535x65535
    gif = b"GIF89a" + struct.pack("<HHBBB", 65535, 65535, 0, 0, 0) + b"\x3b"
    with pytest.raises(ValueError, match="pixel budget"):
        gif_frames_import()(gif)
    # PNG IHDR 65535x65535
    ihdr = struct.pack(">IIBBBBB", 65535, 65535, 8, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00" * 4
    )
    from spdb_spark.operators.render import png_decode
    with pytest.raises(ValueError, match="pixel budget"):
        png_decode(png)
    # JPEG SOF0 65535x65535
    sof = struct.pack(">BHHB", 8, 65535, 65535, 1) + bytes([1, 0x11, 0])
    jpg = (
        b"\xff\xd8" + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
        + b"\xff\xd9"
    )
    from spdb_spark.functions.jpeg import jpeg_decode
    with pytest.raises(ValueError, match="pixel budget"):
        jpeg_decode(jpg)
    # Dispatch must NOT downgrade a budget refusal to a stub row (the
    # JPEG/BMP branches stub ordinary ValueErrors for unsupported
    # variants): the refusal surfaces so the kernel emits an error row.
    from spdb_spark.functions.limits import PixelBudgetError
    from spdb_spark.functions.multimodal import decode_features_status
    for bomb in (gif, png, jpg):
        with pytest.raises(PixelBudgetError):
            decode_features_status(bomb, 2, 3)


def gif_frames_import():
    return gif_frames


def test_png_decompression_bomb_capped():
    """An IDAT inflating far past the declared image size must not
    materialize: the inflate is capped at the header-declared byte count."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * 50_000_000, 9)  # ~48 KB compressed
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00" * 4
        + struct.pack(">I", len(bomb)) + b"IDAT" + bomb + b"\x00" * 4
    )
    from spdb_spark.operators.render import png_decode
    out = png_decode(png)  # decodes the declared 4x4, ignores the tail
    assert out.shape == (4, 4) and (out == 0).all()


def test_png_zero_dim_does_not_uncap_inflate():
    """Review r6b: w=0 made expected=0, and zlib max_length=0 means
    UNLIMITED — the bomb guard must refuse zero dims outright."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 0, 4, 8, 0, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * 50_000_000, 9)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00" * 4
        + struct.pack(">I", len(bomb)) + b"IDAT" + bomb + b"\x00" * 4
    )
    from spdb_spark.operators.render import png_decode
    with pytest.raises(ValueError, match="zero width"):
        png_decode(png)


def test_gif_animation_amplification_refused():
    """Review r6b: per-frame canvas snapshots amplify a tiny payload;
    the cumulative budget must stop it."""
    import struct

    from spdb_spark.functions.gif import lzw_encode

    w = h = 600
    out = bytearray(b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80, 0, 0))
    out += bytes(6)  # 2-entry global palette
    one = bytes([2]) + bytes([len(x := lzw_encode(b"\x00", 2))]) + x + b"\x00"
    frame = b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0) + one
    payload = bytes(out) + frame * 2000 + b"\x3b"
    assert len(payload) < 35_000
    from spdb_spark.functions.gif import gif_frames
    from spdb_spark.functions.limits import PixelBudgetError
    with pytest.raises(PixelBudgetError):
        gif_frames(payload)  # 2000 x 600x600 RGBA would be ~2.8 GB


def test_flac_sample_amplification_refused():
    """Review r6b: CONSTANT subframes expand ~15 bytes to 65536 samples;
    the cumulative sample budget must stop a total=0 stream."""
    import struct

    from spdb_spark.functions.flac import (
        _BitWriter,
        _utf8_code,
        crc8,
        crc16,
        flac_decode,
    )
    from spdb_spark.functions.limits import PixelBudgetError

    si = _BitWriter()
    si.write(65535, 16); si.write(65535, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(8000, 20); si.write(0, 3); si.write(15, 5)
    si.write(0, 36)  # total=0: unbounded stream
    info = si.bytes() + b"\x00" * 16

    def frame(idx):
        w = _BitWriter()
        w.write(0x3FFE, 14); w.write(0, 2)
        w.write(0b0111, 4); w.write(0, 4); w.write(0, 4)
        w.write(0b100, 3); w.write(0, 1)
        for b in _utf8_code(idx):
            w.write(b, 8)
        w.write(65535, 16)
        w.write(crc8(bytes(w.buf)), 8)
        w.write(0, 1); w.write(0, 6); w.write(0, 1)  # CONSTANT
        w.write(0, 16)
        w.align()
        fr = bytes(w.buf)
        return fr + struct.pack(">H", crc16(fr))

    payload = (b"fLaC" + bytes([0x80]) + struct.pack(">I", len(info))[1:]
               + info + b"".join(frame(i) for i in range(8000)))
    assert len(payload) < 160_000
    with pytest.raises(PixelBudgetError):
        flac_decode(payload)  # would be 524M samples > MAX_AUDIO_SAMPLES


@settings(max_examples=20, deadline=None)
@given(
    dims, dims,
    st.sampled_from(["none", "packbits", "lzw"]),
    st.booleans(),
    st.integers(1, 9),
    st.integers(0, 2**32 - 1),
)
def test_tiff_roundtrip_fuzz(h, w, compression, predictor, rps, seed):
    from spdb_spark.functions.tiff import tiff_decode, tiff_encode

    if predictor and compression != "lzw":
        predictor = False
    img = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    out = tiff_decode(
        tiff_encode(img, compression=compression, predictor=predictor,
                    rows_per_strip=rps)
    )
    assert (out == img).all()


@settings(max_examples=20, deadline=None)
@given(dims, dims, st.sampled_from([0, 1, 2, 3, 4]), st.integers(0, 2**32 - 1))
def test_png_unfilter_fuzz(h, w, ftype, seed):
    """Forward-filter random scanlines per the spec definition and decode
    — every filter type, every shape."""
    import struct
    import zlib

    from spdb_spark.operators.render import png_decode

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    raw = bytearray()
    prev = np.zeros(w, np.int32)
    for r in range(h):
        cur = img[r].astype(np.int32)
        a = np.concatenate([[0], cur[:-1]]) if w > 1 else np.zeros(w, np.int32)
        c = np.concatenate([[0], prev[:-1]]) if w > 1 else np.zeros(w, np.int32)
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - a
        elif ftype == 2:
            filt = cur - prev
        elif ftype == 3:
            filt = cur - ((a + prev) >> 1)
        else:
            p = a + prev - c
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a,
                            np.where(pb <= pc, prev, c))
            filt = cur - pred
        raw += bytes([ftype]) + ((filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
    assert (png_decode(payload) == img).all()


def test_oversubscribed_dht_raises_valueerror():
    """Review r6b-2: a DHT claiming more codes than a length holds must
    raise ValueError (the malformed-JPEG contract), not IndexError."""
    from spdb_spark.functions.jpeg import _build_decoder

    with pytest.raises(ValueError, match="Huffman table"):
        _build_decoder([0, 5] + [0] * 14, [1, 2, 3, 4, 5])
    with pytest.raises(ValueError, match="Huffman table"):
        _build_decoder([0, 2] + [0] * 14, [1])  # vals shorter than bits


def test_flac_long_audio_within_budget():
    """Review r6b-2: legitimate long audio must decode — the audio budget
    is 2^28 samples, far above real clips (~50 min stereo 44.1 kHz)."""
    from spdb_spark.functions.flac import flac_decode, flac_encode

    x = np.zeros((2_000_000, 2), np.int16)  # ~45 s stereo: compresses tiny
    out, _ = flac_decode(flac_encode(x))
    assert out.shape == x.shape


# --- round-6 session-3 additions: RLE BMP, tiled/planar TIFF, APNG, zip ---


@settings(max_examples=25, deadline=None)
@given(dims, dims, st.integers(0, 2**32 - 1), st.booleans())
def test_bmp_rle_roundtrip(h, w, seed, four_bit):
    from spdb_spark.functions.bmp import (
        bmp_decode,
        bmp_encode_rle4,
        bmp_encode_rle8,
    )

    rng = np.random.default_rng(seed)
    if four_bit:
        idx = rng.integers(0, 16, (h, w), dtype=np.uint8)
        assert (bmp_decode(bmp_encode_rle4(idx)) == idx * 17).all()
    else:
        img = rng.choice(np.array([0, 3, 200], np.uint8), size=(h, w))
        assert (bmp_decode(bmp_encode_rle8(img)) == img).all()


@settings(max_examples=25, deadline=None)
@given(
    dims, dims,
    st.sampled_from(["none", "packbits", "lzw"]),
    st.booleans(),
    st.sampled_from([None, (16, 16), (32, 16)]),
    st.integers(0, 2**32 - 1),
)
def test_tiff_layouts_roundtrip(h, w, compression, planar, tile, seed):
    from spdb_spark.functions.tiff import tiff_decode, tiff_encode

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = tiff_decode(
        tiff_encode(img, compression=compression, planar=planar, tile=tile)
    )
    assert (out == img).all()


@settings(max_examples=25, deadline=None)
@given(dims, dims, st.integers(1, 5), st.integers(0, 2**32 - 1))
def test_apng_roundtrip(h, w, n, seed):
    from spdb_spark.functions.apng import apng_encode, apng_frames

    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(n)]
    got = apng_frames(apng_encode(frames))
    assert len(got) == n
    for g, f in zip(got, frames):
        assert (g[..., 0] == f).all() and (g[..., 3] == 255).all()


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(0, 400), st.integers(0, 255))
def test_bitflip_rle_bmp_and_apng_contract(seed, pos, val):
    """One corrupted byte in a valid compressed payload either still
    decodes or raises ValueError — never IndexError/struct.error/hang."""
    from spdb_spark.functions.apng import apng_encode, apng_frames
    from spdb_spark.functions.bmp import bmp_decode, bmp_encode_rle8

    rng = np.random.default_rng(seed)
    img = rng.choice(np.array([0, 7, 99], np.uint8), size=(9, 11))
    for payload, decode in (
        (bmp_encode_rle8(img), bmp_decode),
        (apng_encode([img, img[::-1]]), apng_frames),
    ):
        data = bytearray(payload)
        data[pos % len(data)] ^= val or 1
        try:
            decode(bytes(data))
        except ValueError:
            pass


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(0, 2000), st.integers(0, 255))
def test_zip_parse_never_raises(seed, pos, val):
    """parse_zip_bytes returns a (possibly empty) list on ANY input —
    truncated, bit-flipped, or garbage; a raise would fail a shard task."""
    from spdb_spark.sources.zipshard import parse_zip_bytes, zip_encode

    rng = np.random.default_rng(seed)
    payload = bytearray(
        zip_encode({f"k{i}": {"txt": rng.bytes(40)} for i in range(3)})
    )
    payload[pos % len(payload)] ^= val or 1
    cut = pos % (len(payload) + 1)
    for data in (bytes(payload), bytes(payload[:cut])):
        out = parse_zip_bytes(data)
        assert isinstance(out, list)


@settings(max_examples=25, deadline=None)
@given(dims, dims, st.sampled_from([2, 3, 4]), st.integers(0, 2**32 - 1))
def test_qoi_roundtrip(h, w, depth, seed):
    from spdb_spark.functions.qoi import qoi_decode, qoi_encode

    rng = np.random.default_rng(seed)
    shape = (h, w) if depth == 2 else (h, w, depth)
    # low-cardinality values exercise INDEX/RUN; offsets exercise DIFF/LUMA
    img = (rng.integers(0, 6, shape) * 47 % 256).astype(np.uint8)
    want = np.repeat(img[:, :, None], 3, axis=2) if depth == 2 else img
    assert (qoi_decode(qoi_encode(img)) == want).all()


@settings(max_examples=25, deadline=None)
@given(dims, dims, st.sampled_from([2, 3, 4]), st.booleans(),
       st.integers(0, 2**32 - 1))
def test_tga_roundtrip(h, w, depth, rle, seed):
    from spdb_spark.functions.tga import tga_decode, tga_encode

    rng = np.random.default_rng(seed)
    shape = (h, w) if depth == 2 else (h, w, depth)
    img = (rng.integers(0, 5, shape) * 61 % 256).astype(np.uint8)
    assert (tga_decode(tga_encode(img, rle=rle)) == img).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(0, 2000), st.integers(1, 255))
def test_qoi_tga_bitflip_never_crashes(seed, pos, val):
    """A corrupted QOI/TGA payload must decode, stub, or ValueError —
    never index out of range or return a wrong-shaped array silently."""
    from spdb_spark.functions.qoi import qoi_decode, qoi_encode
    from spdb_spark.functions.tga import tga_decode, tga_encode

    rng = np.random.default_rng(seed)
    img = (rng.integers(0, 6, (9, 11, 3)) * 43 % 256).astype(np.uint8)
    for enc, dec in ((qoi_encode, qoi_decode), (tga_encode, tga_decode)):
        payload = bytearray(enc(img))
        payload[pos % len(payload)] ^= val
        cut = pos % (len(payload) + 1)
        for data in (bytes(payload), bytes(payload[:cut])):
            try:
                out = dec(data)
                assert out.ndim in (2, 3)
            except ValueError:
                pass
            except OverflowError:
                pass  # header field corrupted to an absurd size


def test_fingerprint_kernels_rowsify_corrupt_payloads(spark):
    """image_phash / video_phashes / audio_fingerprints consume corrupt
    payloads as stub/error ROWS through the actual Spark kernels — one
    output row per input, never an exception that would fail a whole
    Arrow batch of good media on one bad payload."""
    from spdb_spark.functions.afp import audio_fingerprints
    from spdb_spark.functions.audio import wav_encode
    from spdb_spark.functions.phash import image_phash, video_phashes
    from spdb_spark.functions.qoi import qoi_encode
    from spdb_spark.functions.video import avi_encode_dib

    rng = np.random.default_rng(3)
    img = (rng.integers(0, 6, (9, 11, 3)) * 43 % 256).astype(np.uint8)
    pcm = rng.integers(-2000, 2000, 4096).astype(np.int16)
    bases = [
        qoi_encode(img),
        avi_encode_dib([img[:, :, 0], img[:, :, 1]]),
        wav_encode(pcm, sample_rate=8000),
    ]
    payloads = []
    for base in bases:
        payloads.append(base)  # intact
        for k in range(8):  # bit flips across the payload
            data = bytearray(base)
            data[(k * len(data)) // 8] ^= 0x40 | k
            payloads.append(bytes(data))
        for k in range(1, 5):  # truncations
            payloads.append(base[: (k * len(base)) // 5])
    payloads += [rng.bytes(n) for n in (0, 1, 13, 300)]  # pure garbage

    rows = [(i, bytearray(p)) for i, p in enumerate(payloads)]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    n = len(payloads)
    for kernel in (image_phash, video_phashes, audio_fingerprints):
        out = kernel(media).collect()
        assert len(out) == n, kernel.__name__
        for r in out:
            assert r["status"] == "ok" or r["status"] == "stub" or r[
                "status"
            ].startswith("error"), (kernel.__name__, r["status"])


@settings(max_examples=25, deadline=None)
@given(
    dims,
    dims,
    st.sampled_from(
        [
            {},
            {"subtract_green": True},
            {"cache_bits": 4},
            {"lz77_runs": True},
            {"subtract_green": True, "cache_bits": 5, "lz77_runs": True},
            {"predictor": 7},
            {"palette": True},
        ]
    ),
    st.integers(0, 2**32 - 1),
)
def test_webp_vp8l_roundtrip(h, w, kw, seed):
    from spdb_spark.functions.webp import vp8l_encode, webp_decode

    rng = np.random.default_rng(seed)
    if kw.get("palette"):
        vals = np.array([0, 90, 200, 255], np.uint8)
        img = vals[rng.integers(0, 4, (h, w))]
        img = np.stack([img, img // 2, 255 - img], axis=-1)
    else:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = webp_decode(vp8l_encode(img, **kw))
    assert np.array_equal(out, img)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(0, 10_000))
def test_webp_bitflip_never_crashes(seed, flip_pos):
    """A corrupted VP8L stream must raise ValueError or decode to SOME
    array — never hang, never raise anything else (the kernel error-row
    contract)."""
    from spdb_spark.functions.limits import PixelBudgetError
    from spdb_spark.functions.webp import vp8l_encode, webp_decode

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
    buf = bytearray(vp8l_encode(img, subtract_green=True, cache_bits=4))
    pos = 12 + flip_pos % (len(buf) - 12)  # keep the RIFF magic intact
    buf[pos] ^= 1 << (seed % 8)
    try:
        webp_decode(bytes(buf))
    except (ValueError, PixelBudgetError):
        pass
