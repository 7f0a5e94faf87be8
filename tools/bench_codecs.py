"""Single-core decode/probe throughput for the dependency-free codecs.

Usage: python tools/bench_codecs.py [--quick]

Prints MB/s (payload bytes per decode second) and items/s per codec, at
shapes typical of training corpora. These are the per-task numbers that
size a 100 TB multimodal ingest: executors run the identical kernels in
Arrow batches, so cluster throughput ~= cores x these rates x (1 -
scheduling overhead). The probe row shows why prune-before-decode wins —
header metadata costs microseconds against milliseconds per decode.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, payloads, min_s=0.4):
    n, t0 = 0, time.perf_counter()
    while True:
        for p in payloads:
            fn(p)
        n += len(payloads)
        dt = time.perf_counter() - t0
        if dt >= min_s:
            return n / dt, sum(len(p) for p in payloads) * (n / len(payloads)) / dt / 1e6


def main():
    quick = "--quick" in sys.argv
    rng = np.random.default_rng(0)
    side = 128 if quick else 256
    img = rng.integers(0, 256, (side, side), dtype=np.uint8)
    smooth = (
        np.cumsum(rng.integers(0, 3, (side, side), dtype=np.uint8), axis=1) % 256
    ).astype(np.uint8)
    pcm = rng.integers(-32768, 32768, 16000 if quick else 80000, dtype=np.int16)

    from spdb_spark.functions.audio import audio_frame_features, wav_encode
    from spdb_spark.functions.bmp import bmp_decode, bmp_encode
    from spdb_spark.functions.flac import flac_decode, flac_encode
    from spdb_spark.functions.gif import gif_decode, gif_encode
    from spdb_spark.functions.jpeg import jpeg_decode, jpeg_encode
    from spdb_spark.functions.probe import probe_payload
    from spdb_spark.functions.tiff import tiff_decode, tiff_encode
    from spdb_spark.operators.render import png_decode, png_encode

    cases = [
        ("png/gray random", png_decode, [png_encode(img)]),
        ("png/gray smooth", png_decode, [png_encode(smooth)]),
        ("jpeg/baseline q85", jpeg_decode, [jpeg_encode(img, quality=85)]),
        ("jpeg/progressive q85", jpeg_decode,
         [jpeg_encode(img, quality=85, progressive=True)]),
        ("gif/gray", gif_decode, [gif_encode(img)]),
        ("bmp/gray", bmp_decode, [bmp_encode(img)]),
        ("tiff/packbits", tiff_decode, [tiff_encode(smooth, compression="packbits")]),
        ("tiff/lzw+pred", tiff_decode,
         [tiff_encode(smooth, compression="lzw", predictor=True)]),
        ("wav/pcm16 features", lambda p: audio_frame_features(p, 4, 8),
         [wav_encode(pcm)]),
        ("flac decode", lambda p: flac_decode(p), [flac_encode(pcm)]),
    ]
    from spdb_spark.functions.apng import apng_encode, apng_frames
    from spdb_spark.functions.bmp import bmp_encode_rle8

    frames = [np.roll(smooth, i, axis=1) for i in range(4)]
    cases += [
        ("bmp/rle8 smooth", bmp_decode, [bmp_encode_rle8(smooth)]),
        ("tiff/tiled lzw", tiff_decode,
         [tiff_encode(smooth, tile=(64, 64), compression="lzw")]),
        ("apng 4-frame", apng_frames, [apng_encode(frames)]),
    ]
    from spdb_spark.functions.qoi import qoi_decode, qoi_encode
    from spdb_spark.functions.tga import tga_decode, tga_encode

    rgb_smooth = np.stack([smooth, np.roll(smooth, 1, 1), smooth.T], axis=2)
    cases += [
        ("qoi/rgb smooth", qoi_decode, [qoi_encode(rgb_smooth)]),
        ("tga/rgb raw", tga_decode, [tga_encode(rgb_smooth)]),
        ("tga/rgb rle", tga_decode, [tga_encode(rgb_smooth, rle=True)]),
    ]
    from spdb_spark.functions.afp import afp_doc_signature, band_energies
    from spdb_spark.functions.audio import wav_decode
    from spdb_spark.functions.phash import decode_image_any, phash64

    def _afp(p):
        samples, sr = wav_decode(p)
        return afp_doc_signature(band_energies(samples, sr))

    cases += [
        ("phash (png decode + DCT)", lambda p: phash64(decode_image_any(p)),
         [png_encode(smooth)]),
        ("audio fingerprint (wav)", _afp, [wav_encode(pcm)]),
    ]
    all_payloads = [ps[0] for _, _, ps in cases]
    cases.append(("probe (all of the above)", lambda p: probe_payload(p), all_payloads))

    print(f"{'case':26} {'items/s':>10} {'MB/s':>8}  payload")
    for name, fn, payloads in cases:
        ips, mbs = _time(fn, payloads)
        print(f"{name:26} {ips:10.1f} {mbs:8.2f}  {len(payloads[0])} B")


if __name__ == "__main__":
    main()
