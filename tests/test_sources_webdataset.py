"""WebDataset source (sources/webdataset.py): shard round-trips (plain +
gzip), multi-dot keys, truncated-tail survival, sample assembly, the
documents entry point, and the multimodal composition — a .tar shard of
JPEG+txt pairs flowing into the REAL image decode kernel."""

import numpy as np
from pyspark.sql import functions as F

from spdb_spark.sources.webdataset import (
    ingest_webdataset,
    parse_wds_bytes,
    wds_encode,
    webdataset_samples,
    webdataset_to_docs,
)


def _samples():
    return {
        "000000": {"txt": b"a caption about a cat", "json": b'{"id": 0}'},
        "000001": {"txt": b"a caption about a dog", "json": b'{"id": 1}'},
        "sub/000002": {"txt": b"nested sample text", "seg.png": b"\x89PNGfake"},
    }


class TestParser:
    def test_roundtrip_plain_and_gzip(self):
        want = _samples()
        for compress in (False, True):
            got = parse_wds_bytes(wds_encode(want, compress=compress))
            as_dict = {}
            for key, ext, payload in got:
                as_dict.setdefault(key, {})[ext] = payload
            assert as_dict == want

    def test_multidot_ext_splits_at_first_dot(self):
        got = parse_wds_bytes(wds_encode(_samples()))
        exts = {ext for _k, ext, _p in got}
        assert "seg.png" in exts  # ext keeps everything after the FIRST dot
        keys = {k for k, _e, _p in got}
        assert "sub/000002" in keys  # directory prefix stays in the key

    def test_truncated_tail_keeps_walked_members(self):
        blob = wds_encode(_samples())
        got = parse_wds_bytes(blob[: len(blob) // 2])
        assert 0 < len(got) < 6  # prefix members survive, no exception


class TestIngest:
    def test_members_and_samples(self, spark, tmp_path):
        p = tmp_path / "shards"
        p.mkdir()
        (p / "shard-0000.tar").write_bytes(wds_encode(_samples()))
        (p / "shard-0001.tar.gz").write_bytes(
            wds_encode({"x": {"txt": b"second shard"}}, compress=True)
        )
        members = ingest_webdataset(spark, str(p))
        assert members.count() == 7
        samples = webdataset_samples(members)
        rows = {r.key: r for r in samples.collect()}
        assert len(rows) == 4
        assert rows["000000"].exts == ["json", "txt"]
        assert bytes(rows["000000"].payloads["txt"]) == b"a caption about a cat"
        assert rows["000000"].n_files == 2
        # exactly ONE exchange in the assembly plan (final AQE section —
        # the printed string repeats the pre-adaptive plan below it)
        plan = samples._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert final.count("Exchange") == 1

    def test_to_docs_contract_and_id_invariance(self, spark, tmp_path):
        p = tmp_path / "shards2"
        p.mkdir()
        (p / "s.tar").write_bytes(wds_encode(_samples()))
        docs = webdataset_to_docs(ingest_webdataset(spark, str(p)))
        rows = docs.collect()
        assert {r.text for r in rows} == {
            "a caption about a cat",
            "a caption about a dog",
            "nested sample text",
        }
        assert set(docs.columns) == {"doc_id", "text", "lang", "source", "n_chars"}
        again = {
            r.source: r.doc_id
            for r in webdataset_to_docs(
                ingest_webdataset(spark, str(p)).repartition(5)
            ).collect()
        }
        assert again == {r.source: r.doc_id for r in rows}

    def test_multimodal_shard_feeds_real_decode(self, spark, tmp_path):
        """The actual WebDataset use case: image+caption shards. JPEG
        payloads from the shard flow through extract_frame_features and
        decode for REAL (status='ok'), keyed back to their captions."""
        from spdb_spark.functions.jpeg import jpeg_encode
        from spdb_spark.functions.multimodal import extract_frame_features

        rng = np.random.default_rng(7)
        shard = {}
        for i in range(3):
            img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
            shard[f"{i:06d}"] = {
                "jpg": jpeg_encode(img, quality=90, progressive=bool(i % 2)),
                "txt": f"caption {i}".encode(),
            }
        p = tmp_path / "shards3"
        p.mkdir()
        (p / "img.tar").write_bytes(wds_encode(shard))
        members = ingest_webdataset(spark, str(p))
        media = (
            members.where(F.col("ext") == "jpg")
            .select(
                F.abs(F.xxhash64("key")).alias("media_id"),
                F.col("payload"),
            )
        )
        rows = extract_frame_features(media, n_frames=2, dim=4).collect()
        assert len(rows) == 6
        assert all(r.status == "ok" for r in rows)  # SOF0 and SOF2 both real


def test_duplicate_members_last_wins():
    """Review r6: tar legally repeats member names (tar --append); the
    LAST member must win (tar extraction semantics) and the sample map
    assembly must not abort on a duplicated map key."""
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for payload in (b"old caption", b"new caption"):
            info = tarfile.TarInfo(name="000.txt")
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    got = parse_wds_bytes(buf.getvalue())
    assert got == [("000", "txt", b"new caption")]


def test_duplicate_members_through_samples(spark, tmp_path):
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, payload in (
            ("000.txt", b"v1"),
            ("000.jpg", b"img"),
            ("000.txt", b"v2"),
        ):
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    p = tmp_path / "dups"
    p.mkdir()
    (p / "s.tar").write_bytes(buf.getvalue())
    rows = webdataset_samples(ingest_webdataset(spark, str(p))).collect()
    assert len(rows) == 1
    assert bytes(rows[0].payloads["txt"]) == b"v2"
    assert rows[0].n_files == 2


def test_mixed_codec_shard_feeds_all_new_decoders(spark, tmp_path):
    """Round-6 codecs through the shard path: one .tar holding GIF, BMP,
    FLAC, and WAV members all decode for REAL (status='ok'), and the
    lossless twins (GIF/BMP vs PNG, FLAC vs WAV) featurize identically."""
    from spdb_spark.functions.audio import wav_encode
    from spdb_spark.functions.bmp import bmp_encode
    from spdb_spark.functions.flac import flac_encode
    from spdb_spark.functions.gif import gif_encode
    from spdb_spark.functions.multimodal import extract_frame_features
    from spdb_spark.operators.render import png_encode

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (20, 20), dtype=np.uint8)
    pcm = rng.integers(-32768, 32768, 1200, dtype=np.int16)
    shard = {
        "000000": {"gif": gif_encode(img), "png": png_encode(img),
                   "bmp": bmp_encode(img)},
        "000001": {"flac": flac_encode(pcm), "wav": wav_encode(pcm)},
    }
    p = tmp_path / "shards_mixed"
    p.mkdir()
    (p / "mixed.tar").write_bytes(wds_encode(shard))
    members = ingest_webdataset(spark, str(p))
    media = members.select(
        F.abs(F.xxhash64("key", "ext")).alias("media_id"),
        F.col("ext"),
        F.col("payload"),
    )
    rows = extract_frame_features(media, n_frames=2, dim=4).collect()
    assert len(rows) == 10 and all(r.status == "ok" for r in rows)
    ext_of = {r.media_id: r.ext for r in media.collect()}
    feats = {}
    for r in rows:
        feats.setdefault(ext_of[r.media_id], {})[r.frame_idx] = r.feature
    assert feats["gif"] == feats["png"] == feats["bmp"]
    assert feats["flac"] == feats["wav"]


def test_xz_and_bz2_shards():
    import bz2
    import lzma

    from spdb_spark.sources.webdataset import parse_wds_bytes, wds_encode

    samples = {"a": {"txt": b"alpha"}, "b": {"txt": b"beta"}}
    raw = wds_encode(samples)
    want = sorted(parse_wds_bytes(raw))
    assert sorted(parse_wds_bytes(lzma.compress(raw))) == want
    assert sorted(parse_wds_bytes(bz2.compress(raw))) == want
    # corrupt compressed shards skip, never raise
    assert parse_wds_bytes(b"\xfd7zXZ\x00" + b"junk") == []
    assert parse_wds_bytes(b"BZhjunk") == []


def test_shard_ratio_bomb_skipped(monkeypatch):
    import lzma

    import spdb_spark.sources.webdataset as wds

    bomb = lzma.compress(b"\x00" * (4 << 20))  # 4 MiB of zeros, ~KB payload
    monkeypatch.setattr(wds, "MAX_SHARD_BYTES", 1 << 20)
    assert wds.parse_wds_bytes(bomb) == []
    # gzip flavor through the member loop
    import gzip as _gzip

    gz = _gzip.compress(b"\x00" * (4 << 20))
    assert wds.parse_wds_bytes(gz) == []
