"""ZIP-shard source tests: round-trips, shared downstream assembly with
the WebDataset surface, directory-less recovery of truncated shards,
and hostile-member handling."""

import struct
import zipfile

import pytest

from spdb_spark.sources.zipshard import (
    ingest_zipshard,
    parse_zip_bytes,
    zip_encode,
)

SAMPLES = {
    "000000": {"txt": b"a first document with words", "json": b"{}"},
    "000001": {"txt": b"second doc text", "png": b"\x89PNG fake"},
    "dir/000002": {"txt": b"nested key doc"},
}


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip(compress):
    got = parse_zip_bytes(zip_encode(SAMPLES, compress=compress))
    want = {
        (k, e): p for k, exts in SAMPLES.items() for e, p in exts.items()
    }
    assert {(k, e): p for k, e, p in got} == want


def test_key_ext_convention():
    data = zip_encode({"a/b/000123": {"seg.png": b"x"}})
    [(key, ext, _)] = parse_zip_bytes(data)
    assert (key, ext) == ("a/b/000123", "seg.png")  # first-dot split


def test_duplicate_member_last_wins():
    import io

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("k.txt", b"old")
        zf.writestr("k.txt", b"new")
    got = parse_zip_bytes(buf.getvalue())
    assert got == [("k", "txt", b"new")]


def test_truncated_shard_recovers_complete_members():
    data = zip_encode(SAMPLES, compress=True)
    # cut mid-way: central directory gone, some members incomplete
    eocd = data.rfind(b"PK\x05\x06")
    assert eocd > 0
    for cut in (eocd, eocd - 10, len(data) * 2 // 3):
        got = parse_zip_bytes(data[:cut])
        full = {(k, e): p for k, e, p in parse_zip_bytes(data)}
        # every recovered member is byte-correct, none invented
        for k, e, p in got:
            assert full[(k, e)] == p
    # cutting at the directory start loses nothing member-wise (5 members)
    assert len(parse_zip_bytes(data[:eocd_start(data)])) == 5


def eocd_start(data: bytes) -> int:
    return data.rfind(b"PK\x01\x02")  # first central-directory record


def test_bomb_guard_skips_oversized_members():
    data = zip_encode({"big": {"txt": b"x" * 500}, "ok": {"txt": b"y" * 10}})
    got = parse_zip_bytes(data, max_member_bytes=100)
    assert [(k, e) for k, e, _ in got] == [("ok", "txt")]
    # fallback path enforces the same cap
    got2 = parse_zip_bytes(data[: eocd_start(data)], max_member_bytes=100)
    assert [(k, e) for k, e, _ in got2] == [("ok", "txt")]


def test_encrypted_member_skipped_in_fallback():
    # hand-build a local header with the encryption flag set
    name = b"secret.txt"
    body = b"payl"
    hdr = (
        b"PK\x03\x04"
        + struct.pack(
            "<HHHHHIIIHH", 20, 0x1, 0, 0, 0,
            0, len(body), len(body), len(name), 0,
        )
        + name
        + body
    )
    assert parse_zip_bytes(hdr) == []


def test_garbage_and_empty():
    assert parse_zip_bytes(b"") == []
    assert parse_zip_bytes(b"not a zip at all") == []
    assert parse_zip_bytes(b"PK\x03\x04" + b"\x00" * 10) == []


def test_spark_ingest_feeds_webdataset_assembly(spark, tmp_path):
    from spdb_spark.sources.webdataset import (
        webdataset_samples,
        webdataset_to_docs,
    )

    (tmp_path / "s0.zip").write_bytes(zip_encode(SAMPLES))
    (tmp_path / "s1.zip").write_bytes(
        zip_encode({"000009": {"txt": b"from the second shard"}}, compress=False)
    )
    members = ingest_zipshard(spark, str(tmp_path))
    assert members.count() == 6
    samples = webdataset_samples(members)
    rows = {r["key"]: r for r in samples.collect()}
    assert rows["000000"]["exts"] == ["json", "txt"]
    assert rows["000000"]["payloads"]["txt"] == bytearray(
        b"a first document with words"
    )
    docs = webdataset_to_docs(members)
    assert docs.count() == 4
    assert {r["text"] for r in docs.collect()} >= {
        "a first document with words",
        "from the second shard",
    }


def test_partial_directory_merges_local_header_recovery():
    # a flipped EOCD size field leaves a 1-entry directory that opens but
    # whose entry is unreadable — recovery must still yield all members
    data = bytearray(
        zip_encode({f"{i}": {"txt": b"doc %d words" % i} for i in range(4)})
    )
    data[-10] ^= 0xFF  # cd_size byte in the end-of-central-directory
    got = parse_zip_bytes(bytes(data))
    assert sorted(k for k, _, _ in got) == ["0", "1", "2", "3"]
