"""TFRecord framing (CRC-32C + masked CRC), tf.train.Example wire codec,
and the shard writer round-trip."""

import struct

import pytest
from hypothesis import given
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spdb_spark.sources.tfrecord import (
    crc32c,
    masked_crc32c,
    tf_example_decode,
    tf_example_encode,
    tfrecord_encode,
    tfrecord_iter,
    tfrecord_members,
    write_tfrecord_shards,
)

# --- CRC-32C ---------------------------------------------------------------


def _crc32c_bytewise(data: bytes) -> int:
    """Independent per-byte reference (textbook reflected CRC) the
    slicing-by-8 production path is pinned against."""
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ (0x82F63B78 if crc & 1 else 0)
    return crc ^ 0xFFFFFFFF


def test_crc32c_check_vector():
    # The published CRC-32C check value ("123456789" -> 0xE3069283).
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_crc32c_known_vectors():
    # RFC 3720 appendix B.4 test patterns.
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    assert crc32c(bytes(range(32))) == 0x46DD794E


@given(st.binary(max_size=300))
def test_crc32c_matches_bytewise_reference(data):
    assert crc32c(data) == _crc32c_bytewise(data)


def test_masked_crc_formula():
    data = b"hello tfrecord"
    crc = crc32c(data)
    expect = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert masked_crc32c(data) == expect


# --- framing ---------------------------------------------------------------


def test_tfrecord_roundtrip():
    payloads = [b"", b"a", b"x" * 1000, bytes(range(256))]
    buf = tfrecord_encode(payloads)
    out = list(tfrecord_iter(buf))
    assert out == list(enumerate(payloads))


def test_data_crc_flip_skips_only_that_record():
    payloads = [b"aaaa", b"bbbb", b"cccc"]
    buf = bytearray(tfrecord_encode(payloads))
    # Flip a byte inside record 1's data (offset: rec0 = 12+4+4 = 20).
    buf[20 + 12] ^= 0xFF
    out = list(tfrecord_iter(bytes(buf)))
    assert [i for i, _ in out] == [0, 2]
    assert [d for _, d in out] == [b"aaaa", b"cccc"]


def test_length_crc_flip_stops_walk():
    payloads = [b"aaaa", b"bbbb"]
    buf = bytearray(tfrecord_encode(payloads))
    buf[0] ^= 0xFF  # corrupt record 0's length header
    assert list(tfrecord_iter(bytes(buf))) == []


def test_truncated_tail_dropped():
    buf = tfrecord_encode([b"aaaa", b"bbbb"])
    out = list(tfrecord_iter(buf[:-3]))
    assert out == [(0, b"aaaa")]


def test_length_bomb_refused():
    header = struct.pack("<Q", 1 << 40)  # claims 1 TiB
    bomb = header + struct.pack("<I", masked_crc32c(header)) + b"xx"
    assert list(tfrecord_iter(bomb)) == []


# --- tf.train.Example wire codec -------------------------------------------


def test_example_pinned_bytes():
    # {"a": [1]} encoded by hand from the protobuf wire spec:
    # Int64List(packed [1]) = 0a 01 01; Feature = 1a 03 <that>;
    # map entry = key ("a") + value; Features; Example.
    assert tf_example_encode({"a": [1]}).hex() == "0a0c0a0a0a016112051a030a0101"


def test_example_roundtrip_all_types():
    feats = {
        "text": [b"hello", b"", b"\x00\xff"],
        "ids": [0, 1, -1, 2**62, -(2**62)],
        "weights": [0.5, -2.25, 0.0],
    }
    out = tf_example_decode(tf_example_encode(feats))
    assert out["text"] == feats["text"]
    assert out["ids"] == feats["ids"]
    assert out["weights"] == feats["weights"]


def test_example_deterministic_key_order():
    a = tf_example_encode({"b": [1], "a": [2]})
    b = tf_example_encode({"a": [2], "b": [1]})
    assert a == b


def test_example_accepts_unpacked_int64():
    # Hand-build an UNPACKED Int64List ([3, 5]): field 1, wire 0, twice.
    int64_list = bytes([0x08, 0x03, 0x08, 0x05])
    feature = bytes([0x1A, len(int64_list)]) + int64_list
    entry = bytes([0x0A, 0x01]) + b"k" + bytes([0x12, len(feature)]) + feature
    features = bytes([0x0A, len(entry)]) + entry
    example = bytes([0x0A, len(features)]) + features
    assert tf_example_decode(example) == {"k": [3, 5]}


def test_example_skips_unknown_fields():
    base = tf_example_encode({"a": [7]})
    # Append an unknown varint field (tag 99, wire 0) at Example level;
    # the tag (99 << 3 = 792) itself needs two varint bytes.
    extended = base + bytes([0x98, 0x06, 0x2A])
    assert tf_example_decode(extended) == {"a": [7]}


def test_example_rejects_empty_and_bool():
    with pytest.raises(ValueError):
        tf_example_encode({"a": []})
    with pytest.raises(ValueError):
        tf_example_encode({"a": [True]})


def _example_with_feature_body(body: bytes) -> bytes:
    """Wrap a hand-built Feature message body into a full Example."""
    feature = body
    entry = bytes([0x0A, 0x01]) + b"k" + bytes([0x12, len(feature)]) + feature
    features = bytes([0x0A, len(entry)]) + entry
    return bytes([0x0A, len(features)]) + features


def test_malformed_payloads_raise_valueerror_not_struct_error():
    """CRC-valid but malformed Example payloads must surface the
    module's uniform ValueError contract (the dirty-corpus policy),
    never a raw struct.error/IndexError from the decode kernel."""
    # BytesList whose declared value length overruns the buffer:
    # bytes_list(field 1, wire 2, len 3) -> value claims 9 bytes, has 1
    bad_bytes = bytes([0x0A, 0x03, 0x0A, 0x09]) + b"x"
    with pytest.raises(ValueError):
        tf_example_decode(_example_with_feature_body(bad_bytes))
    # packed FloatList with a 3-byte (non-multiple-of-4) payload
    bad_float = bytes([0x12, 0x05, 0x0A, 0x03, 0x01, 0x02, 0x03])
    with pytest.raises(ValueError):
        tf_example_decode(_example_with_feature_body(bad_float))
    # unpacked float claimed via an illegal wire type (varint)
    bad_wire = bytes([0x12, 0x02, 0x08, 0x01])
    with pytest.raises(ValueError):
        tf_example_decode(_example_with_feature_body(bad_wire))
    # int64 value with an illegal fixed64 wire type
    bad_int = bytes([0x1A, 0x0A, 0x09]) + bytes(8)
    with pytest.raises(ValueError):
        tf_example_decode(_example_with_feature_body(bad_int))


@given(
    st.dictionaries(
        st.text(min_size=1, max_size=8),
        st.one_of(
            st.lists(st.binary(max_size=40), min_size=1, max_size=5),
            st.lists(
                st.integers(min_value=-(2**63), max_value=2**63 - 1),
                min_size=1,
                max_size=5,
            ),
        ),
        max_size=4,
    )
)
def test_example_roundtrip_fuzz(feats):
    assert tf_example_decode(tf_example_encode(feats)) == feats


# --- Spark shard round-trip -------------------------------------------------


def test_write_and_read_shards(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"doc number {i} é") for i in range(37)],
        "doc_id long, text string",
    )
    out = str(tmp_path / "tfr")
    manifest = write_tfrecord_shards(docs, out, docs_per_shard=10)
    files = {r.path for r in manifest.collect()}
    assert len(files) == 4

    raw = spark.read.format("binaryFile").load(out + "/shard-*.tfrecord")
    members = tfrecord_members(raw.select(F.col("path"), "content"))
    rows = members.collect()
    assert len(rows) == 37
    decoded = {}
    for r in rows:
        feats = tf_example_decode(bytes(r.payload))
        decoded[feats["doc_id"][0]] = feats["text"][0].decode("utf-8")
    assert decoded == {i: f"doc number {i} é" for i in range(37)}

    # Byte-identical re-run (the export determinism contract).
    manifest2 = write_tfrecord_shards(docs, out, docs_per_shard=10)
    assert sorted((r.path, r.md5) for r in manifest.collect()) == sorted(
        (r.path, r.md5) for r in manifest2.collect()
    )
