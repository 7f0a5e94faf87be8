"""Streaming image dedup: pairs accumulated over micro-batches must
equal the full batch pHash pipeline on the union of all batches, a
redelivered batch must not change the output (exactly-once), and the
sink must run off a real file-source stream."""

import numpy as np
from pyspark.sql import functions as F

from spdb_spark.functions.phash import (
    image_phash,
    phash_neardup_pairs,
    synthetic_image_dup_payloads,
)
from spdb_spark.streaming.imagededup import StreamingImageDedup


def _media(spark, lo: int, hi: int):
    """Deterministic media rows: class = id % 5, rotating lossless
    formats — duplicates exist within AND across batch boundaries."""
    ids = spark.range(lo, hi).select(F.col("id").alias("doc_id"))
    return synthetic_image_dup_payloads(ids, "doc_id", n_classes=5)


def _unordered(rows):
    return {(min(r.id_a, r.id_b), max(r.id_a, r.id_b)): r.hamming for r in rows}


def test_stream_matches_batch_and_redelivery(spark, tmp_path):
    full = _media(spark, 0, 30)
    expected = _unordered(
        phash_neardup_pairs(image_phash(full)).collect()
    )
    assert len(expected) == 5 * 15  # C(6,2) per class x 5 classes

    sink = StreamingImageDedup(spark, str(tmp_path / "idx"))
    for i, (lo, hi) in enumerate(((0, 10), (10, 20), (20, 30))):
        sink.process_batch(_media(spark, lo, hi), i)
    got = _unordered(sink.pairs().collect())
    assert got == expected

    # crash redelivery: reprocessing a committed batch changes nothing
    sink.process_batch(_media(spark, 10, 20), 1)
    assert _unordered(sink.pairs().collect()) == expected
    assert sink.signatures().count() == 30


def test_real_stream_file_source(spark, tmp_path):
    src = tmp_path / "media_src"
    src.mkdir()
    _media(spark, 0, 12).coalesce(1).write.parquet(str(src / "p1"))

    sink = StreamingImageDedup(spark, str(tmp_path / "sidx"))
    schema = "media_id long, payload binary"
    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    q = sink.start(stream, str(tmp_path / "ckpt"), availableNow=True)
    q.awaitTermination(120)

    expected = _unordered(
        phash_neardup_pairs(image_phash(_media(spark, 0, 12))).collect()
    )
    assert _unordered(sink.pairs().collect()) == expected

    # incremental second shard: only new/cross pairs appear, none lost
    _media(spark, 12, 18).coalesce(1).write.parquet(str(src / "p2"))
    q = sink.start(stream, str(tmp_path / "ckpt"), availableNow=True)
    q.awaitTermination(120)
    expected2 = _unordered(
        phash_neardup_pairs(image_phash(_media(spark, 0, 18))).collect()
    )
    assert _unordered(sink.pairs().collect()) == expected2


def test_pluggable_hasher_dedups_audio(spark, tmp_path):
    """The same sink dedups audio when handed the fingerprint kernel:
    signatures are just 64-bit longs to the index/pair machinery."""
    from spdb_spark.functions.afp import (
        audio_fingerprints,
        synthetic_audio_dup_payloads,
    )

    def audio_hasher(df, id_col, payload_col):
        return audio_fingerprints(df, id_col, payload_col).select(
            F.col(id_col), F.col("afp_sig").alias("phash"), "status"
        )

    def media(lo, hi):
        ids = spark.range(lo, hi).select(F.col("id").alias("media_id"))
        return synthetic_audio_dup_payloads(ids, "media_id", n_classes=3)

    sink = StreamingImageDedup(
        spark, str(tmp_path / "aidx"), hasher=audio_hasher
    )
    sink.process_batch(media(0, 6), 0)
    sink.process_batch(media(6, 12), 1)
    got = _unordered(sink.pairs().collect())
    want = {
        (a, b): 0
        for a in range(12)
        for b in range(a + 1, 12)
        if a % 3 == b % 3
    }
    assert got == want
