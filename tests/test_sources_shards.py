"""Shard-export tests: ingest round-trips, sample integrity,
byte-deterministic re-runs, atomicity, manifest correctness."""

import glob
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from spdb_spark.sources.shards import write_jsonl_shards, write_webdataset_shards


def _members_df(spark, n=23):
    rows = []
    for i in range(n):
        rows.append((f"{i:04d}", "txt", bytearray(f"text {i} body".encode())))
        rows.append((f"{i:04d}", "json", bytearray(b'{"k":%d}' % i)))
    return spark.createDataFrame(rows, "key string, ext string, payload binary")


@pytest.mark.parametrize(
    "container,compress", [("tar", False), ("tar", True), ("zip", False), ("zip", True)]
)
def test_roundtrip_through_ingest(spark, tmp_path, container, compress):
    from spdb_spark.sources.webdataset import ingest_webdataset
    from spdb_spark.sources.zipshard import ingest_zipshard

    members = _members_df(spark)
    out = str(tmp_path / "out")
    manifest = write_webdataset_shards(
        members, out, samples_per_shard=7, container=container, compress=compress
    )
    m = manifest.collect()
    assert sum(r["n_samples"] for r in m) == 23
    assert sum(r["n_members"] for r in m) == 46
    ingest = ingest_webdataset if container == "tar" else ingest_zipshard
    pattern = out  # both ingests glob a directory
    back = ingest(spark, pattern).select("key", "ext", "payload")
    want = {(r["key"], r["ext"]): bytes(r["payload"]) for r in members.collect()}
    got = {(r["key"], r["ext"]): bytes(r["payload"]) for r in back.collect()}
    # the manifest parquet dir lives beside the shards; ingest must not
    # have picked up stray non-shard rows
    assert got == want
    # manifest md5 matches the bytes on disk
    for r in m:
        assert hashlib.md5(open(r["path"], "rb").read()).hexdigest() == r["md5"]
    assert not glob.glob(os.path.join(out, ".tmp-*"))


def test_samples_never_split_across_shards(spark, tmp_path):
    members = _members_df(spark, 40)
    out = str(tmp_path / "out")
    write_webdataset_shards(members, out, samples_per_shard=5)
    from spdb_spark.sources.webdataset import parse_wds_bytes

    seen = {}
    for path in glob.glob(os.path.join(out, "shard-*.tar")):
        for key, _ext, _p in parse_wds_bytes(open(path, "rb").read()):
            seen.setdefault(key, set()).add(path)
    assert all(len(paths) == 1 for paths in seen.values())
    assert len(seen) == 40


def test_byte_deterministic_rerun_any_partitioning(spark, tmp_path):
    members = _members_df(spark)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    ma = write_webdataset_shards(members, a, samples_per_shard=6, compress=True)
    mb = write_webdataset_shards(
        members.repartition(13), b, samples_per_shard=6, compress=True
    )
    da = {r["shard_id"]: r["md5"] for r in ma.collect()}
    db = {r["shard_id"]: r["md5"] for r in mb.collect()}
    assert da == db
    # zip flavor too (fixed ZipInfo timestamp)
    c, d = str(tmp_path / "c"), str(tmp_path / "d")
    mc = write_webdataset_shards(members, c, container="zip")
    md = write_webdataset_shards(members.repartition(3), d, container="zip")
    assert {r["shard_id"]: r["md5"] for r in mc.collect()} == {
        r["shard_id"]: r["md5"] for r in md.collect()
    }


def test_jsonl_roundtrip_and_determinism(spark, tmp_path, tables):
    from spdb_spark.sources.corpus import ingest_jsonl_files

    docs = spark.table("documents").select("doc_id", "text", "lang")
    out = str(tmp_path / "jsonl")
    manifest = write_jsonl_shards(docs, out, docs_per_shard=100)
    n = docs.count()
    assert sum(r["n_samples"] for r in manifest.collect()) == n
    back = ingest_jsonl_files(spark, os.path.join(out, "*.jsonl.gz"))
    assert back.count() == n
    assert {r["text"] for r in back.collect()} == {
        r["text"] for r in docs.collect()
    }
    # re-run at different partitioning: identical bytes
    out2 = str(tmp_path / "jsonl2")
    m2 = write_jsonl_shards(docs.repartition(7), out2, docs_per_shard=100)
    assert {r["shard_id"]: r["md5"] for r in manifest.collect()} == {
        r["shard_id"]: r["md5"] for r in m2.collect()
    }


def test_crawl_select_export_end_to_end(spark, tmp_path):
    """The full corpus-build story in one test: WARC shards -> curated
    docs -> DSIR-selected subset -> jsonl.gz training shards, with the
    export byte-identical across re-runs of the whole pipeline."""
    import gzip
    import hashlib
    import json

    from spdb_spark.sources.crawl import crawl_to_corpus
    from spdb_spark.sources.shards import write_jsonl_shards
    from spdb_spark.sources.warc import ingest_warc, warc_encode

    def page(body: str) -> bytes:
        return (
            "HTTP/1.1 200 OK\r\n\r\n<html><body><p>" + body + "</p></body></html>"
        ).encode()

    finance = ("the market closed higher today with bank shares leading "
               "gains while analysts said rates and earnings will drive "
               "the next quarter as investors weigh inflation data")
    chatter = ("random words strung together about weather hobbies pets "
               "gardens and errands with no particular topic or theme "
               "beyond filling space in a page for testing purposes")
    recs = []
    for i in range(10):
        body = finance if i % 2 == 0 else chatter
        recs.append({"warc_type": "response",
                     "target_uri": f"http://h{i}.org/p",
                     "payload": page(f"{body} item {i}")})
    src = tmp_path / "warc_in"
    src.mkdir()
    (src / "a.warc.gz").write_bytes(warc_encode(recs))

    def run(out: str) -> dict:
        warc = ingest_warc(spark, str(src))
        target = spark.createDataFrame(
            [(999, finance + " trading desks")], "doc_id long, text string"
        )
        docs = crawl_to_corpus(
            warc, quality=False, near_dedup=False,
            select_target=target, select_k=4,
        ).select("doc_id", "text")
        manifest = write_jsonl_shards(docs, out, docs_per_shard=2)
        return {r["path"].rsplit("/", 1)[-1]: r["md5"] for r in manifest.collect()}

    m1 = run(str(tmp_path / "out1"))
    m2 = run(str(tmp_path / "out2"))
    assert m1 == m2 and len(m1) >= 2  # byte-identical re-run, sharded
    # the exported docs skew toward the target distribution
    texts = []
    for name in m1:
        blob = (tmp_path / "out1" / name).read_bytes()
        assert hashlib.md5(blob).hexdigest() == m1[name]
        for line in gzip.decompress(blob).decode().splitlines():
            texts.append(json.loads(line)["text"])
    assert len(texts) == 4
    assert sum("market" in t for t in texts) >= 3


def test_uri_output_path_writes_via_pyarrow_fs(spark, tmp_path):
    """A scheme'd out_dir (here file://) routes executor-side shard
    writes through pyarrow.fs — the path an object store / HDFS takes on
    a real cluster, where executors must write to SHARED storage rather
    than their local disks. Bytes must be identical to the bare-path
    form (same deterministic layout)."""
    members = _members_df(spark, 11)
    bare = str(tmp_path / "bare")
    uri_dir = tmp_path / "uri"
    uri = "file://" + str(uri_dir)
    write_webdataset_shards(members, bare, samples_per_shard=4)
    manifest = write_webdataset_shards(members, uri, samples_per_shard=4)
    rows = manifest.collect()
    assert all(r["path"].startswith("file://") for r in rows)
    got = {
        os.path.basename(p): hashlib.md5(open(p, "rb").read()).hexdigest()
        for p in glob.glob(str(uri_dir / "shard-*.tar"))
    }
    want = {
        os.path.basename(p): hashlib.md5(open(p, "rb").read()).hexdigest()
        for p in glob.glob(os.path.join(bare, "shard-*.tar"))
    }
    assert got == want and got
    assert not glob.glob(str(uri_dir / ".tmp-*"))

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(9)], "doc_id long, text string"
    )
    juri = "file://" + str(tmp_path / "juri")
    jm = write_jsonl_shards(docs, juri, docs_per_shard=4)
    assert jm.count() == 3
    assert glob.glob(str(tmp_path / "juri" / "shard-*.jsonl.gz"))


def test_tmp_suffix_is_collision_proof():
    # host + pid + uuid: repeated calls (a speculative task retry in the
    # same process) must never reuse a tmp name
    import socket

    from spdb_spark.sources.shards import _tmp_suffix

    a, b = _tmp_suffix(), _tmp_suffix()
    assert a != b
    assert a.startswith(socket.gethostname())
