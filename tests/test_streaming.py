"""Structured Streaming ingest: micro-batch merge with latest-write-wins
(replaces the reference's write-buffer/flush pipeline, SURVEY.md §2.8)."""

import pytest
from pyspark.sql import functions as F

from spdb_spark.streaming.ingest import StreamingVoxelIngest, latest_wins, merge_batch


def vox_rows(spark, rows):
    return spark.createDataFrame(
        rows,
        "lookup_key string, resolution int, t long, x long, y long, z long, "
        "value long, seq long",
    )


def test_latest_wins_within_batch(spark):
    batch = vox_rows(
        spark,
        [
            ("k", 0, 0, 1, 1, 1, 10, 1),
            ("k", 0, 0, 1, 1, 1, 20, 2),   # later write wins
            ("k", 0, 0, 2, 2, 2, 5, 1),
        ],
    )
    out = {(r.x, r.value) for r in latest_wins(batch).collect()}
    assert out == {(1, 20), (2, 5)}


def test_merge_batch_overwrite_and_zero_suppression(spark):
    from spdb_spark.schema import VOXEL_SCHEMA

    existing = spark.createDataFrame(
        [("k", 0, 0, 1, 1, 1, 7), ("k", 0, 0, 3, 3, 3, 9)], VOXEL_SCHEMA
    )
    batch = vox_rows(
        spark,
        [
            ("k", 0, 0, 1, 1, 1, 42, 1),  # overwrites 7
            ("k", 0, 0, 5, 5, 5, 11, 2),  # new voxel
            ("k", 0, 0, 3, 3, 3, 0, 3),   # zero does NOT erase (overwriteDense)
        ],
    )
    out = {(r.x, r.value) for r in merge_batch(existing, batch).collect()}
    assert out == {(1, 42), (3, 9), (5, 11)}


def test_streaming_end_to_end(spark, tmp_path):
    """Drive a real streaming query (file source, availableNow) through
    foreachBatch into the voxel table."""
    src = tmp_path / "incoming"
    src.mkdir()
    table = str(tmp_path / "voxtable")
    ckpt = str(tmp_path / "ckpt")

    batch1 = vox_rows(
        spark, [("k", 0, 0, 1, 1, 1, 10, 1), ("k", 0, 0, 2, 2, 2, 20, 2)]
    )
    batch1.write.parquet(str(src / "b1"))

    schema = batch1.schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src / "*"))
    sink = StreamingVoxelIngest(spark, table)
    q = sink.start(stream, ckpt)
    q.awaitTermination(120)

    state = {(r.x, r.value) for r in sink.read_state().collect()}
    assert state == {(1, 10), (2, 20)}

    # second batch overwrites voxel (1,1,1)
    batch2 = vox_rows(spark, [("k", 0, 0, 1, 1, 1, 99, 3)])
    batch2.write.parquet(str(src / "b2"))
    q2 = sink.start(stream, ckpt)
    q2.awaitTermination(120)
    state = {(r.x, r.value) for r in sink.read_state().collect()}
    assert state == {(1, 99), (2, 20)}


def test_streaming_ingest_scoped_merge_leaves_untouched_partitions(spark, tmp_path):
    """A micro-batch only rewrites the super-block partitions it touches:
    files in every other partition stay byte-identical (same inode — they
    are never re-staged, the publish renames only touched dirs)."""
    import os

    table = str(tmp_path / "scoped")
    sink = StreamingVoxelIngest(spark, table)

    # x=0 -> pgroup 0; x=16*512 -> cuboid x_idx 16 -> morton 4096 -> pgroup 1
    far_x = 16 * 512
    b1 = vox_rows(
        spark,
        [("k", 0, 0, 1, 1, 1, 10, 1), ("k", 0, 0, far_x, 1, 1, 20, 2)],
    )
    sink.process_batch(b1, 0)

    def snapshot(pgroup):
        d = os.path.join(table, "lookup_key=k", "resolution=0", f"pgroup={pgroup}")
        out = {}
        for f in os.listdir(d):
            p = os.path.join(d, f)
            if os.path.isfile(p):
                st = os.stat(p)
                out[f] = (st.st_ino, st.st_mtime_ns, st.st_size)
        return out

    before = snapshot(0)
    assert before, "pgroup=0 partition should exist after batch 1"

    # batch 2 touches only pgroup 1
    b2 = vox_rows(spark, [("k", 0, 0, far_x, 1, 1, 99, 3)])
    sink.process_batch(b2, 1)

    assert snapshot(0) == before  # untouched partition: same inodes, same bytes
    state = {(r.x, r.value) for r in sink.read_state().collect()}
    assert state == {(1, 10), (far_x, 99)}


def test_transactional_ingest_exactly_once(spark, tmp_path):
    """Redelivered batch ids are skipped; commits are atomic (an
    uncommitted data dir is invisible to readers); time travel works."""
    import os

    from spdb_spark.streaming.ingest import TransactionalVoxelIngest

    table = str(tmp_path / "txntable")
    sink = TransactionalVoxelIngest(spark, table)

    b1 = vox_rows(spark, [("k", 0, 0, 1, 1, 1, 10, 1), ("k", 0, 0, 2, 2, 2, 20, 2)])
    sink.process_batch(b1, 0)
    assert {(r.x, r.value) for r in sink.read_state().collect()} == {(1, 10), (2, 20)}

    # crash replay: same batch_id delivered again -> no-op
    sink.process_batch(b1, 0)
    assert sink._committed() == [0]

    b2 = vox_rows(spark, [("k", 0, 0, 1, 1, 1, 99, 3)])
    sink.process_batch(b2, 1)
    assert {(r.x, r.value) for r in sink.read_state().collect()} == {(1, 99), (2, 20)}
    # replay of an OLD batch after newer commits: still a no-op
    sink.process_batch(b1, 0)
    assert {(r.x, r.value) for r in sink.read_state().collect()} == {(1, 99), (2, 20)}

    # time travel to the pre-overwrite snapshot
    assert {(r.x, r.value) for r in sink.read_state(version=0).collect()} == {
        (1, 10),
        (2, 20),
    }

    # torn write: data dir exists but ledger entry was never committed
    b3 = vox_rows(spark, [("k", 0, 0, 3, 3, 3, 7, 4)])
    merged = b3.select("lookup_key", "resolution", "t", "x", "y", "z", "value")
    merged.write.parquet(sink._data_dir(2))
    assert {(r.x, r.value) for r in sink.read_state().collect()} == {(1, 99), (2, 20)}

    # vacuum keeps the latest snapshots only
    sink.vacuum(keep_last=1)
    assert sink._committed() == [1]
    assert not os.path.exists(sink._data_dir(0))
    assert {(r.x, r.value) for r in sink.read_state().collect()} == {(1, 99), (2, 20)}


def test_transactional_ingest_scoped_snapshots(spark, tmp_path):
    """Each version dir holds ONLY the batch's touched partitions; the
    manifest carries untouched partitions forward by pointer, so their
    files are written once and never rewritten (O(batch) commits)."""
    import os

    from spdb_spark.streaming.ingest import TransactionalVoxelIngest

    table = str(tmp_path / "txnscoped")
    sink = TransactionalVoxelIngest(spark, table)

    far_x = 16 * 512  # pgroup 1 (see scoped-merge test above)
    b1 = vox_rows(
        spark, [("k", 0, 0, 1, 1, 1, 10, 1), ("k", 0, 0, far_x, 1, 1, 20, 2)]
    )
    sink.process_batch(b1, 0)

    pg0_dir = os.path.join(
        table, "data_v0", "lookup_key=k", "resolution=0", "pgroup=0"
    )
    before = {
        f: os.stat(os.path.join(pg0_dir, f)).st_mtime_ns
        for f in os.listdir(pg0_dir)
        if os.path.isfile(os.path.join(pg0_dir, f))
    }

    b2 = vox_rows(spark, [("k", 0, 0, far_x, 1, 1, 99, 3)])
    sink.process_batch(b2, 1)

    # v1 contains only the touched partition; pgroup=0 still lives in v0
    assert os.path.isdir(
        os.path.join(table, "data_v1", "lookup_key=k", "resolution=0", "pgroup=1")
    )
    assert not os.path.exists(
        os.path.join(table, "data_v1", "lookup_key=k", "resolution=0", "pgroup=0")
    )
    after = {
        f: os.stat(os.path.join(pg0_dir, f)).st_mtime_ns
        for f in os.listdir(pg0_dir)
        if os.path.isfile(os.path.join(pg0_dir, f))
    }
    assert after == before
    assert sink._manifest(1)["k|0|0"] == "data_v0"
    assert sink._manifest(1)["k|0|1"] == "data_v1"

    state = {(r.x, r.value) for r in sink.read_state().collect()}
    assert state == {(1, 10), (far_x, 99)}
    # time travel still resolves the v0 view
    state0 = {(r.x, r.value) for r in sink.read_state(version=0).collect()}
    assert state0 == {(1, 10), (far_x, 20)}

    # vacuum keeps dirs any kept manifest references: v0 is still live
    sink.vacuum(keep_last=1)
    assert os.path.isdir(os.path.join(table, "data_v0"))
    assert {(r.x, r.value) for r in sink.read_state().collect()} == state


def test_transactional_ingest_streaming_query(spark, tmp_path):
    """The transactional sink attaches to a real streaming query."""
    from spdb_spark.streaming.ingest import TransactionalVoxelIngest

    src = tmp_path / "txn_incoming"
    src.mkdir()
    b1 = vox_rows(spark, [("k", 0, 0, 5, 5, 5, 50, 1)])
    b1.write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(b1.schema).parquet(str(src / "*"))
    sink = TransactionalVoxelIngest(spark, str(tmp_path / "txntable2"))
    q = sink.start(stream, str(tmp_path / "txn_ckpt"))
    q.awaitTermination(120)
    assert {(r.x, r.value) for r in sink.read_state().collect()} == {(5, 50)}


def test_transactional_ingest_maintains_id_index(spark, tmp_path):
    """The id index is maintained per micro-batch in lockstep with the data
    (reference updates its id index on every cuboid write,
    object_indices.py:730-769): equals the batch recompute from the final
    state, carries untouched partitions forward by pointer (files never
    rewritten), and retracts ids that an overwrite removed."""
    import os

    from pyspark.sql import functions as F

    from spdb_spark.operators.voxel import cuboid_id_index
    from spdb_spark.streaming.ingest import TransactionalVoxelIngest

    table = str(tmp_path / "txnidx")
    sink = TransactionalVoxelIngest(spark, table)

    far_x = 16 * 512  # lands in pgroup 1; x=1 lands in pgroup 0
    b1 = vox_rows(
        spark, [("k", 0, 0, 1, 1, 1, 10, 1), ("k", 0, 0, far_x, 1, 1, 20, 2)]
    )
    sink.process_batch(b1, 0)

    idx_pg0 = os.path.join(
        table, "index_v0", "lookup_key=k", "resolution=0", "pgroup=0"
    )
    before = {
        f: os.stat(os.path.join(idx_pg0, f)).st_mtime_ns
        for f in os.listdir(idx_pg0)
        if os.path.isfile(os.path.join(idx_pg0, f))
    }

    # batch 2 touches only pgroup 1: overwrite id 20 -> 99 at the same voxel
    b2 = vox_rows(spark, [("k", 0, 0, far_x, 1, 1, 99, 3)])
    sink.process_batch(b2, 1)

    # untouched partition: index files not rewritten, pointer carried forward
    after = {
        f: os.stat(os.path.join(idx_pg0, f)).st_mtime_ns
        for f in os.listdir(idx_pg0)
        if os.path.isfile(os.path.join(idx_pg0, f))
    }
    assert after == before
    assert sink._index_manifest(1)["k|0|0"] == "index_v0"
    assert sink._index_manifest(1)["k|0|1"] == "index_v1"

    # maintained index == recompute-from-state (stream == batch)
    maintained = {
        (r.lookup_key, r.resolution, r.morton, r.id)
        for r in sink.read_id_index().collect()
    }
    recomputed = {
        ("k", 0, r.morton, r.id)
        for r in cuboid_id_index(sink.read_state()).collect()
    }
    assert maintained == recomputed
    # the overwritten id 20 was retracted, 99 present (append-only couldn't)
    ids = {r.id for r in sink.read_id_index().collect()}
    assert ids == {10, 99}

    # time travel resolves the v0 index view
    ids0 = {r.id for r in sink.read_id_index(version=0).collect()}
    assert ids0 == {10, 20}

    # vacuum keeps live index dirs
    sink.vacuum(keep_last=1)
    assert os.path.isdir(os.path.join(table, "index_v0"))
    assert {r.id for r in sink.read_id_index().collect()} == {10, 99}


def test_streaming_ingest_crash_mid_publish_loses_nothing(spark, tmp_path, monkeypatch):
    """Kill the publish between the move-aside and the swap: the old
    partition data survives in the trash dir, and the redelivered batch
    (recovery pass + re-merge) converges to the correct state."""
    import glob
    import os

    table = str(tmp_path / "crashy")
    sink = StreamingVoxelIngest(spark, table)
    b1 = vox_rows(spark, [("k", 0, 0, 1, 1, 1, 10, 1)])
    sink.process_batch(b1, 0)

    b2 = vox_rows(spark, [("k", 0, 0, 2, 2, 2, 20, 2)])
    real_rename = os.rename
    calls = {"n": 0}

    def crashing_rename(src, dst):
        # call 1 = move-aside (old partition -> trash); call 2 = swap
        # (staged -> table). Crash exactly between them.
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("simulated crash between move-aside and swap")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", crashing_rename)
    with pytest.raises(OSError, match="simulated crash"):
        sink.process_batch(b2, 1)
    monkeypatch.setattr(os, "rename", real_rename)

    # the partition is absent from the table mid-crash, but its data was
    # MOVED, not deleted: the only copy lives in the trash dir
    trash = glob.glob(table + ".trash-*")
    assert trash, "move-aside dir must survive the crash"
    trashed = [
        os.path.join(dp, f)
        for t in trash
        for dp, _, fs in os.walk(t)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert trashed, "old partition files must survive in the trash dir"

    # redelivery (same batch) recovers the trash and re-merges correctly
    sink.process_batch(b2, 1)
    assert not glob.glob(table + ".trash-*")
    state = {(r.x, r.value) for r in sink.read_state().collect()}
    assert state == {(1, 10), (2, 20)}


def test_streaming_ingest_empty_table_reads(spark, tmp_path):
    """A table whose partitions were all dropped still reads as empty
    (root dir exists but holds no partition dirs — plain
    spark.read.parquet would fail schema inference)."""
    import os
    import shutil

    table = str(tmp_path / "emptied")
    sink = StreamingVoxelIngest(spark, table)
    sink.process_batch(vox_rows(spark, [("k", 0, 0, 1, 1, 1, 5, 1)]), 0)
    # drop every partition the way the publish drop path does
    for name in os.listdir(table):
        shutil.rmtree(os.path.join(table, name))
    assert os.path.isdir(table)
    assert sink.read_state().count() == 0
    assert sink._read_partitions([("k", 0, 0)]).count() == 0
    # and ingest into the emptied table works
    sink.process_batch(vox_rows(spark, [("k", 0, 0, 9, 9, 9, 7, 2)]), 1)
    assert {(r.x, r.value) for r in sink.read_state().collect()} == {(9, 7)}


def test_transactional_compact_collapses_versions(spark, tmp_path):
    """compact() rewrites all live partitions into one version dir: state
    and id index unchanged, manifest fan-in collapses to a single dir,
    old versions stay time-travelable until vacuum, and a FUTURE stream
    batch whose id equals the compaction's version number still commits
    (maintenance versions never collide with batch-id idempotency)."""
    import os

    from spdb_spark.streaming.ingest import TransactionalVoxelIngest

    table = str(tmp_path / "txncompact")
    sink = TransactionalVoxelIngest(spark, table)

    far_x = 16 * 512  # second pgroup
    sink.process_batch(
        vox_rows(spark, [("k", 0, 0, 1, 1, 1, 10, 1), ("k", 0, 0, far_x, 1, 1, 20, 2)]),
        0,
    )
    sink.process_batch(vox_rows(spark, [("k", 0, 0, far_x, 1, 1, 99, 3)]), 1)
    before = {(r.x, r.value) for r in sink.read_state().collect()}
    idx_before = {(r.morton, r.id) for r in sink.read_id_index().collect()}
    assert before == {(1, 10), (far_x, 99)}

    sink.compact()  # commits version 2, batch_id None
    assert sink._committed() == [0, 1, 2]
    after = {(r.x, r.value) for r in sink.read_state().collect()}
    assert after == before
    assert {(r.morton, r.id) for r in sink.read_id_index().collect()} == idx_before
    # every live partition now points at the single compacted dir
    assert set(sink._manifest(2).values()) == {"data_v2"}
    assert set(sink._index_manifest(2).values()) == {"index_v2"}
    # time travel to pre-compaction versions still resolves
    assert {(r.x, r.value) for r in sink.read_state(version=0).collect()} == {
        (1, 10),
        (far_x, 20),
    }

    # stream continues: batch id 2 == compaction version, must NOT be
    # treated as a replay
    sink.process_batch(vox_rows(spark, [("k", 0, 0, 1, 1, 1, 55, 4)]), 2)
    assert {(r.x, r.value) for r in sink.read_state().collect()} == {
        (1, 55),
        (far_x, 99),
    }
    # ...but a REAL replay of batch 2 is still skipped
    sink.process_batch(vox_rows(spark, [("k", 0, 0, 1, 1, 1, 77, 5)]), 2)
    assert {(r.x, r.value) for r in sink.read_state().collect()} == {
        (1, 55),
        (far_x, 99),
    }

    # vacuum now drops the pre-compaction dirs
    sink.vacuum(keep_last=1)
    assert not os.path.exists(os.path.join(table, "data_v0"))
    assert not os.path.exists(os.path.join(table, "data_v1"))
    assert {(r.x, r.value) for r in sink.read_state().collect()} == {
        (1, 55),
        (far_x, 99),
    }
