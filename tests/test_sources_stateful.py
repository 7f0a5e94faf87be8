"""Volumetric sources/sinks + custom stateful streaming sessionizer."""

import numpy as np


def test_npy_ingest_export_roundtrip(spark, tmp_path):
    from spdb_spark.sources.volumetric import export_npy, ingest_npy
    from spdb_spark.store import CuboidStore

    store = CuboidStore(spark, str(tmp_path / "blocks"))
    rng = np.random.default_rng(3)
    data = rng.integers(1, 200, size=(16, 128, 128)).astype("uint8")
    src = tmp_path / "in.npy"
    np.save(src, data)
    ingest_npy(store, str(src), (0, 0, 0))
    dst = tmp_path / "out.npy"
    export_npy(store, str(dst), (0, 0, 0), (128, 128, 16))
    out = np.load(dst)
    np.testing.assert_array_equal(out[0], data)


def test_distributed_voxel_file_ingest(spark, tmp_path):
    from spdb_spark.schema import VOXEL_SCHEMA
    from spdb_spark.sources.volumetric import ingest_voxel_files
    from spdb_spark.store import CuboidStore

    store = CuboidStore(spark, str(tmp_path / "blocks"))
    vox = spark.createDataFrame(
        [("4&3&2", 0, 0, 5, 6, 7, 42), ("4&3&2", 0, 0, 600, 6, 7, 43)],
        VOXEL_SCHEMA,
    )
    src = str(tmp_path / "voxin")
    vox.write.parquet(src)
    ingest_voxel_files(store, src)
    out = store.cutout((0, 0, 0), (1024, 16, 16))
    assert out[0, 7, 6, 5] == 42
    assert out[0, 7, 6, 600] == 43


def test_stateful_sessionizer_stream_matches_batch(spark, tmp_path):
    from spdb_spark.streaming.stateful import sessionize_batch, sessionize_stream

    rows = []
    base = 1_700_000_000_000
    for user in (1, 2):
        # session A: 3 events 5 min apart; gap 2h; session B: 2 events
        for i in range(3):
            rows.append((user, base + i * 300_000))
        for i in range(2):
            rows.append((user, base + 2 * 3_600_000 + i * 60_000))
        # gap, then one trailing event (stays open in streaming state)
        rows.append((user, base + 5 * 3_600_000))
    df = spark.createDataFrame(rows, "user_id long, ts_ms long")
    src = tmp_path / "sess_src"
    src.mkdir()
    df.write.parquet(str(src / "p"))

    stream = spark.readStream.schema(df.schema).parquet(str(src / "*"))
    out = sessionize_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.user_id, r.session_start_ms, r.session_end_ms, r.n_events)
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    batch_all = {
        (r.user_id, r.session_start_ms, r.session_end_ms, r.n_events)
        for r in sessionize_batch(df).collect()
    }
    # stream emits only CLOSED sessions; the trailing single-event session
    # per user remains open in state
    assert len(streamed) == 4
    assert streamed < batch_all
    open_sessions = batch_all - streamed
    assert {s[3] for s in open_sessions} == {1}
