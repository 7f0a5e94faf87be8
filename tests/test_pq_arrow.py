"""Round-11 PQ surface: the Arrow encode/LUT engine (bit-identical to
the expression form — the production 8-bit path where the expression
plan-build cost is the measured ceiling), IVF-PQ incremental append
(frozen quantizer, exactly-once), and compaction parity with the IVF
index (compact/vacuum + pruning preserved)."""

import os
import shutil
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from tools.ann_recall import make_clustered


def _decimal_round6(x: float) -> float:
    """The definitional target of _np_round6: BigDecimal.valueOf(x)
    .setScale(6, HALF_UP).toDouble — repr(x) is the same shortest
    round-trip decimal as Java's Double.toString."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


@given(
    st.floats(
        min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
    )
)
@settings(max_examples=2000, deadline=None)
def test_np_round6_matches_decimal_reference(x):
    """The vectorized fast path + boundary slow path must equal the
    exact decimal-string HALF_UP round for EVERY double — this is what
    makes the arrow engine bit-identical to Spark's round()."""
    from spdb_spark.functions.pq import _np_round6

    got = _np_round6(np.array([x]))[0]
    assert got == _decimal_round6(x), (x, got, _decimal_round6(x))


def test_np_round6_boundary_values():
    """Values engineered onto the .5 boundary take the Decimal path."""
    from spdb_spark.functions.pq import _np_round6

    xs = [0.1234565, -0.1234565, 2.0000005, -2.0000005, 0.0000005,
          -0.0000005, 1e-7, -1e-7, 0.0, 12345.6789015]
    got = _np_round6(np.array(xs))
    want = [_decimal_round6(x) for x in xs]
    assert list(got) == want
    assert str(got[np.array(xs) == 0.0][0]) == "0.0"  # no negative zero


@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False,
                  allow_infinity=False, width=64),
        min_size=8, max_size=8,
    ),
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False,
                  allow_infinity=False, width=64),
        min_size=8, max_size=8,
    ),
)
@settings(max_examples=500, deadline=None)
def test_np_seq_dot_matches_python_fold(a, b):
    """The numpy row-fold must replay the F.aggregate per-element op
    order exactly — pinned against the literal Python left-to-right
    fold (same IEEE sequence the JVM executes)."""
    from spdb_spark.functions.pq import _np_seq_dot

    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    got = _np_seq_dot(np.array([a]), np.array(b))[0]
    assert got == acc


@pytest.fixture(scope="module")
def small(spark):
    return make_clustered(spark, n=300, dim=64, n_clusters=12, noise=0.3).persist()


def _codes_tuples(df):
    return sorted((r[0], tuple(r[1])) for r in df.collect())


def test_arrow_encode_bit_identical_to_expression(spark, small, cb16):
    """The whole point of the arrow engine: SAME protocol, same bits.
    Pinned at 16 and 32 codes: both exercise the multi-code argmin chain
    and the rounding protocol; the expression form's plan-build cost is
    ~linear in n_codes (measured 6.7/11.2/20.6 s at 16/32/64 on this
    fixture — pure driver-side Catalyst work), and 64 adds no new logic
    over 32 while the 256-code arrow test covers the wide-code range."""
    from spdb_spark.functions.pq import pq_codebooks, pq_encode

    for n_codes, cb in ((16, cb16), (32, pq_codebooks(small, dim=64, m=8, n_codes=32))):
        expr = _codes_tuples(pq_encode(small, cb, engine="expr"))
        arrow = _codes_tuples(pq_encode(small, cb, engine="arrow"))
        assert expr == arrow and len(expr) == 300, n_codes


def test_arrow_topk_bit_identical_to_expression(spark, small):
    from spdb_spark.functions.pq import ivfpq_topk, pq_topk

    queries = small.where(F.col("vec_id") % 60 == 0)
    for fn in (pq_topk, ivfpq_topk):
        expr = sorted(
            map(tuple, fn(small, queries, dim=64, k=5, rerank=40,
                          engine="expr").collect())
        )
        arrow = sorted(
            map(tuple, fn(small, queries, dim=64, k=5, rerank=40,
                          engine="arrow").collect())
        )
        assert expr == arrow and len(expr) > 0, fn.__name__


def test_arrow_engine_stays_zero_exchange(spark, small, cb16):
    """The arrow encode is still a shuffle-free projection (Arrow batch
    eval, not row-at-a-time BatchEvalPython)."""
    from spdb_spark.functions.pq import pq_encode

    cb = cb16
    plan = (
        pq_encode(small, cb, engine="arrow")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_arrow_unlocks_256_codes(spark, small):
    """8-bit PQ (the billion-scale code budget): the arrow engine's plan
    is constant-size in n_codes, so 256-code encode builds and runs where
    the expression form hits the measured 73 s plan-build ceiling
    (SCALE.md r10). Codes must cover the widened range and be
    deterministic across runs."""
    import time

    from spdb_spark.functions.pq import pq_codebooks, pq_encode

    cb = pq_codebooks(small, dim=64, m=8, n_codes=256)
    assert all(len(j) == 256 for j in cb)
    t0 = time.time()
    codes = pq_encode(small, cb, engine="arrow")
    build = time.time() - t0
    assert build < 10, f"arrow plan-build took {build:.1f}s — should be ~0"
    rows1 = _codes_tuples(codes)
    rows2 = _codes_tuples(pq_encode(small, cb, engine="arrow"))
    assert rows1 == rows2 and len(rows1) == 300
    flat = [c for _id, cs in rows1 for c in cs]
    assert min(flat) >= 0 and max(flat) > 63, "256-code range unused"


def test_pq256_recall_floor_clustered(spark, clustered2k, truth2k):
    """Recall floor at the 8-bit code budget: more codes = finer
    subspace cells, so recall at a FIXED rerank must not fall below the
    16-code floor (measured 1.0 at rerank=100 on this fixture)."""
    from tools.ann_recall import recall_at_k

    from spdb_spark.functions.pq import pq_topk

    corpus, truth = clustered2k, truth2k
    queries = corpus.where(F.col("vec_id") % 100 == 0)
    approx = pq_topk(
        corpus, queries, dim=64, k=10, m=8, n_codes=256, rerank=100,
        engine="arrow",
    )
    r = recall_at_k(approx, truth)
    assert r >= 0.9, f"pq256 recall@10 {r}"


# ---------------------------------------------------------------------------
# incremental append + compaction
# ---------------------------------------------------------------------------


def _frozen_quantizer(spark, corpus, n_centroids=8, n_codes=16):
    from spdb_spark.functions.ivf import assign_lists, choose_centroids
    from spdb_spark.functions.pq import pq_codebooks

    cents = choose_centroids(corpus, "vec_id", "embedding", n_centroids)
    cents = spark.createDataFrame(
        [(int(r.centroid_id), list(r.centroid_vec)) for r in cents.collect()],
        schema="centroid_id int, centroid_vec array<double>",
    )
    lists = (
        assign_lists(corpus, cents, "vec_id", "embedding", n_probe=1)
        .join(F.broadcast(cents), "centroid_id")
        .select(
            "vid",
            "centroid_id",
            F.zip_with(
                F.col("v"), F.col("centroid_vec"), lambda a, b: a - b
            ).alias("resid"),
        )
    )
    cbs = pq_codebooks(lists, "vid", "resid", dim=64, m=8, n_codes=n_codes)
    return cents, cbs


@pytest.fixture(scope="module")
def cb16(spark, small):
    """16-code codebooks over `small` — trained once for the module (the
    zero-exchange, encode-parity and empty-input tests all train the
    identical books)."""
    from spdb_spark.functions.pq import pq_codebooks

    return pq_codebooks(small, dim=64, m=8, n_codes=16)


@pytest.fixture(scope="module")
def fq(spark, small):
    """One frozen quantizer for the whole module: every append/compact
    test used to re-train it (choose_centroids + residual codebooks) —
    identical args, identical result, ~7 rebuilds of the same tables."""
    return _frozen_quantizer(spark, small)


@pytest.fixture(scope="module")
def boot_idx(spark, small, fq, tmp_path_factory):
    """A saved boot index (vec_id < 200) built ONCE; tests that append to
    it take a filesystem copy (milliseconds) instead of re-encoding and
    re-saving the index per test."""
    cents, cbs = fq
    from spdb_spark.functions.pq import save_ivfpq_index

    path = str(tmp_path_factory.mktemp("pqarrow") / "boot")
    boot = small.where(F.col("vec_id") < 200)
    save_ivfpq_index(boot, path, dim=64, cents=cents, codebooks=cbs)
    return path


@pytest.fixture(scope="module")
def full_idx(spark, small, fq, tmp_path_factory):
    """A saved full index (all 300 vectors) built ONCE — read-only tests
    use it in place; mutating tests copy it."""
    cents, cbs = fq
    from spdb_spark.functions.pq import save_ivfpq_index

    path = str(tmp_path_factory.mktemp("pqarrow") / "full")
    save_ivfpq_index(small, path, dim=64, cents=cents, codebooks=cbs)
    return path


def _copy_idx(src_path, tmp_path, name="idx"):
    import shutil as _sh

    dst = str(tmp_path / name)
    _sh.copytree(src_path, dst)
    return dst



def test_ivfpq_append_equals_rebuild(spark, small, fq, full_idx, boot_idx, tmp_path):
    """Appending under the frozen quantizer is bit-identical to a full
    rebuild with the same quantizer: identical codes table, identical
    indexed top-k. (The quantizer is trained on the union for both, so
    this pins the APPEND path, not quantizer drift.)"""
    from spdb_spark.functions.pq import (
        _codes_dir,
        append_to_ivfpq_index,
        ivfpq_topk_indexed,
        save_ivfpq_index,
    )

    extra = small.where(F.col("vec_id") >= 200)
    p_full = full_idx
    p_inc = _copy_idx(boot_idx, tmp_path, "inc")
    append_to_ivfpq_index(spark, p_inc, extra, dim=64, batch_id="b1")

    codes_full = _codes_tuples(
        spark.read.parquet(_codes_dir(p_full)).select("vid", "codes")
    )
    codes_inc = _codes_tuples(
        spark.read.parquet(_codes_dir(p_inc)).select("vid", "codes")
    )
    assert codes_full == codes_inc and len(codes_full) == 300

    q = small.where(F.col("vec_id") % 60 == 0)
    full = sorted(
        map(tuple, ivfpq_topk_indexed(spark, p_full, q, small, dim=64,
                                      k=5, rerank=40).collect())
    )
    inc = sorted(
        map(tuple, ivfpq_topk_indexed(spark, p_inc, q, small, dim=64,
                                      k=5, rerank=40).collect())
    )
    assert full == inc and len(full) > 0


def test_ivfpq_append_redelivery_noop(spark, small, boot_idx, tmp_path):
    """foreachBatch redelivery semantics: re-appending the same batch_id
    changes nothing (committed marker short-circuits)."""
    from spdb_spark.functions.pq import (
        _codes_dir,
        append_to_ivfpq_index,
        save_ivfpq_index,
    )

    extra = small.where(F.col("vec_id") >= 200)
    path = _copy_idx(boot_idx, tmp_path)
    append_to_ivfpq_index(spark, path, extra, dim=64, batch_id="b1")
    before = _codes_tuples(spark.read.parquet(_codes_dir(path)).select("vid", "codes"))
    append_to_ivfpq_index(spark, path, extra, dim=64, batch_id="b1")
    after = _codes_tuples(spark.read.parquet(_codes_dir(path)).select("vid", "codes"))
    assert before == after and len(before) == 300


def test_ivfpq_append_crash_mid_publish_recovers(
    spark, small, fq, full_idx, boot_idx, tmp_path, monkeypatch
):
    """A crash between staging and publish: the retry with the SAME
    batch_id republishes from the SEALED staging (same file names, so
    skip-if-present is exact) — never a double-append, never a restage
    against a half-appended base."""
    import shutil as _shutil

    from spdb_spark.functions.pq import (
        _codes_dir,
        append_to_ivfpq_index,
        save_ivfpq_index,
    )

    extra = small.where(F.col("vec_id") >= 200)
    path = _copy_idx(boot_idx, tmp_path)

    state = {"copies": 0}
    real_copyfile = _shutil.copyfile

    def crashing_copyfile(src, dst, **kw):
        state["copies"] += 1
        if state["copies"] == 2:
            raise OSError("injected crash mid-publish")
        return real_copyfile(src, dst, **kw)

    # the function body does `import shutil` per call, so patching the
    # module attribute intercepts its copies
    monkeypatch.setattr(_shutil, "copyfile", crashing_copyfile)
    raised = False
    try:
        append_to_ivfpq_index(spark, path, extra, dim=64, batch_id="b1")
    except OSError:
        raised = True
    assert raised and state["copies"] >= 2
    assert os.path.exists(os.path.join(path, "_staging", "b1", "_STAGED"))
    assert not os.path.exists(os.path.join(path, "_appendlog", "b1.json"))
    monkeypatch.undo()

    append_to_ivfpq_index(spark, path, extra, dim=64, batch_id="b1")
    got = _codes_tuples(spark.read.parquet(_codes_dir(path)).select("vid", "codes"))
    # equals a clean rebuild over the union with the same quantizer
    want = _codes_tuples(
        spark.read.parquet(_codes_dir(full_idx)).select("vid", "codes")
    )
    assert got == want and len(got) == 300
    assert not os.path.exists(os.path.join(path, "_staging", "b1"))


def test_ivfpq_compact_vacuum_preserves_results_and_pruning(spark, small, fq, tmp_path):
    """Compaction parity with the IVF index: after appends, compact
    rewrites the codes into one generation dir, vacuum reclaims the old
    one, results are unchanged, and the probe scan still carries the
    centroid_id partition filter (directory pruning intact)."""
    from spdb_spark.functions.pq import (
        _codes_dir,
        append_to_ivfpq_index,
        compact_ivfpq_index,
        ivfpq_topk_indexed,
        save_ivfpq_index,
        vacuum_ivfpq_index,
    )

    cents, cbs = fq
    boot = small.where(F.col("vec_id") < 150)
    path = str(tmp_path / "idx")
    save_ivfpq_index(boot, path, dim=64, cents=cents, codebooks=cbs)
    append_to_ivfpq_index(
        spark, path, small.where((F.col("vec_id") >= 150) & (F.col("vec_id") < 220)),
        dim=64, batch_id="b1",
    )
    append_to_ivfpq_index(
        spark, path, small.where(F.col("vec_id") >= 220), dim=64, batch_id="b2"
    )
    q = small.where(F.col("vec_id") % 60 == 0)
    before = sorted(
        map(tuple, ivfpq_topk_indexed(spark, path, q, small, dim=64,
                                      k=5, rerank=40).collect())
    )
    compact_ivfpq_index(spark, path)
    vacuum_ivfpq_index(path)
    assert not os.path.exists(os.path.join(path, "codes"))  # gen0 reclaimed
    assert os.path.basename(_codes_dir(path)) == "codes_g1"
    after_df = ivfpq_topk_indexed(spark, path, q, small, dim=64, k=5, rerank=40)
    after = sorted(map(tuple, after_df.collect()))
    assert before == after and len(after) > 0
    # one parquet file per centroid partition in the new generation
    gen = _codes_dir(path)
    for part in os.listdir(gen):
        if part.startswith("centroid_id="):
            files = [f for f in os.listdir(os.path.join(gen, part))
                     if f.endswith(".parquet")]
            assert len(files) == 1, (part, files)
    # pruning: the codes scan keeps its partition filter
    plan = after_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [centroid_id" in plan or "centroid_id#" in plan
    # second compact generation increments
    compact_ivfpq_index(spark, path)
    assert os.path.basename(_codes_dir(path)) == "codes_g2"
    vacuum_ivfpq_index(path)
    assert not os.path.exists(os.path.join(path, "codes_g1"))


def test_ivfpq_filtered_search_semantics(spark, small, fq, full_idx, tmp_path):
    """PRE-filter semantics on the IVF-PQ index: results satisfy the
    predicate; with rerank >= filtered-corpus size the filtered result
    equals brute force over the filtered corpus; and a starved probe
    (n_probe=1, large k) escalates every query to the same exact
    answer."""
    from spdb_spark.functions.pq import ivfpq_topk_indexed, save_ivfpq_index
    from spdb_spark.functions.similarity import brute_force_topk

    cents, cbs = fq
    path = full_idx
    q = small.where(F.col("vec_id") % 60 == 0)
    fc = small.where(F.col("label") == 3)
    n_f = fc.count()
    assert 0 < n_f < 100  # selective predicate on the clustered fixture

    got = ivfpq_topk_indexed(
        spark, path, q, small, dim=64, k=5, n_probe=8, rerank=300,
        where="label = 3",
    )
    rows = got.collect()
    assert rows and {r.neighbor_id for r in rows} <= {
        r.vec_id for r in fc.collect()
    }
    # brute force over the filtered corpus only (PRE-filter semantics)
    want = sorted(map(tuple, brute_force_topk(fc, q, k=5).collect()))
    assert sorted(map(tuple, rows)) == want

    # starved probe: every query short -> full filtered-scan fallback
    esc = ivfpq_topk_indexed(
        spark, path, q, small, dim=64, k=20, n_probe=1, rerank=30,
        where="label = 3",
    )
    want20 = sorted(map(tuple, brute_force_topk(fc, q, k=20).collect()))
    assert sorted(map(tuple, esc.collect())) == want20


def test_refine_codebooks_arrow_engine(spark, small):
    """Lloyd refinement through the arrow assignment: runs at the 8-bit
    code budget (constant plan size) and keeps the k-means objective
    non-increasing, same as the expression form."""
    import numpy as np

    from spdb_spark.functions.pq import pq_codebooks, refine_pq_codebooks

    cb = pq_codebooks(small, dim=64, m=8, n_codes=256)
    refined = refine_pq_codebooks(small, cb, iters=1, engine="arrow")
    assert len(refined) == 8 and all(len(j) == 256 for j in refined)

    V = np.array([r.embedding for r in small.select("embedding").collect()])

    def distortion(books):
        tot = 0.0
        for j, bk in enumerate(books):
            S = V[:, j * 8 : (j + 1) * 8]
            C = np.array([vec for _cid, vec in sorted(bk)])
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            tot += d2.min(1).sum()
        return tot

    assert distortion(refined) <= distortion(cb) * (1 + 1e-9)


def test_empty_inputs_for_new_surfaces(spark, small, cb16, fq, full_idx, tmp_path):
    """Empty-batch behavior of the r11 entry points: encode of an empty
    frame, an empty index append (commits a marker, changes nothing),
    and an empty streaming-dedup batch (commits, finds nothing)."""
    from spdb_spark.functions.pq import (
        _codes_dir,
        append_to_ivfpq_index,
        pq_codebooks,
        pq_encode,
        save_ivfpq_index,
    )
    from spdb_spark.streaming.semdedup import StreamingSemanticDedup

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    for eng in ("expr", "arrow"):
        assert pq_encode(empty, cb16, engine=eng).count() == 0, eng

    cents, cbs = fq
    path = _copy_idx(full_idx, tmp_path)
    before = _codes_tuples(spark.read.parquet(_codes_dir(path)).select("vid", "codes"))
    append_to_ivfpq_index(spark, path, empty, dim=64, batch_id="e0")
    after = _codes_tuples(spark.read.parquet(_codes_dir(path)).select("vid", "codes"))
    assert before == after
    assert os.path.exists(os.path.join(path, "_appendlog", "e0.json"))

    sd = StreamingSemanticDedup(spark, str(tmp_path / "sd"), cents, tau=0.9)
    sd.process_batch(empty, 0)
    sd.process_batch(small.where(F.col("vec_id") < 50), 1)
    assert sd._committed() == [0, 1]
    assert sd.pairs().count() >= 0  # readable state either way


def test_ivfpq_empty_codebooks_guard(spark, small, full_idx, tmp_path):
    """A corrupt/empty pq_codebooks dir raises a diagnosable layout
    error, not max()-of-empty-sequence."""
    from spdb_spark.functions.pq import ivfpq_topk_indexed, save_ivfpq_index

    path = _copy_idx(full_idx, tmp_path)
    shutil.rmtree(os.path.join(path, "pq_codebooks"))
    spark.createDataFrame(
        [], "subspace int, pq_id int, sub_vec array<double>"
    ).write.mode("overwrite").parquet(os.path.join(path, "pq_codebooks"))
    q = small.where(F.col("vec_id") % 60 == 0)
    with pytest.raises(ValueError, match="empty pq_codebooks"):
        ivfpq_topk_indexed(spark, path, q, small, dim=64, k=5)
