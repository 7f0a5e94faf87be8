"""Deduplication operators: exact, canonical-fingerprint, n-gram Jaccard,
MinHash+LSH, SimHash — the standard near-dup stack for pretraining corpora.

Spark-first design notes (100TB posture):
- shingling/hashing are Column expressions (JVM-side);
- candidate generation is equi-join on band buckets (shuffle keyed by a
  32-hex band hash -> uniform partitioning, no skew);
- frequency capping (`max_doc_freq`) drops stop-shingles BEFORE the
  pair join, which is what keeps the join from exploding at scale;
- exact Jaccard verification only runs on LSH candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spdb_spark.functions.hashing import md5_long
from spdb_spark.functions.text import tokens
from spdb_spark.session import truncate_lineage


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup via content hash: one row per distinct content with the
    canonical (minimum) id and the duplicate count."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("n_docs"))
    )


def fingerprint_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Near-exact dedup on the canonical token-set fingerprint (order- and
    multiplicity-insensitive): md5 of the sorted distinct token list."""
    fp = F.md5(
        F.array_join(F.array_sort(F.array_distinct(tokens(F.col(text_col)))), " ")
    )
    return (
        df.select(fp.alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("n_docs"))
    )


def contamination_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
    eval_source: str,
) -> DataFrame:
    """Benchmark-contamination check: training docs (any other source)
    whose canonical token-set fingerprint collides with a doc of
    `eval_source`. Returns (doc_id, source, eval_doc_id).

    The eval side is benchmark-sized, so it broadcasts — the training
    corpus streams through a broadcast hash join without shuffling,
    which is the only shape that works when the training side is 100 TB."""
    fp = F.md5(
        F.array_join(F.array_sort(F.array_distinct(tokens(F.col(text_col)))), " ")
    )
    fps = df.select(
        F.col(id_col).alias("doc"), F.col(source_col).alias("src"), fp.alias("fp")
    )
    ev = fps.where(F.col("src") == eval_source).select(
        "fp", F.col("doc").alias("eval_doc_id")
    )
    return (
        fps.where(F.col("src") != eval_source)
        .join(F.broadcast(ev), "fp")
        .select(
            F.col("doc").alias("doc_id"),
            F.col("src").alias("source"),
            "eval_doc_id",
        )
    )


def shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, distinct: bool = True
) -> DataFrame:
    """Word k-shingles per document: (id, shingle), distinct by default.

    The token array is materialized as its own projection first — inlining
    it into the transform lambda would re-split the text once per element
    (quadratic per document; Catalyst keeps multi-referenced non-cheap
    expressions un-inlined since collapseProjectAlwaysInline=false).

    `distinct=False` skips the dedup shuffle for consumers that are
    idempotent to repeated shingles (MinHash min, collect_set) — the
    minhash pipeline saves a full shuffle of the shingle table this way.

    The space-join runs in a POST-explode projection (whole-stage
    codegen) rather than inside transform's interpreted lambda — same
    rows, measured faster (the repo's HOF penalty note). F.get replaces
    element_at for the short-doc tail (docs with < k tokens emit ONE
    shingle of their tokens): NULL-on-out-of-bounds in BOTH ANSI modes,
    where element_at throws under ANSI."""
    with_toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    t = F.col("_toks")
    e = with_toks.select(
        F.col(id_col),
        t,
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.size(t) - k, F.lit(0)))
        ).alias("_shi"),
    )
    gram = F.concat_ws(
        " ", *[F.get(F.col("_toks"), F.col("_shi") + j) for j in range(k)]
    )
    out = e.select(F.col(id_col), gram.alias("shingle"))
    return out.distinct() if distinct else out


def jaccard_pairs(
    sh: DataFrame,
    id_col: str,
    threshold: float = 0.2,
    max_doc_freq: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """All-pairs exact n-gram Jaccard >= threshold from a (id, shingle) set.

    Pair generation joins on shingle; `max_doc_freq` drops shingles present
    in more than that many docs first (stop-shingle removal — the scale
    guard; the dropped mass only lowers Jaccard estimates of unrelated
    pairs). Returns (id_a, id_b, jaccard) with id_a < id_b.

    Cap form, measured (r6, sf0.1 medians): this partial-agged
    groupBy(df) + semi-join costs +1.1 s of local stage overhead vs
    uncapped (2.79 vs 1.67). Two cheaper-looking forms were measured and
    REJECTED: count-over-Window.partitionBy(shingle) is nearly free
    locally (+0.13 s — the window's by-shingle exchange is reused by the
    pair join) but buffers/spills a hot shingle's ENTIRE row set in one
    window task — O(df) single-task state in exactly the pathological
    case the cap exists for; a broadcast anti-join against the tiny
    drop-list measured identical to the semi form (2.34 vs 2.34 — the
    cost is the df aggregation pass, not the join type). The semi form
    keeps map-side partials, streams the probe, and is AQE-splittable —
    the scale-robust shape; the local overhead is fixed stage cost that
    amortizes at corpus scale.

    `materialize` (default True) checkpoints the capped shingle table
    once (session.truncate_lineage, lazy): FOUR consumers read it (the
    per-doc size aggregate, both sides of the pair self-join) and
    exchange reuse does not unify their probe-side subtrees — the
    before-plan showed the shingle explode + distinct + df-cap chain
    replicated four times (16 parquet scans in the gate plan). One
    materialization = one pass over the corpus instead of four at any
    scale; pass False to keep the pure-lineage form."""
    sh = sh.select(F.col(id_col).alias("doc"), "shingle")
    if max_doc_freq is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_doc_freq)
            .select("shingle")
        )
        # re-select: the USING join puts the join column FIRST, and the
        # positional toDF renames below would silently swap doc<->shingle
        sh = sh.join(keep, "shingle", "left_semi").select("doc", "shingle")
    if materialize:
        sh = truncate_lineage(sh, eager=False)
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    a = sh.toDF("doc_a", "shingle")
    b = sh.toDF("doc_b", "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.toDF("doc_a", "sz_a"), "doc_a")
        .join(sizes.toDF("doc_b", "sz_b"), "doc_b")
        .select(
            F.col("doc_a").alias("id_a"),
            F.col("doc_b").alias("id_b"),
            (
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# Affine rehash constants: deterministic odd multipliers / offsets derived
# once from the portable hash (so the DuckDB oracle can reproduce them).
def _affine_consts(j: int) -> tuple[int, int]:
    import hashlib

    a = int(hashlib.md5(f"minhash-a:{j}".encode()).hexdigest()[:7], 16) * 2 + 1
    b = int(hashlib.md5(f"minhash-b:{j}".encode()).hexdigest()[:7], 16)
    return a, b


_MASK31 = 0x7FFFFFFF


def shingle_arrays(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """(doc, sh_arr) — the per-document shingle ARRAY, never exploded.
    Same expressions as `shingles` (token array materialized in its own
    projection so the transform doesn't re-split per element), but the
    shingles stay a row-local array: consumers that are per-document
    (MinHash mins, distinct-set fingerprints) compute shuffle-free."""
    with_toks = df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("_toks")
    )
    t = F.col("_toks")
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(t) - k, F.lit(0))),
        lambda i: F.concat_ws(" ", *[F.element_at(t, i + j + 1) for j in range(k)]),
    )
    return with_toks.select("doc", sh.alias("sh_arr"))


def minhash_signatures(sh: DataFrame, id_col: str, num_hashes: int = 16) -> DataFrame:
    """MinHash signature columns m0..m{n-1} per doc via the standard
    one-hash + affine-rehash family: m_j = min over shingles of
    (a_j * h31 + b_j) & (2^31-1), h31 = 31 low bits of the portable hash.

    One md5 per shingle (not per shingle x hash); 31-bit operands keep
    a_j*h31 < 2^62 so the arithmetic never overflows signed 64-bit (DuckDB
    raises on overflow). All n mins evaluate inside ONE partial-aggregating
    groupBy — the shuffle carries n longs per doc per partition."""
    h31 = md5_long(F.col("shingle")).bitwiseAND(F.lit(_MASK31))
    base = sh.select(F.col(id_col).alias("doc"), h31.alias("h31"))
    aggs = []
    for j in range(num_hashes):
        a, b = _affine_consts(j)
        aggs.append(
            F.min(
                (F.col("h31") * F.lit(a) + F.lit(b)).bitwiseAND(F.lit(_MASK31))
            ).alias(f"m{j}")
        )
    return base.groupBy("doc").agg(*aggs)


def minhash_rehash_sql(h31_expr: str, j: int) -> str:
    """DuckDB SQL for the identical affine rehash."""
    a, b = _affine_consts(j)
    return f"((({h31_expr}) * {a} + {b}) & {_MASK31})"


def band_buckets(
    signatures: DataFrame, bands: int = 8, rows: int = 2
) -> DataFrame:
    """(doc, band, bucket) — LSH band table of a signature DataFrame.
    Bucket key is md5 of the band's minhashes — uniform shuffle keys at
    any scale. This is the table a deployment PERSISTS as the dedup
    index (bucketed by `bucket` so incremental probes don't shuffle the
    corpus side)."""
    return signatures.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"m{b * rows + r}").cast("string")
                                    for r in range(rows)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 8, rows: int = 2
) -> DataFrame:
    """Band the signature (bands x rows) and emit distinct candidate pairs
    sharing any band bucket."""
    banded = band_buckets(signatures, bands, rows)
    a = banded.toDF("doc_a", "band", "bucket")
    b = banded.toDF("doc_b", "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def dup_clusters(
    pairs: DataFrame,
    max_iter: int = 20,
    checkpoint_every: int | None = 5,
    probe_every: int = 2,
) -> DataFrame:
    """Transitive closure of near-dup pairs: connected components via
    iterative min-label propagation (the step that turns pairwise matches
    into dedup groups). Each iteration is one join + one min-agg; the loop
    terminates when no label changes (checked with a cheap count) or at
    max_iter. Iterative by nature — not SQL-expressible in one query.

    `probe_every` batches the convergence probe: the limit(1) count is a
    driver-synchronized JOB, so probing every round serializes the loop
    into one job per iteration (the r14 scaling block measured the
    iterative gates mildly ANTI-scaling 8->32 cores on exactly this).
    Probing every k-th round lets k iterations pipeline into one job
    (lazy persists chain until the probe materializes them) at the cost
    of at most k-1 idempotent extra rounds after the fixed point — a
    converged round recomputes identical labels, so the result is
    value-identical for any k >= 1. Checkpoint rounds already pay a
    materializing job, so the probe is folded into them for free.

    Every `checkpoint_every` iterations the label lineage is truncated
    (session.truncate_lineage): without it each iteration's plan nests
    the previous one, so Catalyst re-analyzes an ever-deeper tree every
    round (quadratic planning on high-diameter graphs — exactly the
    graphs that need many iterations). Truncation uses localCheckpoint
    (executor blocks, fast) by default, or reliable `.checkpoint()`
    automatically when the session has
    `spark.sparkContext.setCheckpointDir` pointed at durable storage —
    the executor-loss posture for dynamic-allocation clusters.

    Input: (id_a, id_b) pairs. Output: (id, cluster_id) for every id that
    appears in a pair, cluster_id = min id of its component."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .persist()
    )
    # Iteration 0 fused with the label init: starting labels are the
    # identity (cluster_id = id), so the first round's neighbor minimum
    # is just min(dst) — labels_1 = least(src, min(dst)) in ONE
    # aggregation over the edge table. The unfused form paid a distinct
    # (the id set), a join against those trivial labels, and the agg;
    # every id appears as src (edges are symmetrized), so the groupBy
    # covers exactly the same id set. One join + one shuffle fewer on
    # every call, at any scale (measured ~35% off the loop at sf0.1).
    new_full = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("_nm"))
        .select(
            F.col("src").alias("id"),
            F.least(F.col("src"), F.col("_nm")).alias("cluster_id"),
            (F.col("_nm") < F.col("src")).alias("_chg"),
        )
        .persist()
    )
    pending: list = [new_full]  # persisted handles awaiting a probe
    labels = new_full.select("id", "cluster_id")
    # Iteration-0 probe stays unbatched: already-converged inputs (the
    # common small-cluster case) exit here without paying a join round.
    changed = new_full.where(F.col("_chg")).limit(1).count()
    it = 0
    since_probe = 0
    while changed and it < max_iter - 1:
        it += 1
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        # _chg rides along instead of a separate new-vs-old join: the new
        # label is least(old, nbr_min), so "some label changed" is exactly
        # "some nbr_min undercuts its old label" — the convergence probe
        # becomes a limit(1) scan of the frame this iteration materializes
        # anyway (one join + one shuffle fewer per iteration).
        new_full = labels.join(
            neighbor_min, labels.id == neighbor_min.src, "left"
        ).select(
            "id",
            F.least(
                F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
            ).alias("cluster_id"),
            (F.col("nbr_min") < F.col("cluster_id")).alias("_chg"),
        )
        ckpt = bool(checkpoint_every) and (it + 1) % checkpoint_every == 0
        if ckpt:
            new_full = truncate_lineage(new_full, eager=True)
        else:
            new_full = new_full.persist()
        labels = new_full.select("id", "cluster_id")
        since_probe += 1
        # Probe on checkpoint rounds (the job already ran) and every
        # probe_every-th round otherwise; skipped rounds stay lazy and
        # pipeline into the next probe's job. Convergence only needs the
        # LATEST round's _chg: no nbr_min undercuts its label <=> the
        # frame is a fixed point, regardless of what skipped rounds did.
        if ckpt or since_probe >= max(1, probe_every):
            changed = new_full.where(F.col("_chg")).limit(1).count()
            since_probe = 0
            # new_full is materialized now — earlier handles are dead
            # weight (recompute-on-eviction falls back to lineage). Keep
            # new_full itself in pending so the final cleanup (or the
            # next probe) drops its cache too, including on the break
            # path below.
            for h in pending:
                h.unpersist()
            pending = [new_full]
            if changed == 0:
                break
        else:
            pending.append(new_full)
    # truncate the RETURNED plan too: up to checkpoint_every-1 rounds of
    # join tower (each doubling) otherwise ride along into every consumer.
    # Materialize BEFORE dropping the edge/label caches it reads through.
    if checkpoint_every:
        labels = truncate_lineage(labels, eager=True)
    for h in pending:
        h.unpersist()
    edges.unpersist()
    return labels


_VERIFY_BROADCAST_MAX_DOCS = 1_000_000


def minhash_verify_mode(n_docs: int | None) -> str:
    """Verify-stage selection policy (r5 'What's wrong #2'): broadcast
    verify ships every doc's shingle set to every executor — O(corpus)
    memory — so it is only legal when the corpus is KNOWN small. The
    crossover is a count the caller already has (catalog stats, parquet
    footer, manifest — the `enumeration_width` pattern): <= 1M docs
    (~1 KB of set per doc -> ~1 GB broadcast) stays broadcast (measured
    6.6x faster at 500k docs, SCALE.md); above it, or with NO hint, the
    scale-safe shuffle form — an unknown corpus size must never default
    into an executor OOM at cluster scale."""
    if n_docs is not None and n_docs <= _VERIFY_BROADCAST_MAX_DOCS:
        return "broadcast"
    return "shuffle"


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    rows: int = 2,
    threshold: float = 0.2,
    verify: str = "auto",
    n_docs: int | None = None,
    materialize: bool = False,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle -> minhash -> band ->
    bucket-join candidates -> exact-Jaccard verify. Output
    (id_a, id_b, jaccard) for verified pairs.

    `materialize` (default False) checkpoints the DOC-SIZED intermediates
    that multiple plan subtrees re-derive from the corpus scan: the
    signature table (doc + num_hashes ints — both band self-join sides
    rebuild it otherwise, since a broadcast build is never unified by
    exchange reuse) and, in broadcast verify, the per-doc shingle-set
    table (both verify sides broadcast-build it). Shingle ROWS are still
    never cached (corpus x k bytes — the r6 note stands); only tables
    bounded by the document count. Net: 4 corpus passes -> 2 — the
    100 TB dial, where re-shingling the corpus dwarfs a doc-sized
    checkpoint. Default OFF: at bench scale the re-derivation is cheaper
    than the checkpoint round-trip (interleaved A/B at sf0.1, 8 paired
    passes: 1.22x slower materialized), and micro-batch streaming
    callers never want it.

    `verify` picks the exact-Jaccard stage's physical form:
    - "auto" (default): `minhash_verify_mode(n_docs)` — broadcast when
      the optional corpus-size hint says the set table fits executors,
      the scale-safe shuffle otherwise (including hint absent).
    - "broadcast": per-doc shingle SETS broadcast, two map-side
      lookups + array_intersect. Right while the set table fits the
      broadcast budget.
    - "shuffle": the 100 TB form — candidates join the flat (doc,
      shingle) table on doc_a (one hash shuffle), then match doc_b's
      shingles on (doc_b, shingle) (second shuffle), count matches.
      No broadcast of anything corpus-sized; identical output
      (test-pinned)."""
    if verify == "auto":
        verify = minhash_verify_mode(n_docs)
    # Signatures stay the EXPLODED groupBy form on purpose: map-side
    # partial aggregation collapses each partition to 16 longs per doc
    # before the exchange (near-zero shuffle), and the min-agg runs in
    # whole-stage codegen. The tempting all-HOF alternative (16
    # array_min(transform(...)) over a per-doc shingle array) removes
    # that tiny shuffle but measured 1.75x SLOWER: higher-order
    # functions evaluate their lambda interpreted, outside codegen.
    # No persist: the two consumers re-derive shingles from the scan —
    # at 100 TB a shingle cache would not fit anyway; recompute-from-
    # scan is the scale-correct shape.
    sh = shingles(df, id_col, text_col, k, distinct=False)
    sigs = minhash_signatures(sh, id_col, num_hashes)
    if materialize:
        from spdb_spark.session import truncate_lineage

        sigs = truncate_lineage(sigs, eager=False)
    cands = lsh_candidate_pairs(sigs, bands, rows)
    if verify == "shuffle":
        sh_d = sh.select(F.col(id_col).alias("doc"), "shingle").distinct()
        sizes = sh_d.groupBy("doc").agg(F.count("*").alias("sz"))
        inter = (
            cands.join(sh_d.toDF("doc_a", "shingle"), "doc_a")
            .join(sh_d.toDF("doc_b", "shingle"), ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("inter"))
            .join(sizes.toDF("doc_a", "sz_a"), "doc_a")
            .join(sizes.toDF("doc_b", "sz_b"), "doc_b")
        )
    else:
        # Verify sets DO use the array form: distinct-set per doc is a
        # row-local array op (shingle_arrays + array_distinct), where
        # the old groupBy(collect_set) shuffled every shingle row with
        # no map-side reduction (collect_set partials are the full
        # sets). One whole-corpus shuffle gone, local cost unchanged.
        sh_sets = shingle_arrays(df, id_col, text_col, k).select(
            "doc",
            F.array_sort(F.array_distinct(F.col("sh_arr"))).alias("sh_set"),
        )
        if materialize:
            from spdb_spark.session import truncate_lineage

            sh_sets = truncate_lineage(sh_sets, eager=False)
        sh_sets = F.broadcast(sh_sets)
        inter = (
            cands.join(sh_sets.toDF("doc_a", "set_a"), "doc_a")
            .join(sh_sets.toDF("doc_b", "set_b"), "doc_b")
            .select(
                "doc_a",
                "doc_b",
                F.size(F.array_intersect(F.col("set_a"), F.col("set_b"))).alias("inter"),
                F.size("set_a").alias("sz_a"),
                F.size("set_b").alias("sz_b"),
            )
        )
    return (
        inter.select(
            F.col("doc_a").alias("id_a"),
            F.col("doc_b").alias("id_b"),
            (
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def incremental_minhash_dedup(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    rows: int = 2,
    threshold: float = 0.2,
    corpus_bands: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup: a NEW batch probed against the stored corpus,
    never re-pairing the corpus with itself. Returns
    (new_id, corpus_id, jaccard) for verified matches.

    This is the 100 TB dedup workflow: the corpus's band table
    (`band_buckets` output, same hash family) is a persisted index —
    pass it as `corpus_bands` and only the new batch is shingled +
    signed. Candidates come from joining new-side bands against the
    index (shuffle sized by the new batch; with the index bucketed by
    `bucket`, the corpus side doesn't move). Exact-Jaccard verification
    recomputes shingle sets ONLY for candidate corpus docs (left-semi
    pushdown into the corpus scan).
    """
    sh_new = shingles(new_docs, id_col, text_col, k, distinct=False)
    nb = band_buckets(
        minhash_signatures(sh_new, id_col, num_hashes), bands, rows
    ).toDF("new_id", "band", "bucket")
    if corpus_bands is None:
        sh_c = shingles(corpus_docs, id_col, text_col, k, distinct=False)
        corpus_bands = band_buckets(
            minhash_signatures(sh_c, id_col, num_hashes), bands, rows
        )
    cb = corpus_bands.toDF("corpus_id", "band", "bucket")
    cands = nb.join(cb, ["band", "bucket"]).select("new_id", "corpus_id").distinct()

    # Verify sets from the row-local array form (shingle_arrays +
    # array_distinct): collect_set over exploded shingles has no map-side
    # reduction, so it shuffled every shingle row — see PLANS.md's
    # HOF-vs-partial-agg rule
    new_sets = (
        shingle_arrays(new_docs, id_col, text_col, k)
        .select(
            F.col("doc").alias("new_id"),
            F.array_sort(F.array_distinct("sh_arr")).alias("set_n"),
        )
        .join(cands.select("new_id").distinct(), "new_id", "left_semi")
    )
    cand_corpus = corpus_docs.join(
        cands.select(F.col("corpus_id").alias(id_col)).distinct(), id_col, "left_semi"
    )
    corp_sets = shingle_arrays(cand_corpus, id_col, text_col, k).select(
        F.col("doc").alias("corpus_id"),
        F.array_sort(F.array_distinct("sh_arr")).alias("set_c"),
    )
    inter = (
        cands.join(new_sets, "new_id")
        .join(corp_sets, "corpus_id")
        .select(
            "new_id",
            "corpus_id",
            F.size(F.array_intersect(F.col("set_n"), F.col("set_c"))).alias("inter"),
            F.size("set_n").alias("sz_n"),
            F.size("set_c").alias("sz_c"),
        )
    )
    return (
        inter.select(
            "new_id",
            "corpus_id",
            (
                F.col("inter") / (F.col("sz_n") + F.col("sz_c") - F.col("inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def keep_best(
    df: DataFrame,
    id_col: str,
    text_col: str,
    quality_col: str,
) -> DataFrame:
    """Canonical-document selection for near-exact dup groups: within each
    token-set-fingerprint group, keep the highest-`quality_col` doc
    (ties -> smallest id). Returns one row per group with >1 member:
    (fingerprint, keep_id, n_docs, n_dropped).

    The reference policy everywhere else is min-id; real curation keeps
    the best copy instead. One shuffle (groupBy fingerprint) using a
    max_by-style struct-max — no window, no second pass. quality must be
    computed identically across engines (bit-identical doubles) for the
    argmax to be portable."""
    from spdb_spark.functions.text import tokens as _tokens

    fp = F.md5(
        F.array_join(F.array_sort(F.array_distinct(_tokens(F.col(text_col)))), " ")
    )
    # argmax via struct ordering: (quality DESC, id ASC) == max of
    # struct(quality, -id) for numeric ids; use min of struct(-q, id)
    # to stay sign-agnostic on the id type.
    return (
        df.select(
            fp.alias("fingerprint"),
            F.col(id_col),
            F.col(quality_col).alias("_q"),
        )
        .groupBy("fingerprint")
        .agg(
            F.min(F.struct((-F.col("_q")).alias("nq"), F.col(id_col).alias("i")))
            .alias("best"),
            F.count("*").alias("n_docs"),
        )
        .where(F.col("n_docs") > 1)
        .select(
            "fingerprint",
            F.col("best.i").alias("keep_id"),
            "n_docs",
            (F.col("n_docs") - 1).alias("n_dropped"),
        )
    )


def shared_ngram_coverage(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Exact-substring overlap detection (the k-gram form of
    suffix-array dedup): for each doc, how much of it is covered by
    k-token grams that also appear in at least one OTHER doc. Returns
    (id, n_grams, n_shared, shared_frac) for docs with any overlap.

    Pipeline: explode grams -> per-gram distinct-doc count (partial
    aggs both sides) -> flag grams with doc freq > 1 -> per-doc
    re-aggregate. The gram join is keyed by the gram string (uniform,
    unskewed); the shared-gram set is boilerplate-sized in practice, so
    AQE turns the back-join into a broadcast when it fits."""
    from spdb_spark.functions.text import exploded_word_ngrams
    from spdb_spark.functions.text import tokens as _tokens

    staged = df.select(
        F.col(id_col).alias("doc"),
        _tokens(F.col(text_col)).alias("_toks"),
        # n_grams must be a SCALAR next to the explode: putting
        # size(grams) in the same projection forces the Generate to
        # retain the whole gram array on every exploded row (quadratic
        # row-copy per doc — measured 30x slower); a scalar derived from
        # the token count carries for free
        F.greatest(
            F.size(_tokens(F.col(text_col))) - (k - 1), F.lit(0)
        ).cast("long").alias("n_grams"),
    )
    g = exploded_word_ngrams(
        staged, "_toks", k, out="gram", keep=("doc", "n_grams")
    )
    shared = (
        g.groupBy("gram")
        .agg(F.count_distinct("doc").alias("nd"))
        .where(F.col("nd") > 1)
        .select("gram")
    )
    return (
        g.join(shared, "gram")
        .groupBy("doc", "n_grams")
        .agg(F.count("*").alias("n_shared"))
        .select(
            F.col("doc").alias(id_col),
            "n_grams",
            "n_shared",
            (F.floor(F.col("n_shared") * 1000000 / F.col("n_grams")) / 1000000).alias(
                "shared_frac"
            ),
        )
    )


# --- paragraph-level dedup (CCNet / RefinedWeb line-dedup style) ----------

def paragraphs(df: DataFrame, id_col: str, text_col: str, sep: str = "\n\n") -> DataFrame:
    """(doc, idx, para) — ordered paragraph units split on a structural
    delimiter (CCNet splits on newline, RefinedWeb on blank lines). A
    narrow posexplode: no shuffle, idx preserves document order."""
    return df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("idx", "para"),
    )


def word_chunk_paragraphs(
    df: DataFrame, id_col: str, text_col: str, chunk_words: int = 10
) -> DataFrame:
    """(doc, idx, para) with fixed word-count chunks as the dedup unit —
    for corpora whose text has no structural delimiter (the synthetic
    fixture). Same downstream contract as `paragraphs`."""
    t = F.col("_toks")
    n_chunks = F.greatest(
        F.ceil(F.size(t) / F.lit(chunk_words)).cast("int"), F.lit(1)
    )
    # chunk join runs POST-explode (whole-stage codegen), not inside
    # transform's interpreted lambda; the exploded sequence value IS the
    # posexplode idx
    e = df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("_toks")
    ).select(
        "doc",
        "_toks",
        F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("idx"),
    )
    return e.select(
        "doc",
        "idx",
        F.concat_ws(
            " ", F.slice(t, F.col("idx") * chunk_words + 1, chunk_words)
        ).alias("para"),
    )


def paragraph_dedup(paras: DataFrame, min_df: int = 2, keep_first: bool = True) -> DataFrame:
    """Corpus-wide duplicated-paragraph removal: drop every occurrence of
    a paragraph whose corpus frequency reaches `min_df`, except (when
    `keep_first`) its single canonical first occurrence — min (doc, idx)
    lexicographically, deterministic under any partitioning.

    Scale shape: one groupBy on the paragraph hash (partial-agg'd: the
    exchange carries one row per DISTINCT paragraph per partition, and a
    32-hex md5 key is uniform — boilerplate paragraphs with huge df do
    not skew the shuffle), then a back-join on the same hash key that AQE
    plans as it likes. Never materializes per-paragraph occurrence lists.

    Input: (doc, idx, para). Output: kept (doc, idx, para).
    """
    occ = paras.select("doc", "idx", "para", F.md5(F.col("para")).alias("ph"))
    stats = occ.groupBy("ph").agg(
        F.count("*").alias("df"),
        F.min(F.struct(F.col("doc"), F.col("idx"))).alias("first_occ"),
    )
    joined = occ.join(stats, "ph")
    keep = F.col("df") < F.lit(min_df)
    if keep_first:
        keep = keep | (
            (F.col("doc") == F.col("first_occ.doc"))
            & (F.col("idx") == F.col("first_occ.idx"))
        )
    return joined.where(keep).select("doc", "idx", "para")


def reassemble_paragraph_docs(
    paras: DataFrame, kept: DataFrame, sep: str = " "
) -> DataFrame:
    """Rebuild cleaned documents from kept paragraphs, preserving
    in-document order: (doc, clean_text, n_paras, n_kept). Docs whose
    every paragraph was dropped survive with clean_text = ''.

    One shuffle per aggregate (both keyed by doc); the ordered concat is
    a row-local array_sort over the doc's own kept paragraphs — no
    window, no global sort."""
    totals = paras.groupBy("doc").agg(F.count("*").alias("n_paras"))
    reasm = kept.groupBy("doc").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    return totals.join(reasm, "doc", "left").select(
        "doc",
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        "n_paras",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
    )


def paragraph_provenance(paras: DataFrame, min_df: int = 2) -> DataFrame:
    """Attribution view of the paragraph dedup: every occurrence that
    `paragraph_dedup` would DROP, mapped to the canonical occurrence that
    shadows it — (doc, idx, canonical_doc, canonical_idx). The audit
    trail curation pipelines need ("why did this text disappear, and
    where does it live now"). Same single hash-keyed aggregate + back-
    join as the dedup itself."""
    occ = paras.select("doc", "idx", F.md5(F.col("para")).alias("ph"))
    stats = occ.groupBy("ph").agg(
        F.count("*").alias("df"),
        F.min(F.struct(F.col("doc"), F.col("idx"))).alias("first_occ"),
    )
    joined = occ.join(stats.where(F.col("df") >= F.lit(min_df)), "ph")
    return joined.where(
        (F.col("doc") != F.col("first_occ.doc"))
        | (F.col("idx") != F.col("first_occ.idx"))
    ).select(
        "doc",
        "idx",
        F.col("first_occ.doc").alias("canonical_doc"),
        F.col("first_occ.idx").alias("canonical_idx"),
    )


def cross_corpus_gram_novelty(
    df: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
    eval_source: str,
    k: int = 3,
) -> DataFrame:
    """N-gram novelty of one source against the rest of the corpus (the
    measurement complement of `contamination_pairs`): per eval doc, the
    fraction of its k-grams NOT present anywhere in the other sources —
    low novelty = the eval text largely reappears in training data.

    100 TB shape: the eval side is benchmark-sized, so its distinct gram
    set broadcasts; the training corpus streams through ONE broadcast
    semi-join (no corpus shuffle) to find which eval grams it contains,
    and that matched set (<= eval grams) broadcasts back into the per-doc
    coverage join. Returns (id, n_grams, n_seen, novelty_frac)."""
    from spdb_spark.functions.text import exploded_word_ngrams
    from spdb_spark.functions.text import tokens as _tokens

    staged = df.select(
        F.col(id_col).alias("doc"),
        F.col(source_col).alias("src"),
        _tokens(F.col(text_col)).alias("_toks"),
    )
    staged = staged.withColumn(
        "n_grams",
        F.greatest(F.size("_toks") - (k - 1), F.lit(0)).cast("long"),
    )
    grams = exploded_word_ngrams(
        staged, "_toks", k, out="gram", keep=("doc", "src", "n_grams")
    )
    eval_grams = grams.where(F.col("src") == F.lit(eval_source))
    eval_gram_set = eval_grams.select("gram").distinct()
    seen = (
        grams.where(F.col("src") != F.lit(eval_source))
        .join(F.broadcast(eval_gram_set), "gram", "left_semi")
        .select("gram")
        .distinct()
    )
    return (
        eval_grams.join(F.broadcast(seen.withColumn("_seen", F.lit(1))), "gram", "left")
        .groupBy("doc", "n_grams")
        .agg(F.sum(F.coalesce(F.col("_seen"), F.lit(0))).alias("n_seen"))
        .select(
            F.col("doc").alias(id_col),
            "n_grams",
            F.col("n_seen").cast("long").alias("n_seen"),
            (
                F.lit(1.0)
                - F.floor(F.col("n_seen") * 1000000 / F.col("n_grams")) / 1000000
            ).alias("novelty_frac"),
        )
        .where(F.col("n_grams") > 0)
    )


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-duplicate PAIRS at scale: banded candidate generation
    over the per-doc signatures (text.simhash), then exact Hamming verify
    — completing the SimHash dedup story (the per-doc signature query is
    `llm_dedup_simhash`; this is its pair-generation stage).

    Pigeonhole guarantee: with `bands` equal-width bands of the `bits`-bit
    signature, any pair within Hamming distance <= bands - 1 shares at
    least one identical band, so max_hamming <= bands - 1 gives EXACT
    recall (every qualifying pair is a candidate); the default (64 bits,
    4 bands, max_hamming 3) is the classic near-dup configuration AND
    the scale-safe one — 16-bit bands give 65536 keys per band, so the
    32-bit default's 479 s bucket-saturation cliff at 100k docs can't
    happen until ~10M docs.

    Scale shape: candidates come from a band-keyed equi-join (never
    all-pairs) — the same posture as MinHash LSH banding
    (minhash_lsh_dedup); the verify is a narrow bit_count(xor) on the
    already-joined pair rows. CAPACITY IS THE BAND WIDTH: each band has
    2^(bits/bands) possible keys, so expected bucket size is
    n / 2^(bits/bands) and candidate volume grows as n^2 / 2^(bits/bands)
    once buckets saturate. Measured: the 32-bit/8-bit-band default hit
    479 s at 100k docs (256 keys/band -> ~400-doc buckets), while
    bits=64, bands=4 (16-bit bands, 65536 keys) runs the same corpus in
    seconds — use 64-bit signatures beyond ~10k docs (tools/
    stress_docs.py measures both). Returns (id_a, id_b, hamming),
    id_a < id_b, exact distances, deduplicated."""
    from spdb_spark.functions.text import simhash

    if bits % bands:
        raise ValueError("simhash_neardup_pairs: bands must divide bits")
    width = bits // bands
    mask = (1 << width) - 1
    # both join sides derive from the signatures; without truncation the
    # token-aggregation pipeline executes once PER SIDE (exchange reuse
    # does not unify the duplicated subtrees — the closing() lesson).
    # Signatures are one row per doc, so the checkpoint is tiny; lazy so
    # plan construction stays action-free.
    sig = truncate_lineage(simhash(df, id_col, text_col, bits), eager=False)
    return hamming_neardup_pairs(
        sig, id_col, "simhash", bits=bits, bands=bands, max_hamming=max_hamming
    )


def hamming_neardup_pairs(
    sig: DataFrame,
    id_col: str,
    sig_col: str,
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Banded Hamming near-dup pairs over PRECOMPUTED bit signatures —
    the engine under simhash_neardup_pairs, shared by any 64-bit
    fingerprint (text SimHash, image pHash). Same pigeonhole guarantee
    and band-capacity economics as documented there."""
    if bits % bands:
        raise ValueError("hamming_neardup_pairs: bands must divide bits")
    width = bits // bands
    mask = (1 << width) - 1
    banded = sig.select(
        F.col(id_col).alias("id"),
        F.col(sig_col).alias("_sig"),
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1)).cast("array<int>")).alias(
            "band"
        ),
    ).withColumn(
        # LOGICAL shift + AND: a 64-bit signature with bit 63 set is a
        # negative long, and arithmetic shiftright would sign-extend into
        # the band bits (and % would go negative) — unsigned shift keeps
        # band keys equal iff the band bits are equal, for any width
        "band_key",
        F.expr(f"shiftrightunsigned(_sig, band * {width})").bitwiseAND(
            F.lit(mask)
        ),
    )
    a = banded.select(
        "band", "band_key", F.col("id").alias("id_a"), F.col("_sig").alias("sig_a")
    )
    b = banded.select(
        "band", "band_key", F.col("id").alias("id_b"), F.col("_sig").alias("sig_b")
    )
    # verify INSIDE the join projection, dedup the surviving scalars (the
    # score-in-join lesson from the semantic-dedup pair scoring): the
    # Hamming distance of a pair is identical in every shared band, so
    # filtering before dropDuplicates is equivalent — but this way the
    # dedup exchange carries 3-scalar survivor rows instead of every
    # banded candidate with both signatures attached, and candidates
    # failing the verify die map-side. Measured at 500k docs / 100-dup
    # families (24.7M true pairs): 440 s -> 35 s.
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.expr("bit_count(sig_a ^ sig_b)").cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def containment_pairs(
    sh: DataFrame,
    id_col: str,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Shingle CONTAINMENT C(A->B) = |A∩B| / |A| — the asymmetric
    near-dup measure that catches partial copies (a short doc quoted
    inside a long one), which symmetric Jaccard under-scores (the union
    in its denominator is dominated by the longer doc). The standard
    companion to Jaccard in pretraining dedup (quote/boilerplate
    containment sweeps).

    Same scale shape as `jaccard_pairs`: pair generation is a
    shingle-keyed equi-join with optional stop-shingle capping BEFORE
    the join (`max_doc_freq` — the guard that keeps the join linear at
    corpus scale). Emits one row per unordered pair with BOTH
    directions: (id_a, id_b, containment_a, containment_b), id_a < id_b,
    kept when either direction >= threshold."""
    sh = sh.select(F.col(id_col).alias("doc"), "shingle")
    if max_doc_freq is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_doc_freq)
            .select("shingle")
        )
        # re-select: the USING join puts the join column FIRST, and the
        # positional toDF renames below would silently swap doc<->shingle
        sh = sh.join(keep, "shingle", "left_semi").select("doc", "shingle")
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    a = sh.toDF("doc_a", "shingle")
    b = sh.toDF("doc_b", "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.toDF("doc_a", "sz_a"), "doc_a")
        .join(sizes.toDF("doc_b", "sz_b"), "doc_b")
        .select(
            F.col("doc_a").alias("id_a"),
            F.col("doc_b").alias("id_b"),
            (F.col("inter") / F.col("sz_a")).alias("containment_a"),
            (F.col("inter") / F.col("sz_b")).alias("containment_b"),
        )
        .where(
            (F.col("containment_a") >= threshold)
            | (F.col("containment_b") >= threshold)
        )
    )


def incremental_dup_clusters(
    labels: DataFrame,
    new_pairs: DataFrame,
    max_iter: int = 20,
    checkpoint_every: int | None = 5,
) -> DataFrame:
    """Incremental transitive-closure maintenance: fold NEW near-dup
    pairs into an EXISTING (id, cluster_id) labeling without revisiting
    the original candidate-pair set — the cluster-level counterpart of
    `incremental_minhash_dedup` (which produces the new pairs from a
    persisted band index).

    The existing clustering collapses to its star graph (every id joined
    to its cluster representative), which is connectivity-equivalent to
    the original pair set but only O(ids) edges with diameter 2; the
    min-label propagation then runs over star + new edges. A batch of
    new pairs therefore costs O(labeled ids + batch) per round with
    round count tracking how many old clusters the batch CHAINS together
    — not the size or diameter of the historical pair set. Output
    contract matches `dup_clusters` (cluster_id = min member id), so
    incremental == full recompute on the union (test-pinned)."""
    star = labels.select(
        F.col("id").alias("id_a"), F.col("cluster_id").alias("id_b")
    )
    edges = star.unionByName(
        new_pairs.select(
            F.col("id_a").cast(star.schema["id_a"].dataType),
            F.col("id_b").cast(star.schema["id_b"].dataType),
        )
    )
    return dup_clusters(
        edges, max_iter=max_iter, checkpoint_every=checkpoint_every
    )
