"""Interpolated Kneser-Ney trigram language model — the real CCNet-style
quality signal: perplexity of each document under an n-gram LM trained
on the corpus itself (Wenzek et al. filter CommonCrawl with a KenLM
5-gram; the published smoothing for such models is interpolated
modified Kneser-Ney — this is the classic single-discount form of it,
Kneser & Ney 1995 / Chen & Goodman 1999).

Everything is count algebra over two corpus aggregates, so the whole
model trains in one distributed pass family (no iteration, no UDFs):

    c3(u,v,w)      trigram occurrence counts          (one groupBy)
    c2ctx(u,v)     = sum_w c3          t3(u,v) = |{w : c3 > 0}|
    n2cont(v,w)    = |{u : c3 > 0}|    (continuation counts, from the
    n2ctx(v)       = |{(u,w)}|          trigram TYPE table — lower
    t2(v)          = |{w}|              orders always derive from the
    n1cont(w)      = |{v : (v,w)}|      highest order in KN)
    n2types        = |{(v,w)}|         t1 = |{w : n1cont > 0}|
    V              = |vocabulary|

    P1(w)     = max(n1cont-D,0)/n2types + D*t1/n2types/V
    P2(w|v)   = max(n2cont-D,0)/n2ctx   + D*t2/n2ctx   * P1(w)
    P3(w|u,v) = max(c3-D,0)/c2ctx       + D*t3/c2ctx   * P2(w|v)

with absolute discount D = 0.75 and a uniform 1/V base, so every
probability is strictly positive and sums to 1 over the vocabulary.

Engine-parity protocol: each trigram's log-probability quantizes to
MICRO-NATS (floor(ln(P3) * 1e6) as BIGINT) before the per-document
aggregate, so the document mean is integer arithmetic — order-
independent across partitions and engines; the only cross-engine float
exposure is a 1-ulp ln() difference landing exactly on a 1e-6 floor
boundary (~1e-10 per trigram). The DuckDB twin replays the identical
expression shape (SQL_KN_TRIGRAM in suite_llm.py).

Scale shape: count tables are bounded by distinct n-gram TYPES (grows
~ O(corpus^0.8), far below corpus size); the scoring stream joins them
on gram keys — the standard LM-training join topology, map-side
partial-aggregated everywhere. At 100 TB the count tables shuffle-join
(they no longer broadcast) and a hot-gram salt on the score stream is
the documented dial; nothing here collects to the driver except the
two single-row totals (n2types, t1, V), which broadcast.

Reference-capability analogue: none — spdb has no text tier; this is
north-star surface next to text.py's unigram/bigram proxies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spdb_spark.functions.text import exploded_word_ngrams, tokens

DISCOUNT = 0.75


def _part(g: Column, which: str) -> Column:
    """Split a space-joined trigram into its pieces (tokens are
    whitespace-split upstream, so they contain no spaces)."""
    if which == "u":
        return F.substring_index(g, " ", 1)
    if which == "v":
        return F.substring_index(F.substring_index(g, " ", 2), " ", -1)
    if which == "w":
        return F.substring_index(g, " ", -1)
    if which == "uv":
        return F.substring_index(g, " ", 2)
    if which == "vw":
        return F.substring_index(g, " ", -2)
    raise ValueError(which)


def kn_trigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = DISCOUNT,
    materialize: bool = True,
    materialize_levels: bool = False,
    broadcast_levels: bool | None = None,
) -> DataFrame:
    """(id_col, mean_logprob, n_trigrams) — mean interpolated-KN
    trigram log-probability per document (natural log, micro-nat
    quantized; higher = more typical of the corpus). Documents with
    fewer than 3 tokens have no trigrams and are excluded.

    `materialize` lazily checkpoints the trigram occurrence stream and
    the type table (consumed 2x and 4x respectively by the count tables
    + scoring joins) — the crawl_to_corpus posture; pass False to keep
    pure lineage.

    `materialize_levels` additionally checkpoints cont2 — the count
    table with a deep derivation chain hanging off it (cont1 replays
    tri->cont2 as its own subtree, totals replays tri->cont2->cont1;
    exchange reuse never unifies the replicas — see kn_ngram_model).
    Default OFF: at bench scale the redundant replays execute as
    CONCURRENT broadcast-build jobs on otherwise-idle cores, while the
    checkpoint serializes the chain into dependent materializations —
    measured 1.2x slower at sf0.1 (11-pass interleaved A/B). Flip it on
    when the type tables are large enough that total work, not the
    critical path, is the budget — the 100 TB posture — or whenever the
    model is reused across scoring runs. `broadcast_levels` (default:
    follow materialize_levels) hints the scoring joins to broadcast the
    materialized tables, restoring the strategy statistics-based
    planning chose before checkpointing stripped the stats (measured 2x
    slower without the hint); pass False when the count tables exceed
    broadcast capacity (the joins then shuffle-join the materialized
    tables; the derive-once win survives)."""
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    d = float(discount)
    if broadcast_levels is None:
        broadcast_levels = materialize_levels

    def _mk_trunc(on: bool):
        def trunc(df: DataFrame) -> DataFrame:
            if not on:
                return df
            from spdb_spark.session import truncate_lineage

            return truncate_lineage(df, eager=False)

        return trunc

    trunc = _mk_trunc(materialize)
    ltrunc = _mk_trunc(materialize_levels)

    toks = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_t")
    ).where(F.size("_t") >= 3)
    grams = trunc(exploded_word_ngrams(toks, "_t", 3, out="g", keep=(id_col,)))

    # --- count tables (all map-side combined groupBys) ---
    tri = trunc(grams.groupBy("g").agg(F.count("*").alias("c3")))
    tri_keys = tri.select(
        "g",
        "c3",
        _part(F.col("g"), "uv").alias("uv"),
        _part(F.col("g"), "vw").alias("vw"),
        _part(F.col("g"), "v").alias("v"),
        _part(F.col("g"), "w").alias("w"),
    )
    ctx = tri_keys.groupBy("uv").agg(
        F.sum("c3").alias("c2ctx"), F.count("*").alias("t3")
    )
    # cont2 is the one DEEP-chain table (cont1 and totals both hang
    # off it): under materialize_levels they derive from the computed
    # table instead of each replaying tri -> cont2 as its own subtree.
    # ctx/mid/cont1 stay pure single aggregates — their replays are one
    # level over a checkpoint scan (cheap), while a localCheckpoint per
    # table adds a materialization barrier (measured: all-level
    # checkpointing is 1.29x slower at sf0.1 than none).
    cont2 = ltrunc(tri_keys.groupBy("vw").agg(F.count("*").alias("n2cont")))
    mid = tri_keys.groupBy("v").agg(
        F.count("*").alias("n2ctx"), F.count_distinct("w").alias("t2")
    )
    cont1 = cont2.select(
        F.substring_index(F.col("vw"), " ", -1).alias("w")
    ).groupBy("w").agg(F.count("*").alias("n1cont"))
    # Both totals come from ONE pass over cont1: |cont2| = sum(n1cont)
    # (every vw type contributes once to its w's continuation count)
    # and t1 = |cont1|. Two separate count-aggregates would each replay
    # the whole tri -> cont2 [-> cont1] derivation chain as its own
    # subtree (exchange reuse never unifies them: column pruning makes
    # the subtrees non-identical) — same integers, one chain fewer.
    # coalesce: sum() over an empty cont1 is NULL where the count-based
    # form this replaced yielded 0 — keep the totals row well-defined on
    # an empty corpus (the scoring join is empty there, so non-empty
    # corpora are value-identical either way).
    totals = cont1.agg(
        F.coalesce(F.sum("n1cont"), F.lit(0)).alias("n2types"),
        F.count("*").alias("t1"),
    ).crossJoin(
        toks.select(F.explode("_t").alias("_tok")).agg(
            F.count_distinct("_tok").alias("v_size")
        )
    )

    # --- score each distinct trigram TYPE once, then attach to the
    # occurrence stream by g (the kn_ngram_logprob shape): lp_q is a
    # pure function of the type's count-table row, so per-type and
    # per-occurrence evaluation are value-identical — but the five
    # count-table joins now act on the type table (sublinear in corpus)
    # and the corpus-sized occurrence stream joins exactly once ---
    # Explicit broadcast hints: the materialized count tables are
    # LogicalRDD scans with no statistics, so without the hint the
    # planner demotes these (locally tiny) joins to sort-merge — see
    # the broadcast_levels docstring note for the scale dial.
    def _side(t: DataFrame) -> DataFrame:
        return F.broadcast(t) if broadcast_levels else t

    scored = (
        tri_keys
        .join(_side(ctx), "uv")
        .join(_side(mid), "v")
        .join(_side(cont2), "vw")
        .join(_side(cont1), "w")
        .crossJoin(F.broadcast(totals))
    )
    # The expression SHAPE below is replayed token-for-token by the
    # DuckDB twin — edit both together or neither.
    p1 = (
        F.greatest(F.col("n1cont") - d, F.lit(0.0)) / F.col("n2types")
        + F.lit(d) * F.col("t1") / F.col("n2types") / F.col("v_size")
    )
    p2 = (
        F.greatest(F.col("n2cont") - d, F.lit(0.0)) / F.col("n2ctx")
        + F.lit(d) * F.col("t2") / F.col("n2ctx") * p1
    )
    p3 = (
        F.greatest(F.col("c3") - d, F.lit(0.0)) / F.col("c2ctx")
        + F.lit(d) * F.col("t3") / F.col("c2ctx") * p2
    )
    lp_q = F.floor(F.log(p3) * 1e6).cast("long")
    type_lp = scored.select("g", lp_q.alias("_lpq"))

    return (
        grams.join(type_lp, "g")
        .groupBy(id_col)
        .agg(
            (
                F.floor(F.sum("_lpq").cast("double") / F.count("*")) / 1e6
            ).alias("mean_logprob"),
            F.count("*").alias("n_trigrams"),
        )
    )


def _suffix(g: Column, k: int) -> Column:
    return F.substring_index(g, " ", -k)


def _prefix(g: Column, k: int) -> Column:
    return F.substring_index(g, " ", k)


def kn_ngram_model(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize: bool = True,
    materialize_levels: bool = False,
    broadcast_levels: bool | None = None,
) -> dict:
    """Train the order-n KN count tables ONCE and reuse them across
    scoring runs — the (corpus, n)-keyed analogue of `kn_model` for the
    general-order form. Returns {"n", "top", "ctx_top", "types",
    "ctxs", "totals"}; `kn_ngram_logprob(docs, n, model=...)` consumes
    it without re-deriving anything.

    materialize checkpoints the top-order type table (via
    session.truncate_lineage): it feeds the whole cascade plus the
    scoring join and is the one table whose recompute re-runs the
    corpus explode+count.

    materialize_levels additionally checkpoints every types[k] in the
    suffix cascade. The types tables form a chain (types[k] derives
    from types[k+1]) that every scoring-join build side replays as its
    own subtree — exchange reuse NEVER unifies the replicas (column
    pruning makes them non-canonical; measured 0 ReusedExchange, 10
    checkpoint scans in the executed kn5 plan) — so materializing each
    level makes every derivation run exactly once. Default OFF: at
    bench scale the redundant replays execute as CONCURRENT
    broadcast-build jobs on otherwise-idle cores, while the checkpoint
    SERIALIZES the cascade into dependent materializations — measured
    1.2x slower at sf0.1 (11-pass interleaved A/B; checkpointing
    ctxs/ctx_top too is 1.29x). Flip it on when the type tables are
    large enough that total aggregation work, not the critical path,
    is the budget — the 100 TB posture, where each replay is a full
    O(corpus^0.8) aggregation cascade — and whenever the model is
    REUSED across scoring runs (the frozen-model/streaming shape: the
    one-time checkpoint amortizes over every batch). The ctx tables
    stay pure single aggregates either way: their replays are one
    exchange over the level below, cheaper than a per-table
    materialization barrier. The occurrence stream is NOT checkpointed — under
    per-type scoring it has exactly two consumers (the top count and
    the final score join), both narrow re-reads of the scan, and
    checkpointing an n-x-corpus string stream costs more than scanning
    the corpus twice (measured at sf0.1; the same trade-off holds
    harder at 100 TB).

    broadcast_levels (default: follow `materialize_levels`) hints the
    scoring joins to BROADCAST the materialized level tables. Checkpointed
    tables are LogicalRDD scans whose size AQE cannot estimate, so
    without the hint Spark silently demotes the (locally tiny)
    broadcast joins to sort-merge — measured 2x slower at sf0.1 when
    r14 tried level checkpointing without hints. The hint restores
    exactly the strategy statistics-based planning chose before
    materialization. Scale dial: type tables grow ~O(corpus^0.8); on a
    corpus whose high-order type tables exceed broadcast capacity
    (~8 GB hard cap), pass broadcast_levels=False — the joins
    shuffle-join the materialized tables, keeping the
    derive-once-per-level win, which is the part that matters at
    100 TB (the published-practice analogue: a KN scorer whose model
    no longer fits every node stops shipping it whole)."""
    if not 2 <= n <= 8:
        raise ValueError(f"n must be in [2, 8], got {n}")
    if broadcast_levels is None:
        broadcast_levels = materialize_levels

    def _mk_trunc(on: bool):
        def trunc(df: DataFrame) -> DataFrame:
            if not on:
                return df
            from spdb_spark.session import truncate_lineage

            return truncate_lineage(df, eager=False)

        return trunc

    trunc = _mk_trunc(materialize)
    ltrunc = _mk_trunc(materialize_levels)

    toks = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_t")
    ).where(F.size("_t") >= n)
    grams = exploded_word_ngrams(toks, "_t", n, out="g", keep=(id_col,))
    top = trunc(grams.groupBy("g").agg(F.count("*").alias("cn")))
    ctx_top = (
        top.select(_prefix(F.col("g"), n - 1).alias("p"), "cn")
        .groupBy("p")
        .agg(F.sum("cn").alias("ctxsum"), F.count("*").alias("tdistn"))
    )
    types: dict[int, DataFrame] = {}
    prev, prev_key = top, "g"
    for k in range(n - 1, 0, -1):
        # ltrunc each level: types[k-1] then derives from the
        # MATERIALIZED types[k], so the cascade runs once end to end
        # instead of once per consumer (see the docstring).
        tk = ltrunc(
            prev.select(_suffix(F.col(prev_key), k).alias(f"s{k}"))
            .groupBy(f"s{k}")
            .agg(F.count("*").alias(f"nc{k}"))
        )
        types[k] = tk
        prev, prev_key = tk, f"s{k}"
    ctxs: dict[int, DataFrame] = {}
    for k in range(n - 1, 1, -1):
        ctxs[k] = (
            types[k]
            .select(_prefix(F.col(f"s{k}"), k - 1).alias(f"m{k}"), f"nc{k}")
            .groupBy(f"m{k}")
            .agg(
                F.sum(f"nc{k}").alias(f"denom{k}"),
                F.count("*").alias(f"tdist{k}"),
            )
        )
    # Both totals come from ONE pass over types[1]: |types[2]| =
    # sum(nc1) (each bigram type contributes once to its 1-suffix's
    # continuation count) and t1total = |types[1]|. Two separate
    # count-aggregates would each replay the whole top -> t_{n-1} ->
    # ... -> t1/t2 derivation cascade as its own subtree (exchange
    # reuse never unifies them: column pruning makes the subtrees
    # non-identical) — same integers, one cascade fewer.
    totals = types[1].agg(
        F.coalesce(F.sum("nc1"), F.lit(0)).alias("denom1"),
        F.count("*").alias("t1total"),
    ).crossJoin(
        toks.select(F.explode("_t").alias("_tok")).agg(
            F.count_distinct("_tok").alias("v_size")
        )
    )
    return {
        "n": n,
        "top": top,
        "ctx_top": ctx_top,
        "types": types,
        "ctxs": ctxs,
        "totals": totals,
        "broadcast_levels": bool(broadcast_levels),
        # the tokenized gram stream is not part of the frozen model
        # proper, but self-scoring reuses it (one corpus explode, not
        # two) — callers scoring OTHER corpora ignore it
        "_grams": grams,
    }


def kn_ngram_logprob(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = DISCOUNT,
    materialize: bool = True,
    model: dict | None = None,
    backoff_alpha: float = 0.4,
    materialize_levels: bool = False,
    broadcast_levels: bool | None = None,
) -> DataFrame:
    """Order-n interpolated Kneser-Ney — the published CommonCrawl
    filters score with a KenLM **5-gram**; this is that model order,
    same single-discount smoothing and micro-nat protocol as the
    trigram form. Documents with fewer than n tokens are excluded.

    The recursion derives every lower order from the top-order TYPE
    table exactly as the trigram implementation does: T_k = the
    distinct k-token suffixes of T_{k+1} with continuation count
    N_k = |distinct left extensions|, context tables group T_k by its
    (k-1)-token prefix (denom_k = sum N_k, tdist_k = |{w}|), down to
    the uniform 1/V base. The expression shapes are token-identical to
    `kn_trigram_logprob`'s at every level, so **kn_ngram_logprob(docs,
    3) is bit-equal to kn_trigram_logprob(docs)** — pinned in tests as
    a two-implementation cross-check.

    `model` accepts a prebuilt `kn_ngram_model(docs, n)` so repeated
    scoring runs share one set of count tables — the FROZEN path for
    scoring other corpora. Frozen scoring joins every count table LEFT
    and routes misses through the stupid-backoff ladder (`backoff_alpha`
    per skipped level, Brants et al. 2007 — the kn_score posture): an
    n-gram whose context the model never saw scores alpha * P_{k-1},
    down to the strictly-positive uniform base for unseen words, so
    out-of-domain documents stay in the output and score LOW instead of
    being silently dropped (frozen n=3 is bit-equal to kn_score;
    test-pinned). Self-scoring (model=None) trains here and every join
    hits — the backoff branches never fire."""
    if not 2 <= n <= 8:
        raise ValueError(f"n must be in [2, 8], got {n}")
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    if not 0.0 < backoff_alpha <= 1.0:
        raise ValueError(
            f"backoff_alpha must be in (0, 1], got {backoff_alpha}"
        )
    d = float(discount)
    alpha = float(backoff_alpha)

    frozen = model is not None
    if model is None:
        model = kn_ngram_model(
            docs,
            n,
            text_col,
            id_col,
            materialize,
            materialize_levels,
            broadcast_levels,
        )
        grams = model["_grams"]
    else:
        if model.get("n") != n:
            raise ValueError(
                f"model order {model.get('n')} != requested n {n}"
            )
        toks = docs.select(
            F.col(id_col), tokens(F.col(text_col)).alias("_t")
        ).where(F.size("_t") >= n)
        # no checkpoint: the stream has ONE consumer here (the score
        # join) — see kn_ngram_model's materialize note
        grams = exploded_word_ngrams(toks, "_t", n, out="g", keep=(id_col,))
    top, ctx_top = model["top"], model["ctx_top"]
    types, ctxs, totals = model["types"], model["ctxs"], model["totals"]

    # Score each distinct n-gram TYPE once, then join the per-type
    # score onto the occurrence stream by g. lp_q is a pure function
    # of the type's count-table row, so per-type and per-occurrence
    # evaluation are value-identical — but the 2n-1 count-table joins
    # now act on the TYPE table (sublinear in corpus), and the corpus-
    # sized occurrence stream shuffles exactly once (the g join)
    # before the per-doc aggregate. At 100 TB this is the difference
    # between nine corpus shuffles and one.
    #
    # Frozen scoring types over the SCORED corpus's grams (the model's
    # top table need not cover them) and joins every count table LEFT.
    if frozen:
        base = grams.select("g").distinct().join(top, "g", "left")
    else:
        base = top
    how = "left" if frozen else "inner"
    scored = base.withColumn("p", _prefix(F.col("g"), n - 1))
    for k in range(1, n):
        scored = scored.withColumn(f"s{k}", _suffix(F.col("g"), k))
    for k in range(2, n):
        scored = scored.withColumn(f"m{k}", _prefix(F.col(f"s{k}"), k - 1))
    # Explicit broadcast hints for materialized level tables: their
    # LogicalRDD plans carry no statistics, so without the hint the
    # planner demotes these (locally tiny) joins to sort-merge — see
    # kn_ngram_model's broadcast_levels note for the scale dial.
    def _side(t: DataFrame) -> DataFrame:
        return F.broadcast(t) if model.get("broadcast_levels") else t

    scored = scored.join(_side(ctx_top), "p", how)
    for k in range(1, n):
        scored = scored.join(_side(types[k]), f"s{k}", how)
    for k in range(2, n):
        scored = scored.join(_side(ctxs[k]), f"m{k}", how)
    scored = scored.crossJoin(F.broadcast(totals))

    if frozen:
        # Backoff ladder, level shapes token-identical to kn_score's:
        # an unseen suffix type contributes its discounted-zero mass
        # (coalesce->0); an unseen CONTEXT backs the whole level off to
        # alpha * P_{k-1}; denominators from `totals` always exist, so
        # unseen words keep the strictly-positive uniform base.
        p = (
            F.greatest(
                F.coalesce(F.col("nc1"), F.lit(0)) - d, F.lit(0.0)
            ) / F.col("denom1")
            + F.lit(d) * F.col("t1total") / F.col("denom1") / F.col("v_size")
        )
        for k in range(2, n):
            pk_seen = (
                F.greatest(
                    F.coalesce(F.col(f"nc{k}"), F.lit(0)) - d, F.lit(0.0)
                ) / F.col(f"denom{k}")
                + F.lit(d) * F.col(f"tdist{k}") / F.col(f"denom{k}") * p
            )
            p = F.when(
                F.col(f"denom{k}").isNull(), F.lit(alpha) * p
            ).otherwise(pk_seen)
        pn_seen = (
            F.greatest(
                F.coalesce(F.col("cn"), F.lit(0)) - d, F.lit(0.0)
            ) / F.col("ctxsum")
            + F.lit(d) * F.col("tdistn") / F.col("ctxsum") * p
        )
        p = F.when(
            F.col("ctxsum").isNull(), F.lit(alpha) * p
        ).otherwise(pn_seen)
    else:
        # Level expressions — token-identical shapes to
        # kn_trigram_logprob (bit-equality at n=3 is test-pinned).
        p = (
            F.greatest(F.col("nc1") - d, F.lit(0.0)) / F.col("denom1")
            + F.lit(d) * F.col("t1total") / F.col("denom1") / F.col("v_size")
        )
        for k in range(2, n):
            p = (
                F.greatest(F.col(f"nc{k}") - d, F.lit(0.0))
                / F.col(f"denom{k}")
                + F.lit(d) * F.col(f"tdist{k}") / F.col(f"denom{k}") * p
            )
        p = (
            F.greatest(F.col("cn") - d, F.lit(0.0)) / F.col("ctxsum")
            + F.lit(d) * F.col("tdistn") / F.col("ctxsum") * p
        )
    lp_q = F.floor(F.log(p) * 1e6).cast("long")
    type_lp = scored.select("g", lp_q.alias("_lpq"))

    return (
        grams.join(type_lp, "g")
        .groupBy(id_col)
        .agg(
            (
                F.floor(F.sum("_lpq").cast("double") / F.count("*")) / 1e6
            ).alias("mean_logprob"),
            F.count("*").alias("n_ngrams"),
        )
    )


def kn_model(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize: bool = True,
    materialize_levels: bool = False,
    broadcast_levels: bool | None = None,
) -> dict[str, DataFrame]:
    """Train the KN count tables once and reuse them — the frozen-model
    path for scoring OTHER corpora (decontamination-style quality
    scoring of a new crawl under yesterday's LM, and the streaming
    scorer). Returns {tri, ctx, mid, cont2, cont1, totals}.

    `materialize` (default True) checkpoints the trigram TYPE table —
    the root every other table and every scoring join derives from.
    Without it each of the five consumers re-runs the corpus explode +
    count (measured: frozen-model scoring of a 10%% slice cost as much
    as training at 30k synthetic docs, SCALE.md). The crawl_to_corpus
    materialize posture, via session.truncate_lineage.

    `materialize_levels` additionally checkpoints the four derived
    count tables, so every kn_score run reads them as computed tables
    instead of replaying each derivation chain per join (exchange
    reuse never unifies the replicas — see kn_ngram_model, including
    the measured reason the default is OFF for one-shot scoring).
    FLIP IT ON when one model scores many batches — the streaming
    scorer / decontamination shape — where the one-time checkpoint
    amortizes over every batch. `broadcast_levels` (default: follow
    materialize_levels) makes kn_score hint its joins to broadcast the
    materialized tables — statistics are stripped by checkpointing, so
    the planner would otherwise demote to sort-merge; pass False when
    the count tables exceed broadcast capacity (the derive-once win
    survives as shuffle joins)."""
    if broadcast_levels is None:
        broadcast_levels = materialize_levels

    def _mk_trunc(on: bool):
        def trunc(df: DataFrame) -> DataFrame:
            if not on:
                return df
            from spdb_spark.session import truncate_lineage

            return truncate_lineage(df, eager=False)

        return trunc

    trunc = _mk_trunc(materialize)
    ltrunc = _mk_trunc(materialize_levels)

    toks = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_t")
    ).where(F.size("_t") >= 3)
    grams = exploded_word_ngrams(toks, "_t", 3, out="g", keep=(id_col,))
    tri = trunc(grams.groupBy("g").agg(F.count("*").alias("c3")))
    tri_keys = tri.select(
        "g",
        "c3",
        _part(F.col("g"), "uv").alias("uv"),
        _part(F.col("g"), "vw").alias("vw"),
        _part(F.col("g"), "v").alias("v"),
        _part(F.col("g"), "w").alias("w"),
    )
    ctx = ltrunc(
        tri_keys.groupBy("uv").agg(
            F.sum("c3").alias("c2ctx"), F.count("*").alias("t3")
        )
    )
    cont2 = ltrunc(tri_keys.groupBy("vw").agg(F.count("*").alias("n2cont")))
    mid = ltrunc(
        tri_keys.groupBy("v").agg(
            F.count("*").alias("n2ctx"), F.count_distinct("w").alias("t2")
        )
    )
    cont1 = ltrunc(
        cont2.select(
            F.substring_index(F.col("vw"), " ", -1).alias("w")
        ).groupBy("w").agg(F.count("*").alias("n1cont"))
    )
    # One pass over cont1 for both totals (|cont2| = sum(n1cont),
    # t1 = |cont1|) — see the kn_trigram_logprob note. coalesce keeps
    # the totals row 0 (not NULL) on an empty corpus.
    totals = cont1.agg(
        F.coalesce(F.sum("n1cont"), F.lit(0)).alias("n2types"),
        F.count("*").alias("t1"),
    ).crossJoin(
        toks.select(F.explode("_t").alias("_tok")).agg(
            F.count_distinct("_tok").alias("v_size")
        )
    )
    return {
        "tri": tri,
        "ctx": ctx,
        "mid": mid,
        "cont2": cont2,
        "cont1": cont1,
        "totals": totals,
        "broadcast_levels": bool(broadcast_levels),
    }


def kn_score(
    docs: DataFrame,
    model: dict[str, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = DISCOUNT,
    backoff_alpha: float = 0.4,
) -> DataFrame:
    """Score ANY documents under a frozen `kn_model` — the tables join
    LEFT, with a backoff ladder for material the model never saw:
    unseen trigram context (u,v) scores as alpha * P2(w|v); unseen
    middle word v as alpha * P1(w); unseen w keeps the strictly-
    positive uniform-base mass (n1cont = 0). The per-level alpha = 0.4
    is the stupid-backoff penalty (Brants et al. 2007) — without it an
    all-novel-context document would score pure continuation-unigram
    mass with no out-of-distribution penalty at all, which is exactly
    what a quality filter must not do. On the model's own training
    corpus every join hits, no backoff branch fires, and the seen
    branch is token-identical to `kn_trigram_logprob`, so self-scoring
    is bit-equal (test-pinned)."""
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    if not 0.0 < backoff_alpha <= 1.0:
        raise ValueError(
            f"backoff_alpha must be in (0, 1], got {backoff_alpha}"
        )
    d = float(discount)
    alpha = float(backoff_alpha)

    toks = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_t")
    ).where(F.size("_t") >= 3)
    grams = exploded_word_ngrams(toks, "_t", 3, out="g", keep=(id_col,))
    # Score each distinct trigram TYPE once against the frozen tables,
    # then attach per-type scores to the occurrence stream by g (the
    # kn_ngram_logprob frozen shape): lp_q is a pure function of the
    # type's count-table row, so per-type and per-occurrence evaluation
    # are value-identical — but the five LEFT joins act on the scored
    # corpus's TYPE table, and the occurrence stream joins exactly once.
    # Materialized model tables carry no statistics, so the broadcast
    # decision is explicit (see kn_model's broadcast_levels note).
    def _b(t: DataFrame) -> DataFrame:
        return F.broadcast(t) if model.get("broadcast_levels") else t

    scored = (
        grams.select("g")
        .distinct()
        .withColumn("uv", _part(F.col("g"), "uv"))
        .withColumn("vw", _part(F.col("g"), "vw"))
        .withColumn("v", _part(F.col("g"), "v"))
        .withColumn("w", _part(F.col("g"), "w"))
        .join(_b(model["tri"]), "g", "left")
        .join(_b(model["ctx"]), "uv", "left")
        .join(_b(model["mid"]), "v", "left")
        .join(_b(model["cont2"]), "vw", "left")
        .join(_b(model["cont1"]), "w", "left")
        .crossJoin(F.broadcast(model["totals"]))
    )
    # Seen branches are token-identical to kn_trigram_logprob.
    p1 = (
        F.greatest(
            F.coalesce(F.col("n1cont"), F.lit(0)) - d, F.lit(0.0)
        ) / F.col("n2types")
        + F.lit(d) * F.col("t1") / F.col("n2types") / F.col("v_size")
    )
    p2_seen = (
        F.greatest(F.coalesce(F.col("n2cont"), F.lit(0)) - d, F.lit(0.0))
        / F.col("n2ctx")
        + F.lit(d) * F.col("t2") / F.col("n2ctx") * p1
    )
    p2 = F.when(F.col("n2ctx").isNull(), F.lit(alpha) * p1).otherwise(p2_seen)
    p3_seen = (
        F.greatest(F.coalesce(F.col("c3"), F.lit(0)) - d, F.lit(0.0))
        / F.col("c2ctx")
        + F.lit(d) * F.col("t3") / F.col("c2ctx") * p2
    )
    p3 = F.when(F.col("c2ctx").isNull(), F.lit(alpha) * p2).otherwise(p3_seen)
    lp_q = F.floor(F.log(p3) * 1e6).cast("long")
    type_lp = scored.select("g", lp_q.alias("_lpq"))

    return (
        grams.join(type_lp, "g")
        .groupBy(id_col)
        .agg(
            (
                F.floor(F.sum("_lpq").cast("double") / F.count("*")) / 1e6
            ).alias("mean_logprob"),
            F.count("*").alias("n_trigrams"),
        )
    )


def kn_perplexity(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = DISCOUNT,
) -> DataFrame:
    """(id_col, perplexity, n_trigrams): exp(-mean_logprob) — the
    conventional reporting unit (lower = more fluent under the corpus
    LM; CCNet buckets head/middle/tail on exactly this)."""
    lp = kn_trigram_logprob(docs, text_col, id_col, discount)
    return lp.select(
        id_col,
        (
            F.floor(F.exp(-F.col("mean_logprob")) * 1e6) / 1e6
        ).alias("perplexity"),
        "n_trigrams",
    )
