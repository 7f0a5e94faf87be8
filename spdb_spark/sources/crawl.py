"""Crawl-to-corpus: the end-to-end WARC -> curated training corpus
composition, wiring the round-6 curation operators into one call.

One function composes what a crawl-processing job actually runs:

    WARC shards
      -> warc_responses_to_docs     (main-content extraction, URL
                                     normalization: functions/html.py,
                                     functions/url.py)
      -> gopher_filter              (published hard rules:
                                     functions/quality.py)
      -> exact + minhash dedup      (functions/dedup.py keep-one policy)
      -> documents DataFrame        (ready for write_jsonl_shards)

Plan shape: extraction/quality are projections inside the WARC scan
stage (zero added exchanges); dedup contributes its banded-join
exchanges; nothing else shuffles. A 1000-executor crawl job is
file-parallel until the dedup joins, exactly like the standalone
operators the gates verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def crawl_to_corpus(
    warc: DataFrame,
    main_content: bool = True,
    normalize_urls: bool = True,
    quality: bool = True,
    near_dedup: bool = True,
    minhash_threshold: float = 0.8,
    n_docs: int | None = None,
    materialize: bool = True,
    select_target: DataFrame | None = None,
    select_k: int | None = None,
    select_buckets: int = 10_000,
    select_seed: int = 0,
    rank_prior: bool = False,
    rank_iterations: int = 5,
    min_host_rank_q: int | None = None,
    rank_map: DataFrame | None = None,
    suffix_rules: DataFrame | None = None,
    robots: DataFrame | None = None,
    robots_agent: str = "*",
) -> DataFrame:
    """WARC record rows (sources/warc.ingest_warc) -> curated documents.

    Every stage is optional so corpora with external curation can skip
    pieces; defaults are the full treatment. Near-dedup keeps the
    smallest doc_id of each duplicate pair's cluster side (the same
    keep-first policy the gated dedup queries verify).

    `n_docs` is an optional upper-bound hint on the corpus size (a
    manifest count / catalog statistic the caller usually has) passed
    to the minhash verify-mode policy: below the broadcast budget the
    exact-jaccard stage uses the broadcast set-array form; with no hint
    it stays on the scale-safe shuffle form.

    `materialize` (default True) checkpoints the extracted+filtered
    corpus before the dedup stages (session.truncate_lineage: reliable
    checkpoint when a checkpoint dir is set, executor-local otherwise).
    The dedup tail consumes the corpus several times (exact-dup groupBy
    + semi join, minhash signatures, verify sets, final anti-join);
    without materialization every consumer re-runs the WARC parse +
    HTML extraction + quality regexes — measured 4x the whole pipeline
    wall at sf0.1. This is exactly what production crawl jobs do: the
    extraction stage writes the corpus once, dedup reads it. Pass False
    to keep the pure-lineage form (e.g. when the caller materializes
    itself).

    Passing `select_target` (a documents DataFrame exemplifying the
    desired distribution) AND `select_k` appends DSIR importance
    resampling (functions/dsir.py) after dedup: fit target/raw hashed
    n-gram log-ratios, weight the survivors, keep a deterministic
    Gumbel top-k sample of `select_k` docs — the full
    crawl -> curate -> select path ahead of write_jsonl_shards.

    `rank_prior=True` derives the crawl's OWN host graph — href targets
    extracted from every distinct fetched page (functions/linkgraph.py),
    collapsed to weighted eTLD+1 edges — runs integer-protocol PageRank
    (functions/graph.py) over it, and attaches each surviving doc's
    domain rank as a `host_rank_q` column (BIGINT micro-units; 0 for
    domains outside the graph). This is the Common Crawl recipe: the
    quality prior comes from the crawl itself, not an external list.
    `min_host_rank_q` additionally FILTERS to docs whose domain rank
    meets the floor — rank-prior selection. The graph is built from the
    raw responses (pre-quality, pre-dedup: link structure is evidence
    even when a page's text is dropped), so the rank join is the only
    coupling to the curation chain — a broadcast of the graph-sized
    (domain, rank) map onto the corpus.

    `rank_map` short-circuits the rank build: pass a prebuilt
    (domain, rank_q) table — `stage_host_ranks` output read back, or
    `crawl_host_ranks` — and the rank-prior stage becomes ONE broadcast
    join at selection time instead of re-deriving the entire link graph
    + PageRank chain inside this plan (the kn_ngram_model reuse
    posture: build once per crawl, consume everywhere; identical output
    test-pinned, split walls in SCALE.md).

    `robots` (a host-keyed (host, robots_txt) DataFrame) applies
    RFC 9309 exclusion for `robots_agent` (functions/robots.py) before
    any content-derived stage: disallowed pages never reach quality
    scoring, dedup survivor choice, or DSIR — but their outbound links
    still feed the rank-prior graph (link structure is crawl evidence;
    content is not corpus material)."""
    from spdb_spark.functions.quality import gopher_filter
    from spdb_spark.sources.warc import warc_responses_to_docs

    pages_all = None
    if rank_prior and rank_map is None:
        # The rank prior needs the distinct fetched pages and the doc
        # pipeline needs the same parsed bodies (doc_id IS crawl_pages'
        # content-addressed _pid, text derives from the same
        # http_response_body html). Parse ONCE, materialize the parsed
        # pages, and derive BOTH sides from the cache — the old shape ran
        # the WARC parse + body split + distinct twice, once per side.
        # At 100 TB this is the difference between one and two passes
        # over every payload.
        from spdb_spark.session import truncate_lineage

        pages_all = truncate_lineage(
            crawl_pages(warc, normalize_urls).dropDuplicates(["_pid"]),
            eager=False,
        )
        docs = docs_from_pages(pages_all, main_content=main_content)
    else:
        docs = warc_responses_to_docs(
            warc, main_content=main_content, normalize_urls=normalize_urls
        )
    if robots is not None:
        # robots exclusion runs FIRST — a disallowed page's content
        # must not influence dedup survivor choice or the rank prior's
        # doc set (the graph still sees its links: link structure is
        # crawl evidence, content is not corpus material)
        from spdb_spark.functions.robots import robots_filter

        docs = robots_filter(docs, robots, robots_agent, url_col="source")
    if quality:
        docs = docs.where(gopher_filter(F.col("text")))
    if materialize:
        from spdb_spark.session import truncate_lineage

        docs = truncate_lineage(docs)
    # Exact dedup keeps the MIN doc_id per content group (the same
    # canonical-id policy as exact_dup_groups / SQL_DEDUP_EXACT).
    # dropDuplicates(["text"]) would keep an arbitrary row per group —
    # the survivor would depend on partitioning and scan order, breaking
    # the pipeline's determinism (content-addressed ids, deterministic
    # Gumbel resampling, byte-identical shard export). Joining on the
    # md5 hash instead of the full text keeps the shuffle key small.
    keep = (
        docs.groupBy(F.md5("text").alias("_th"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    if materialize:
        # The dedup tail consumes the exact-survivor set several times
        # (shingle/signature scan, verify sets, the final attach; the
        # rank-prior path adds the hosts-distinct build). Broadcast
        # builds are not unified by exchange reuse, so without this the
        # md5-per-doc aggregate re-executes once per consumer — id-only
        # checkpoint, corpus never duplicated.
        from spdb_spark.session import truncate_lineage

        keep = truncate_lineage(keep, eager=False)
    docs_kept = docs.join(keep, "doc_id", "left_semi")
    if near_dedup:
        from spdb_spark.functions.dedup import minhash_lsh_dedup

        pairs = minhash_lsh_dedup(
            docs_kept, "doc_id", "text", threshold=minhash_threshold,
            n_docs=n_docs,
        )
        losers = pairs.select(
            F.greatest("id_a", "id_b").alias("doc_id")
        ).distinct()
        if materialize:
            # Survivor ids = exact survivors minus near-dup losers —
            # id-only algebra, checkpointed so the entire minhash chain
            # runs ONCE no matter how many consumers read the corpus
            # (docs X (keep \ losers) == (docs X keep) \ losers: both
            # keep exactly the rows whose doc_id is an exact survivor
            # and not a near-dup loser).
            from spdb_spark.session import truncate_lineage

            surv = truncate_lineage(
                keep.join(losers, "doc_id", "left_anti"), eager=False
            )
            docs = docs.join(surv, "doc_id", "left_semi")
        else:
            docs = docs_kept.join(losers, "doc_id", "left_anti")
    else:
        docs = docs_kept
    if select_target is not None and select_k is not None:
        from spdb_spark.functions.dsir import (
            dsir_bucket_logratio,
            dsir_resample,
            dsir_weights,
        )

        lr = dsir_bucket_logratio(
            docs, select_target, n_buckets=select_buckets
        )
        w = dsir_weights(docs, lr, n_buckets=select_buckets)
        chosen = dsir_resample(w, select_k, seed=select_seed).select("doc_id")
        docs = docs.join(F.broadcast(chosen), "doc_id", "left_semi")
    if rank_prior or rank_map is not None:
        if rank_map is None:
            rank_map = host_ranks_from_pages(
                pages_all.select("page_url", "html"),
                iterations=rank_iterations,
                rules=suffix_rules,
            )
        docs = attach_host_rank(docs, rank_map, rules=suffix_rules)
        if min_host_rank_q is not None:
            docs = docs.where(F.col("host_rank_q") >= min_host_rank_q)
    return docs


def crawl_pages(
    warc: DataFrame, normalize_urls: bool = True
) -> DataFrame:
    """One row per fetched response: (_pid, page_url, html), with _pid
    content-addressed over (normalized URL, payload hash) — the page
    identity BOTH the batch rank build (dropDuplicates) and the
    streaming link-graph ledger (seen-pid anti-join) dedup on, so the
    two paths see the same distinct-page set by construction. Narrow
    projection; no exchange."""
    from spdb_spark.functions.hashing import md5_long
    from spdb_spark.sources.warc import http_response_body

    uri = F.col("target_uri")
    if normalize_urls:
        from spdb_spark.functions.url import url_normalize

        uri = url_normalize(uri)
    return warc.where(F.col("warc_type") == "response").select(
        md5_long(
            F.concat_ws("\x1f", uri, F.md5(F.col("payload")))
        ).alias("_pid"),
        uri.alias("page_url"),
        http_response_body(F.col("payload")).alias("html"),
    )


def docs_from_pages(
    pages: DataFrame, main_content: bool = True
) -> DataFrame:
    """crawl_pages output -> the documents schema (doc_id, text, lang,
    source, n_chars), identical to warc_responses_to_docs(dedup=True)
    over the same records: doc_id is the shared content-addressed _pid
    and text extracts from the same http_response_body html. Exists so
    a pipeline that needs BOTH the corpus and the page set (rank-prior
    curation) parses every payload once."""
    from spdb_spark.functions.text import lang_id

    if main_content:
        from spdb_spark.functions.html import html_main_text

        text = html_main_text(F.col("html"))
    else:
        from spdb_spark.sources.warc import html_to_text

        text = html_to_text(F.col("html"))
    from spdb_spark.session import where_above

    out = pages.select(
        F.col("_pid").alias("doc_id"),
        text.alias("text"),
        F.col("page_url").alias("source"),
    )
    # where_above: the emptiness test must read the PROJECTED text —
    # pushed below the projection it would re-run the whole main-text
    # extraction inside the Filter (and any caller's quality filter
    # stacks above this one rather than tunneling down to the scan), so
    # extraction runs once per page instead of up to three times.
    #
    # ACCEPTED TRADE: the barrier also blocks CHEAP caller predicates
    # (a source/page_url prune, say) from reaching the pages scan, so a
    # selective caller pays full extraction for pages it immediately
    # discards. Corpus-construction callers (the ones this feeds) read
    # every page, so the duplicated-extraction saving dominates; a
    # caller that prunes hard by URL should filter PAGES before calling
    # (pages.where(...) pushes fine — the barrier starts here), which
    # costs one line rather than an API variant.
    return where_above(out, F.length("text") > 0).select(
        "doc_id",
        "text",
        lang_id(F.col("text")).alias("lang"),
        "source",
        F.length("text").cast("int").alias("n_chars"),
    )


def host_ranks_from_pages(
    pages: DataFrame,
    iterations: int = 5,
    rules: DataFrame | None = None,
) -> DataFrame:
    """(page_url, html) distinct pages -> href host graph at eTLD+1
    (functions/linkgraph.host_graph_edges) -> integer-protocol PageRank
    -> (domain, rank_q). Graph-sized output — broadcastable onto any
    corpus."""
    from spdb_spark.functions.graph import pagerank
    from spdb_spark.functions.linkgraph import host_graph_edges

    edges = host_graph_edges(pages, "page_url", "html", rules=rules)
    pr = pagerank(
        edges, "src_domain", "dst_domain", weight="weight",
        iterations=iterations,
    )
    return pr.select(F.col("node").alias("domain"), "rank_q")


def crawl_host_ranks(
    warc: DataFrame,
    normalize_urls: bool = True,
    iterations: int = 5,
    rules: DataFrame | None = None,
) -> DataFrame:
    """The crawl's own host-rank prior from raw WARC records: distinct
    fetched pages (the same content-addressed collapse the doc pipeline
    applies) -> host_ranks_from_pages."""
    pages = (
        crawl_pages(warc, normalize_urls)
        .dropDuplicates(["_pid"])
        .select("page_url", "html")
    )
    return host_ranks_from_pages(pages, iterations=iterations, rules=rules)


def stage_host_ranks(
    warc: DataFrame,
    path: str,
    normalize_urls: bool = True,
    iterations: int = 5,
    rules: DataFrame | None = None,
) -> DataFrame:
    """Materialize the crawl's (domain, rank_q) prior once and return a
    reader over it — the production shape for rank-prior selection: the
    link-graph + PageRank chain (corpus-scan-heavy, graph-sized output)
    runs ONCE per crawl snapshot, and every downstream selection pass
    consumes the persisted table as a broadcast map via
    `crawl_to_corpus(rank_map=...)` / `attach_host_rank`. Reading the
    table back (rather than returning the lineage) also frees the
    selection plan from AQE-opaque recomputation: the parquet scan
    carries statistics, so the host join stays broadcast."""
    ranks = crawl_host_ranks(
        warc,
        normalize_urls=normalize_urls,
        iterations=iterations,
        rules=rules,
    )
    ranks.write.mode("overwrite").parquet(path)
    return warc.sparkSession.read.schema(
        "domain string, rank_q long"
    ).parquet(path)


def attach_host_rank(
    docs: DataFrame,
    rank_map: DataFrame,
    url_col: str = "source",
    rules: DataFrame | None = None,
    out_col: str = "host_rank_q",
) -> DataFrame:
    """Attach a (domain, rank_q) prior to a corpus by the registered
    domain of each doc's URL — distinct-host broadcast map, corpus
    never shuffled; rank 0 for domains outside the graph."""
    from spdb_spark.functions.domains import host_registered_domains
    from spdb_spark.functions.url import url_host

    d = docs.withColumn("_host", url_host(F.col(url_col)))
    hosts = d.select(F.col("_host").alias("host")).where(
        F.col("host") != ""
    ).distinct()
    mapping = host_registered_domains(hosts, "host", rules).select(
        F.col("host").alias("_host"),
        F.coalesce("domain", "host").alias("_dom"),
    )
    ranked = mapping.join(
        rank_map.withColumnRenamed("domain", "_dom"), "_dom", "left"
    ).select("_host", F.coalesce("rank_q", F.lit(0)).alias(out_col))
    return (
        d.join(F.broadcast(ranked), "_host", "left")
        .drop("_host")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit(0)))
    )


def cap_per_host(
    docs: DataFrame,
    max_docs: int,
    url_col: str = "source",
    salt: int = 16,
) -> DataFrame:
    """Per-domain quota: keep at most `max_docs` documents per host,
    deterministically — ranked by a content-derived hash so the kept set
    is a pure function of the corpus (re-runs and repartitioning cannot
    change which docs survive), not whichever rows a scan met first.

    Salted two-phase top-k, because crawl hosts are Zipfian and AQE does
    NOT split window partitions — a single hot host's every row would
    land in one task. Phase 1 ranks within (host, hash(doc_id) % salt)
    and keeps each bucket's local top-`max_docs`; phase 2 re-ranks the
    survivors (at most salt * max_docs rows per host) within host alone.
    The global top-k of a key is a subset of the union of its buckets'
    local top-ks, so the keep set is IDENTICAL to a single host-keyed
    window — but the widest phase-1 partition is ~1/salt of the hottest
    host, and phase 2's per-host input is bounded by salt * max_docs
    regardless of corpus size. salt=1 degenerates to the single-window
    form for tiny inputs."""
    from spdb_spark.functions.hashing import md5_long
    from spdb_spark.functions.url import url_host
    from pyspark.sql import Window

    rank_key = [md5_long(F.col("doc_id").cast("string")), F.col("doc_id")]
    host = url_host(F.col(url_col))
    if salt > 1:
        bucket = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(salt))
        w1 = Window.partitionBy(host, bucket).orderBy(*rank_key)
        docs = (
            docs.withColumn("_rk", F.row_number().over(w1))
            .where(F.col("_rk") <= max_docs)
            .drop("_rk")
        )
    w = Window.partitionBy(host).orderBy(*rank_key)
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= max_docs)
        .drop("_rk")
    )
