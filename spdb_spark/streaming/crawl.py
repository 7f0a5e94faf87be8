"""Incremental crawl ingest: a Structured Streaming WARC-watcher.

New .warc[.gz] files landing in a directory flow through the SAME
kernels and Column expressions as batch crawl ingest — per-file record
parse (sources/warc.warc_records), main-content extraction, URL
normalization (sources/warc.warc_responses_to_docs) — into documents
rows ready for the stateless curation columns
(streaming/curation.curate_crawl_stream) and the incremental dedup
sinks. Exactly-once per WARC file comes from the file-source checkpoint
(the ingest unit of a crawl feed IS the file — Common Crawl ships ~1 GB
non-splittable .warc.gz segments).

Statefulness policy: the ingest functions are stateless projections
(stream == batch row-for-row, pinned in tests). The batch path's exact
revisit collapse (dropDuplicates on the content-addressed doc_id) is a
STATEFUL operator on an unbounded stream, so the streaming docs pass
`dedup=False` — StreamingCrawlCorpus (below) carries ALL the stateful
curation (robots exclusion -> quality -> exact dedup -> near-dedup) in
a ledger-backed foreachBatch sink whose `corpus()` reader reproduces
the batch `crawl_to_corpus` output exactly. The rank-prior stage
(batch: rank_prior=True / min_host_rank_q) streams through a SECOND
sink on the raw record feed — StreamingLinkGraph, the crawl_host_ranks
twin — consumed at read time by `corpus_ranked()`, so the full r12
batch composition (robots + quality + dedup + rank prior) has an
exact streaming replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spdb_spark.streaming.ledger import BatchLedgerSink

_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def stream_warc_records(
    spark: SparkSession, warc_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """readStream over a crawl-feed directory: one row per WARC record
    of each newly-arrived file.

    Memory shape / backpressure: the binaryFile source materializes ONE
    ROW PER FILE — a whole .warc.gz segment (Common Crawl ships ~1 GB
    non-splittable segments) lives in a single row until warc_records'
    Arrow kernel fans it out, so each in-flight file costs about its
    size in executor memory, and Arrow caps any single row at 2 GiB
    (larger segments must be re-chunked upstream). Set
    `max_files_per_trigger` so (files per trigger) x (segment size)
    fits the executors comfortably; the default (unset) takes every
    pending file in one micro-batch, which is only safe for small
    feeds/tests."""
    from spdb_spark.sources.warc import warc_records

    reader = spark.readStream.format("binaryFile").schema(_BINARYFILE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return warc_records(reader.load(warc_dir))


def stream_crawl_docs(
    spark: SparkSession,
    warc_dir: str,
    main_content: bool = True,
    normalize_urls: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """WARC feed -> documents-schema rows (doc_id, text, lang, source,
    n_chars), stateless end-to-end; compose curation columns with
    curate_crawl_stream and full corpus curation (quality + exact +
    near dedup) with StreamingCrawlCorpus. `max_files_per_trigger`
    bounds per-micro-batch memory (see stream_warc_records)."""
    from spdb_spark.sources.warc import warc_responses_to_docs

    recs = stream_warc_records(
        spark, warc_dir, max_files_per_trigger=max_files_per_trigger
    )
    return warc_responses_to_docs(
        recs,
        main_content=main_content,
        normalize_urls=normalize_urls,
        dedup=False,
    )


_PAIR_SCHEMA = "id_a long, id_b long, jaccard double, batch_id long"
_BAND_SCHEMA = "doc long, band int, bucket string"
DOCS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars int,"
    " text_hash string"
)
_PAGES_DDL = "pid long"
_LG_EDGES_DDL = "src_domain string, dst_domain string, weight long"


class StreamingLinkGraph(BatchLedgerSink):
    """foreachBatch sink maintaining the crawl's OWN href host graph
    over an unbounded WARC record feed — the streaming twin of
    sources/crawl.crawl_host_ranks, attached to the RAW record stream
    (stream_warc_records output) because link structure is crawl
    evidence even for pages whose text the curation chain drops.

    Parity argument: batch ranks build on the DISTINCT fetched pages
    (_pid content-addressed over (normalized URL, payload hash) —
    sources/crawl.crawl_pages). Here each batch contributes the edge
    slice of its NEVER-SEEN pids only (anti-join on the committed pid
    set), and duplicate pages carry identical content by construction,
    so the first arrival wins a pid with the same outbound links any
    arrival would. host_graph_edges weights are per-page-additive
    counts — a SUM monoid over disjoint page sets (the
    StreamingHostGraph argument) — so the per-key sum of slices equals
    the batch edge list over the union for ANY arrival order;
    exactly-once comes from the ledger marker.

    State: pages/b{N} (pid long — distinct-page-count-sized),
    edges/b{N} (graph-sized slices, collapsed lazily at read time and
    physically by compact()/vacuum()). Per-batch cost is O(batch pages
    + matching pids); rank reads recompute the exact T-iteration
    integer-protocol PageRank over graph-sized state (warm starts
    rejected for the reasons in streaming/graph.py).
    """

    def __init__(
        self,
        spark,
        base_path: str,
        normalize_urls: bool = True,
        rules: DataFrame | None = None,
    ):
        super().__init__(spark, base_path)
        self.STATE_TABLES = {"pages": _PAGES_DDL, "edges": _LG_EDGES_DDL}
        self.normalize_urls = normalize_urls
        self.rules = rules

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        from spdb_spark.functions.linkgraph import host_graph_edges
        from spdb_spark.sources.crawl import crawl_pages

        committed = self._committed()
        if batch_id in committed:
            return  # redelivered: this batch's edge slice already summed
        pages = (
            crawl_pages(batch, self.normalize_urls)
            .dropDuplicates(["_pid"])
            .persist()
        )
        try:
            seen = self._read("pages", _PAGES_DDL, committed)
            if seen is not None:
                new = pages.join(
                    seen.withColumnRenamed("pid", "_pid"), "_pid", "left_anti"
                )
            else:
                new = pages
            new = new.persist()
            try:
                host_graph_edges(
                    new, "page_url", "html", rules=self.rules
                ).write.mode("overwrite").parquet(
                    self._dir("edges", batch_id)
                )
                new.select(F.col("_pid").alias("pid")).write.mode(
                    "overwrite"
                ).parquet(self._dir("pages", batch_id))
                self._commit(batch_id)
            finally:
                new.unpersist()
        finally:
            pages.unpersist()

    def start(self, stream: DataFrame, checkpoint: str, **trigger_kwargs):
        """Attach to a streaming WARC record DataFrame
        (stream_warc_records output)."""
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(**(trigger_kwargs or {"availableNow": True}))
            .start()
        )

    def edges(self) -> DataFrame:
        """The accumulated weighted eTLD+1 edge list — equal to
        host_graph_edges over the union's distinct pages."""
        from pyspark.sql import functions as F

        state = self._read_state("edges", _LG_EDGES_DDL)
        if state is None:
            return self.spark.createDataFrame([], _LG_EDGES_DDL)
        return state.groupBy("src_domain", "dst_domain").agg(
            F.sum("weight").alias("weight")
        )

    def host_ranks(self, iterations: int = 5) -> DataFrame:
        """(domain, rank_q): the integer-protocol PageRank over the
        accumulated graph — equal to crawl_host_ranks over the union of
        every committed batch, any arrival order."""
        from pyspark.sql import functions as F

        from spdb_spark.functions.graph import pagerank

        pr = pagerank(
            self.edges(),
            "src_domain",
            "dst_domain",
            weight="weight",
            iterations=iterations,
        )
        return pr.select(F.col("node").alias("domain"), "rank_q")


class StreamingCrawlCorpus(BatchLedgerSink):
    """foreachBatch composition of the FULL crawl_to_corpus pipeline
    (sources/crawl.py:28) over an unbounded WARC feed: Gopher quality ->
    exact dedup -> MinHash near-dedup, with `corpus()` returning
    EXACTLY the rows batch `crawl_to_corpus` would produce over the
    union of every committed micro-batch — for ANY arrival order.

    The trick that makes stream == batch exact (not merely
    keep-first-arrival-approximate) is splitting the work between the
    sink and the reader:

    - per batch (bounded work): quality-filter, collapse the batch to
      one representative row per content hash (min doc_id — the batch
      policy), and run the minhash machinery ONLY on content never seen
      before (anti-join on the committed hash set). Within-batch pairs
      come from `minhash_lsh_dedup`; cross-batch pairs probe the
      persisted band index via `incremental_minhash_dedup` — the corpus
      is never re-paired with itself, so per-batch cost is
      O(batch x matching buckets), not O(corpus^2).
    - at read time (`corpus()`): the accumulated state replays the
      batch pipeline's POLICIES declaratively. Exact dedup = min-struct
      per content hash over every stored representative (so a smaller
      doc_id arriving in a LATER file retroactively displaces the
      earlier survivor, exactly as the batch groupBy would). Near-dedup
      losers = greatest id per pair AFTER mapping each pair's
      representative ids to the canonical (min) id of their content —
      signatures are pure functions of text, so the canonicalized pair
      set is identical to the batch run's pair set.

    State tables under `base_path` (layout/compaction/exactly-once:
    streaming/ledger.py — a redelivered batch_id finds its marker and
    skips; `compact()` collapses per-batch dirs):

      docs/b{N}   batch N's representative rows (one per content hash)
      bands/b{N}  LSH band-index slice of batch N's NEW content
      pairs/b{N}  near-dup pairs flagged in batch N
      _log/N.json commit marker (atomic rename, written last)

    100 TB shape: the sink-side joins are equi-joins on content hashes /
    band buckets (AQE broadcasts the micro-batch side); `corpus()` is
    one min-struct aggregate (map-side reducing partials) plus two
    bounded joins (pairs are near-dup-sized, losers smaller still).
    Persist the band index bucketed by `bucket` at scale so probes
    co-locate without shuffling the corpus side.
    """

    def __init__(
        self,
        spark,
        base_path: str,
        quality: bool = True,
        near_dedup: bool = True,
        minhash_threshold: float = 0.8,
        k: int = 3,
        num_hashes: int = 16,
        bands: int = 8,
        rows: int = 2,
        robots: DataFrame | None = None,
        robots_agent: str = "*",
    ):
        super().__init__(spark, base_path)
        self.STATE_TABLES = {
            "docs": DOCS_SCHEMA,
            "bands": _BAND_SCHEMA,
            "pairs": _PAIR_SCHEMA,
        }
        self.quality = quality
        self.near_dedup = near_dedup
        self.minhash_threshold = minhash_threshold
        self.k = k
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows = rows
        # robots exclusion is a stateless per-row fold over a static
        # (host, robots_txt) table, so it drops into the sink unchanged
        # and runs FIRST — exactly the batch crawl_to_corpus order
        # (disallowed content must not influence survivor choice)
        self.robots = robots
        self.robots_agent = robots_agent

    _DOC_COLS = ("doc_id", "text", "lang", "source", "n_chars")

    # -- the sink ------------------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        from spdb_spark.functions.dedup import (
            band_buckets,
            incremental_minhash_dedup,
            minhash_lsh_dedup,
            minhash_signatures,
            shingles,
        )

        committed = self._committed()
        if batch_id in committed:
            return  # foreachBatch redelivery after a crash: already done
        docs = batch.select(*self._DOC_COLS)
        if self.robots is not None:
            from spdb_spark.functions.robots import robots_filter

            docs = robots_filter(
                docs, self.robots, self.robots_agent, url_col="source"
            )
        if self.quality:
            from spdb_spark.functions.quality import gopher_filter

            docs = docs.where(gopher_filter(F.col("text")))
        docs = docs.withColumn("text_hash", F.md5("text"))
        # one representative row per content hash: min doc_id, carrying
        # its OWN source/lang (the batch pipeline's survivor row) — a
        # single partial-aggregating min-struct, no window
        reps = (
            docs.groupBy("text_hash")
            .agg(F.min(F.struct(*self._DOC_COLS)).alias("_s"))
            .select("text_hash", "_s.*")
            .persist()
        )
        try:
            seen = self._read("docs", DOCS_SCHEMA, committed)
            if seen is not None:
                new = reps.join(
                    seen.select("text_hash").distinct(), "text_hash", "left_anti"
                )
            else:
                new = reps
            new = new.persist()
            try:
                pairs = self.spark.createDataFrame([], _PAIR_SCHEMA)
                if self.near_dedup:
                    within = minhash_lsh_dedup(
                        new,
                        "doc_id",
                        "text",
                        k=self.k,
                        num_hashes=self.num_hashes,
                        bands=self.bands,
                        rows=self.rows,
                        threshold=self.minhash_threshold,
                        # a micro-batch is bounded by the trigger size,
                        # never the corpus — broadcast verify is legal;
                        # no checkpointing on micro-batches
                        verify="broadcast",
                        materialize=False,
                    ).select("id_a", "id_b", "jaccard")
                    pairs = within
                    idx = self._read("bands", _BAND_SCHEMA, committed)
                    if idx is not None and seen is not None:
                        cross = incremental_minhash_dedup(
                            new,
                            corpus_docs=seen.select("doc_id", "text"),
                            id_col="doc_id",
                            text_col="text",
                            k=self.k,
                            num_hashes=self.num_hashes,
                            bands=self.bands,
                            rows=self.rows,
                            threshold=self.minhash_threshold,
                            corpus_bands=idx,
                        ).select(
                            F.col("corpus_id").alias("id_a"),
                            F.col("new_id").alias("id_b"),
                            "jaccard",
                        )
                        pairs = pairs.unionByName(cross)
                pairs.withColumn(
                    "batch_id", F.lit(batch_id).cast("long")
                ).write.mode("overwrite").parquet(self._dir("pairs", batch_id))
                if self.near_dedup:
                    band_buckets(
                        minhash_signatures(
                            shingles(new, "doc_id", "text", self.k, distinct=False),
                            "doc_id",
                            self.num_hashes,
                        ),
                        self.bands,
                        self.rows,
                    ).write.mode("overwrite").parquet(self._dir("bands", batch_id))
                reps.select(
                    *self._DOC_COLS, "text_hash"
                ).write.mode("overwrite").parquet(self._dir("docs", batch_id))
                self._commit(batch_id)
            finally:
                new.unpersist()
        finally:
            reps.unpersist()

    # -- committed-state readers ----------------------------------------------

    def pairs(self) -> DataFrame:
        """All committed near-dup pairs (representative ids as seen at
        flag time; `corpus()` canonicalizes before resolving losers)."""
        df = self._read_state("pairs", _PAIR_SCHEMA)
        if df is None:
            return self.spark.createDataFrame([], _PAIR_SCHEMA)
        return df

    def corpus(self) -> DataFrame:
        """The curated corpus over everything committed so far — equal,
        row for row, to `crawl_to_corpus` run as one batch over the
        union of all ingested WARC records (pinned in tests)."""
        from pyspark.sql import functions as F

        state = self._read_state("docs", DOCS_SCHEMA)
        if state is None:
            return self.spark.createDataFrame([], DOCS_SCHEMA).select(
                *self._DOC_COLS
            )
        # exact-dedup policy, replayed globally: min doc_id per content
        canon = (
            state.groupBy("text_hash")
            .agg(F.min(F.struct(*self._DOC_COLS)).alias("_s"))
            .select("text_hash", "_s.*")
        )
        out = canon
        if self.near_dedup:
            canon_ids = canon.select(
                "text_hash", F.col("doc_id").alias("canon_id")
            )
            id_map = (
                state.select(F.col("doc_id").alias("rep_id"), "text_hash")
                .join(canon_ids, "text_hash")
                .select("rep_id", "canon_id")
            )
            p = self.pairs()
            losers = (
                p.join(
                    id_map.select(
                        F.col("rep_id").alias("id_a"),
                        F.col("canon_id").alias("_ca"),
                    ),
                    "id_a",
                )
                .join(
                    id_map.select(
                        F.col("rep_id").alias("id_b"),
                        F.col("canon_id").alias("_cb"),
                    ),
                    "id_b",
                )
                .select(F.greatest("_ca", "_cb").alias("doc_id"))
                .distinct()
            )
            out = out.join(losers, "doc_id", "left_anti")
        return out.select(*self._DOC_COLS)

    def corpus_selected(
        self,
        select_target: DataFrame,
        select_k: int,
        select_buckets: int = 10_000,
        select_seed: int = 0,
    ) -> DataFrame:
        """The curated corpus with DSIR importance resampling applied —
        the same selection stage batch `crawl_to_corpus` appends
        (sources/crawl.py): fit target/corpus hashed n-gram log-ratios,
        weight the survivors, keep the deterministic Gumbel top-k.
        Because `corpus()` equals the batch corpus row for row, this
        equals the batch pipeline WITH selection (test-pinned).
        Selection runs at read time over the accumulated state — the
        right place for a distribution-matching stage, which is a
        global decision a per-batch sink cannot make incrementally."""
        from pyspark.sql import functions as F

        from spdb_spark.functions.dsir import (
            dsir_bucket_logratio,
            dsir_resample,
            dsir_weights,
        )

        docs = self.corpus()
        lr = dsir_bucket_logratio(docs, select_target, n_buckets=select_buckets)
        w = dsir_weights(docs, lr, n_buckets=select_buckets)
        chosen = dsir_resample(w, select_k, seed=select_seed).select("doc_id")
        return docs.join(F.broadcast(chosen), "doc_id", "left_semi")

    def corpus_ranked(
        self,
        link_graph: "StreamingLinkGraph",
        rank_iterations: int = 5,
        min_host_rank_q: int | None = None,
        rules: DataFrame | None = None,
    ) -> DataFrame:
        """The curated corpus with the rank prior attached — equal to
        batch `crawl_to_corpus(rank_prior=True, rank_iterations=...,
        min_host_rank_q=...)` over the union of every committed batch,
        for any arrival order, when `link_graph` is a StreamingLinkGraph
        fed from the SAME WARC feed (test-pinned and driver-gated
        against the batch oracle). The rank prior is a global decision
        over the accumulated graph, so it reads at corpus() time — the
        read-time-canonicalization pattern exact dedup already uses;
        the join itself is the distinct-host broadcast map of
        sources/crawl.attach_host_rank (the corpus never shuffles)."""
        from pyspark.sql import functions as F

        from spdb_spark.sources.crawl import attach_host_rank

        out = attach_host_rank(
            self.corpus(), link_graph.host_ranks(rank_iterations),
            rules=rules,
        )
        if min_host_rank_q is not None:
            out = out.where(F.col("host_rank_q") >= min_host_rank_q)
        return out

    # -- streaming attachment ---------------------------------------------------

    def start(self, stream: DataFrame, checkpoint: str, **trigger_kwargs):
        """Attach to a streaming documents DataFrame (stream_crawl_docs
        output)."""
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(**(trigger_kwargs or {"availableNow": True}))
            .start()
        )
