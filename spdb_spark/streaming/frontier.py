"""Streaming crawl frontier — candidate URLs discovered continuously
(sitemap sweeps, outlink extraction, recrawl feeds) accumulate in a
ledger-backed sink, and the politeness schedule reads at any point
equal the batch `frontier_schedule` over the union of everything
committed, for ANY arrival order.

Why the frontier streams well: the URL set is a SET — rediscovering a
URL must not create a second fetch slot — so each batch stores ONE
representative row per url (min struct) and reads canonicalize to the
min struct per url across every slice (the StreamingCrawlCorpus
exact-dedup pattern: a smaller carrier row arriving LATE retroactively
displaces the earlier one, exactly as the batch min-per-url would).
The schedule itself is a pure function of the accumulated set + the
static delay table, so it computes at read time — slots are global
decisions a per-batch sink cannot make incrementally (a later URL can
sort EARLIER within its host).

State: urls/b{N} parquet slices — one row per (batch, url), so total
state is bounded by the sum of per-batch distinct arrivals;
compact()/vacuum() collapse the file count (row collapse happens in the
read-time aggregate). Per-batch cost is O(batch); schedule reads are
one min-struct aggregate + the broadcast delay join + the per-host
window (sources/frontier.frontier_schedule's shape notes apply).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from spdb_spark.streaming.ledger import BatchLedgerSink


class StreamingFrontier(BatchLedgerSink):
    """foreachBatch sink accumulating a deduplicated URL frontier.

    Usage:
        sink = StreamingFrontier(spark, path, schema, url_col="url")
        q = sink.start(url_stream, checkpoint)
        ...
        sink.urls()                      # the canonical frontier
        sink.schedule(delays, ...)       # == batch frontier_schedule
    """

    def __init__(self, spark, base_path: str, schema: str, url_col: str = "url"):
        super().__init__(spark, base_path)
        self.schema = schema
        self.url_col = url_col
        self.STATE_TABLES = {"urls": schema}

    # -- sink ----------------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        committed = self._committed()
        if batch_id in committed:
            return  # redelivered: this batch's slice already stored
        cols = [f.name for f in batch.schema.fields]
        # one representative row per url within the batch (min struct —
        # deterministic); cross-batch displacement happens at read time,
        # so every batch's representative is stored (no anti-join)
        reps = (
            batch.groupBy(self.url_col)
            .agg(F.min(F.struct(*cols)).alias("_s"))
            .select("_s.*")
        )
        reps.write.mode("overwrite").parquet(self._dir("urls", batch_id))
        self._commit(batch_id)

    def start(self, stream: DataFrame, checkpoint: str, **trigger_kwargs):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(**(trigger_kwargs or {"availableNow": True}))
            .start()
        )

    # -- reads ----------------------------------------------------------

    def urls(self) -> DataFrame:
        """The canonical frontier: one row per distinct URL (min struct
        over every stored representative — equal to the batch distinct
        over the union for any arrival order)."""
        from pyspark.sql import functions as F

        state = self._read_state("urls", self.schema)
        if state is None:
            return self.spark.createDataFrame([], self.schema)
        cols = [f.name for f in state.schema.fields]
        return (
            state.groupBy(self.url_col)
            .agg(F.min(F.struct(*cols)).alias("_s"))
            .select("_s.*")
        )

    def schedule(
        self,
        delays: DataFrame | None = None,
        default_delay_s: float = 1.0,
        start_s: float = 0.0,
    ) -> DataFrame:
        """The politeness schedule over everything committed — equal,
        row for row, to sources/frontier.frontier_schedule run as one
        batch over the union of every ingested URL slice (test-pinned
        and driver-gated against the batch oracle). `delays` may be a
        static table OR a StreamingRobots sink's crawl_delays() read —
        either way it is host-count-sized and broadcast at read time."""
        from spdb_spark.sources.frontier import frontier_schedule

        return frontier_schedule(
            self.urls(),
            delays,
            url_col=self.url_col,
            default_delay_s=default_delay_s,
            start_s=start_s,
        )


class StreamingRobots(BatchLedgerSink):
    """foreachBatch sink accumulating robots.txt FETCHES — the
    politeness side-channel of the streaming crawl loop (frontier ->
    fetch -> link graph -> ranked corpus), so the loop closes without
    any static table: StreamingFrontier schedules from the delays this
    sink has accumulated so far.

    The robots set is a per-host SET like the frontier's URL set: a
    host refetched in a later batch must not yield two rule tables, so
    each batch stores one representative row per host (min struct) and
    reads canonicalize to the min struct per host across all slices —
    schedule reads equal the batch computation over the distinct union
    for ANY arrival order. State is host-count-sized (robots files are
    one per host); every read-time consumer (crawl_delays, sitemaps,
    the robots_filter join) is the batch operator over robots(), so
    stream == batch is definitional, not re-implemented.

    Usage:
        rb = StreamingRobots(spark, path)
        q = rb.start(robots_stream, checkpoint)   # (host, robots_txt)
        ...
        rb.robots()                    # canonical (host, robots_txt)
        rb.crawl_delays("mybot")       # == batch robots_crawl_delays
        frontier.schedule(rb.crawl_delays("mybot"), ...)
    """

    SCHEMA = "host string, robots_txt string"

    def __init__(
        self,
        spark,
        base_path: str,
        host_col: str = "host",
        text_col: str = "robots_txt",
    ):
        super().__init__(spark, base_path)
        self.host_col = host_col
        self.text_col = text_col
        self.schema = f"{host_col} string, {text_col} string"
        self.STATE_TABLES = {"robots": self.schema}

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        if batch_id in self._committed():
            return
        reps = (
            batch.select(self.host_col, self.text_col)
            .groupBy(self.host_col)
            .agg(F.min(F.struct(self.host_col, self.text_col)).alias("_s"))
            .select("_s.*")
        )
        reps.write.mode("overwrite").parquet(self._dir("robots", batch_id))
        self._commit(batch_id)

    def start(self, stream: DataFrame, checkpoint: str, **trigger_kwargs):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(**(trigger_kwargs or {"availableNow": True}))
            .start()
        )

    def robots(self) -> DataFrame:
        """Canonical (host, robots_txt): min struct per host over every
        committed slice — the batch distinct-union representative."""
        from pyspark.sql import functions as F

        state = self._read_state("robots", self.schema)
        if state is None:
            return self.spark.createDataFrame([], self.schema)
        return (
            state.groupBy(self.host_col)
            .agg(F.min(F.struct(self.host_col, self.text_col)).alias("_s"))
            .select("_s.*")
        )

    def crawl_delays(self, agent: str) -> DataFrame:
        """(host, delay_s) == batch robots_crawl_delays over robots()."""
        from spdb_spark.functions.robots import robots_crawl_delays

        return robots_crawl_delays(
            self.robots(), agent, host_col=self.host_col,
            text_col=self.text_col,
        )

    def sitemaps(self) -> DataFrame:
        """(host, sitemap) == batch robots_sitemaps over robots() —
        frontier seeds discovered from the streamed fetches."""
        from spdb_spark.functions.robots import robots_sitemaps

        return robots_sitemaps(
            self.robots(), host_col=self.host_col, text_col=self.text_col
        )
