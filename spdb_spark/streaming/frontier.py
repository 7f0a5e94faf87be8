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
        and driver-gated against the batch oracle)."""
        from spdb_spark.sources.frontier import frontier_schedule

        return frontier_schedule(
            self.urls(),
            delays,
            url_col=self.url_col,
            default_delay_s=default_delay_s,
            start_s=start_s,
        )
