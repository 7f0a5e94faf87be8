"""SparkSession factory with engine defaults.

Tuned for correctness tests on local[N] but with settings chosen for
multi-executor scale: AQE on (runtime re-plan, skew-join splitting,
partition coalescing), Arrow on (vectorized pandas UDF transfer),
shuffle partitions sized by env.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spdb_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPDB_SHUFFLE_PARTITIONS", cpus)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # ANSI on: Spark 4's default AND the correctness driver's session
        # config. Every local verification layer (pytest, check_oracle,
        # bench) must exercise the same strict cast/overflow/division
        # semantics the driver does — r13's frontier gates crashed on a
        # cast that only throws under ANSI because this was pinned false.
        .config("spark.sql.ansi.enabled", "true")
        # The driver's parquet tables use TIMESTAMP(NANOS), which Spark 4.x
        # rejects unless read as long (converted back in load_tables).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPDB_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Read the driver parquet tables under ``sf_dir`` and register temp views.

    Returns a dict name -> DataFrame. Views let operators be written either
    as DataFrame transformations or spark.sql over the same names the DuckDB
    oracle uses.
    """
    names = names or (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    )
    # Defensive: the caller may hand us a session built elsewhere (the
    # driver's), without the TIMESTAMP(NANOS) and timezone settings.
    for key, val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(key, val)
        except Exception:
            pass
    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        df = spark.read.parquet(path)
        df = _restore_nano_timestamps(df, path)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


_NANO_COLS_CACHE: dict[str, frozenset[str]] = {}


def _restore_nano_timestamps(df, path: str):
    """Convert timestamp[ns] parquet columns that Spark read as raw longs
    (via spark.sql.legacy.parquet.nanosAsLong) back to timestamp_ntz.

    Some files' nano columns map to timestamp_ntz automatically; only those
    left as bigint need the explicit div-1000 conversion. The footer probe
    is cached per path (the driver gate loads tables once per query).
    """
    from pyspark.sql import functions as F

    nano_cols = _NANO_COLS_CACHE.get(path)
    if nano_cols is None:
        import pyarrow.parquet as pq

        arrow_schema = pq.read_schema(path)
        nano_cols = frozenset(
            f.name for f in arrow_schema if str(f.type).startswith("timestamp[ns")
        )
        _NANO_COLS_CACHE[path] = nano_cols
    spark_types = dict(df.dtypes)
    for c in nano_cols:
        if spark_types.get(c) == "bigint":
            df = df.withColumn(
                c,
                F.timestamp_micros(F.expr(f"`{c}` div 1000")).cast("timestamp_ntz"),
            )
    return df


def where_above(df, pred):
    """`df.where(pred)` with the Filter pinned ABOVE df's projection.

    PushDownPredicates substitutes projected aliases into a predicate
    with no cost guard — in Spark 4 even a NONDETERMINISTIC predicate
    is pushed through a deterministic Project — so
    `select(expensive.alias(c)).where(f(c))` evaluates `expensive`
    TWICE per row: once inside the pushed-down Filter and once in the
    Project above it (the built-in-expression analogue of the guide's
    duplicated-UDF trap, which is fixed there with asNondeterministic;
    built-ins have no such handle). What pushdown through a Project DOES
    still require is that every PROJECT FIELD be deterministic — so a
    nondeterministic guard column joins the projection, the predicate
    gains an always-false disjunct referencing it (rand in [0,1) is
    never < -1; p OR false = p, NULL OR false = NULL — the filter's
    value is untouched), and the guard is dropped above the filter.
    Net plan: Project(expensive) -> Filter(attribute) — the expensive
    column evaluates once. A later filter stacked on the result still
    stops at this Filter (it cannot combine with or cross a filter
    that references the guard), so no caller's predicate can tunnel
    down to re-expand the projection either.

    The guard is rand(seed), not monotonically_increasing_id: mid is
    rejected by the streaming UnsupportedOperationChecker, and a bare
    rand comparison placed directly in the predicate is range-folded
    by Spark 4's optimizer — as a PROJECTED field read back through an
    attribute it survives both. Fixed seed keeps plans reproducible;
    Rand is flagged nondeterministic regardless of seed.

    Use ONLY where the predicate's inputs are expensive projected
    expressions: on cheap columns the lost pushdown (filtering earlier,
    closer to the scan) outweighs the saved re-evaluation."""
    from pyspark.sql import functions as F

    tag = "_no_pushdown"
    # withColumn REPLACES an existing column of the same name — uniquify
    # so a caller column named _no_pushdown survives the barrier intact.
    i = 0
    while tag in df.columns:
        i += 1
        tag = f"_no_pushdown{i}"
    staged = df.withColumn(tag, F.rand(42))
    return staged.where(pred | (F.col(tag) < F.lit(-1.0))).drop(tag)


def truncate_lineage(df, eager: bool = True):
    """Checkpoint `df` to truncate its lineage, choosing durability by
    session configuration: when a RELIABLE checkpoint dir is set
    (``spark.sparkContext.setCheckpointDir(...)`` — HDFS/S3 in
    production), use ``checkpoint()``, whose blocks live in fault-
    tolerant storage and survive executor loss; otherwise fall back to
    ``localCheckpoint()``, whose blocks live on executors (faster, fine
    for local mode, but a lost executor kills the job mid-iteration on a
    dynamic-allocation cluster).

    All iterative operators (connected_components, dup_clusters,
    closing, BPE training) route their lineage truncation through here,
    so a caller opts an entire pipeline into cluster-durable
    checkpointing with one ``setCheckpointDir`` call. See SCALE.md
    ("Checkpoint durability") for when to use which."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
