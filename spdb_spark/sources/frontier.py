"""Crawl-frontier operators: sitemap ingestion and politeness
scheduling — the consumers of the robots.txt side-channels
(functions/robots.robots_sitemaps / robots_crawl_delays) that a crawl
pipeline runs BEFORE fetching: seed the frontier from each host's
sitemaps (recursively through <sitemapindex> trees), score what is due
for recrawl (lastmod/changefreq/priority), apportion the fetch budget
across hosts, then lay candidate URLs out on per-host fetch slots
spaced by the host's Crawl-delay.

Spark-first shape: sitemap parsing is regexp_extract_all + explode —
a scan-stage projection, no exchange (the sitemap table is
host-count-sized). Scheduling joins the host-count-sized delay table as
a BROADCAST map and assigns slots with ONE window over (host, url
order): a per-host fetch sequence is inherently a per-host total order,
so the window partitioning IS the semantics — the hot-host mitigation
is capping the frontier first (sources/crawl.cap_per_host, the salted
two-phase form), after which every host's partition is bounded by the
cap. Every step has a DuckDB twin, so the driver gate replays parse +
schedule exactly.

Reference-capability analogue: none (jhuapl-boss/spdb is voxel-only);
north-star crawl surface (SURVEY.md) beside sources/crawl.py and
functions/robots.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (?s) so multi-line <url> blocks match; non-greedy so adjacent blocks
# never merge. Both spellings are shared by Java regex and RE2.
_URL_BLOCK = r"(?s)<url\b[^>]*>.*?</url>"
_SITEMAP_BLOCK = r"(?s)<sitemap\b[^>]*>.*?</sitemap>"


# The five XML predefined entities. &amp; decodes LAST so an escaped
# escape (&amp;lt; = the literal text "&lt;") never double-decodes.
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def xml_unescape(col) -> "F.Column":
    """Decode the XML predefined entities (&amp; &lt; &gt; &quot;
    &apos;) in a string Column — the minimal decode a spec-conforming
    sitemap needs (sitemaps.org REQUIRES these five escaped in every
    text node). Numeric character references are out of scope (real
    sitemap generators emit UTF-8 directly)."""
    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def xml_unescape_sql(expr: str) -> str:
    """DuckDB twin of xml_unescape."""
    for ent, ch in _ENTITIES:
        lit = ch.replace("'", "''")
        expr = f"replace({expr}, '{ent}', '{lit}')"
    return expr


def _field(block, tag: str):
    """Text content of <tag> inside a block: CDATA sections pass
    through verbatim (already-literal text), plain text is
    entity-decoded; surrounding whitespace trims, empty -> NULL."""
    cdata = F.trim(
        F.regexp_extract(
            block,
            rf"(?s)<{tag}[^>]*>\s*<!\[CDATA\[(.*?)\]\]>\s*</{tag}>",
            1,
        )
    )
    plain = xml_unescape(
        F.trim(
            F.regexp_extract(
                block, rf"(?s)<{tag}[^>]*>\s*([^<]*?)\s*</{tag}>", 1
            )
        )
    )
    return F.nullif(
        F.when(cdata != "", cdata).otherwise(plain), F.lit("")
    )


def sitemap_urls(
    sitemaps: DataFrame,
    xml_col: str = "xml",
    keep_cols: tuple[str, ...] = ("host",),
) -> DataFrame:
    """Parse <urlset> sitemap XML -> one row per <url> entry:
    (*keep_cols, loc, lastmod, changefreq, priority double). Entries
    without a <loc> are dropped (nothing to fetch); the optional fields
    are NULL when absent; text nodes decode the XML predefined
    entities and CDATA sections pass through verbatim (_field).
    Narrow: regexp explode in the scan stage."""
    blocks = sitemaps.select(
        *keep_cols,
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK), 0)
        ).alias("_b"),
    )
    b = F.col("_b")
    return blocks.select(
        *keep_cols,
        _field(b, "loc").alias("loc"),
        _field(b, "lastmod").alias("lastmod"),
        _field(b, "changefreq").alias("changefreq"),
        # try_cast: junk <priority> values become NULL in both ANSI
        # modes, matching the twin's TRY_CAST (sitemap_urls_sql).
        _field(b, "priority").try_cast("double").alias("priority"),
    ).where(F.col("loc").isNotNull())


def sitemap_index_locs(
    sitemaps: DataFrame,
    xml_col: str = "xml",
    keep_cols: tuple[str, ...] = ("host",),
) -> DataFrame:
    """Parse <sitemapindex> XML -> (*keep_cols, loc, lastmod): the
    child sitemap URLs to fetch and feed back through sitemap_urls."""
    blocks = sitemaps.select(
        *keep_cols,
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_SITEMAP_BLOCK), 0)
        ).alias("_b"),
    )
    b = F.col("_b")
    return blocks.select(
        *keep_cols,
        _field(b, "loc").alias("loc"),
        _field(b, "lastmod").alias("lastmod"),
    ).where(F.col("loc").isNotNull())


# sitemaps.org changefreq -> recrawl period (seconds). 'always' = 0
# (every visit), 'never' = archived (no period; never due).
_CHANGEFREQ_PERIOD_S = (
    ("always", 0),
    ("hourly", 3600),
    ("daily", 86400),
    ("weekly", 604800),
    ("monthly", 2592000),
    ("yearly", 31536000),
)


def recrawl_priority(
    entries: DataFrame,
    now_s: int,
    lastmod_col: str = "lastmod",
    changefreq_col: str = "changefreq",
    priority_col: str = "priority",
    default_changefreq: str = "weekly",
    default_priority: float = 0.5,
) -> DataFrame:
    """Freshness-aware recrawl scoring over sitemap metadata — the
    operator that turns a sitemap sweep into a recrawl ORDER: entries +
    (period_s, age_s, due, recrawl_score).

    - period_s: the changefreq's revisit period (NULL for 'never' =
      archived; absent changefreq falls back to `default_changefreq`);
    - age_s: now_s - lastmod as epoch seconds (try_cast to DATE —
      malformed or absent lastmod -> NULL = never seen modified);
    - due: 'never' is never due; unknown lastmod is always due; else
      age_s >= period_s;
    - recrawl_score: priority (default `default_priority`) x staleness,
      where staleness = age_s/period_s capped at 2.0 (unknown lastmod
      and 'always' score the cap; 'never' scores 0). Sort descending to
      fill a fetch budget with the most-overdue, highest-priority URLs.

    Narrow per-row projection — no exchange; composes ahead of
    frontier_schedule (score the sweep, take the budget, schedule)."""
    known = [n for n, _ in _CHANGEFREQ_PERIOD_S] + ["never"]
    raw = F.lower(F.col(changefreq_col))
    # absent OR unrecognized changefreq falls back to the default
    freq = F.when(raw.isin(known), raw).otherwise(
        F.lit(default_changefreq)
    )
    period = F.lit(None).cast("long")
    for name, secs in reversed(_CHANGEFREQ_PERIOD_S):
        period = F.when(freq == name, F.lit(secs).cast("long")).otherwise(
            period
        )
    lastd = F.col(lastmod_col).try_cast("date")
    age = (F.lit(now_s).cast("long") - F.unix_date(lastd) * 86400).alias(
        "age_s"
    )
    due = (
        F.when(freq == "never", F.lit(False))
        .when(lastd.isNull(), F.lit(True))
        .otherwise(F.col("age_s") >= F.col("period_s"))
    )
    staleness = F.when(
        lastd.isNull() | (F.col("period_s") == 0), F.lit(2.0)
    ).otherwise(
        F.least(F.col("age_s") / F.col("period_s"), F.lit(2.0))
    )
    score = F.coalesce(
        F.col(priority_col).try_cast("double"),
        F.lit(float(default_priority)),
    ) * F.when(freq == "never", F.lit(0.0)).otherwise(staleness)
    return (
        entries.withColumn("period_s", period)
        .withColumn("age_s", age)
        .withColumn("due", due)
        .withColumn("recrawl_score", score)
    )


def recrawl_priority_sql(
    entries_cte: str,
    now_s: int,
    lastmod_expr: str = "lastmod",
    changefreq_expr: str = "changefreq",
    priority_expr: str = "priority",
    default_changefreq: str = "weekly",
    default_priority: float = 0.5,
) -> str:
    """SELECT <entries_cte>.*, period_s, age_s, due, recrawl_score —
    exactly recrawl_priority()."""
    known = ", ".join(
        f"'{n}'" for n, _ in _CHANGEFREQ_PERIOD_S
    ) + ", 'never'"
    freq = (
        f"CASE WHEN lower({changefreq_expr}) IN ({known}) "
        f"THEN lower({changefreq_expr}) ELSE '{default_changefreq}' END"
    )
    period_cases = " ".join(
        f"WHEN '{name}' THEN {secs}" for name, secs in _CHANGEFREQ_PERIOD_S
    )
    return f"""(
WITH rc_base AS (
  SELECT e.*,
         CAST(CASE {freq} {period_cases} END AS BIGINT) AS period_s,
         CAST({now_s} AS BIGINT)
           - date_diff('day', DATE '1970-01-01',
                       TRY_CAST({lastmod_expr} AS DATE)) * 86400 AS age_s,
         TRY_CAST({lastmod_expr} AS DATE) IS NULL AS _rc_nolast
  FROM {entries_cte} e
)
SELECT * EXCLUDE (_rc_nolast),
       CASE WHEN {freq} = 'never' THEN false
            WHEN _rc_nolast THEN true
            ELSE age_s >= period_s END AS due,
       coalesce(TRY_CAST({priority_expr} AS DOUBLE),
                {float(default_priority)})
         * CASE WHEN {freq} = 'never' THEN 0.0
                WHEN _rc_nolast OR period_s = 0 THEN 2.0
                ELSE least(age_s / period_s, 2.0) END AS recrawl_score
FROM rc_base
)"""


def fetch_budget_allocate(
    hosts: DataFrame,
    budget: int,
    weight_col: str = "weight",
    host_col: str = "host",
) -> DataFrame:
    """Apportion an integer fetch budget across hosts proportionally to
    `weight_col` (host rank, backlog size, ...) by the largest-remainder
    (Hamilton) method: hosts + (fetch_budget long), with
    sum(fetch_budget) == budget exactly (when any weight is positive).

    Semantics: non-positive/NULL weights get weight 0; every host's
    base share is floor(budget * w / total); the remaining
    budget - sum(base) units (< #hosts with weight) go to the largest
    fractional remainders, ties broken by host ascending. If no weight
    is positive the budget is unallocated (all zeros).

    Scale shape: the total is one aggregate broadcast back as a 1-row
    cross join (constant work); the remainder distribution is
    orderBy+limit(leftover) — TakeOrderedAndProject, never a
    single-partition window — then a broadcast semi-join of at most
    #hosts rows. The driver materializes two scalars (total leftover),
    both bounded; everything row-wise stays in the scan stage."""
    out_cols = [c for c in hosts.columns if c != "fetch_budget"]
    w = F.coalesce(F.col(weight_col).try_cast("double"), F.lit(0.0))
    w = F.when(w > 0, w).otherwise(F.lit(0.0))
    tot = hosts.select(F.sum(w).alias("_cb_tot"))
    d = hosts.select(*out_cols).crossJoin(F.broadcast(tot))
    share = F.when(
        F.col("_cb_tot") > 0,
        F.lit(float(budget)) * w / F.col("_cb_tot"),
    ).otherwise(F.lit(0.0))
    d = (
        d.withColumn("_cb_share", share)
        .withColumn("_cb_base", F.floor("_cb_share").cast("long"))
        .withColumn("_cb_frac", F.col("_cb_share") - F.col("_cb_base"))
    )
    allocated = d.select(F.sum("_cb_base")).first()[0]
    leftover = int(budget) - int(allocated or 0)
    top = (
        d.where(F.col("_cb_frac") > 0)
        .orderBy(F.col("_cb_frac").desc(), F.col(host_col))
        .limit(max(leftover, 0))
        .select(F.col(host_col).alias("_cb_host"), F.lit(1).alias("_cb_plus"))
    )
    return (
        d.join(
            F.broadcast(top), d[host_col] == top["_cb_host"], "left"
        )
        .select(
            *out_cols,
            (
                F.col("_cb_base")
                + F.coalesce(F.col("_cb_plus"), F.lit(0))
            ).cast("long").alias("fetch_budget"),
        )
    )


def fetch_budget_allocate_sql(
    hosts_cte: str,
    budget: int,
    weight_expr: str = "weight",
    host_expr: str = "host",
) -> str:
    """SELECT <hosts_cte>.*, fetch_budget — exactly
    fetch_budget_allocate()."""
    w = (
        f"CASE WHEN coalesce(TRY_CAST({weight_expr} AS DOUBLE), 0.0) > 0 "
        f"THEN TRY_CAST({weight_expr} AS DOUBLE) ELSE 0.0 END"
    )
    return f"""(
WITH cb_tot AS (SELECT sum({w}) AS tot FROM {hosts_cte}),
cb_base AS (
  SELECT h.*,
         floor(CASE WHEN t.tot > 0
                    THEN {float(budget)} * {w} / t.tot
                    ELSE 0.0 END)::BIGINT AS _base,
         CASE WHEN t.tot > 0
              THEN {float(budget)} * {w} / t.tot
              ELSE 0.0 END
           - floor(CASE WHEN t.tot > 0
                        THEN {float(budget)} * {w} / t.tot
                        ELSE 0.0 END) AS _frac
  FROM {hosts_cte} h CROSS JOIN cb_tot t
),
cb_left AS (
  SELECT {budget} - coalesce(sum(_base), 0) AS leftover FROM cb_base
),
cb_rank AS (
  SELECT {host_expr} AS _h,
         row_number() OVER (ORDER BY _frac DESC, {host_expr}) AS _rn
  FROM cb_base WHERE _frac > 0
)
SELECT b.* EXCLUDE (_base, _frac),
       (_base + CASE WHEN r._rn IS NOT NULL
                      AND r._rn <= (SELECT leftover FROM cb_left)
                     THEN 1 ELSE 0 END)::BIGINT AS fetch_budget
FROM cb_base b LEFT JOIN cb_rank r ON b.{host_expr} = r._h
)"""


def frontier_schedule(
    urls: DataFrame,
    delays: DataFrame | None = None,
    url_col: str = "url",
    default_delay_s: float = 1.0,
    start_s: float = 0.0,
) -> DataFrame:
    """Politeness schedule: assign each candidate URL a per-host fetch
    slot and timestamp — urls + (host, delay_s, slot, fetch_at_s) with
    slot numbering the host's URLs in url order (a deterministic pure
    function of the frontier: re-runs and repartitionings produce the
    identical schedule) and fetch_at_s = start_s + slot * delay_s.

    `delays` is the (host, delay_s) table robots_crawl_delays emits —
    host-count-sized, joined as a broadcast map; hosts without a
    directive fall back to `default_delay_s`. A frontier scheduler
    consumes this as \"host h may be fetched at start + k*delay\" —
    the RFC politeness contract laid out declaratively.

    The four output columns (host, delay_s, slot, fetch_at_s) REPLACE
    any same-named input column — host is always recomputed from
    `url_col` — so composing over sitemap_urls (which keeps its own
    host) never yields an ambiguous duplicate."""
    from pyspark.sql import Window

    from spdb_spark.functions.url import url_host

    _mine = ("host", "delay_s", "slot", "fetch_at_s")
    out_cols = [c for c in urls.columns if c not in _mine]
    d = urls.select(*out_cols).withColumn("host", url_host(F.col(url_col)))
    if delays is not None:
        d = d.join(
            F.broadcast(
                delays.select("host", F.col("delay_s").alias("_fs_delay"))
            ),
            "host",
            "left",
        )
        delay = F.coalesce(F.col("_fs_delay"), F.lit(float(default_delay_s)))
    else:
        delay = F.lit(float(default_delay_s))
    w = Window.partitionBy("host").orderBy(F.col(url_col))
    return d.select(
        *out_cols,
        F.col("host"),
        delay.alias("delay_s"),
        (F.row_number().over(w) - 1).cast("long").alias("slot"),
        (F.lit(float(start_s)) + (F.row_number().over(w) - 1) * delay).alias(
            "fetch_at_s"
        ),
    )


def sitemap_tree_urls(
    roots: DataFrame,
    fetched: DataFrame,
    loc_col: str = "loc",
    xml_col: str = "xml",
    keep_cols: tuple[str, ...] = ("host",),
    max_depth: int = 3,
) -> DataFrame:
    """Expand a sitemap TREE: follow <sitemapindex> children from the
    root sitemap URLs down to <urlset> leaves and return every URL
    entry — (*keep_cols, loc, lastmod, changefreq, priority), exactly
    sitemap_urls applied to each reachable urlset document.

    `roots` is (*keep_cols, loc_col): the entry sitemap URLs, e.g.
    robots_sitemaps output. `fetched` is (loc_col, xml_col): the
    sitemap documents already fetched, keyed by their URL (the fetch
    itself is I/O outside the engine). Expansion is a bounded loop of
    `max_depth` host-count-sized broadcast joins — sitemaps.org caps
    nesting at one index level, so 3 covers every spec-conforming tree
    with slack; a loc visited at an earlier depth is not re-expanded
    (cycle-safe). Documents never fetched (no row in `fetched`) are
    skipped silently, like a 404 in a real crawl.

    Reference-capability analogue: none; north-star crawl surface."""
    from spdb_spark.session import truncate_lineage

    frontier = roots.select(
        *keep_cols, F.col(loc_col).alias("_sm_loc")
    ).distinct()
    seen = frontier.select(*keep_cols, "_sm_loc")
    # The fetch table is joined once PER DEPTH: without truncation every
    # depth replays its full lineage (whatever parse/decode produced the
    # XML corpus) — max_depth passes over the fetch pipeline instead of
    # one. One lazy checkpoint, sized by the sitemap corpus itself.
    docs = truncate_lineage(
        fetched.select(
            F.col(loc_col).alias("_sm_loc"), F.col(xml_col).alias("_sm_xml")
        ),
        eager=False,
    )
    leaves: DataFrame | None = None
    for depth in range(max_depth):
        # Broadcast the frontier LOC SET (bounded by the sitemap count)
        # and keep the fetched-XML corpus on executors — the reversed
        # join would collect every sitemap document to the driver per
        # depth. `cur` (this depth's matched documents only) is
        # checkpointed because both the urlset and the sitemapindex
        # extraction read it; the frontier checkpoint below keeps depth
        # d's plan from replaying depths 0..d-1 (each depth was
        # otherwise re-deriving the full expansion chain of every
        # earlier depth — quadratic in max_depth).
        cur = truncate_lineage(
            docs.join(F.broadcast(frontier), "_sm_loc").select(
                *keep_cols, F.col("_sm_xml").alias("_sm_doc")
            ),
            eager=False,
        )
        urls = sitemap_urls(cur, xml_col="_sm_doc", keep_cols=keep_cols)
        leaves = urls if leaves is None else leaves.unionByName(urls)
        if depth == max_depth - 1:
            break  # the last depth's children can never be expanded
        children = (
            sitemap_index_locs(cur, xml_col="_sm_doc", keep_cols=keep_cols)
            .select(*keep_cols, F.col("loc").alias("_sm_loc"))
            .distinct()
            .join(seen, [*keep_cols, "_sm_loc"], "left_anti")
        )
        frontier = truncate_lineage(children)
        if not frontier.take(1):
            break  # no unvisited children anywhere — tree exhausted
        seen = seen.unionByName(frontier)
    return leaves


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------


def _fld_sql(tag: str) -> str:
    """Twin of _field: CDATA passes verbatim, plain text entity-decodes,
    trim, empty -> NULL. `b` is the block column."""
    cdata = (
        f"trim(regexp_extract(b, "
        f"'(?s)<{tag}[^>]*>\\s*<!\\[CDATA\\[(.*?)\\]\\]>\\s*</{tag}>', 1))"
    )
    plain = xml_unescape_sql(
        f"trim(regexp_extract(b, "
        f"'(?s)<{tag}[^>]*>\\s*([^<]*?)\\s*</{tag}>', 1))"
    )
    return (
        f"nullif(CASE WHEN {cdata} <> '' THEN {cdata} "
        f"ELSE {plain} END, '')"
    )


def sitemap_urls_sql(
    sitemaps_cte: str,
    xml_expr: str = "xml",
    keep_exprs: str = "host",
) -> str:
    """SELECT <keep_exprs>, loc, lastmod, changefreq, priority —
    exactly sitemap_urls() over `sitemaps_cte`."""

    fld = _fld_sql

    return f"""(
WITH sm_blocks AS (
  SELECT {keep_exprs},
         unnest(regexp_extract_all({xml_expr}, '{_URL_BLOCK}')) AS b
  FROM {sitemaps_cte}
)
SELECT {keep_exprs},
       {fld("loc")} AS loc,
       {fld("lastmod")} AS lastmod,
       {fld("changefreq")} AS changefreq,
       TRY_CAST({fld("priority")} AS DOUBLE) AS priority
FROM sm_blocks
WHERE {fld("loc")} IS NOT NULL
)"""


def sitemap_tree_urls_sql(
    roots_cte: str,
    fetched_cte: str,
    loc_expr: str = "loc",
    xml_expr: str = "xml",
    keep_exprs: str = "host",
    max_depth: int = 3,
) -> str:
    """SELECT <keep_exprs>, loc, lastmod, changefreq, priority —
    exactly sitemap_tree_urls(): the bounded expansion unrolled to
    `max_depth` CTE levels (join frontier to fetched, emit urlset
    leaves, anti-join index children against everything seen)."""
    keys = [k.strip() for k in keep_exprs.split(",")]
    klist = ", ".join(keys)
    fkeys = ", ".join(f"f.{k}" for k in keys)
    leaf_cols = (
        f"{_fld_sql('loc')} AS loc, {_fld_sql('lastmod')} AS lastmod, "
        f"{_fld_sql('changefreq')} AS changefreq, "
        f"TRY_CAST({_fld_sql('priority')} AS DOUBLE) AS priority"
    )
    parts = [
        f"st_f0 AS (SELECT DISTINCT {klist}, {loc_expr} AS _sm_loc "
        f"FROM {roots_cte})"
    ]
    seen = "SELECT * FROM st_f0"
    leaves = []
    for i in range(max_depth):
        parts.append(
            f"st_d{i} AS (SELECT {fkeys}, x.{xml_expr} AS _sm_xml "
            f"FROM st_f{i} f JOIN {fetched_cte} x "
            f"ON f._sm_loc = x.{loc_expr})"
        )
        parts.append(
            f"st_u{i} AS (SELECT {klist}, "
            f"unnest(regexp_extract_all(_sm_xml, '{_URL_BLOCK}')) AS b "
            f"FROM st_d{i})"
        )
        leaves.append(
            f"SELECT {klist}, {leaf_cols} FROM st_u{i} "
            f"WHERE {_fld_sql('loc')} IS NOT NULL"
        )
        if i < max_depth - 1:
            parts.append(
                f"st_c{i} AS (SELECT DISTINCT {klist}, "
                f"{_fld_sql('loc')} AS _sm_loc FROM "
                f"(SELECT {klist}, unnest(regexp_extract_all(_sm_xml, "
                f"'{_SITEMAP_BLOCK}')) AS b FROM st_d{i}) "
                f"WHERE {_fld_sql('loc')} IS NOT NULL)"
            )
            parts.append(
                f"st_f{i + 1} AS (SELECT c.{klist.replace(', ', ', c.')},"
                f" c._sm_loc FROM st_c{i} c ANTI JOIN ({seen}) s "
                f"USING ({klist}, _sm_loc))"
            )
            seen += f" UNION SELECT * FROM st_f{i + 1}"
    return (
        "(\nWITH "
        + ",\n".join(parts)
        + "\n"
        + "\nUNION ALL\n".join(leaves)
        + "\n)"
    )


def frontier_schedule_sql(
    urls_cte: str,
    delays_cte: str | None,
    url_expr: str = "url",
    default_delay_s: float = 1.0,
    start_s: float = 0.0,
    drop_cols: tuple[str, ...] = (),
) -> str:
    """SELECT <urls_cte>.*, host, delay_s, slot, fetch_at_s — exactly
    frontier_schedule(). `delays_cte` exposes (host, delay_s) or is
    None for the uniform default. `drop_cols` mirrors the Python
    side's replace-on-collision: list any of host/delay_s/slot/
    fetch_at_s the urls_cte already carries so they are EXCLUDEd
    before the computed columns are appended."""
    from spdb_spark.functions.url import url_host_sql

    if delays_cte is not None:
        join = f"LEFT JOIN {delays_cte} dl USING (host)"
        delay = f"coalesce(dl.delay_s, {float(default_delay_s)})"
    else:
        join = ""
        delay = str(float(default_delay_s))
    ex = f" EXCLUDE ({', '.join(drop_cols)})" if drop_cols else ""
    return f"""(
WITH fs_urls AS (
  SELECT u.*{ex}, {url_host_sql(url_expr)} AS host FROM {urls_cte} u
),
fs_joined AS (
  SELECT fs_urls.*, {delay} AS _delay
  FROM fs_urls {join}
)
SELECT * EXCLUDE (_delay, _slot),
       _delay AS delay_s,
       _slot AS slot,
       {float(start_s)} + _slot * _delay AS fetch_at_s
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY host ORDER BY {url_expr}
  ) - 1 AS _slot
  FROM fs_joined
)
)"""
