"""robots.txt exclusion (RFC 9309, the Robots Exclusion Protocol) —
the curation stage every responsible crawl pipeline runs before a URL's
content enters a corpus: parse each host's robots.txt into per-agent
rule groups, then keep only documents whose URL path the selected
group allows.

Semantics implemented (RFC 9309 core):
- lines are `key: value` with `#` comments stripped; unknown keys
  (crawl-delay, sitemap, ...) carry no rules but DO participate in
  group structure: a `User-agent:` line after ANY non-user-agent
  key starts a new group, so a group whose lines are all non-rule
  directives still bounds its neighbours;
- consecutive `User-agent:` lines form ONE group header; the
  allow/disallow rules that follow bind to every agent in the group;
  rules before any user-agent line bind to nothing;
- group selection per host (RFC 9309 §2.2.1 / the Googlebot
  longest-match convention): among agent values that are a
  case-insensitive PREFIX of the product token, the longest wins
  (`mybot-news` obeys a `mybot` group when no `mybot-news` group
  exists, and prefers `mybot-news` when both exist); else the `*`
  group; else everything is allowed. ALL groups naming the winning
  agent value are combined (RFC: matching groups' rules MUST be
  combined), and a matched group with no rules allows everything —
  it does NOT fall through to `*`;
- path patterns support `*` (any octet sequence) and a trailing `$`
  end anchor; an EMPTY pattern matches nothing (so `Disallow:` on its
  own line allows everything, per the RFC example);
- precedence per URL: the longest pattern (octet length) wins; on a
  tie, allow wins; no matching rule means allowed.

Spark-first shape: parsing is posexplode(lines) + ONE window over
(host, line order) to assign group ids — robots files are small, and
there is one per HOST, so the parse table is host-count-sized, never
corpus-sized. Matching broadcast-joins the (host-sized) rule table
onto the corpus keyed by host and evaluates the pattern as a per-row
regex (patterns compile from the rule value by pure string ops);
precedence is one max(struct(len, is_allow)) aggregate per doc. Every
step has a DuckDB SQL twin, so the driver gate replays parse + match
exactly.

Reference-capability analogue: none (jhuapl-boss/spdb is voxel-only);
north-star crawl-curation surface (SURVEY.md) beside functions/url.py
and functions/domains.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _parsed_kv(
    robots: DataFrame, host_col: str, text_col: str
) -> DataFrame:
    """(host, line_no, key, value, grp): every recognized `key: value`
    line with its user-agent group id. Group starts are detected over
    the FULL key stream — not just user-agent/allow/disallow — so two
    groups separated only by non-rule directives (crawl-delay, ...)
    never merge, and a group whose lines are all unrecognized keys
    still registers. One window over (host, line order): the parse
    table is host-count-sized."""
    from pyspark.sql import Window

    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(
            F.split(F.col(text_col), r"\r?\n")
        ).alias("line_no", "raw"),
    )
    kv = (
        lines.select(
            "host",
            "line_no",
            F.trim(
                F.regexp_replace(F.col("raw"), r"#.*$", "")
            ).alias("line"),
        )
        .where(F.col("line") != "")
        .select(
            "host",
            "line_no",
            F.lower(
                F.regexp_extract(F.col("line"), r"^([A-Za-z-]+)\s*:", 1)
            ).alias("key"),
            F.trim(
                F.regexp_extract(
                    F.col("line"), r"^[A-Za-z-]+\s*:\s*(.*)$", 1
                )
            ).alias("value"),
        )
        .where(F.col("key") != "")
    )
    w = Window.partitionBy("host").orderBy("line_no")
    return (
        kv.withColumn(
            "_starts",
            (
                (F.col("key") == "user-agent")
                & (
                    F.coalesce(F.lag("key").over(w), F.lit(""))
                    != "user-agent"
                )
            ).cast("int"),
        )
        .withColumn("grp", F.sum("_starts").over(w))
        .drop("_starts")
    )


def _agents(parsed: DataFrame) -> DataFrame:
    # A blank `User-agent:` line still bounds groups (that happens in
    # _parsed_kv) but names no agent: an empty value would otherwise be
    # a zero-length prefix of EVERY product token and beat `*`.
    return (
        parsed.where((F.col("key") == "user-agent") & (F.col("value") != ""))
        .select("host", "grp", F.lower(F.col("value")).alias("agent"))
        .distinct()
    )


def _select_agent(agents: DataFrame, me: str) -> DataFrame:
    """(host, agent): the group-selection winner per host for product
    token `me` — the longest agent value that is a case-insensitive
    prefix of `me`, else `*`, else no row (allow-all host). Selection
    runs on the AGENTS table so rule-less groups still win (a matched
    empty group allows all rather than falling through to `*`)."""
    cand = agents.where(
        (F.col("agent") == "*")
        | (
            F.col("agent")
            == F.substring(F.lit(me), F.lit(1), F.length(F.col("agent")))
        )
    )
    return (
        cand.select("host", "agent")
        .distinct()
        .groupBy("host")
        .agg(
            F.max(
                F.struct(
                    (F.col("agent") != "*").cast("int").alias("spec"),
                    F.length("agent").alias("len"),
                    F.col("agent").alias("agent"),
                )
            ).alias("_p")
        )
        .select("host", F.col("_p.agent").alias("agent"))
    )


def robots_rules(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, robots_txt) -> (host, grp, agent, rule_type, pattern,
    pattern_len): one row per (agent, rule) pair, grp numbering the
    user-agent groups per host in file order (every recognized key
    counts toward group structure). Rules preceding any user-agent
    line are dropped (grp 0 has no agents); groups with no
    allow/disallow lines produce no rows here — group SELECTION runs
    on the agents table, not this join."""
    grouped = _parsed_kv(robots, host_col, text_col)
    agents = _agents(grouped)
    rules = grouped.where(
        F.col("key").isin("allow", "disallow") & (F.col("grp") > 0)
    ).select(
        "host",
        "grp",
        F.col("key").alias("rule_type"),
        F.col("value").alias("pattern"),
        F.length("value").alias("pattern_len"),
    )
    return agents.join(rules, ["host", "grp"]).select(
        "host", "grp", "agent", "rule_type", "pattern", "pattern_len"
    )


def _pattern_regex(pattern: Column) -> Column:
    """robots path pattern -> anchored Java/RE2 regex (shared by the
    SQL twin): escape regex metachars, `*` -> `.*`, trailing `$` stays
    an anchor, prefix semantics otherwise."""
    anchored = pattern.endswith("$")
    body = F.when(
        anchored, F.substring(pattern, 1, F.length(pattern) - 1)
    ).otherwise(pattern)
    esc = F.regexp_replace(body, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    wild = F.replace(esc, F.lit("*"), F.lit(".*"))
    return F.concat(
        F.lit("^"), wild, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )


def url_path(url: Column) -> Column:
    """Path + query of a URL ('/' when absent) — the string robots
    patterns match against."""
    p = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_filter(
    docs: DataFrame,
    robots: DataFrame,
    agent: str,
    url_col: str = "source",
    host_col: str = "host",
    text_col: str = "robots_txt",
    keep_verdict: bool = False,
) -> DataFrame:
    """Drop documents whose URL the host's robots.txt disallows for
    `agent`. `robots` is (host, robots_txt) — host-count-sized, so the
    rule join broadcasts; the corpus never shuffles AND never
    aggregates: each host's active rules collect into ONE array row
    (host-sized state), the corpus broadcast-joins it 1:1, and the
    longest-match/allow-wins precedence evaluates as a per-row
    aggregate() fold over the array — stateless end to end, so the
    same operator drops into a structured stream unchanged.
    keep_verdict=True returns ALL docs with an `allowed` boolean
    instead of filtering."""
    from spdb_spark.functions.url import url_host

    me = agent.lower()
    grouped = _parsed_kv(robots, host_col, text_col)
    agents = _agents(grouped)
    # group selection: longest prefix-matching agent, else '*' (see
    # _select_agent); ALL groups naming the winning agent combine, and
    # a rule-less selected group yields no active rules -> allow-all
    sel = agents.join(_select_agent(agents, me), ["host", "agent"]).select(
        "host", "grp"
    )
    rules = grouped.where(
        F.col("key").isin("allow", "disallow")
        & (F.col("grp") > 0)
        & (F.col("value") != "")
    )
    active = rules.join(sel, ["host", "grp"]).select(
        "host",
        F.col("key").alias("rule_type"),
        F.length("value").alias("pattern_len"),
        _pattern_regex(F.col("value")).alias("rx"),
    )
    host_rules = active.groupBy("host").agg(
        F.collect_list(
            F.struct(
                F.col("pattern_len"),
                (F.col("rule_type") == "allow").cast("int").alias("_a"),
                F.col("rx"),
            )
        ).alias("_rb_rules")
    )
    d = docs.withColumn("_rb_host", url_host(F.col(url_col))).withColumn(
        "_rb_path", url_path(F.col(url_col))
    )
    id_cols = docs.columns
    # per-row fold: among rules whose regex matches the path, keep the
    # max (pattern_len, is_allow) struct; absent/empty rules or no
    # match -> NULL -> allowed
    matched = (
        d.join(F.broadcast(host_rules), d["_rb_host"] == host_rules["host"], "left")
        .drop(host_rules["host"])
        .withColumn(
            "_top",
            F.array_max(
                F.expr(
                    "filter(_rb_rules, r -> rlike(_rb_path, r.rx))"
                )
            ),
        )
        .select(
            *id_cols,
            (
                F.col("_top").isNull() | (F.col("_top._a") == 1)
            ).alias("allowed"),
        )
    )
    if keep_verdict:
        return matched
    return matched.where(F.col("allowed")).drop("allowed")


def robots_crawl_delays(
    robots: DataFrame,
    agent: str,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, delay_s double) — the Crawl-delay directive of the
    agent's SELECTED group (the same longest-prefix-else-`*` selection
    robots_filter uses, over all groups of the winning agent; min wins
    if several). Group boundaries come from the full key stream, so a
    rules-only group never absorbs the next group's crawl-delay.
    Non-numeric or absent values drop the host. The politeness input
    of a frontier scheduler; host-count-sized."""
    me = agent.lower()
    grouped = _parsed_kv(robots, host_col, text_col)
    agents = _agents(grouped)
    sel = agents.join(_select_agent(agents, me), ["host", "agent"]).select(
        "host", "grp"
    )
    delays = grouped.where(
        (F.col("key") == "crawl-delay") & (F.col("grp") > 0)
    ).select(
        # try_cast: a malformed delay ("Crawl-delay: soon") becomes NULL
        # and drops the host in BOTH ANSI modes, matching the SQL twin's
        # TRY_CAST — a plain cast throws CAST_INVALID_INPUT under ANSI.
        "host",
        "grp",
        F.col("value").try_cast("double").alias("delay_s"),
    )
    return (
        delays.join(sel, ["host", "grp"])
        .where(F.col("delay_s").isNotNull())
        .groupBy("host")
        .agg(F.min("delay_s").alias("delay_s"))
    )


def robots_sitemaps(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, sitemap string) — Sitemap directives, which per the
    protocol live OUTSIDE user-agent groups (one row per occurrence,
    file order not preserved; duplicates dropped). Frontier seeds."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(text_col), r"\r?\n")).alias("raw"),
    )
    return (
        lines.select(
            "host",
            F.trim(F.regexp_replace(F.col("raw"), r"#.*$", "")).alias(
                "line"
            ),
        )
        .where(F.lower(F.col("line")).rlike(r"^sitemap\s*:"))
        .select(
            "host",
            F.trim(
                F.regexp_extract(
                    F.col("line"), r"(?i)^sitemap\s*:\s*(.*)$", 1
                )
            ).alias("sitemap"),
        )
        .where(F.col("sitemap") != "")
        .distinct()
    )


# ---------------------------------------------------------------------------
# DuckDB twins: the same parse + match over a (host, robots_txt) CTE.
# ---------------------------------------------------------------------------


def _parsed_sql(robots_cte: str) -> str:
    """CTE fragment chain ending in rb_grp / rb_agents — the DuckDB
    twin of _parsed_kv + _agents (group ids over ALL recognized keys)."""
    return f"""rb_split AS (
  SELECT host, string_split_regex(robots_txt, '\\r?\\n') AS ls
  FROM {robots_cte}
),
rb_lines AS (
  SELECT host, u.i - 1 AS line_no,
         trim(regexp_replace(ls[u.i::INT], '#.*$', '', 'g')) AS line
  FROM rb_split, unnest(range(1, len(ls) + 1)) AS u(i)
),
rb_kv AS (
  SELECT host, line_no, key, value FROM (
    SELECT host, line_no,
           lower(regexp_extract(line, '^([A-Za-z-]+)\\s*:', 1)) AS key,
           trim(regexp_extract(line, '^[A-Za-z-]+\\s*:\\s*(.*)$', 1))
             AS value
    FROM rb_lines WHERE line <> ''
  ) WHERE key <> ''
),
rb_starts AS (
  SELECT host, line_no, key, value,
         CASE WHEN key = 'user-agent' AND
              coalesce(lag(key) OVER (PARTITION BY host
                                      ORDER BY line_no), '')
              <> 'user-agent' THEN 1 ELSE 0 END AS starts
  FROM rb_kv
),
rb_grp AS (
  SELECT host, line_no, key, value,
         SUM(starts) OVER (PARTITION BY host ORDER BY line_no) AS grp
  FROM rb_starts
),
rb_agents AS (
  SELECT DISTINCT host, grp, lower(value) AS agent
  FROM rb_grp WHERE key = 'user-agent' AND value <> ''
)"""


def _pick_sql(agent: str) -> str:
    """CTE fragment rb_pick(host, agent): the longest prefix-matching
    agent value else '*' — the twin of _select_agent over rb_agents."""
    me = agent.lower().replace("'", "''")
    return f"""rb_pick AS (
  SELECT host, agent FROM (
    SELECT host, agent,
           row_number() OVER (
             PARTITION BY host
             ORDER BY (agent <> '*') DESC, length(agent) DESC, agent
           ) AS rn
    FROM (SELECT DISTINCT host, agent FROM rb_agents
          WHERE agent = '*'
             OR agent = substr('{me}', 1, length(agent)))
  ) WHERE rn = 1
)"""


def robots_rules_sql(robots_cte: str) -> str:
    """SELECT host, grp, agent, rule_type, pattern, pattern_len —
    exactly robots_rules() over `robots_cte`(host, robots_txt)."""
    return f"""(
WITH {_parsed_sql(robots_cte)},
rb_rules AS (
  SELECT host, grp, key AS rule_type, value AS pattern,
         length(value) AS pattern_len
  FROM rb_grp WHERE key IN ('allow', 'disallow') AND grp > 0
)
SELECT a.host, a.grp, a.agent, r.rule_type, r.pattern, r.pattern_len
FROM rb_agents a JOIN rb_rules r USING (host, grp)
)"""


def robots_filter_sql(
    docs_cte: str,
    robots_cte: str,
    agent: str,
    url_expr: str = "source",
    id_expr: str = "doc_id",
) -> str:
    """SELECT <docs_cte>.*, allowed — exactly robots_filter(...,
    keep_verdict=True). `docs_cte` must expose the URL as `url_expr`
    and a row-unique `id_expr` (the per-doc precedence partition)."""
    from spdb_spark.functions.url import url_host_sql

    rx = (
        "'^' || replace(regexp_replace("
        "CASE WHEN pattern LIKE '%$' THEN substr(pattern, 1,"
        " length(pattern) - 1) ELSE pattern END,"
        " '([.^$+?(){}\\[\\]|\\\\])', '\\\\\\1', 'g'),"
        " '*', '.*')"
        " || CASE WHEN pattern LIKE '%$' THEN '$' ELSE '' END"
    )
    path = (
        f"(CASE WHEN regexp_extract({url_expr},"
        f" '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$', 1) = ''"
        f" THEN '/' ELSE regexp_extract({url_expr},"
        f" '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$', 1) END)"
    )
    return f"""(
WITH {_parsed_sql(robots_cte)},
{_pick_sql(agent)},
rb_sel AS (
  SELECT a.host, a.grp
  FROM rb_agents a JOIN rb_pick p
    ON a.host = p.host AND a.agent = p.agent
),
rb_active AS (
  SELECT c.host, c.rule_type, length(c.pattern) AS pattern_len,
         {rx} AS rx
  FROM (SELECT host, grp, key AS rule_type, value AS pattern
        FROM rb_grp
        WHERE key IN ('allow', 'disallow') AND grp > 0
          AND value <> '') c
  JOIN rb_sel s ON c.host = s.host AND c.grp = s.grp
),
rb_docs AS (
  SELECT d.*, {url_host_sql(url_expr)} AS _rb_host, {path} AS _rb_path
  FROM {docs_cte} d
),
rb_matched AS (
  SELECT d.*, a.rule_type, a.pattern_len
  FROM rb_docs d LEFT JOIN rb_active a
    ON d._rb_host = a.host AND regexp_matches(d._rb_path, a.rx)
),
rb_top AS (
  SELECT * EXCLUDE (rule_type, pattern_len, _rn) FROM (
    SELECT *, row_number() OVER (
      PARTITION BY {id_expr}
      ORDER BY pattern_len DESC NULLS LAST,
               (rule_type = 'allow') DESC
    ) AS _rn,
    (pattern_len IS NULL OR rule_type = 'allow') AS allowed
    FROM rb_matched
  ) WHERE _rn = 1
)
SELECT * EXCLUDE (_rb_host, _rb_path) FROM rb_top
)"""


def robots_crawl_delays_sql(robots_cte: str, agent: str) -> str:
    """SELECT host, delay_s — exactly robots_crawl_delays() over
    `robots_cte`(host, robots_txt): the same full-key-stream grouping
    and longest-prefix agent selection, min delay over the selected
    agent's groups, non-numeric values dropped."""
    return f"""(
WITH {_parsed_sql(robots_cte)},
{_pick_sql(agent)},
rb_sel AS (
  SELECT a.host, a.grp
  FROM rb_agents a JOIN rb_pick p
    ON a.host = p.host AND a.agent = p.agent
),
rb_delays AS (
  SELECT g.host, TRY_CAST(g.value AS DOUBLE) AS delay_s
  FROM rb_grp g JOIN rb_sel s ON g.host = s.host AND g.grp = s.grp
  WHERE g.key = 'crawl-delay' AND g.grp > 0
)
SELECT host, MIN(delay_s) AS delay_s
FROM rb_delays WHERE delay_s IS NOT NULL
GROUP BY host
)"""


def robots_sitemaps_sql(robots_cte: str) -> str:
    """SELECT host, sitemap — exactly robots_sitemaps() over
    `robots_cte`(host, robots_txt)."""
    return f"""(
WITH sm_split AS (
  SELECT host, string_split_regex(robots_txt, '\\r?\\n') AS ls
  FROM {robots_cte}
),
sm_lines AS (
  SELECT host,
         trim(regexp_replace(ls[u.i::INT], '#.*$', '', 'g')) AS line
  FROM sm_split, unnest(range(1, len(ls) + 1)) AS u(i)
)
SELECT DISTINCT host,
       trim(regexp_extract(line, '(?i)^sitemap\\s*:\\s*(.*)$', 1))
         AS sitemap
FROM sm_lines
WHERE regexp_matches(lower(line), '^sitemap\\s*:')
  AND trim(regexp_extract(line, '(?i)^sitemap\\s*:\\s*(.*)$', 1)) <> ''
)"""
