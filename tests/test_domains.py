"""Registered-domain extraction (functions/domains.py): public-suffix
algorithm semantics per rule class, DuckDB twin parity, and the
no-corpus-shuffle plan shape of with_registered_domain."""

import duckdb
from pyspark.sql import functions as F

from spdb_spark.functions.domains import (
    host_registered_domains,
    registered_domain_sql,
    with_registered_domain,
)

CASES = {
    # exact single-label rule
    "www.site.com": ("com", "site.com"),
    "site.com": ("com", "site.com"),
    "com": ("com", None),  # host IS a public suffix
    # longest match wins: co.uk over uk
    "a.b.site.co.uk": ("co.uk", "site.co.uk"),
    "site.co.uk": ("co.uk", "site.co.uk"),
    "co.uk": ("co.uk", None),
    "site.uk": ("uk", "site.uk"),
    # wildcard *.ck: any one extra label is public
    "foo.ck": ("foo.ck", None),
    "x.foo.ck": ("foo.ck", "x.foo.ck"),
    # exception !www.ck beats the wildcard
    "www.ck": ("ck", "www.ck"),
    "sub.www.ck": ("ck", "www.ck"),
    # implicit default rule '*': unknown TLD's top label is public
    "site.zz": ("zz", "site.zz"),
    "deep.site.zz": ("zz", "site.zz"),
    "zz": ("zz", None),
    # case folding
    "WWW.Site.COM": ("com", "site.com"),
    # FQDN trailing dot names the same host: stripped before matching
    "site.com.": ("com", "site.com"),
    "a.b.site.co.uk.": ("co.uk", "site.co.uk"),
    "com.": ("com", None),
    # degenerate
    "": (None, None),
    ".": (None, None),
}


def test_psl_semantics(spark):
    hosts = spark.createDataFrame([(h,) for h in CASES], "host string")
    got = {
        r["host"]: (r["public_suffix"], r["domain"])
        for r in host_registered_domains(hosts).collect()
    }
    assert got == CASES


def test_duckdb_twin_parity(spark):
    hosts = list(CASES)
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r["host"]: (r["public_suffix"], r["domain"])
        for r in host_registered_domains(df).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE hosts(host VARCHAR)")
    con.executemany("INSERT INTO hosts VALUES (?)", [(h,) for h in hosts])
    want = {
        h: (p, d)
        for h, p, d in con.execute(
            f"SELECT * FROM {registered_domain_sql('hosts')}"
        ).fetchall()
    }
    assert got == want


def test_corpus_is_broadcast_joined_not_shuffled(spark):
    docs = spark.createDataFrame(
        [(i, f"www.site{i % 5}.co.uk", f"text {i}") for i in range(100)],
        "doc_id long, host string, text string",
    )
    out = with_registered_domain(docs)
    rows = out.collect()
    assert all(r["domain"] == f"site{r['doc_id'] % 5}.co.uk" for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the corpus side reaches the final join via broadcast, never via a
    # doc-keyed exchange: every Exchange in the plan belongs to the
    # distinct-host subtree (host column only)
    assert "BroadcastHashJoin" in plan
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "doc_id" not in m.group(1), plan


def test_full_rule_table_pluggable(spark):
    rules = spark.createDataFrame(
        [("dev", False, 1), ("pages.dev", False, 2)],
        "suffix string, is_exception boolean, level int",
    )
    hosts = spark.createDataFrame(
        [("proj.pages.dev",), ("pages.dev",)], "host string"
    )
    got = {
        r["host"]: r["domain"]
        for r in host_registered_domains(hosts, rules=rules).collect()
    }
    assert got == {"proj.pages.dev": "proj.pages.dev", "pages.dev": None}


from spdb_spark.functions.domains import PSL_SNAPSHOT  # noqa: E402


def test_psl_loader_parses_published_format():
    from spdb_spark.functions.domains import parse_public_suffix_list

    rules = parse_public_suffix_list(PSL_SNAPSHOT)
    assert rules == (
        "ac", "com.ac", "*.ck", "!www.ck", "jp", "co.jp",
        "*.kawasaki.jp", "!city.kawasaki.jp", "uk", "co.uk", "com",
        "中国", "github.io", "s3.amazonaws.com",
    )
    icann = parse_public_suffix_list(PSL_SNAPSHOT, include_private=False)
    assert "github.io" not in icann and "com" in icann
    assert icann == rules[:-2]


def test_psl_loader_drives_the_extractor(spark):
    from spdb_spark.functions.domains import (
        host_registered_domains,
        load_suffix_rules,
    )

    rules = load_suffix_rules(spark, PSL_SNAPSHOT)
    cases = {
        # private-section rule: github.io is a public suffix
        "a.foo.github.io": ("github.io", "foo.github.io"),
        # wildcard + exception inside a real TLD block
        "x.net.kawasaki.jp": ("net.kawasaki.jp", "x.net.kawasaki.jp"),
        "sub.city.kawasaki.jp": ("kawasaki.jp", "city.kawasaki.jp"),
        # IDN rule kept in Unicode form
        "example.中国": ("中国", "example.中国"),
        # plain exact rules still work through the loader
        "www.site.co.uk": ("co.uk", "site.co.uk"),
    }
    hosts = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r["host"]: (r["public_suffix"], r["domain"])
        for r in host_registered_domains(hosts, rules=rules).collect()
    }
    assert got == cases

    # ICANN-only: github.io becomes an ordinary registrable domain
    icann = load_suffix_rules(spark, PSL_SNAPSHOT, include_private=False)
    hosts2 = spark.createDataFrame([("a.foo.github.io",)], "host string")
    r = host_registered_domains(hosts2, rules=icann).collect()[0]
    assert (r["public_suffix"], r["domain"]) == ("io", "github.io")


def test_expression_form_matches_join_form(spark):
    """registered_domain_expr (stateless literal-map form) must agree
    with host_registered_domains (distinct+broadcast join form) on
    every rule class, for both the default rules and the PSL snapshot
    loader rules — two independent implementations of the published
    algorithm pinned against each other."""
    from spdb_spark.functions.domains import (
        host_registered_domains,
        load_suffix_rules,
        parse_public_suffix_list,
        registered_domain_expr,
    )

    hosts = list(CASES) + [
        "a.foo.github.io", "x.net.kawasaki.jp", "sub.city.kawasaki.jp",
        "example.中国", "cdn.x.com.ac", "foo.github.io.",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")

    expr_default = {
        r["host"]: r["d"]
        for r in df.select(
            "host", registered_domain_expr("host").alias("d")
        ).collect()
    }
    join_default = {
        r["host"]: r["domain"] for r in host_registered_domains(df).collect()
    }
    assert expr_default == join_default

    rules = parse_public_suffix_list(PSL_SNAPSHOT)
    expr_psl = {
        r["host"]: r["d"]
        for r in df.select(
            "host", registered_domain_expr("host", rules).alias("d")
        ).collect()
    }
    join_psl = {
        r["host"]: r["domain"]
        for r in host_registered_domains(
            df, rules=load_suffix_rules(spark, PSL_SNAPSHOT)
        ).collect()
    }
    assert expr_psl == join_psl


def test_domain_blocklist_blocks_at_etld_plus_one(spark):
    from spdb_spark.functions.domains import domain_blocklist_filter

    docs = spark.createDataFrame(
        [
            (1, "a.b.badsite.co.uk"),   # subdomain of a blocked domain
            (2, "badsite.co.uk"),        # the blocked domain itself
            (3, "notbadsite.co.uk"),     # sibling: must survive
            (4, "badsite.com"),          # different eTLD+1: survives
            (5, ""),                     # no domain: survives
        ],
        "doc_id long, host string",
    )
    kept = domain_blocklist_filter(docs, ("badsite.co.uk",))
    assert sorted(r["doc_id"] for r in kept.collect()) == [3, 4, 5]
    assert sorted(kept.columns) == ["doc_id", "host"]  # helper col dropped


def test_expression_form_tolerates_duplicate_rules(spark):
    # hand-maintained rule lists easily repeat a rule (e.g. a suffix in
    # two PSL sections); with mapKeyDedupPolicy=EXCEPTION a duplicate
    # literal-map key is a runtime error unless we dedupe first
    from spdb_spark.functions.domains import registered_domain_expr

    docs = spark.createDataFrame(
        [(1, "www.example.co.uk"), (2, "foo.example.com")],
        "doc_id long, host string",
    )
    dup_rules = ("co.uk", "com", "co.uk", "com", "co.uk")
    got = {
        r["doc_id"]: r["d"]
        for r in docs.select(
            "doc_id", registered_domain_expr("host", dup_rules).alias("d")
        ).collect()
    }
    assert got == {1: "example.co.uk", 2: "example.com"}
    # same body as normal AND exception: the exception prevails (PSL)
    exc_rules = ("*.ck", "!www.ck", "www.ck")
    got2 = docs.limit(0)  # plan-build alone must not raise
    got2 = spark.createDataFrame(
        [(1, "shop.www.ck")], "doc_id long, host string"
    ).select(registered_domain_expr("host", exc_rules).alias("d")).collect()
    assert got2[0]["d"] == "www.ck"
