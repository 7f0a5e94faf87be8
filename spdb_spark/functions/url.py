"""URL normalization and host extraction for crawl curation.

Web-crawl corpora carry the same page under many URL spellings: mixed-
case scheme/host, default ports, fragments, and tracking parameters
(utm_*, fbclid, gclid, ...). Normalizing before the URI enters the
content-addressed doc_id collapses those spellings so exact-refetch
dedup actually fires; host extraction feeds per-domain quotas and
blocklists.

Spark-first shape: every function is a pure Column expression
(regexp_replace/regexp_extract chains — JVM-side, codegen, zero
exchanges). Every regex is RE2-compatible (no lookahead/backreferences)
and each function has a *_sql twin emitting the equivalent DuckDB
expression so gate oracles replay the normalization exactly. DuckDB's
regexp_replace needs the explicit 'g' option where Spark replaces
globally by default — the twins encode that.

No reference-repo counterpart (jhuapl-boss/spdb is voxel-only); part of
the LLM training-data pipeline surface (SURVEY.md north-star).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tracking parameters stripped by normalization: the industry-common set.
_TRACKING = "utm_[a-z]+|fbclid|gclid|msclkid|dclid|mc_eid|igshid|ref|ref_src"

# scheme://authority prefix (case-insensitive match; group 0 is lowercased)
_PREFIX = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"


def url_normalize(c: Column) -> Column:
    """Canonical URL spelling: drop the fragment, strip tracking params,
    collapse the leftover ?/& separators, drop http:80 / https:443
    default ports, lowercase scheme+host (path/query case preserved —
    paths are case-significant), and drop a bare trailing '?'."""
    s = F.regexp_replace(c, r"#.*$", "")  # fragment
    # keep the captured separator: replacing with a literal '&' would eat
    # the '?' of a leading tracking param, and consuming the FOLLOWING
    # '&' instead would skip the second of two consecutive tracking
    # params (global replace scans on, it does not re-scan replacements)
    s = F.regexp_replace(s, rf"([?&])({_TRACKING})=[^&#]*", "$1")
    s = F.regexp_replace(s, r"\?&+", "?")  # '?&x' -> '?x'
    s = F.regexp_replace(s, r"&&+", "&")
    s = F.regexp_replace(s, r"[?&]+$", "")
    # lowercase scheme+host BEFORE port stripping so 'HTTP://H:80' matches
    prefix = F.regexp_extract(s, _PREFIX, 0)
    rest = F.substring(s, F.length(prefix) + F.lit(1), F.length(s))
    s = F.when(prefix == "", s).otherwise(F.concat(F.lower(prefix), rest))
    s = F.regexp_replace(s, r"^(http://[^/:?#]*):80([/?#].*)?$", "$1$2")
    s = F.regexp_replace(s, r"^(https://[^/:?#]*):443([/?#].*)?$", "$1$2")
    return s


def url_host(c: Column) -> Column:
    """Lowercased host (no port, no userinfo); '' for non-URL strings."""
    return F.lower(
        F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)", 1)
    )


def url_resolve_parts(base: Column) -> list[Column]:
    """The base-URL-derived pieces url_resolve needs, as five aliased
    columns (_rs_nofrag, _rs_noq, _rs_scheme, _rs_root, _rs_dirp).
    Everything here depends ONLY on the page URL — computing these once
    per PAGE (before an href explode) instead of once per LINK removes
    ~fan-out× regex evaluations from link extraction (guide §1.2 "per-
    task work"); url_resolve_from_parts consumes them."""
    base_nofrag = F.regexp_replace(base, r"#.*$", "")
    base_noq = F.regexp_replace(base_nofrag, r"\?.*$", "")
    scheme = F.regexp_extract(base, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
    root = F.regexp_extract(base, _PREFIX, 0)
    has_path = base_noq.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*/")
    dirp = F.when(
        has_path, F.regexp_replace(base_noq, r"[^/]*$", "")
    ).otherwise(F.concat(base_noq, F.lit("/")))
    return [
        base_nofrag.alias("_rs_nofrag"),
        base_noq.alias("_rs_noq"),
        scheme.alias("_rs_scheme"),
        root.alias("_rs_root"),
        dirp.alias("_rs_dirp"),
    ]


def url_resolve_from_parts(href: Column) -> Column:
    """url_resolve with the base-derived pieces read from the columns
    url_resolve_parts projected — the per-link branch is CASE + concat
    only (no regex on the base side). Same branch semantics as
    url_resolve; bit-identical output."""
    h = F.trim(href)
    return (
        F.when(h.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*:"), h)
        .when(h.startswith("//"), F.concat(F.col("_rs_scheme"), F.lit(":"), h))
        .when(h.startswith("/"), F.concat(F.col("_rs_root"), h))
        .when(h.startswith("?"), F.concat(F.col("_rs_noq"), h))
        .when((h == "") | h.startswith("#"), F.col("_rs_nofrag"))
        .otherwise(F.concat(F.col("_rs_dirp"), h))
    )


def url_resolve(base: Column, href: Column) -> Column:
    """Resolve an href against its page URL (RFC 3986 reference
    resolution, the cases a host-graph extractor needs):

    - absolute (`scheme:...`)            -> the href itself;
    - protocol-relative (`//host/p`)     -> base's scheme + `:` + href;
    - root-relative (`/p`)               -> base's scheme://authority + href;
    - query-only (`?q`)                  -> base minus query/fragment + href;
    - fragment-only (`#f`) / empty       -> base minus fragment;
    - relative path (`p`, `../p`)        -> base's directory + href.

    Documented approximation: dot-segments (`./`, `../`) are NOT
    collapsed — the authority (all a HOST graph consumes) is exact in
    every branch; only the path spelling of relative links differs from
    a full RFC resolver. Pure Column expressions, RE2-compatible, with
    a DuckDB twin (url_resolve_sql) replaying every branch."""
    h = F.trim(href)
    base_nofrag = F.regexp_replace(base, r"#.*$", "")
    base_noq = F.regexp_replace(base_nofrag, r"\?.*$", "")
    scheme = F.regexp_extract(base, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
    root = F.regexp_extract(base, _PREFIX, 0)
    # directory of the base path: strip the last path segment; a base
    # with NO path ('http://host') must keep its authority and gain '/'
    has_path = base_noq.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*/")
    dirp = F.when(
        has_path, F.regexp_replace(base_noq, r"[^/]*$", "")
    ).otherwise(F.concat(base_noq, F.lit("/")))
    return (
        F.when(h.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*:"), h)
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(root, h))
        .when(h.startswith("?"), F.concat(base_noq, h))
        .when((h == "") | h.startswith("#"), base_nofrag)
        .otherwise(F.concat(dirp, h))
    )


def url_resolve_sql(base_expr: str, href_expr: str) -> str:
    """DuckDB SQL computing exactly url_resolve(base_expr, href_expr)."""
    h = f"trim({href_expr})"
    base_nofrag = f"regexp_replace({base_expr}, '#.*$', '', 'g')"
    base_noq = f"regexp_replace({base_nofrag}, '\\?.*$', '', 'g')"
    scheme = f"regexp_extract({base_expr}, '^([a-zA-Z][a-zA-Z0-9+.-]*):', 1)"
    root = f"regexp_extract({base_expr}, '{_PREFIX}', 0)"
    dirp = (
        f"(CASE WHEN regexp_matches({base_noq},"
        f" '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*/')"
        f" THEN regexp_replace({base_noq}, '[^/]*$', '', 'g')"
        f" ELSE {base_noq} || '/' END)"
    )
    return (
        f"(CASE"
        f" WHEN regexp_matches({h}, '^[a-zA-Z][a-zA-Z0-9+.-]*:') THEN {h}"
        f" WHEN {h} LIKE '//%' THEN {scheme} || ':' || {h}"
        f" WHEN {h} LIKE '/%' THEN {root} || {h}"
        f" WHEN {h} LIKE '?%' THEN {base_noq} || {h}"
        f" WHEN {h} = '' OR {h} LIKE '#%' THEN {base_nofrag}"
        f" ELSE {dirp} || {h} END)"
    )


def url_normalize_sql(expr: str) -> str:
    """DuckDB SQL computing exactly url_normalize(expr)."""
    s = f"regexp_replace({expr}, '#.*$', '', 'g')"
    s = f"regexp_replace({s}, '([?&])({_TRACKING})=[^&#]*', '\\1', 'g')"
    s = f"regexp_replace({s}, '\\?&+', '?', 'g')"
    s = f"regexp_replace({s}, '&&+', '&', 'g')"
    s = f"regexp_replace({s}, '[?&]+$', '', 'g')"
    prefix = f"regexp_extract({s}, '{_PREFIX}', 0)"
    s = (
        f"(CASE WHEN {prefix} = '' THEN {s} "
        f"ELSE lower({prefix}) || substring({s}, length({prefix}) + 1) END)"
    )
    s = f"regexp_replace({s}, '^(http://[^/:?#]*):80([/?#].*)?$', '\\1\\2', 'g')"
    return f"regexp_replace({s}, '^(https://[^/:?#]*):443([/?#].*)?$', '\\1\\2', 'g')"


def url_host_sql(expr: str) -> str:
    """DuckDB SQL computing exactly url_host(expr)."""
    return (
        f"lower(regexp_extract({expr},"
        f" '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#@]*@)?([^/:?#]+)', 2))"
    )
