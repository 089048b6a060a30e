"""URL canonicalization for crawl-scale corpora — pure Catalyst.

A web-crawl corpus keys almost everything on the URL (dedup, host-level
quality priors, robots/blocklist joins, refetch scheduling), and raw
crawl URLs are noisy: case-insensitive scheme/host written in any case,
explicit default ports, tracking query parameters, fragments that never
reach the server, decorative trailing slashes. Canonicalizing BEFORE
the URL becomes a join/group key collapses those spurious distinctions
once, instead of leaking them into every downstream shuffle.

Everything here is built from `pyspark.sql.functions` regexp/string
expressions — no Python UDF — so URL normalization of 100 TB of crawl
metadata stays inside whole-stage codegen and the normalized column is
usable as a partition/bucket key with zero Python cost.

The reference engine has no web layer (it ingests CSV reviews —
/root/reference/examples/cosine_query_example.rs:14-43); this module is
part of the training-data-pipeline surface built on top of its query
semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# query parameters that identify a CLICK, not a resource — the standard
# strip-list (Google Analytics utm_*, Google/Facebook click ids)
_TRACKING_PARAM = r"(?:utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_url(col: Column | str) -> Column:
    """Canonical URL form, applied as a fixed rule chain:

    1. trim surrounding whitespace;
    2. lowercase the scheme and authority (RFC 3986 §6.2.2.1 — they are
       case-insensitive; the path/query are NOT touched);
    3. drop the fragment (never sent to the server);
    4. remove tracking query parameters (``utm_*``, ``gclid``,
       ``fbclid``, ``msclkid``), then tidy dangling ``?``/``&``;
    5. strip an explicit default port (``:80`` for http, ``:443`` for
       https);
    6. drop a single decorative trailing slash (but keep a bare-root
       ``/`` — ``https://h/`` and ``https://h/p/`` normalize to
       ``https://h/`` and ``https://h/p``).

    Non-URL strings pass through steps that don't match them unchanged —
    the function is total, never raising, so it is safe directly over a
    dirty crawl column.
    """
    u = F.trim(_c(col))
    scheme = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    authority = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^#]*)", 1)
    # steps 3+4: `rest` already excludes the fragment; strip tracking
    # params wherever they sit in the query, then tidy separators
    rest = F.regexp_replace(rest, r"(?<=[?&])" + _TRACKING_PARAM + r"=[^&]*&?", "")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    # step 5: default ports (the authority is already lowercased below,
    # but match case-insensitively to keep the rule order-independent)
    scheme_l = F.lower(scheme)
    auth_l = F.lower(authority)
    auth_l = F.when(
        (scheme_l == "http") & auth_l.endswith(":80"),
        F.substring(auth_l, 1, F.length(auth_l) - 3),
    ).when(
        (scheme_l == "https") & auth_l.endswith(":443"),
        F.substring(auth_l, 1, F.length(auth_l) - 4),
    ).otherwise(auth_l)
    # step 6: one decorative trailing slash on a non-root path
    rest = F.regexp_replace(rest, r"^(/.+?)/$", "$1")
    return F.when(
        scheme == "", u  # not scheme://… — pass through untouched
    ).otherwise(F.concat(scheme_l, F.lit("://"), auth_l, rest))


def html_to_text(col: Column | str) -> Column:
    """Main-text extraction from raw HTML — the first transform a crawl
    corpus goes through, kept as a fixed Catalyst regexp chain (no
    Python in the per-byte hot path):

    1. drop ``<script>``/``<style>`` blocks WITH their contents
       (case-insensitive, dotall — code/CSS is never prose);
    2. drop ``<!-- comments -->``;
    3. replace every remaining tag with a space (tags are word
       boundaries: ``a<br>b`` is two words);
    4. decode the basic entities (``&nbsp; &lt; &gt; &quot; &#39;``,
       and ``&amp;`` LAST so double-escaped text decodes exactly one
       level, e.g. ``&amp;lt;`` → ``&lt;``);
    5. collapse whitespace runs to single spaces and trim.

    Entity decoding runs AFTER tag stripping, so escaped markup in the
    text (``&lt;tag&gt;``) survives as literal ``<tag>`` instead of
    being eaten by the tag regex. This is a boilerplate-agnostic
    extractor (everything outside script/style/comments is kept);
    line-level quality pruning is operators/cleaning.py::clean_lines."""
    s = _c(col)
    s = F.regexp_replace(s, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", " ")
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    s = F.regexp_replace(s, r"(?s)<[^>]+>", " ")
    for ent, ch in [
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
    ]:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def url_host(col: Column | str, strip_www: bool = True) -> Column:
    """Lowercased host of a URL (no port, no userinfo); with
    ``strip_www`` a leading ``www.`` label is removed — the usual key
    for host-level aggregation (per-site quality priors, crawl budgets,
    domain blocklists)."""
    auth = F.lower(
        F.regexp_extract(_c(col), r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    )
    host = F.regexp_replace(auth, r"^[^@]*@", "")  # userinfo
    host = F.regexp_replace(host, r":\d+$", "")  # port
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    return host


def apply_url_rules(
    urls,
    rules,
    url_col: str = "url",
    default_allow: bool = True,
    out_col: str = "allow",
):
    """Robots-style URL gating with LONGEST-MATCH semantics (RFC 9309
    §2.2.2: the most specific matching rule wins, allow beats disallow
    on equal length): ``rules`` is (host, path_prefix, allow); each URL
    takes the matching rule with the longest path_prefix for its host,
    or ``default_allow`` when none matches. Returns ``urls`` plus an
    ``out_col`` boolean (default ``allow``); input columns that collide
    with the output or the internal tag columns raise up front instead
    of silently mis-aggregating.

    Plan: rules tables are small by nature (a crawl's robots corpus is
    per-host, not per-page) — broadcast equi-join on the canonical
    host, prefix test per candidate rule, then ONE row-id-keyed
    aggregate picking max(struct(prefix_len, allow)); the struct
    ordering makes allow win length ties. That single shuffle carries
    each URL row once per matching-host rule (a handful), never a
    corpus×rules blow-up.
    """
    from pyspark.sql import functions as F

    clashes = {"_host", "_path", "_rid", out_col} & set(urls.columns)
    if clashes:
        raise ValueError(
            f"apply_url_rules: input already has column(s) {sorted(clashes)}; "
            f"rename them or pass a different out_col (internal columns "
            f"_host/_path/_rid and the output column must be free)"
        )

    u = F.col(url_col)
    host = url_host(u)
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    tagged = urls.select(
        "*",
        host.alias("_host"),
        path.alias("_path"),
        F.monotonically_increasing_id().alias("_rid"),
    )
    r = rules.select(
        F.col("host").alias("_host"),
        F.col("path_prefix").alias("_pfx"),
        F.col("allow").alias("_allow"),
    )
    joined = tagged.join(F.broadcast(r), "_host", "left")
    hit = F.col("_pfx").isNotNull() & F.col("_path").startswith(F.col("_pfx"))
    best = F.max(
        F.when(hit, F.struct(F.length("_pfx").alias("l"), F.col("_allow").alias("a")))
    ).alias("_best")
    keep_cols = [c for c in urls.columns]
    out = (
        joined.groupBy("_rid")
        .agg(*[F.first(c).alias(c) for c in keep_cols], best)
        .select(
            *keep_cols,
            F.coalesce(F.col("_best.a"), F.lit(default_allow)).alias(out_col),
        )
    )
    return out
