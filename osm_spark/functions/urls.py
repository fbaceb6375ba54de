"""URL canonicalization for web-corpus dedup (pure Column expressions).

Canonical form — the usual Common-Crawl-style URL-dedup preparation:

1. trim surrounding whitespace;
2. lowercase the scheme and host (they are case-insensitive per RFC
   3986; path/query are NOT touched — they are case-sensitive);
3. drop the default port (``:80`` for http, ``:443`` for https);
4. drop the fragment (``#...`` never reaches the server);
5. drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid``),
   keeping the remaining parameters in their original order, and drop a
   trailing bare ``?``.

URLs without a ``scheme://`` prefix are returned trimmed but otherwise
untouched (opaque — canonicalizing a non-URL would corrupt it).

Everything is decomposed into extract/substr/concat steps with NO regex
backreferences or lookarounds, so the identical chain runs in Spark
(Java regex) and DuckDB (RE2) — the ``redact_pii`` common-dialect rule.
The oracle SQL in ``__spark_entry__.py`` replays it step for step.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme '://' host[:port] — host part stops at the first /, ?, or #
_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://"
_HOSTPORT_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)"
TRACKING_PARAM_RE = r"^(utm_[a-zA-Z0-9_]*|fbclid|gclid)="


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_host(url: Column | str) -> Column:
    """Lowercased host with the port stripped ('' when no scheme)."""
    hostport = F.lower(F.regexp_extract(F.trim(_c(url)), _HOSTPORT_RE, 1))
    return F.regexp_extract(hostport, r"^([^:]*)", 1)


def url_domain(url: Column | str) -> Column:
    """Registrable-domain approximation: the last two dot-labels of the
    host (documented approximation — a public-suffix list is data, not
    code, and slots in here when available)."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def canonical_url(url: Column | str) -> Column:
    u = F.trim(_c(url))
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _HOSTPORT_RE, 1))
    # everything after scheme://hostport, fragment dropped
    tail = F.regexp_replace(
        F.substring(
            u, F.length(scheme) + F.lit(3) + F.length(hostport) + F.lit(1), F.lit(1 << 30)
        ),
        "#.*",
        "",
    )
    # default-port strip (endswith tests, no backrefs)
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.substring(hostport, 1, F.length(hostport) - F.lit(3)),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.substring(hostport, 1, F.length(hostport) - F.lit(4)),
    ).otherwise(hostport)
    # split tail into path and query at the first '?'
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    query = F.substring(
        tail, F.length(path) + F.lit(2), F.lit(1 << 30)
    )  # '' when no '?'
    kept = F.filter(
        F.split(query, "&"),
        lambda t: ~t.rlike(TRACKING_PARAM_RE) & (t != ""),
    )
    new_query = F.array_join(kept, "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(new_query != "", F.concat(F.lit("?"), new_query)).otherwise(
            F.lit("")
        ),
    )
    return F.when(scheme == "", u).otherwise(rebuilt)


def url_path(url: Column | str) -> Column:
    """Path component ('' when absent): everything after the authority,
    before '?' or '#'. Case-preserved (RFC 3986 — paths are
    case-sensitive, unlike hosts)."""
    u = F.trim(_c(url))
    tail = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    return tail


def path_rollup(
    urls: "DataFrame",
    max_depth: int = 3,
    url_col: str = "url",
) -> "DataFrame":
    """(host, prefix, depth, n_pages) — page counts per path-prefix up
    to ``max_depth`` segments: the directory-tree profile of a site
    ("/wiki/* holds 92% of pages") that drives crawl budgeting and
    sitemap diffing.

    One pure-Column prefix expansion (≤ max_depth rows per URL — a
    constant fan-out, never a shuffle amplifier) feeding one
    combiner-reduced (host, prefix) aggregate; URLs with no path
    contribute to depth 0 under the empty prefix. The reference walks
    term→usage maps per record (SURVEY.md §2.2 P3/P4 map semantics);
    this is the same split-and-fold over URL structure.
    """
    from pyspark.sql import functions as _F

    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    host = url_host(url_col)
    path = url_path(url_col)
    # segments: drop the leading '' from the initial '/'; '' path -> []
    segs = _F.filter(_F.split(path, "/"), lambda s: s != "")
    depth = _F.least(_F.size(segs), _F.lit(max_depth))
    prefixes = _F.transform(
        _F.sequence(_F.lit(1), depth),
        lambda i: _F.struct(
            i.cast("int").alias("depth"),
            _F.concat(
                _F.lit("/"),
                _F.array_join(_F.slice(segs, 1, i), "/"),
            ).alias("prefix"),
        ),
    )
    rolled = (
        urls.select(
            host.alias("host"),
            _F.explode(
                _F.when(depth >= 1, prefixes).otherwise(
                    _F.array(
                        _F.struct(
                            _F.lit(0).alias("depth"),
                            _F.lit("/").alias("prefix"),
                        )
                    )
                )
            ).alias("p"),
        )
        .groupBy("host", _F.col("p.prefix").alias("prefix"),
                 _F.col("p.depth").alias("depth"))
        .agg(_F.count(_F.lit(1)).alias("n_pages"))
    )
    return rolled
