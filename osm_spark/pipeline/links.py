"""Hyperlink extraction — pages → edge list, the front of the web-graph
layer (``osm_spark.graph`` PageRank / connected components).

The reference walks entity-reference lists out of API payloads
(`lib/osm/event.rb:63-65` member/column refs; SURVEY.md §1.4); this is
the web analog: anchor targets out of the ``html`` binary column of the
pages table (BASELINE.json input_hint shape).

Design: pure Column — ``decode`` the binary once, ``regexp_extract_all``
the href values, explode to (src_url, dst_url) edges. The href pattern
lives in the Java-regex/RE2 COMMON dialect (no backreferences, no
lookaround — the `functions/urls.py` rule), so the DuckDB oracle runs
the same pattern verbatim. Scale: zero shuffle, zero UDF; the regex is
evaluated once per row inside whole-stage codegen and the explode is a
Generate (which also, usefully, stops CollapseProject cloning the
decode+regex subtree into downstream references — BENCH.md finding #2).

Composition: ``extract_links`` → ``functions.urls.canonical_url`` on
both endpoints → ``graph.pagerank`` is the full Common-Crawl link-rank
pipeline; the integration test runs it end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# common-dialect pattern: an <a ...> tag's double-quoted href value.
# [^>]* before href keeps attributes ahead of it; [^"]+ is the value.
# The whitespace class is EXPLICIT (not \s): Java's \s includes vertical
# tab (\x0B) while RE2's does not, so \s would silently diverge between
# the engine and the DuckDB oracle on pathological HTML.
HREF_PATTERN = r'<a[ \t\n\r\f][^>]*href="([^"]+)"'


def extract_links(
    pages: DataFrame,
    src_col: str = "url",
    html_col: str = "html",
    absolute_only: bool = True,
) -> DataFrame:
    """(src_url, dst_url) — one row per anchor href in each page.

    ``absolute_only`` keeps http(s) targets (the web-graph edge set);
    relative links need base-resolution, which belongs to a dedicated
    resolver, not a regex.
    """
    hrefs = F.regexp_extract_all(
        F.decode(F.col(html_col), "UTF-8"), F.lit(HREF_PATTERN), 1
    )
    out = pages.select(
        F.col(src_col).alias("src_url"), F.explode(hrefs).alias("dst_url")
    )
    if absolute_only:
        out = out.filter(
            F.col("dst_url").startswith("http://")
            | F.col("dst_url").startswith("https://")
        )
    return out


def extract_links_sql(
    pages_table: str, src_col: str = "url", html_col: str = "html",
    absolute_only: bool = True,
) -> str:
    """DuckDB replay: THE SAME pattern constant, group 1, same filter."""
    where = (
        "WHERE dst_url LIKE 'http://%' OR dst_url LIKE 'https://%'"
        if absolute_only
        else ""
    )
    # DuckDB standard string literals pass backslashes through verbatim
    # (no escape processing), so the \t\n\r\f sequences reach RE2 intact
    # — embed the pattern constant as-is (it contains no single quotes)
    pattern_sql = "'" + HREF_PATTERN + "'"
    return f"""
        SELECT {src_col} AS src_url, dst_url FROM (
            SELECT {src_col},
                   unnest(regexp_extract_all(
                       CAST({html_col} AS VARCHAR),
                       {pattern_sql}, 1)) AS dst_url
            FROM {pages_table}
        ) {where}
    """


# full anchor element: href value (group 1) + inner text (group 2).
# [^<]* inner text means anchors containing nested markup do not match —
# the deterministic subset both regex engines agree on (no backtracking-
# vs-RE2 divergence without alternation or nesting).
ANCHOR_PATTERN = r'<a[ \t\n\r\f][^>]*href="([^"]+)"[^>]*>([^<]*)</a>'

# explicit class, not \s — the dialect rule at the top of this module
_WS_RUN = r"[ \t\n\r\f]+"


def extract_anchors(
    pages: DataFrame,
    src_col: str = "url",
    html_col: str = "html",
    absolute_only: bool = True,
) -> DataFrame:
    """(src_url, dst_url, anchor) — href + normalized anchor text per link.

    Anchor text is the classic off-page relevance signal (what OTHER
    pages call this url); normalization is lower → collapse whitespace
    runs → trim, all pure Column. Both capture groups come from the SAME
    pattern, so the two ``regexp_extract_all`` arrays align index by
    index; they are materialized once behind a Generate barrier and
    zipped with a ``transform`` over their common index (zero shuffle,
    zero UDF).
    """
    txt = F.decode(F.col(html_col), "UTF-8")
    staged = pages.select(
        F.col(src_col).alias("src_url"),
        F.explode(
            F.array(
                F.struct(
                    F.regexp_extract_all(txt, F.lit(ANCHOR_PATTERN), 1).alias("hs"),
                    F.regexp_extract_all(txt, F.lit(ANCHOR_PATTERN), 2).alias("ts"),
                )
            )
        ).alias("z"),
    )
    pair = lambda i: F.struct(  # noqa: E731
        F.element_at("z.hs", i.cast("int")).alias("dst_url"),
        F.element_at("z.ts", i.cast("int")).alias("raw"),
    )
    pairs = staged.select(
        "src_url",
        F.explode(
            F.when(
                F.size("z.hs") >= 1,
                F.transform(F.sequence(F.lit(1), F.size("z.hs")), pair),
            ).otherwise(
                F.array().cast("array<struct<dst_url:string,raw:string>>")
            )
        ).alias("p"),
    )
    out = pairs.select(
        "src_url",
        F.col("p.dst_url").alias("dst_url"),
        F.trim(
            F.regexp_replace(F.lower(F.col("p.raw")), _WS_RUN, " ")
        ).alias("anchor"),
    )
    if absolute_only:
        out = out.filter(
            F.col("dst_url").startswith("http://")
            | F.col("dst_url").startswith("https://")
        )
    return out


def anchor_stats(
    pages: DataFrame,
    src_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(dst_url, anchor, n_links, n_sources) — aggregated anchor-text
    profile per link target: how often each phrase is used to link to
    the url, and from how many distinct pages.

    Scale: ONE exchange on (dst_url, anchor) with map-side partial
    aggregation; the count-distinct of sources rides the same shuffle
    (partial_count_distinct). Empty anchors (image links etc.) drop
    before the shuffle.
    """
    a = extract_anchors(pages, src_col, html_col).filter(F.col("anchor") != "")
    return a.groupBy("dst_url", "anchor").agg(
        F.count("*").alias("n_links"),
        F.count_distinct("src_url").alias("n_sources"),
    )


def anchor_stats_sql(
    pages_table: str, src_col: str = "url", html_col: str = "html"
) -> str:
    """DuckDB replay: same pattern constant/groups, same normalization
    (DuckDB regexp_replace needs the explicit 'g' flag — Spark's always
    replaces all occurrences)."""
    pat = "'" + ANCHOR_PATTERN + "'"
    ws = "'" + _WS_RUN + "'"
    return f"""
        WITH ax AS (
            SELECT {src_col} AS src_url,
                   regexp_extract_all(CAST({html_col} AS VARCHAR), {pat}, 1) AS hs,
                   regexp_extract_all(CAST({html_col} AS VARCHAR), {pat}, 2) AS ts
            FROM {pages_table}
        ), p AS (
            SELECT src_url, hs[CAST(i AS INT)] AS dst_url,
                   trim(regexp_replace(lower(ts[CAST(i AS INT)]), {ws}, ' ', 'g'))
                       AS anchor
            FROM (SELECT *, unnest(generate_series(1, len(hs))) AS i FROM ax)
        )
        SELECT dst_url, anchor,
               count(*) AS n_links,
               count(DISTINCT src_url) AS n_sources
        FROM p
        WHERE (dst_url LIKE 'http://%' OR dst_url LIKE 'https://%')
          AND anchor <> ''
        GROUP BY dst_url, anchor
    """
