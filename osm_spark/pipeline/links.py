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
