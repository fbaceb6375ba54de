"""Tests for hyperlink extraction and the pages→graph composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_spark.pipeline.links import extract_links


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode()) for u, h in rows], "url string, html binary"
    )


def test_extract_links_truth_table(spark):
    pages = _pages(
        spark,
        [
            ("p1", '<a href="https://a.com/x">one</a><a id="k" href="http://b.com">two</a>'),
            ("p2", '<a href="/relative">rel</a>'),        # filtered (relative)
            ("p3", "<p>no anchors at all</p>"),           # no rows
            ("p4", '<a href="https://c.com">c</a> body <a href="https://c.com">dup</a>'),
        ],
    )
    out = [(r.src_url, r.dst_url) for r in extract_links(pages).collect()]
    assert sorted(out) == [
        ("p1", "http://b.com"),
        ("p1", "https://a.com/x"),
        ("p4", "https://c.com"),
        ("p4", "https://c.com"),  # duplicates preserved (edge weight info)
    ]


def test_extract_links_keep_relative(spark):
    pages = _pages(spark, [("p", '<a href="/r">r</a><a href="https://x.com">x</a>')])
    out = {r.dst_url for r in extract_links(pages, absolute_only=False).collect()}
    assert out == {"/r", "https://x.com"}


def test_links_to_pagerank_integration(spark):
    """pages → extract_links → canonical_url → pagerank end to end:
    the hub page every other page links to must rank highest."""
    from osm_spark.functions.urls import canonical_url
    from osm_spark.graph.pagerank import pagerank

    hub = "https://hub.com/"
    rows = [(f"https://p{i}.com/", f'<a href="{hub.upper()[:8].lower() + hub[8:]}">h</a>')
            for i in range(6)]
    # hub fans back out to every page: its mass splits 6 ways while it
    # keeps receiving 6 whole contributions (no 2-cycle oscillation)
    back = "".join(f'<a href="https://p{i}.com/">b</a>' for i in range(6))
    rows.append((hub, back))
    pages = _pages(spark, rows)
    edges = extract_links(pages).select(
        canonical_url(F.col("src_url")).alias("src"),
        canonical_url(F.col("dst_url")).alias("dst"),
    )
    ranks = pagerank(edges, n_iter=4)
    top = ranks.orderBy(F.desc("rank_scaled")).first()
    # expected canonical hub form, resolved through the same function:
    # the scheme-uppercased variants all collapse onto it
    expected = edges.filter(F.col("dst").contains("hub")).first().dst
    assert top["id"] == expected
