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


def test_extract_anchors_normalizes_and_aligns(spark):
    from osm_spark.pipeline.links import anchor_stats, extract_anchors

    pages = _pages(spark, [
        ("a", '<a href="https://x.com/1">First  LINK</a>'
              '<a href="/rel">skip</a>'
              '<a class="c" href="https://x.com/2"> Second\tlink </a>'),
        ("b", '<a href="https://x.com/1">first link</a><a href="https://x.com/3"></a>'),
        ("c", "no anchors here"),
    ])
    got = {(r.src_url, r.dst_url, r.anchor) for r in extract_anchors(pages).collect()}
    assert got == {
        ("a", "https://x.com/1", "first link"),
        ("a", "https://x.com/2", "second link"),
        ("b", "https://x.com/1", "first link"),
        ("b", "https://x.com/3", ""),
    }
    stats = {(r.dst_url, r.anchor): (r.n_links, r.n_sources)
             for r in anchor_stats(pages).collect()}
    # empty anchor dropped; shared phrase counted across two sources
    assert stats == {
        ("https://x.com/1", "first link"): (2, 2),
        ("https://x.com/2", "second link"): (1, 1),
    }


def test_anchor_stats_matches_duckdb(spark):
    import duckdb
    import pandas as pd

    from osm_spark.pipeline.links import anchor_stats, anchor_stats_sql

    rows = [
        (f"https://s{i}.com/",
         f'<a href="https://t{i % 3}.com/">Topic  {i % 4}</a>'
         + ('<a href="/r">Rel</a>' if i % 2 == 0 else ""))
        for i in range(20)
    ]
    pages = _pages(spark, rows)
    got = anchor_stats(pages).toPandas()
    con = duckdb.connect()
    con.register("pg", pd.DataFrame(
        [(u, h) for u, h in rows], columns=["url", "html"]))
    want = con.sql(anchor_stats_sql("pg")).df()
    key = ["dst_url", "anchor", "n_links", "n_sources"]
    a = got[key].sort_values(key).reset_index(drop=True)
    b = want[key].sort_values(key).reset_index(drop=True)
    assert len(a) > 0 and a.astype(str).equals(b.astype(str))
