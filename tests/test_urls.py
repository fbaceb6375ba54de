"""URL canonicalization vs a pure-Python oracle (urllib-free, same rules)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from osm_spark.functions.urls import canonical_url, url_domain, url_host

CASES = [
    # (input, canon, host, domain)
    (
        "HTTP://Example.COM:80/p/1?utm_source=feed&id=1#top",
        "http://example.com/p/1?id=1",
        "example.com",
        "example.com",
    ),
    (
        "https://news.example.org/a/2?id=2&utm_campaign=x&ref=kept",
        "https://news.example.org/a/2?id=2&ref=kept",
        "news.example.org",
        "example.org",
    ),
    (
        "HTTPS://CDN.Example.net:443/i/3.jpg#frag",
        "https://cdn.example.net/i/3.jpg",
        "cdn.example.net",
        "example.net",
    ),
    # trailing bare '?' dropped
    ("http://example.com/p/4?", "http://example.com/p/4", "example.com", "example.com"),
    # tracking-only query collapses entirely
    (
        "http://a.b.example.com/x?fbclid=abc&gclid=def",
        "http://a.b.example.com/x",
        "a.b.example.com",
        "example.com",
    ),
    # non-default port kept; path case preserved
    (
        "http://Example.com:8080/CaseKept?Q=V",
        "http://example.com:8080/CaseKept?Q=V",
        "example.com",
        "example.com",
    ),
    # https on port 80: NOT a default port, kept
    ("https://example.com:80/x", "https://example.com:80/x", "example.com", "example.com"),
    # no path at all
    ("HTTP://HOST.example.com:80#f", "http://host.example.com", "host.example.com", "example.com"),
    # opaque non-URL: trimmed, untouched
    ("  not a url 7  ", "not a url 7", "", ""),
    # single-label host: domain extraction finds no dot pair
    ("http://localhost:80/x", "http://localhost/x", "localhost", ""),
    # empty query params filtered
    ("http://e.com/p?&&id=9&", "http://e.com/p?id=9", "e.com", "e.com"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(u,) for u, *_ in CASES], "url string")
    got = (
        df.select(
            "url",
            canonical_url("url").alias("c"),
            url_host("url").alias("h"),
            url_domain("url").alias("d"),
        )
        .collect()
    )
    by_url = {r.url: (r.c, r.h, r.d) for r in got}
    for u, c, h, d in CASES:
        assert by_url[u] == (c, h, d), u


def test_canonical_url_idempotent(spark):
    """canon(canon(u)) == canon(u) — required for repeated-ingest dedup."""
    df = spark.createDataFrame([(u,) for u, *_ in CASES], "url string")
    once = df.select(canonical_url("url").alias("c"))
    twice = once.select(F.col("c").alias("url")).select(
        canonical_url("url").alias("c2"), F.col("url").alias("c")
    )
    for r in twice.collect():
        assert r.c2 == r.c


def test_canonical_url_null_safe(spark):
    df = spark.createDataFrame([(None,), ("",)], "url string")
    rows = df.select(canonical_url("url").alias("c")).collect()
    assert rows[0].c is None
    assert rows[1].c == ""


# ----------------------------------------------------------- path rollup


def test_url_path_extraction(spark):
    import pandas as pd

    from osm_spark.functions.urls import url_path

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [
                    "http://a.com/x/Y/z?q=1#f",  # case preserved, query cut
                    "https://a.com",              # no path at all
                    "http://a.com/?q=1",          # bare slash
                    "not a url",                  # no scheme -> ''
                ]
            }
        )
    )
    got = [r[0] for r in df.select(url_path("url")).collect()]
    assert got == ["/x/Y/z", "", "/", ""]


def test_path_rollup_counts_and_depth_cap(spark):
    import pandas as pd

    from osm_spark.functions.urls import path_rollup

    urls = [
        "http://a.com/wiki/Cat",
        "http://a.com/wiki/Dog?ref=1",
        "http://a.com/news",
        "http://a.com/w/x/y/z",  # depth 4 caps at 3
        "http://a.com",          # no path -> '/' at depth 0
        "http://b.org/wiki/Cat",  # other host: separate tree
    ]
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    got = {
        (r.host, r.prefix, r.depth): r.n_pages
        for r in path_rollup(df, max_depth=3).collect()
    }
    assert got[("a.com", "/wiki", 1)] == 2
    assert got[("a.com", "/wiki/Cat", 2)] == 1
    assert got[("a.com", "/w/x/y", 3)] == 1  # capped, no depth-4 rows
    assert got[("a.com", "/", 0)] == 1
    assert got[("b.org", "/wiki", 1)] == 1
    assert not any(d > 3 for (_, _, d) in got)


def test_path_rollup_validates_depth(spark):
    import pandas as pd
    import pytest as _pytest

    from osm_spark.functions.urls import path_rollup

    df = spark.createDataFrame(pd.DataFrame({"url": ["http://a.com/x"]}))
    with _pytest.raises(ValueError):
        path_rollup(df, max_depth=0)
