"""Crawl frontier (osm_spark/pipeline/frontier.py): politeness, order,
budget and determinism properties."""

from __future__ import annotations

import pandas as pd
import pytest

from osm_spark.pipeline.frontier import frontier_assign

URLS = [
    ("http://a.com/3", 1),
    ("http://a.com/1", 5),
    ("http://a.com/2", 5),
    ("https://b.org:8080/x", 2),
    ("https://b.org/y", 9),
    ("http://c.net/only", 0),
]


@pytest.fixture(scope="module")
def urls(spark):
    return spark.createDataFrame(
        pd.DataFrame(URLS, columns=["url", "priority"])
    )


def test_frontier_one_worker_per_host(spark, urls):
    got = frontier_assign(urls, n_workers=4, priority_col="priority").toPandas()
    assert got.groupby("host").worker.nunique().eq(1).all()
    # port stripped, scheme-insensitive host
    assert set(got.host) == {"a.com", "b.org", "c.net"}


def test_frontier_order_priority_then_url(spark, urls):
    got = frontier_assign(urls, n_workers=4, priority_col="priority").toPandas()
    a = got[got.host == "a.com"].sort_values("fetch_seq")
    # priority 5 urls first (tie on priority -> url asc), then priority 1
    assert list(a.url) == [
        "http://a.com/1", "http://a.com/2", "http://a.com/3",
    ]
    b = got[got.host == "b.org"].sort_values("fetch_seq")
    assert list(b.url) == ["https://b.org/y", "https://b.org:8080/x"]


def test_frontier_budget_cut_and_validation(spark, urls):
    got = frontier_assign(
        urls, n_workers=4, max_per_host=1, priority_col="priority"
    ).toPandas()
    assert len(got) == 3 and (got.fetch_seq == 1).all()
    with pytest.raises(ValueError):
        frontier_assign(urls, n_workers=0)
    with pytest.raises(ValueError):
        frontier_assign(urls, n_workers=4, max_per_host=0)


def test_frontier_assignment_stable_across_worker_counts_modulo(spark, urls):
    # the digest is of the HOST alone: the same host maps to the same
    # worker on every run, and changing n_workers only re-mods it
    g8 = frontier_assign(urls, n_workers=8).toPandas()
    g8b = frontier_assign(urls, n_workers=8).toPandas()
    assert g8.set_index("url").worker.to_dict() == (
        g8b.set_index("url").worker.to_dict()
    )
    g1 = frontier_assign(urls, n_workers=1).toPandas()
    assert (g1.worker == 0).all()
