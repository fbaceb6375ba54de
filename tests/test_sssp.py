"""Bounded-hop SSSP (osm_spark/graph/sssp.py) vs python Bellman-Ford /
Dijkstra oracles."""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_spark.graph.sssp import shortest_paths

INF = float("inf")


def _bounded_bf(n, edges, sources, hops):
    adj: dict[int, list[tuple[int, int]]] = {}
    for u, v, w in edges:
        adj.setdefault(u, []).append((v, w))
    cur = {i: INF for i in range(n)}
    for s in sources:
        cur[s] = 0
    for _ in range(hops):
        new = dict(cur)
        for u, d in cur.items():
            if d == INF:
                continue
            for v, w in adj.get(u, []):
                if d + w < new[v]:
                    new[v] = d + w
        cur = new
    return {i: d for i, d in cur.items() if d < INF}


def _dijkstra(n, edges, sources):
    adj: dict[int, list[tuple[int, int]]] = {}
    for u, v, w in edges:
        adj.setdefault(u, []).append((v, w))
    dist = {i: INF for i in range(n)}
    pq = []
    for s in sources:
        dist[s] = 0
        heapq.heappush(pq, (0, s))
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist[u]:
            continue
        for v, w in adj.get(u, []):
            if d + w < dist[v]:
                dist[v] = d + w
                heapq.heappush(pq, (d + w, v))
    return {i: d for i, d in dist.items() if d < INF}


@pytest.fixture(scope="module")
def graph(spark):
    rng = np.random.default_rng(5)
    n = 150
    edges = []
    for _ in range(450):
        u, v = (int(x) for x in rng.integers(0, n, 2))
        if u != v:
            edges.append((u, v, int(rng.integers(1, 1000))))
    for i in range(n - 1):  # high-diameter chain exercises the hop bound
        edges.append((i, i + 1, 1))
    sources = [0, 77]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst", "w"]))
    s = spark.createDataFrame(pd.DataFrame({"id": sources}))
    return n, edges, sources, e, s


def test_bounded_hops_matches_bellman_ford(spark, graph):
    n, edges, sources, e, s = graph
    got = dict(
        shortest_paths(e, s, 5).toPandas()[["id", "dist"]].itertuples(index=False)
    )
    exp = _bounded_bf(n, edges, sources, 5)
    assert got == exp
    # the chain guarantees the bound is binding: not everything reached
    assert len(got) < n


def test_converged_matches_dijkstra(spark, graph):
    n, edges, sources, e, s = graph
    got = dict(
        shortest_paths(e, s, 400).toPandas()[["id", "dist"]].itertuples(index=False)
    )
    assert got == _dijkstra(n, edges, sources)


def test_zero_hops_returns_sources(spark, graph):
    _, _, sources, e, s = graph
    got = shortest_paths(e, s, 0).toPandas()
    assert sorted(got["id"]) == sorted(sources)
    assert (got["dist"] == 0).all()


def test_negative_weight_rejected(spark, graph):
    _, _, _, e, s = graph
    bad = e.withColumn("w", F.col("w") - 10_000)
    with pytest.raises(ValueError):
        shortest_paths(bad, s, 3)
    with pytest.raises(ValueError):
        shortest_paths(e, s, -1)


def test_reachability_zones_band_shortest_paths(spark, graph):
    from osm_spark.graph.sssp import reachability_zones, shortest_paths

    n, edges, sources, e, s = graph
    band_mm = 40
    sp = {r.id: r.dist for r in shortest_paths(e, s, 6).collect()}
    want: dict[int, list[int]] = {}
    for d in sp.values():
        want.setdefault(d // band_mm, []).append(d)
    got = {
        r.band: (r.n_vertices, r.min_mm, r.max_mm)
        for r in reachability_zones(e, s, 6, band_mm).collect()
    }
    assert got == {
        b: (len(ds), min(ds), max(ds)) for b, ds in want.items()
    }
    assert len(got) > 1  # the fixture must span multiple bands
    with pytest.raises(ValueError):
        reachability_zones(e, s, 6, 0)
