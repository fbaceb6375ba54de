"""Neighborhood function (graph/neighborhood.py): exact vs a Python BFS
oracle, HyperBall parity on small (sparse-mode-exact) sets, and the
monotonicity/self-inclusion invariants."""

from __future__ import annotations

import pytest

from osm_spark.graph.neighborhood import hyperball, neighborhood_function

# chain 0→1→2→3, cycle 4→5→6→4, hub 0→4, isolated-source 7→0
EDGES = [(0, 1), (1, 2), (2, 3), (4, 5), (5, 6), (6, 4), (0, 4), (7, 0)]


def _bfs_counts(edges, max_hops):
    adj = {}
    verts = set()
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        verts.update((s, d))
    want = {}
    for u in verts:
        reach = {u}
        frontier = {u}
        for h in range(1, max_hops + 1):
            frontier = {d for s in frontier for d in adj.get(s, ())}
            reach |= frontier
            frontier = set(reach)  # BFS over the closed set is the same
            want[(u, h)] = len(reach)
    return want


def _run(spark, fn, max_hops):
    df = spark.createDataFrame(EDGES, "src int, dst int")
    out = fn(df, max_hops=max_hops)
    cols = out.columns
    val = "n_reachable" if "n_reachable" in cols else "est_reachable"
    return {(r.id, r.hops): r[val] for r in out.collect()}


@pytest.mark.parametrize("max_hops", [1, 3])
def test_exact_matches_bfs(spark, max_hops):
    got = _run(spark, neighborhood_function, max_hops)
    assert got == _bfs_counts(EDGES, max_hops)


def test_hyperball_parity_on_small_sets(spark):
    # DataSketches HLL stays exact (sparse mode) at these cardinalities,
    # so HyperBall must agree with the exact operator bit-for-bit here.
    exact = _run(spark, neighborhood_function, 3)
    approx = _run(spark, hyperball, 3)
    assert approx == exact


def test_monotone_and_self_included(spark):
    got = _run(spark, neighborhood_function, 2)
    ids = {i for i, _ in got}
    assert ids == {0, 1, 2, 3, 4, 5, 6, 7}
    for u in ids:
        assert got[(u, 1)] >= 1  # self at distance 0
        assert got[(u, 2)] >= got[(u, 1)]


def test_validation(spark):
    df = spark.createDataFrame(EDGES, "src int, dst int")
    with pytest.raises(ValueError):
        neighborhood_function(df, max_hops=0)
    with pytest.raises(ValueError):
        hyperball(df, max_hops=0)


def test_effective_diameter(spark):
    from osm_spark.graph.neighborhood import effective_diameter

    df = spark.createDataFrame(EDGES, "src int, dst int")
    counts = _bfs_counts(EDGES, 3)
    totals = {
        h: sum(v for (u, hh), v in counts.items() if hh == h)
        for h in (1, 2, 3)
    }
    row = effective_diameter(df, q=0.9, max_hops=3).collect()[0]
    want = min(h for h in (1, 2, 3) if totals[h] >= 0.9 * totals[3])
    assert (row.eff_diameter, row.pairs_at_h, row.pairs_at_max) == (
        want,
        totals[want],
        totals[3],
    )
    # q=1.0 always lands on the last hop's total
    row1 = effective_diameter(df, q=1.0, max_hops=3).collect()[0]
    assert row1.pairs_at_h == row1.pairs_at_max
    with pytest.raises(ValueError):
        effective_diameter(df, q=0.0)


def _harmonic_replay(edges, max_hops):
    counts = _bfs_counts(edges, max_hops)
    out = {}
    for (u, h), n in counts.items():
        prev = counts.get((u, h - 1), 1)
        out[u] = out.get(u, 0) + round((n - prev) * 1e6 / h)
    return out


def test_harmonic_exact_matches_replay(spark):
    from osm_spark.graph.neighborhood import harmonic_centrality

    df = spark.createDataFrame(EDGES, "src int, dst int")
    got = {r.id: r.harmonic_micro for r in harmonic_centrality(df, 3).collect()}
    assert got == _harmonic_replay(EDGES, 3)


def test_harmonic_hyperball_parity(spark):
    # HLL sparse mode is exact at these cardinalities, so the 100 TB
    # path must equal the audit path bit-for-bit here.
    from osm_spark.graph.neighborhood import harmonic_centrality

    df = spark.createDataFrame(EDGES, "src int, dst int")
    exact = {r.id: r.harmonic_micro for r in harmonic_centrality(df, 3).collect()}
    hb = {
        r.id: r.harmonic_micro
        for r in harmonic_centrality(df, 3, method="hyperball").collect()
    }
    assert hb == exact


def test_harmonic_rejects_bad_method(spark):
    from osm_spark.graph.neighborhood import harmonic_centrality

    df = spark.createDataFrame(EDGES, "src int, dst int")
    with pytest.raises(ValueError):
        harmonic_centrality(df, 3, method="nope")
