"""Triangle counting: brute force, known graphs, canonicalization, plans."""

from __future__ import annotations

from itertools import combinations

import numpy as np
from pyspark.sql import functions as F

from osm_spark.graph.triangles import (
    CC_SCALE,
    canonical_edges,
    triangle_counts,
    triangles,
)


def _brute(edge_list):
    """Per-vertex (deg, n_tri, cc_micro) from an undirected edge set."""
    adj = {}
    for a, b in edge_list:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for v, nbrs in adj.items():
        tri = sum(1 for a, b in combinations(sorted(nbrs), 2) if b in adj.get(a, ()))
        deg = len(nbrs)
        cc = int(np.floor(2.0 * CC_SCALE * tri / float(deg * (deg - 1)))) if deg >= 2 else 0
        out[v] = (deg, tri, cc)
    return out


def _run(spark, edge_list):
    df = spark.createDataFrame(edge_list, "src long, dst long")
    return {r.id: (r.deg, r.n_tri, r.cc_micro) for r in triangle_counts(df).collect()}


def test_k4_every_vertex_closed():
    # brute-force sanity on the brute force itself
    k4 = list(combinations(range(4), 2))
    assert _brute(k4) == {v: (3, 3, CC_SCALE) for v in range(4)}


def test_triangle_counts_known_graphs(spark):
    k4 = list(combinations(range(4), 2))
    assert _run(spark, k4) == _brute(k4)
    path = [(i, i + 1) for i in range(6)]
    got = _run(spark, path)
    assert got == _brute(path)
    assert all(t == 0 for _, t, _ in got.values())
    # triangle with a pendant: the pendant's neighbor has cc = 1/3
    tri_pend = [(0, 1), (1, 2), (0, 2), (2, 3)]
    got = _run(spark, tri_pend)
    assert got[0] == (2, 1, CC_SCALE)
    assert got[2] == (3, 1, CC_SCALE // 3)
    assert got[3] == (1, 0, 0)


def test_triangle_counts_random_vs_brute(spark):
    rng = np.random.RandomState(7)
    edges = list({(int(a), int(b)) for a, b in rng.randint(0, 40, size=(300, 2))})
    assert _run(spark, edges) == _brute(edges)


def test_canonicalization_direction_dups_self_loops(spark):
    # directed both ways + duplicates + self-loops must not change counts
    base = [(0, 1), (1, 2), (0, 2)]
    messy = base + [(b, a) for a, b in base] + base + [(1, 1), (2, 2)]
    assert _run(spark, messy) == _run(spark, base) == _brute(base)
    e = canonical_edges(spark.createDataFrame(messy, "src long, dst long"))
    assert e.count() == 3


def test_each_triangle_generated_once(spark):
    k5 = list(combinations(range(5), 2))
    df = spark.createDataFrame(k5, "src long, dst long")
    rows = triangles(df).collect()
    assert len(rows) == 10  # C(5,3)
    assert len({tuple(sorted((r.x, r.y, r.z))) for r in rows}) == 10


def test_hub_skew_matches_brute(spark):
    # star + rim: the hub's rank is highest, so it fans out no wedges
    hub = [(0, i) for i in range(1, 30)] + [(i, i + 1) for i in range(1, 29)]
    got = _run(spark, hub)
    assert got == _brute(hub)
    assert got[0][1] == 28  # hub closes every rim edge


def test_triangle_plan_shape(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2), (0, 2)], "src long, dst long")
    plan = triangle_counts(edges)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan
