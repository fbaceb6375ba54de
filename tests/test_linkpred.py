"""Link prediction + degree assortativity (osm_spark/graph/linkpred.py):
hand-checked goldens, a brute-force property replay, the hub cap, and
the degenerate-variance guard."""

from __future__ import annotations

import math
from itertools import combinations

from pyspark.sql import functions as F

from osm_spark.graph.linkpred import degree_assortativity, link_prediction

RA = 1_000_000_000
JAC = 1_000_000


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _brute(pairs, min_common=1, hub_cap=None):
    """Dict (u, v) -> row, replayed with python ints (exact)."""
    edges = set()
    for a, b in pairs:
        if a != b:
            edges.add((min(a, b), max(a, b)))
    nbrs: dict[int, set[int]] = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    deg = {z: len(ns) for z, ns in nbrs.items()}
    out = {}
    for u, v in combinations(sorted(nbrs), 2):
        if (u, v) in edges:
            continue
        shared = nbrs[u] & nbrs[v]
        if hub_cap is not None:
            shared = {z for z in shared if deg[z] <= hub_cap}
        if len(shared) < min_common or not shared:
            continue
        union = deg[u] + deg[v] - len(shared)
        out[(u, v)] = (
            len(shared),
            deg[u],
            deg[v],
            (JAC * len(shared)) // union,
            sum(RA // deg[z] for z in shared),
            # HALF_UP like Spark's round (python round is banker's)
            sum(
                math.floor(1_000_000 / math.log(deg[z]) + 0.5)
                for z in shared
                if deg[z] >= 2
            ),
        )
    return out


def _collect(df):
    return {
        (r.u, r.v): (
            r.common, r.deg_u, r.deg_v, r.jaccard_ppm, r.ra_nano, r.aa_micro
        )
        for r in df.collect()
    }


def test_link_prediction_golden(spark):
    # path + square: 1-2, 1-3, 2-3, 2-4, 3-4, 4-5 (directed noise + dupes)
    pairs = [(1, 2), (3, 1), (2, 3), (2, 4), (4, 3), (4, 5), (2, 1), (1, 1)]
    got = _collect(link_prediction(_edges_df(spark, pairs)))
    # non-adjacent pairs: (1,4) share {2,3}; (1,5) share {}; (2,5),(3,5)
    # share {4}
    assert got == _brute(pairs)
    assert got[(1, 4)][0] == 2  # common neighbours 2 and 3
    assert got[(2, 5)][0] == 1 and got[(3, 5)][0] == 1
    # ra for (1,4): deg(2)=3, deg(3)=3 -> 2 * (1e9 div 3)
    assert got[(1, 4)][4] == 2 * (RA // 3)


def test_link_prediction_brute_force_replay(spark):
    # deterministic affine multigraph over 40 vertices
    n = 40
    pairs = [(i, (i * 7 + 1) % n) for i in range(n)]
    pairs += [(i, (i * 13 + 5) % n) for i in range(n)]
    pairs += [(i, (i * 3 + 2) % n) for i in range(n)]
    for mc in (1, 2):
        got = _collect(link_prediction(_edges_df(spark, pairs), min_common=mc))
        assert got == _brute(pairs, min_common=mc)


def test_link_prediction_hub_cap(spark):
    # star center 0 of degree 6 + a separate triangle-ish tail
    pairs = [(0, i) for i in range(1, 7)] + [(1, 2), (7, 8), (8, 9), (7, 9)]
    capped = _collect(link_prediction(_edges_df(spark, pairs), hub_cap=4))
    assert capped == _brute(pairs, hub_cap=4)
    # leaf pairs (3,4) share only the capped hub -> absent when capped
    assert (3, 4) not in capped
    full = _collect(link_prediction(_edges_df(spark, pairs)))
    assert (3, 4) in full and full[(3, 4)][0] == 1


def test_degree_assortativity_matches_pearson(spark):
    # gcd(6, 30) > 1 makes the second map non-bijective, so degrees vary
    pairs = [(i, (i * 7 + 1) % 30) for i in range(30)]
    pairs += [(i, (i * 6 + 3) % 30) for i in range(30)]
    row = degree_assortativity(_edges_df(spark, pairs)).collect()[0]
    # python replay over the doubled edge list
    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    deg: dict[int, int] = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    xs, ys = [], []
    for u, v in edges:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    n = float(len(xs))
    sx, sxy = float(sum(xs)), float(sum(x * y for x, y in zip(xs, ys)))
    sxx = float(sum(x * x for x in xs))
    r = (n * sxy - sx * sx) / (n * sxx - sx * sx)
    assert row.m == len(edges)
    assert row.r_nano == math.floor(1e9 * r)


def test_degree_assortativity_degenerate_null(spark):
    # 3-cycle: every degree 2 -> zero variance -> NULL, not a crash
    row = degree_assortativity(
        _edges_df(spark, [(1, 2), (2, 3), (3, 1)])
    ).collect()[0]
    assert row.m == 3 and row.r_nano is None


def test_link_prediction_plan_no_cartesian(spark):
    pairs = [(i, (i * 7 + 1) % 20) for i in range(20)]
    plan = link_prediction(_edges_df(spark, pairs))._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
