"""Landmark stress centrality (graph/stress.py): hand diamond with
known path counts, random weighted digraph vs a walk-enumeration
ground truth, endpoint/pair exclusions, and the guards."""

from __future__ import annotations

import numpy as np
import pytest

from osm_spark.graph.stress import landmark_stress


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long, w long")


def _truth(edges, landmarks, H):
    adj, radj = {}, {}
    for a, b, w in edges:
        adj.setdefault(a, []).append((b, w))
        radj.setdefault(b, []).append((a, w))
    VS = sorted({x for e in edges for x in e[:2]})

    def walk_stats(s, nbrs):
        walks = {v: [] for v in VS}

        def rec(v, d, h):
            walks[v].append(d)
            if h == H:
                return
            for w2, wt in nbrs.get(v, []):
                rec(w2, d + wt, h + 1)

        rec(s, 0, 0)
        out = {}
        for v in VS:
            if walks[v]:
                mn = min(walks[v])
                out[v] = (mn, sum(1 for x in walks[v] if x == mn))
        return out

    Fw = {s: walk_stats(s, adj) for s in landmarks}
    Bw = {t: walk_stats(t, radj) for t in landmarks}
    exp = {}
    for v in VS:
        st = 0
        for s in landmarks:
            for t in landmarks:
                if s == t or v in (s, t) or t not in Fw[s]:
                    continue
                D = Fw[s][t][0]
                fv, bv = Fw[s].get(v), Bw[t].get(v)
                if fv and bv and fv[0] + bv[0] == D:
                    st += fv[1] * bv[1]
        exp[v] = st
    return exp


def test_diamond_path_counts(spark):
    # two equal-weight 1→4 routes through 2 and 3: σ(1,4)=2, each of
    # 2/3 carries one path per direction of the (1,4)+(4,1) pair sum
    base = [(1, 2, 5), (2, 4, 5), (1, 3, 5), (3, 4, 5)]
    edges = base + [(b, a, w) for a, b, w in base]
    got = {r.id: r.stress
           for r in landmark_stress(_df(spark, edges), [1, 4], 8).collect()}
    assert got == {1: 0, 2: 2, 3: 2, 4: 0}


def test_random_digraph_matches_walk_truth(spark):
    rng = np.random.RandomState(7)
    edges = set()
    while len(edges) < 40:
        a, b = rng.randint(0, 14, 2)
        if a != b:
            edges.add((int(a), int(b)))
    edges = sorted((a, b, int(rng.randint(1, 5))) for a, b in edges)
    H = 5
    lms = [0, 5, 9]
    exp = _truth(edges, lms, H)
    got = {r.id: r.stress
           for r in landmark_stress(_df(spark, edges), lms, H).collect()}
    assert got == exp
    assert any(v > 0 for v in exp.values())  # nontrivial fixture


def test_endpoints_excluded(spark):
    # chain 1→2→3: only 2 carries stress for the (1,3) pair
    edges = [(1, 2, 1), (2, 3, 1)]
    got = {r.id: r.stress
           for r in landmark_stress(_df(spark, edges), [1, 3], 4).collect()}
    assert got == {1: 0, 2: 1, 3: 0}


def test_unreachable_landmarks_raise(spark):
    edges = [(1, 2, 1), (5, 6, 1)]  # two disconnected pieces
    with pytest.raises(ValueError, match="mutually reachable"):
        landmark_stress(_df(spark, edges), [1, 5], 4)


def test_too_few_landmarks_raise(spark):
    with pytest.raises(ValueError, match="at least 2"):
        landmark_stress(_df(spark, [(1, 2, 1)]), [1], 4)
