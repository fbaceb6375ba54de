"""rich_club vs a networkx-free python replay."""

from __future__ import annotations

import math

import pytest

from osm_spark.graph.richclub import rich_club

KS = [0, 1, 2, 3, 10]


def _replay(edges: list[tuple[int, int]]):
    es = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    deg: dict[int, int] = {}
    for u, v in es:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    out = {}
    for k in KS:
        rich = {n for n, d in deg.items() if d > k}
        ek = sum(1 for u, v in es if u in rich and v in rich)
        nk = len(rich)
        phi = (
            int(math.floor(2e6 * ek / (nk * (nk - 1)) + 0.5)) if nk >= 2 else None
        )
        out[k] = (nk, ek, phi)
    return out


@pytest.fixture(scope="module")
def edges():
    # a 4-clique core (degrees >= 3) + pendant leaves + a duplicate and
    # a self-loop to exercise canonicalization
    core = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    leaves = [(1, 10), (2, 11), (3, 12), (12, 3), (5, 5)]
    return core + leaves


def test_rich_club_matches_replay(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.k: (r.n_k, r.e_k, r.phi_micro) for r in rich_club(df, KS).collect()}
    assert got == _replay(edges)
    # the clique core is a perfect rich club at k=2 (deg > 2 keeps
    # exactly the four clique members; their induced edges are the 6
    # clique edges)
    assert got[2] == (4, 6, 1_000_000)
    # an impossible threshold yields the empty club
    assert got[10] == (0, 0, None)


def test_rich_club_validation(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(ValueError):
        rich_club(df, [])
