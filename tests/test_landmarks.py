"""Multi-source landmark distances (graph/landmarks.py)."""

from __future__ import annotations

import pytest

from osm_spark.graph.landmarks import landmark_distances
from osm_spark.graph.sssp import shortest_paths

# small weighted digraph with a cycle, a dead end and an unreachable node
EDGES = [
    (1, 2, 10), (2, 3, 5), (3, 1, 1), (2, 4, 2), (4, 5, 7),
    (5, 4, 7), (3, 6, 100), (7, 1, 3),  # 7 reaches in, nothing reaches 7
]
LMS = [1, 4, 7]
HOPS = 6


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(EDGES, "src long, dst long, w long")


def test_equals_k_independent_sssp(spark, edges):
    got = {
        (r.id, r.landmark): r.dist_mm
        for r in landmark_distances(edges, LMS, HOPS).collect()
    }
    exp = {}
    for lm in LMS:
        srcs = spark.createDataFrame([(lm,)], "id long")
        for r in shortest_paths(edges, srcs, HOPS).collect():
            exp[(r.id, lm)] = r.dist
    assert got == exp
    assert got[(7, 7)] == 0 and (7, 1) not in got  # 7 unreachable from 1


def test_hop_bound_zero(spark, edges):
    got = {
        (r.id, r.landmark): r.dist_mm
        for r in landmark_distances(edges, LMS, 0).collect()
    }
    assert got == {(lm, lm): 0 for lm in LMS}


def test_validation(spark, edges):
    with pytest.raises(ValueError):
        landmark_distances(edges, [], HOPS)
    with pytest.raises(ValueError):
        landmark_distances(edges, [1, 1], HOPS)
    with pytest.raises(ValueError):
        landmark_distances(edges, LMS, -1)
    neg = spark.createDataFrame([(1, 2, -4)], "src long, dst long, w long")
    with pytest.raises(ValueError):
        landmark_distances(neg, [1], 2)
