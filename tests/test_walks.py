"""Deterministic hash-random walks (osm_spark/graph/walks.py)."""

from __future__ import annotations

import hashlib

import pytest

from osm_spark.graph.walks import random_walks

# 0→{1,2}, 1→{2}, 2→{0,3}, 3 is a sink; 4→4 self loop
EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (4, 4)]


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _replay(edges, walk_len, walks_per_node):
    adj: dict[int, list[int]] = {}
    verts = set()
    for s, d in edges:
        adj.setdefault(s, []).append(d)
        verts.update((s, d))
    rows = set()
    for v in sorted(verts):
        for w in range(walks_per_node):
            node = v
            rows.add((v, w, 0, node))
            for step in range(1, walk_len + 1):
                nbrs = adj.get(node)
                if not nbrs:
                    break
                node = min(nbrs, key=lambda d: (_md5(f"{v}:{w}:{step}:{d}"), d))
                rows.add((v, w, step, node))
    return rows


def _run(spark, walk_len=3, walks_per_node=2):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    return {
        (r.start_id, r.walk_no, r.step, r.node)
        for r in random_walks(df, walk_len, walks_per_node).collect()
    }


def test_walks_match_python_replay(spark):
    assert _run(spark) == _replay(EDGES, 3, 2)


def test_walks_terminate_at_sinks(spark):
    got = _run(spark, walk_len=4, walks_per_node=1)
    # vertex 3 is a sink: only its step-0 row exists for walks that
    # start there; walks that REACH 3 stop there
    assert (3, 0, 0, 3) in got
    assert not any(s == 3 and step >= 1 for (s, w, step, n) in got)


def test_walks_are_deterministic_across_runs(spark):
    assert _run(spark) == _run(spark)


def test_walks_validation(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        random_walks(df, walk_len=0)
    with pytest.raises(ValueError):
        random_walks(df, walks_per_node=0)
