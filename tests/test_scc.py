"""Strongly connected components (graph/scc.py): hand condensation
case, random-graph parity against a reachability-closure ground truth,
directedness (vs undirected CC), tolerance edges, and guards."""

from __future__ import annotations

import numpy as np
import pytest

from osm_spark.graph.scc import strongly_connected_components


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = strongly_connected_components(df, **kw)
    return sorted((r.id, r.scc) for r in out.collect())


def _truth(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)

    def reach(s):
        seen, st = {s}, [s]
        while st:
            u = st.pop()
            for w in adj.get(u, []):
                if w not in seen:
                    seen.add(w)
                    st.append(w)
        return seen

    vs = sorted({x for e in edges for x in e})
    R = {v: reach(v) for v in vs}
    return sorted(
        (v, min([v] + [w for w in R[v] if v in R[w]])) for v in vs
    )


def test_hand_condensation_chain(spark):
    # cycle {1,2,3} → singleton 4 → cycle {5,6}; disjoint edge 7→8
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 5), (7, 8)]
    assert _run(spark, edges) == [
        (1, 1), (2, 1), (3, 1), (4, 4),
        (5, 5), (6, 5), (7, 7), (8, 8),
    ]


def test_direction_matters(spark):
    # a→b and b→a are one SCC; a→b alone is two — undirected CC
    # cannot tell these apart
    assert _run(spark, [(1, 2), (2, 1)]) == [(1, 1), (2, 1)]
    assert _run(spark, [(1, 2)]) == [(1, 1), (2, 2)]


def test_self_loops_and_duplicates_tolerated(spark):
    edges = [(1, 1), (1, 2), (1, 2), (2, 1)]
    assert _run(spark, edges) == [(1, 1), (2, 1)]


def test_random_graph_matches_closure_truth(spark):
    rng = np.random.RandomState(3)
    edges = set()
    while len(edges) < 90:
        a, b = rng.randint(0, 40, 2)
        if a != b:
            edges.add((int(a), int(b)))
    edges = sorted(edges)
    got = _run(spark, edges, max_rounds=40)
    assert got == _truth(edges)
    n_sccs = len({s for _, s in got})
    assert 1 < n_sccs < len(got)  # nontrivial structure


def test_long_cycle_single_scc(spark):
    # one directed 32-cycle: a single SCC. The forward color phase
    # closes in O(log n) rounds (shortcut compression), but the
    # backward phase is the adversarial single-wavefront case and
    # needs ~n rounds — the documented O(diameter) worst case, inside
    # the default max_prop guard
    n = 32
    edges = [(i, (i + 1) % n) for i in range(n)]
    got = _run(spark, edges)
    assert got == [(i, 0) for i in range(n)]


def test_max_rounds_guard(spark):
    # chain of 3 singleton SCCs needs 3 outer rounds — guard of 1 raises
    with pytest.raises(RuntimeError, match="max_rounds"):
        _run(spark, [(1, 2), (2, 3)], max_rounds=1)


# --- bowtie decomposition (bowtie_classes) -----------------------------

def test_bowtie_hand_case(spark):
    from osm_spark.graph.scc import bowtie_classes

    # IN: 0, 5 → core {1,2,3} → OUT: 4; tube 0→8→4 and the disjoint
    # pair 6→7 are 'other'
    edges = [(0, 1), (1, 2), (2, 3), (3, 1), (3, 4),
             (5, 0), (6, 7), (0, 8), (8, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = sorted((r.id, r.scc, r.cls) for r in bowtie_classes(df).collect())
    assert got == [
        (0, 0, "in"), (1, 1, "core"), (2, 1, "core"), (3, 1, "core"),
        (4, 4, "out"), (5, 5, "in"), (6, 6, "other"), (7, 7, "other"),
        (8, 8, "other"),
    ]


def test_bowtie_core_tie_breaks_to_min_scc(spark):
    from osm_spark.graph.scc import bowtie_classes

    # two 2-cycles of equal size: {1,2} and {5,6} — core must be scc 1
    edges = [(1, 2), (2, 1), (5, 6), (6, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.cls for r in bowtie_classes(df).collect()}
    assert got == {1: "core", 2: "core", 5: "other", 6: "other"}


def test_bowtie_in_out_disjoint(spark):
    from osm_spark.graph.scc import bowtie_classes

    # a vertex both reaching and reachable from the core would BE core:
    # 0 → core{1,2} → 3 → 0 makes {0,1,2,3} one SCC, all core
    edges = [(0, 1), (1, 2), (2, 1), (2, 3), (3, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.cls for r in bowtie_classes(df).collect()}
    assert set(got.values()) == {"core"}


# --- condensation levels ------------------------------------------------

def test_condensation_levels_hand_case(spark):
    from osm_spark.graph.scc import condensation_levels

    # {1,2,3} at level 0 → 4 at 1 → {5,6} at 2; separate chain 7 → 8
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 5), (7, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = sorted(tuple(r) for r in condensation_levels(df).collect())
    assert got == [(1, 0, 3), (4, 1, 1), (5, 2, 2), (7, 0, 1), (8, 1, 1)]


def test_condensation_longest_path_not_shortest(spark):
    from osm_spark.graph.scc import condensation_levels

    # diamond with a long arm: 1→2→3→4 and 1→4 — level(4) must be 3
    edges = [(1, 2), (2, 3), (3, 4), (1, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.scc: r.level for r in condensation_levels(df).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_string_keyed_scc(spark):
    # the coloring machinery is pure min/least — string ids work and
    # min = lexicographic
    edges = [("b.com", "a.com"), ("a.com", "b.com"), ("b.com", "c.com")]
    df = spark.createDataFrame(edges, "src string, dst string")
    from osm_spark.graph.scc import strongly_connected_components

    got = sorted((r.id, r.scc)
                 for r in strongly_connected_components(df).collect())
    assert got == [("a.com", "a.com"), ("b.com", "a.com"),
                   ("c.com", "c.com")]
