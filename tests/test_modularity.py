"""Modularity (osm_spark/graph/modularity.py): textbook values, the
python replay, and the LPA acceptance pairing."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from osm_spark.graph.modularity import Q_SCALE, modularity


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _labels(spark, d):
    return spark.createDataFrame(
        [(int(k), int(v)) for k, v in d.items()], "id long, label long"
    )


def _py_q(pairs, lab):
    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    m = len(edges)
    deg: dict[int, int] = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    m_intra = sum(1 for u, v in edges if lab[u] == lab[v])
    dc: dict[int, int] = {}
    for n, d in deg.items():
        dc[lab[n]] = dc.get(lab[n], 0) + d
    sdc2 = sum(d * d for d in dc.values())
    q = (4.0 * m * m_intra - sdc2) / (4.0 * m * m)
    return m, len(dc), math.floor(Q_SCALE * q)


def test_two_cliques_bridge(spark):
    # two triangles joined by one bridge: strong community structure
    pairs = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    lab = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
    row = modularity(_edges(spark, pairs), _labels(spark, lab)).collect()[0]
    assert (row.m, row.n_communities, row.q_nano) == _py_q(pairs, lab)
    assert row.q_nano > 0.3 * Q_SCALE
    # one-community labeling of the same graph: Q = 0 exactly
    row1 = modularity(
        _edges(spark, pairs), _labels(spark, {k: 7 for k in lab})
    ).collect()[0]
    assert row1.q_nano == 0


def test_arbitrary_partition_near_zero(spark):
    n = 40
    pairs = [(i, (i * 7 + 1) % n) for i in range(n)]
    pairs += [(i, (i * 6 + 3) % n) for i in range(n)]
    lab = {i: i % 4 for i in range(n)}
    row = modularity(_edges(spark, pairs), _labels(spark, lab)).collect()[0]
    assert (row.m, row.n_communities, row.q_nano) == _py_q(pairs, lab)
    assert abs(row.q_nano) < 0.15 * Q_SCALE


def test_lpa_labels_score_above_random(spark):
    from osm_spark.graph.lpa import label_propagation

    # two dense blocks with sparse cross edges
    pairs = []
    for base in (0, 20):
        pairs += [
            (base + i, base + j) for i in range(10) for j in range(i + 1, 10)
            if (i + j) % 3 != 0
        ]
    pairs += [(1, 21), (5, 27)]
    e = _edges(spark, pairs)
    labs = label_propagation(e, n_iter=5).select(
        "id", F.col("label").alias("label")
    )
    q_lpa = modularity(e, labs).collect()[0].q_nano
    rand = _labels(spark, {i: i % 2 for i in range(30)})
    q_rand = modularity(e, rand).collect()[0].q_nano
    assert q_lpa > q_rand