"""Convex hull (geo/hull.py): brute-force parity with a local monotone
chain, collinear/duplicate semantics, tiny groups, and partitioning
invariance (the hull-merge associativity claim under test)."""

from __future__ import annotations

import random

from osm_spark.geo.hull import convex_hull


def _chain(pts):
    pts = sorted(set(pts))
    if len(pts) <= 2:
        return pts

    def half(points):
        out = []
        for p in points:
            while (
                len(out) >= 2
                and (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
                <= 0
            ):
                out.pop()
            out.append(p)
        return out

    lo = half(pts)
    up = half(list(reversed(pts)))
    return lo[:-1] + up[:-1]


def _spark_hull(spark, rows, repartition=None):
    df = spark.createDataFrame(rows, "grp string, px double, py double")
    if repartition:
        df = df.repartition(repartition)
    out = convex_hull(df)
    got = {}
    for r in out.collect():
        got.setdefault(r.grp, set()).add((r.px, r.py))
    return got


def test_matches_local_chain_random(spark):
    rng = random.Random(7)
    rows = [
        (f"g{i % 3}", float(rng.randint(0, 1000)), float(rng.randint(0, 1000)))
        for i in range(240)
    ]
    got = _spark_hull(spark, rows)
    for g in ("g0", "g1", "g2"):
        pts = [(x, y) for gg, x, y in rows if gg == g]
        assert got[g] == set(_chain(pts))


def test_collinear_and_duplicates(spark):
    rows = [
        ("s", 0.0, 0.0),
        ("s", 2.0, 0.0),
        ("s", 2.0, 2.0),
        ("s", 0.0, 2.0),
        ("s", 1.0, 0.0),  # on an edge — not a strict vertex
        ("s", 1.0, 1.0),  # interior
        ("s", 0.0, 0.0),  # duplicate
    ]
    got = _spark_hull(spark, rows)
    assert got["s"] == {(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)}


def test_tiny_groups(spark):
    rows = [("one", 5.0, 5.0), ("two", 1.0, 1.0), ("two", 2.0, 3.0)]
    got = _spark_hull(spark, rows)
    assert got == {
        "one": {(5.0, 5.0)},
        "two": {(1.0, 1.0), (2.0, 3.0)},
    }


def test_nan_coordinates_filtered(spark):
    """NaN passes isNotNull; it must be dropped before _chain or the
    sort/turn tests silently corrupt the hull (ADVICE r4)."""
    rows = [
        ("s", 0.0, 0.0),
        ("s", 2.0, 0.0),
        ("s", 2.0, 2.0),
        ("s", 0.0, 2.0),
        ("s", float("nan"), 1.0),
        ("s", 1.0, float("nan")),
    ]
    got = _spark_hull(spark, rows)
    assert got["s"] == {(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)}


def test_partitioning_invariance(spark):
    rng = random.Random(11)
    rows = [
        ("g", float(rng.randint(0, 500)), float(rng.randint(0, 500)))
        for _ in range(300)
    ]
    assert _spark_hull(spark, rows) == _spark_hull(spark, rows, repartition=7)
