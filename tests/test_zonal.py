"""zonal_centroid vs a python replay over hand-made pairs."""

from __future__ import annotations

import math

import pytest

from osm_spark.geo.zonal import zonal_centroid


@pytest.fixture(scope="module")
def dfs(spark):
    points = spark.createDataFrame(
        [("p1", 10.0, 20.0), ("p2", 10.2, 20.4), ("p3", 10.4, 20.2),
         ("p4", -5.05, 30.0)],
        "url string, lat double, lon double",
    )
    pairs = spark.createDataFrame(
        [("p1", 1), ("p2", 1), ("p3", 1), ("p4", 2), ("p1", 3)],
        "url string, way_id long",
    )
    polygons = spark.createDataFrame(
        [(1,), (2,), (3,), (4,)], "way_id long"
    )
    return points, pairs, polygons


def test_zonal_centroid_matches_replay(spark, dfs):
    points, pairs, polygons = dfs
    got = {r.way_id: tuple(r)[1:] for r in
           zonal_centroid(pairs, points, polygons).collect()}
    coords = {"p1": (10.0, 20.0), "p2": (10.2, 20.4),
              "p3": (10.4, 20.2), "p4": (-5.05, 30.0)}
    member = {1: ["p1", "p2", "p3"], 2: ["p4"], 3: ["p1"]}
    e7 = lambda v: int(round(v * 1e7))
    rnd = lambda x: int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))
    want = {}
    for w, ms in member.items():
        la = [e7(coords[m][0]) for m in ms]
        lo = [e7(coords[m][1]) for m in ms]
        want[w] = (len(ms), rnd(sum(la) / len(la)), rnd(sum(lo) / len(lo)),
                   min(la), max(la), min(lo), max(lo))
    want[4] = (0, None, None, None, None, None, None)
    assert got == want


def test_zonal_centroid_singleton_is_the_point(spark, dfs):
    points, pairs, polygons = dfs
    r = {x.way_id: x for x in zonal_centroid(pairs, points, polygons).collect()}
    assert r[2].clat_e7 == int(round(-5.05 * 1e7))
    assert r[2].min_lat_e7 == r[2].max_lat_e7 == r[2].clat_e7
