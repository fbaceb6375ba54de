"""IDW interpolation: brute-force equality, exact-hit limit, invariance."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from osm_spark.geo.idw import MIN_D_MM, idw_interpolate, idw_scale
from osm_spark.geo.knn import haversine_m_py


def _fixture(spark, seed=7, n_pts=200, n_nodes=40, center=(51.5, -0.13)):
    rng = np.random.RandomState(seed)
    clat, clon = center
    pts = [(f"p{i}",
            float(clat + rng.uniform(-0.05, 0.05)),
            float(clon + rng.uniform(-0.05, 0.05))) for i in range(n_pts)]
    nodes = [(i,
              float(clat + rng.uniform(-0.04, 0.04)),
              float(clon + rng.uniform(-0.04, 0.04)),
              int(i % 97)) for i in range(n_nodes)]
    pdf = spark.createDataFrame(pts, "url string, lat double, lon double")
    ndf = spark.createDataFrame(nodes, "id long, lat double, lon double, val long")
    return pts, nodes, pdf, ndf


def _brute(pts, nodes, radius_m):
    """The exact integer weight chain of geo/idw.py, replayed in Python."""
    scale = float(idw_scale(radius_m))
    out = {}
    for url, plat, plon in pts:
        n_nbrs, num, den, exact = 0, 0, 0, None
        for nid, nlat, nlon, v in nodes:
            d = haversine_m_py(plat, plon, nlat, nlon)
            if d > radius_m:
                continue
            n_nbrs += 1
            d_mm = int(round(d * 1000.0))
            if d_mm == 0:
                exact = v if exact is None else min(exact, v)
                continue
            d_eff = max(d_mm, MIN_D_MM)
            w = math.floor(scale / float(d_eff * d_eff))
            num += w * v
            den += w
        if n_nbrs == 0:
            continue
        if exact is not None:
            est = exact * 1_000_000
        else:
            # round-half-even is what F.round / Python round both do
            est = int(round(1e6 * num / den))
        out[url] = (n_nbrs, est)
    return out


def test_idw_equals_brute_force(spark):
    pts, nodes, pdf, ndf = _fixture(spark)
    got = {
        r.url: (r.n_nbrs, r.est_micro)
        for r in idw_interpolate(pdf, ndf, 1500.0, strategy="broadcast").collect()
    }
    assert got == _brute(pts, nodes, 1500.0)
    assert len(got) > 0


def test_idw_exact_hit_short_circuits(spark):
    # a query sitting exactly on a node returns that node's value
    pdf = spark.createDataFrame(
        [("hit", 51.5, -0.13), ("near", 51.5001, -0.13)],
        "url string, lat double, lon double",
    )
    ndf = spark.createDataFrame(
        [(1, 51.5, -0.13, 42), (2, 51.501, -0.129, 7)],
        "id long, lat double, lon double, val long",
    )
    rows = {r.url: r for r in idw_interpolate(pdf, ndf, 500.0, strategy="broadcast").collect()}
    assert rows["hit"].est_micro == 42 * 1_000_000
    # the near point blends both nodes: strictly between the two values
    assert 7 * 1_000_000 < rows["near"].est_micro < 42 * 1_000_000


def test_idw_paths_identical(spark):
    pts, nodes, pdf, ndf = _fixture(spark, seed=11)
    b = {tuple(r) for r in idw_interpolate(pdf, ndf, 2000.0, strategy="broadcast").collect()}
    s = {tuple(r) for r in idw_interpolate(pdf, ndf, 2000.0, strategy="shuffle").collect()}
    assert b == s and len(b) > 0


def test_idw_partitioning_invariant(spark):
    # integer sums make the estimate independent of partition layout
    pts, nodes, pdf, ndf = _fixture(spark, seed=13)
    one = {tuple(r) for r in idw_interpolate(pdf.coalesce(1), ndf, 1500.0, strategy="broadcast").collect()}
    many = {tuple(r) for r in idw_interpolate(pdf.repartition(17), ndf, 1500.0, strategy="broadcast").collect()}
    assert one == many


def test_idw_min_weight_resolution():
    # the farthest in-radius node keeps >= W_RES - 1 weight units
    from osm_spark.geo.idw import W_RES

    for radius_m in (100.0, 1500.0, 50_000.0):
        scale = idw_scale(radius_m)
        d_eff = max(int(round(radius_m * 1000.0)), MIN_D_MM)
        assert math.floor(scale / float(d_eff * d_eff)) >= W_RES - 1


def test_idw_loocv_matches_brute_force(spark):
    from osm_spark.geo.idw import idw_loocv

    _, nodes, _, ndf = _fixture(spark)
    radius = 1500.0
    got = {r.node_id: (r.n_nbrs, r.est_micro, r.err_micro)
           for r in idw_loocv(ndf, radius).collect()}
    # replay: each node predicted from the OTHERS
    want = {}
    for nid, nlat, nlon, v in nodes:
        others = [o for o in nodes if o[0] != nid]
        res = _brute([(nid, nlat, nlon)], others, radius)
        if nid in res:
            n_nbrs, est = res[nid]
            want[nid] = (n_nbrs, est, est - v * 1_000_000)
    assert got == want
    assert got  # predictions exist
    assert any(e[2] != 0 for e in got.values())  # real errors measured


def test_idw_loocv_twin_nodes_predict_exactly(spark):
    from osm_spark.geo.idw import idw_loocv

    ndf = spark.createDataFrame(
        [(1, 51.5, -0.13, 42), (2, 51.5, -0.13, 42), (3, 51.51, -0.13, 7)],
        "id long, lat double, lon double, val long",
    )
    rows = {r.node_id: r for r in idw_loocv(ndf, 5000.0).collect()}
    # the coincident twins hit each other's d=0 branch -> err 0
    assert rows[1].err_micro == 0 and rows[2].err_micro == 0
