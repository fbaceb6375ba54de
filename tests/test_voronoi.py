"""voronoi_regions vs a pure-python argmin replay."""

from __future__ import annotations

import math

import pytest

from osm_spark.geo.voronoi import voronoi_regions

Z, TS = 10, 256
MAXLAT = 85.05112878


def _pix(lat: float, lon: float) -> tuple[int, int, int, int]:
    n = float(1 << Z)
    lat = max(min(lat, MAXLAT), -MAXLAT)
    fx = (lon + 180.0) / 360.0 * n
    fy = (1.0 - math.asinh(math.tan(math.radians(lat))) / math.pi) / 2.0 * n
    x = min(max(int(math.floor(fx)), 0), (1 << Z) - 1)
    y = min(max(int(math.floor(fy)), 0), (1 << Z) - 1)
    px = min(int(math.floor((fx - x) * TS)), TS - 1)
    py = min(int(math.floor((fy - y) * TS)), TS - 1)
    return x, y, px, py


def _replay(pts, seeds):
    squv = {}
    for sid, lat, lon in seeds:
        x, y, px, py = _pix(lat, lon)
        squv[sid] = (x * TS + px, y * TS + py)
    out = {}
    for lat, lon in pts:
        x, y, _, _ = _pix(lat, lon)
        cx, cy = x * TS + TS // 2, y * TS + TS // 2
        best = min(
            ((cx - qx) ** 2 + (cy - qy) ** 2, sid) for sid, (qx, qy) in squv.items()
        )
        out[(x, y)] = (best[1], best[0])
    return out


@pytest.fixture(scope="module")
def data():
    pts = [(10.01, 20.01), (10.02, 20.30), (10.40, 20.02), (10.41, 20.31), (10.01, 20.02)]
    seeds = [(1, 10.00, 20.00), (2, 10.00, 20.32), (3, 10.42, 20.00), (4, 10.42, 20.33)]
    return pts, seeds


def test_voronoi_matches_replay(spark, data):
    pts, seeds = data
    pdf = spark.createDataFrame(pts, "lat double, lon double")
    sdf = spark.createDataFrame(seeds, "id long, lat double, lon double")
    got = {(r.x, r.y): (r.seed_id, r.d2) for r in voronoi_regions(pdf, sdf, Z).collect()}
    assert got == _replay(pts, seeds)
    # four quadrant points land on their four distinct nearest facilities
    assert {v[0] for v in got.values()} == {1, 2, 3, 4}


def test_voronoi_one_row_per_occupied_tile(spark, data):
    pts, seeds = data
    pdf = spark.createDataFrame(pts, "lat double, lon double")
    sdf = spark.createDataFrame(seeds, "id long, lat double, lon double")
    rows = voronoi_regions(pdf, sdf, Z).collect()
    assert len(rows) == len({(_pix(la, lo)[0], _pix(la, lo)[1]) for la, lo in pts})


def test_voronoi_tie_breaks_on_seed_id(spark):
    # two seeds symmetric about the tile center -> equal d2, smaller id wins
    pdf = spark.createDataFrame([(0.01, 0.01)], "lat double, lon double")
    x, y, _, _ = _pix(0.01, 0.01)
    # place both seeds exactly at the tile center => d2 = 0 for both
    n = float(1 << Z)
    lon_c = ((x + (TS // 2 + 0.5) / TS) / n) * 360.0 - 180.0
    fy = (y + (TS // 2 + 0.5) / TS) / n
    lat_c = math.degrees(math.atan(math.sinh(math.pi * (1.0 - 2.0 * fy))))
    sdf = spark.createDataFrame(
        [(7, lat_c, lon_c), (5, lat_c, lon_c)], "id long, lat double, lon double"
    )
    rows = voronoi_regions(pdf, sdf, Z).collect()
    assert len(rows) == 1 and rows[0].seed_id == 5 and rows[0].d2 == 0
