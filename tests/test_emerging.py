"""Emerging hotspots (osm_spark/geo/emerging.py): cube densification,
Mann-Kendall replay, tie correction, trend classification."""

from __future__ import annotations

import datetime as dt
import math
from itertools import combinations

import pandas as pd

from osm_spark.geo.emerging import Z_SCALE, emerging_hotspots, space_time_cube

Z = 15


def _tile_center(x, y, z=Z):
    n = 1 << z
    lon = (x + 0.5) / n * 360.0 - 180.0
    lat = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * (y + 0.5) / n))))
    return lat, lon


def _points(spark, series: dict[tuple[int, int], list[int]]):
    """series: tile -> per-day counts (day 0 = 2024-01-01)."""
    rows = []
    i = 0
    for (x, y), days in series.items():
        la, lo = _tile_center(x, y)
        for day, cnt in enumerate(days):
            for _ in range(cnt):
                rows.append(
                    {
                        "id": i,
                        "lat": la,
                        "lon": lo,
                        "ts": dt.datetime(2024, 1, 1, 12) + dt.timedelta(days=day),
                    }
                )
                i += 1
    return spark.createDataFrame(pd.DataFrame(rows))


def _mk(counts):
    s = sum(
        (0 if counts[j] == counts[i] else (1 if counts[j] > counts[i] else -1))
        for i, j in combinations(range(len(counts)), 2)
    )
    n = len(counts)
    ties = {}
    for c in counts:
        ties[c] = ties.get(c, 0) + 1
    var18 = n * (n - 1) * (2 * n + 5) - sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values()
    )
    if var18 <= 0:
        return s, var18, None
    zv = (s - (0 if s == 0 else math.copysign(1, s))) / math.sqrt(var18 / 18.0)
    return s, var18, round(zv * Z_SCALE)


def test_cube_densifies_to_global_range(spark):
    series = {(100, 200): [3, 0, 1], (105, 205): [0, 2, 0]}
    # tile B has no events on days 0/2; the cube still carries zeros
    pts = _points(spark, series)
    cube = {
        (r.x, r.y, r.bucket): r.cnt
        for r in space_time_cube(pts, Z).collect()
    }
    assert len(cube) == 6
    base = min(b for (_, _, b) in cube)
    assert cube[(105, 205, base)] == 0 and cube[(105, 205, base + 1)] == 2


def test_mann_kendall_matches_replay(spark):
    series = {
        (100, 200): [1, 2, 3, 4, 5, 6, 7, 8],  # monotone heating
        (110, 210): [8, 7, 6, 5, 4, 3, 2, 1],  # cooling
        (120, 220): [5, 1, 4, 2, 5, 1, 4, 2],  # no trend, with ties
    }
    got = {
        (r.x, r.y): (r.n_buckets, r.s, r.var18, r.z_micro, r.trend)
        for r in emerging_hotspots(_points(spark, series), Z).collect()
    }
    for tile, counts in series.items():
        s, var18, zm = _mk(counts)
        nb, gs, gv, gz, gt = got[tile]
        assert (nb, gs, gv, gz) == (len(counts), s, var18, zm)
    assert got[(100, 200)][4] == "heating"
    assert got[(110, 210)][4] == "cooling"
    assert got[(120, 220)][4] is None


def test_constant_series_null(spark):
    series = {(100, 200): [2, 2, 2, 2]}
    r = emerging_hotspots(_points(spark, series), Z).collect()[0]
    assert r.var18 == 0 and r.z_micro is None and r.trend is None