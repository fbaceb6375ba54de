"""Getis-Ord Gi* hotspots (osm_spark/geo/hotspot.py) vs a numpy replay,
plus degenerate-raster edge cases."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from osm_spark.geo.hotspot import hotspot_gi, tile_count_grid
from osm_spark.geo.tiles import tile_xy_py


def _gi_replay(counts: dict[tuple[int, int], int]) -> dict[tuple[int, int], int | None]:
    xs = list(counts.values())
    n = len(xs)
    sx, sx2 = sum(xs), sum(v * v for v in xs)
    mean = sx / n
    s = math.sqrt(sx2 / n - mean * mean)
    out = {}
    for (x, y), cnt in counts.items():
        nbrs = [
            counts[(x + dx, y + dy)]
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (x + dx, y + dy) in counts
        ]
        g, w = sum(nbrs), len(nbrs)
        if n <= 1 or s <= 0:
            out[(x, y)] = None
            continue
        denom = s * math.sqrt((n * w - w * w) / (n - 1.0))
        out[(x, y)] = int(round((g - mean * w) / denom * 1e6))
    return out


@pytest.fixture(scope="module")
def city_points(spark):
    rng = np.random.default_rng(3)
    # one hot blob + sparse background: clear positive and negative Gi*
    lat = np.concatenate([51.5 + rng.normal(0, 0.002, 400),
                          51.4 + rng.random(100) * 0.3])
    lon = np.concatenate([-0.12 + rng.normal(0, 0.003, 400),
                          -0.3 + rng.random(100) * 0.5])
    pdf = pd.DataFrame({"lat": lat, "lon": lon})
    return pdf, spark.createDataFrame(pdf)


def test_gi_matches_replay(spark, city_points):
    pdf, pts = city_points
    z = 14
    got = hotspot_gi(pts, z).toPandas()
    counts: dict[tuple[int, int], int] = {}
    for r in pdf.itertuples():
        _, x, y = tile_xy_py(r.lat, r.lon, z)
        counts[(x, y)] = counts.get((x, y), 0) + 1
    exp = _gi_replay(counts)
    assert len(got) == len(exp)
    for r in got.itertuples():
        e = exp[(r.x, r.y)]
        g = None if pd.isna(r.z_micro) else int(r.z_micro)
        assert g == e, (r.x, r.y, g, e)
    # the blob must show up as a strongly significant hotspot
    assert got["z_micro"].max() > 2_576_000  # z > 2.576 (p < 0.01)


def test_gi_constant_raster_is_null(spark):
    # 4 tiles with identical counts: S == 0, statistic undefined
    rows = []
    for x_off, y_off in [(0, 0), (0.03, 0), (0, 0.022), (0.03, 0.022)]:
        rows.append({"lat": 51.5 + y_off, "lon": -0.12 + x_off})
    pts = spark.createDataFrame(pd.DataFrame(rows))
    got = hotspot_gi(pts, 14).toPandas()
    assert got["z_micro"].isna().all()
    assert (got["cnt"] == 1).all()


def test_gi_single_tile_is_null(spark):
    pts = spark.createDataFrame(pd.DataFrame([{"lat": 51.5, "lon": -0.12}]))
    got = hotspot_gi(pts, 10).toPandas()
    assert len(got) == 1
    assert got["z_micro"].isna().all()


def test_tile_count_grid_total(spark, city_points):
    pdf, pts = city_points
    grid = tile_count_grid(pts, 14).toPandas()
    assert grid["cnt"].sum() == len(pdf)
