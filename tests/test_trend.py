"""trend_surface vs an exact integer Cramer replay."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from osm_spark.geo.trend import trend_surface

Z = 10
MAXLAT = 85.05112878


def _tile(lat: float, lon: float) -> tuple[int, int]:
    n = float(1 << Z)
    lat = max(min(lat, MAXLAT), -MAXLAT)
    x = int(math.floor((lon + 180.0) / 360.0 * n))
    y = int(math.floor((1.0 - math.asinh(math.tan(math.radians(lat))) / math.pi) / 2.0 * n))
    clamp = lambda t: min(max(t, 0), (1 << Z) - 1)
    return clamp(x), clamp(y)


def _replay(pts: list[tuple[float, float]]) -> dict[tuple[int, int], tuple[int, int | None]]:
    cnt: dict[tuple[int, int], int] = {}
    for lat, lon in pts:
        cnt[_tile(lat, lon)] = cnt.get(_tile(lat, lon), 0) + 1
    tiles = [(x, y, c) for (x, y), c in cnt.items()]
    s0 = len(tiles)
    su = sum(t[0] for t in tiles); sv = sum(t[1] for t in tiles)
    suu = sum(t[0] ** 2 for t in tiles); suv = sum(t[0] * t[1] for t in tiles)
    svv = sum(t[1] ** 2 for t in tiles)
    sc = sum(t[2] for t in tiles)
    scu = sum(t[2] * t[0] for t in tiles); scv = sum(t[2] * t[1] for t in tiles)

    def det3(m):
        return (
            m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
            - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
            + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
        )

    dd = det3([[s0, su, sv], [su, suu, suv], [sv, suv, svv]])
    da = det3([[sc, su, sv], [scu, suu, suv], [scv, suv, svv]])
    db = det3([[s0, sc, sv], [su, scu, suv], [sv, scv, svv]])
    dc = det3([[s0, su, sc], [su, suu, scu], [sv, suv, scv]])
    out = {}
    for x, y, c in tiles:
        if dd == 0:
            out[(x, y)] = (c, None)
        else:
            num = c * dd - da - db * x - dc * y
            # Spark round() is HALF_UP on the double ratio
            r = num / dd * 1e6
            out[(x, y)] = (c, int(math.floor(r + 0.5)) if r >= 0 else -int(math.floor(-r + 0.5)))
    return out


@pytest.fixture(scope="module")
def pts():
    # a sloped density field: denser toward the north-east tiles
    base = []
    for i in range(7):
        for j in range(5):
            lat, lon = 10.0 + i * 0.4, 20.0 + j * 0.4
            base += [(lat, lon)] * (1 + i + 2 * j)
    base.append((10.05, 20.05))
    return base


def test_trend_matches_replay(spark, pts):
    df = spark.createDataFrame(pts, "lat double, lon double")
    got = {(r.x, r.y): (r.cnt, r.resid_micro) for r in trend_surface(df, Z).collect()}
    assert got == _replay(pts)
    assert any(v[1] not in (0, None) for v in got.values())


def test_trend_residuals_sum_to_zero(spark, pts):
    """OLS residuals are orthogonal to the intercept column — Σresid = 0
    exactly in the integer numerators, so micro-sums stay within rounding."""
    df = spark.createDataFrame(pts, "lat double, lon double")
    rows = trend_surface(df, Z).collect()
    assert abs(sum(r.resid_micro for r in rows)) <= len(rows)  # ≤ .5 ulp each


def test_trend_exact_plane_has_zero_residuals(spark):
    # cnt == 3 everywhere is fit exactly by a = 3, b = c = 0
    pts = [(10.0 + i * 0.4, 20.0 + j * 0.4) for i in range(3) for j in range(3)] * 3
    df = spark.createDataFrame(pts, "lat double, lon double")
    rows = trend_surface(df, Z).collect()
    assert all(r.resid_micro == 0 for r in rows)


def test_trend_collinear_is_null(spark):
    # all tiles on one row of the grid -> singular normal equations
    pts = [(10.0, 20.0 + j * 0.4) for j in range(4)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    rows = trend_surface(df, Z).collect()
    assert rows and all(r.resid_micro is None for r in rows)


def test_trend_universe_is_occupied_tiles(spark, pts):
    df = spark.createDataFrame(pts, "lat double, lon double")
    n_tiles = df.select(
        F.floor((F.col("lon") + 180.0) / 360.0 * (1 << Z)).alias("x"),
        F.floor(
            (1.0 - F.asinh(F.tan(F.radians("lat"))) / math.pi) / 2.0 * (1 << Z)
        ).alias("y"),
    ).distinct().count()
    assert trend_surface(df, Z).count() == n_tiles
