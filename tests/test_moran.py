"""Global Moran's I / Geary's C (osm_spark/geo/moran.py) vs dense replays."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from osm_spark.geo.moran import gearys_c, morans_i

Z = 15


def _tile_center(x: int, y: int, z: int = Z) -> tuple[float, float]:
    import math

    n = 1 << z
    lon = (x + 0.5) / n * 360.0 - 180.0
    lat = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * (y + 0.5) / n))))
    return lat, lon


def _points_for(grid: dict[tuple[int, int], int], spark):
    rows = []
    i = 0
    for (x, y), cnt in grid.items():
        la, lo = _tile_center(x, y)
        for _ in range(cnt):
            rows.append({"id": i, "lat": la, "lon": lo})
            i += 1
    return spark.createDataFrame(pd.DataFrame(rows))


def _replay(grid: dict[tuple[int, int], int]) -> tuple[int, int, float | None]:
    cells = list(grid)
    n = len(cells)
    xs = np.array([grid[c] for c in cells], dtype=np.int64)
    mean = xs.mean()
    w_pairs = 0
    cross = 0.0
    for i, (cx, cy) in enumerate(cells):
        for j, (ox, oy) in enumerate(cells):
            if i != j and abs(cx - ox) <= 1 and abs(cy - oy) <= 1:
                w_pairs += 1
                cross += (xs[i] - mean) * (xs[j] - mean)
    den = ((xs - mean) ** 2).sum()
    if n <= 1 or den == 0 or w_pairs == 0:
        return n, w_pairs, None
    return n, w_pairs, (n / w_pairs) * cross / den


@pytest.mark.parametrize(
    "grid",
    [
        # smooth gradient: strong positive autocorrelation
        {(100 + i, 200 + j): 10 + 3 * (i + j) for i in range(4) for j in range(4)},
        # checkerboard: negative autocorrelation
        {(100 + i, 200 + j): (1 if (i + j) % 2 else 9) for i in range(4) for j in range(4)},
        # isolated occupied tile far from a 2x2 block (w=0 tile kept)
        {(100, 200): 5, (100, 201): 7, (101, 200): 6, (101, 201): 8, (150, 250): 3},
    ],
)
def test_morans_i_matches_replay(spark, grid):
    n, w_pairs, i_val = _replay(grid)
    got = morans_i(_points_for(grid, spark), Z).toPandas().iloc[0]
    assert got["n_cells"] == n
    assert got["w_pairs"] == w_pairs
    assert got["i_micro"] == round(i_val * 1e6)
    assert got["e_i_micro"] == round(-1e6 / (n - 1))


def test_morans_i_sign_convention(spark):
    grad = {(100 + i, 200 + j): 10 + 3 * (i + j) for i in range(4) for j in range(4)}
    chk = {(100 + i, 200 + j): (1 if (i + j) % 2 else 9) for i in range(4) for j in range(4)}
    i_grad = morans_i(_points_for(grad, spark), Z).toPandas().iloc[0]["i_micro"]
    i_chk = morans_i(_points_for(chk, spark), Z).toPandas().iloc[0]["i_micro"]
    assert i_grad > 0 > i_chk


def _replay_geary(grid: dict[tuple[int, int], int]) -> tuple[int, int, float | None]:
    cells = list(grid)
    n = len(cells)
    xs = np.array([grid[c] for c in cells], dtype=np.int64)
    mean = xs.mean()
    w_pairs = 0
    num = 0.0
    for i, (cx, cy) in enumerate(cells):
        for j, (ox, oy) in enumerate(cells):
            if i != j and abs(cx - ox) <= 1 and abs(cy - oy) <= 1:
                w_pairs += 1
                num += float(xs[i] - xs[j]) ** 2
    den = ((xs - mean) ** 2).sum()
    if n <= 1 or den == 0 or w_pairs == 0:
        return n, w_pairs, None
    return n, w_pairs, (n - 1) * num / (2.0 * w_pairs * den)


@pytest.mark.parametrize(
    "grid",
    [
        {(100 + i, 200 + j): 10 + 3 * (i + j) for i in range(4) for j in range(4)},
        {(100 + i, 200 + j): (1 if (i + j) % 2 else 9) for i in range(4) for j in range(4)},
        {(100, 200): 5, (100, 201): 7, (101, 200): 6, (101, 201): 8, (150, 250): 3},
    ],
)
def test_gearys_c_matches_replay(spark, grid):
    n, w_pairs, c_val = _replay_geary(grid)
    got = gearys_c(_points_for(grid, spark), Z).toPandas().iloc[0]
    assert got["n_cells"] == n
    assert got["w_pairs"] == w_pairs
    assert got["c_micro"] == round(c_val * 1e6)
    assert got["e_c_micro"] == 1_000_000


def test_gearys_c_sign_convention(spark):
    # C < 1 for positive autocorrelation (smooth), C > 1 for negative
    # (checkerboard) — opposite orientation to Moran's I around its null.
    grad = {(100 + i, 200 + j): 10 + 3 * (i + j) for i in range(4) for j in range(4)}
    chk = {(100 + i, 200 + j): (1 if (i + j) % 2 else 9) for i in range(4) for j in range(4)}
    c_grad = gearys_c(_points_for(grad, spark), Z).toPandas().iloc[0]["c_micro"]
    c_chk = gearys_c(_points_for(chk, spark), Z).toPandas().iloc[0]["c_micro"]
    assert c_grad < 1_000_000 < c_chk


def test_gearys_c_degenerate(spark):
    grid = {(100 + i, 200): 4 for i in range(3)}
    got = gearys_c(_points_for(grid, spark), Z).toPandas().iloc[0]
    assert pd.isna(got["c_micro"]) and got["e_c_micro"] == 1_000_000
    got1 = gearys_c(_points_for({(100, 200): 5}, spark), Z).toPandas().iloc[0]
    assert pd.isna(got1["c_micro"]) and pd.isna(got1["e_c_micro"])


def test_morans_i_degenerate(spark):
    # constant raster: den = 0 -> NULL statistic, expectation defined
    grid = {(100 + i, 200): 4 for i in range(3)}
    got = morans_i(_points_for(grid, spark), Z).toPandas().iloc[0]
    assert pd.isna(got["i_micro"]) and got["e_i_micro"] == round(-1e6 / 2)
    # single tile: everything undefined
    got1 = morans_i(_points_for({(100, 200): 5}, spark), Z).toPandas().iloc[0]
    assert pd.isna(got1["i_micro"]) and pd.isna(got1["e_i_micro"])


def _lisa_replay(grid):
    cells = list(grid)
    n = len(cells)
    xs = np.array([grid[c] for c in cells], dtype=np.int64)
    mean = xs.mean()
    den = ((xs - mean) ** 2).sum()
    out = {}
    for i, (cx, cy) in enumerate(cells):
        nbrs = [
            j for j, (ox, oy) in enumerate(cells)
            if j != i and abs(cx - ox) <= 1 and abs(cy - oy) <= 1
        ]
        w = len(nbrs)
        if n <= 1 or den == 0 or w == 0:
            out[(cx, cy)] = (int(xs[i]), w, None, None)
            continue
        d = xs[i] - mean
        lag = sum(xs[j] - mean for j in nbrs)
        ii = n * d * lag / den
        quad = None
        if d > 0 and lag > 0:
            quad = "HH"
        elif d < 0 and lag < 0:
            quad = "LL"
        elif d > 0 and lag < 0:
            quad = "HL"
        elif d < 0 and lag > 0:
            quad = "LH"
        out[(cx, cy)] = (int(xs[i]), w, round(ii * 1e6), quad)
    return out


@pytest.mark.parametrize(
    "grid",
    [
        {(100 + i, 200 + j): 10 + 3 * (i + j) for i in range(4) for j in range(4)},
        {(100 + i, 200 + j): (1 if (i + j) % 2 else 9) for i in range(4) for j in range(4)},
        {(100, 200): 5, (100, 201): 7, (101, 200): 6, (101, 201): 8, (150, 250): 3},
    ],
)
def test_local_morans_i_matches_replay(spark, grid):
    from osm_spark.geo.moran import local_morans_i

    want = _lisa_replay(grid)
    got = {
        (r.x, r.y): (r.cnt, r.w, r.ii_micro, r.quadrant)
        for r in local_morans_i(_points_for(grid, spark), Z).collect()
    }
    assert got == want


def test_local_morans_i_quadrants(spark):
    # one strong peak inside a flat low field -> the peak is HL (high
    # among lows) and its flat neighbors are LH
    grid = {(100 + i, 200 + j): 1 for i in range(3) for j in range(3)}
    grid[(101, 201)] = 50
    from osm_spark.geo.moran import local_morans_i

    got = {
        (r.x, r.y): r.quadrant
        for r in local_morans_i(_points_for(grid, spark), Z).collect()
    }
    assert got[(101, 201)] == "HL"
    assert got[(100, 200)] == "LH"
