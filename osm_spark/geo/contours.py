"""Raster density tiles + raster→vector contour extraction.

``density_raster``: page points → per-tile-pixel counts. Pure groupBy —
the tile/pixel ids come from closed-form Column math (tiles.py), so the
whole rasterization is one partial-aggregated shuffle.

``contours``: marching squares per tile via ``applyInPandas`` — one pandas
group per (z, x, y) tile, vectorized case-table lookup over all 2×2 pixel
blocks at once. Crossing points use the (deterministic) midpoint rule, not
value interpolation, so goldens are integer-exact in half-pixel units.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.geo.tiles import tile_pixel

# Marching-squares case table: case index (bit 0 = top-left, 1 = top-right,
# 2 = bottom-right, 3 = bottom-left, bit set when >= threshold) → list of
# segments as (edge_from, edge_to); edges 0=top,1=right,2=bottom,3=left.
_CASES: dict[int, list[tuple[int, int]]] = {
    0: [],
    1: [(3, 0)],
    2: [(0, 1)],
    3: [(3, 1)],
    4: [(1, 2)],
    5: [(3, 2), (1, 0)],  # saddle: deterministic fixed choice
    6: [(0, 2)],
    7: [(3, 2)],
    8: [(2, 3)],
    9: [(2, 0)],
    10: [(0, 3), (2, 1)],  # saddle: deterministic fixed choice
    11: [(2, 1)],
    12: [(1, 3)],
    13: [(1, 0)],
    14: [(0, 3)],
    15: [],
}

# Edge midpoints in half-pixel units relative to the 2x2 block's top-left
# pixel center: top=(1,0), right=(2,1), bottom=(1,2), left=(0,1).
_EDGE_XY = np.array([[1, 0], [2, 1], [1, 2], [0, 1]], dtype=np.int64)


def density_raster(points: DataFrame, z: int, tile_size: int = 256) -> DataFrame:
    """(z, x, y, px, py, cnt) per-pixel page density."""
    t = tile_pixel("lat", "lon", z, tile_size)
    return (
        points.select(t.alias("t"))
        .groupBy("t.z", "t.x", "t.y", "t.px", "t.py")
        .agg(F.count("*").alias("cnt"))
    )


def tile_density(points: DataFrame, z: int) -> DataFrame:
    """(z, x, y, density) coarse per-tile counts (the heatmap layer)."""
    from osm_spark.geo.tiles import tile_xy

    t = tile_xy("lat", "lon", z)
    return (
        points.select(t.alias("t"))
        .groupBy("t.z", "t.x", "t.y")
        .agg(F.count("*").cast("double").alias("density"))
    )


def marching_squares_np(
    grid: np.ndarray, threshold: float
) -> np.ndarray:
    """Contour segments of ``grid >= threshold``; (n, 4) array of
    (x1, y1, x2, y2) in half-pixel units. Vectorized case classification."""
    b = (grid >= threshold).astype(np.int64)
    if b.shape[0] < 2 or b.shape[1] < 2:
        return np.empty((0, 4), dtype=np.int64)
    # Case index per 2x2 block; grid indexed [row=y, col=x].
    tl = b[:-1, :-1]
    tr = b[:-1, 1:]
    br = b[1:, 1:]
    bl = b[1:, :-1]
    case = tl * 1 + tr * 2 + br * 4 + bl * 8
    segs = []
    for c in range(1, 15):
        ys, xs = np.nonzero(case == c)
        if len(xs) == 0:
            continue
        for e_from, e_to in _CASES[c]:
            p1 = _EDGE_XY[e_from]
            p2 = _EDGE_XY[e_to]
            out = np.empty((len(xs), 4), dtype=np.int64)
            out[:, 0] = 2 * xs + p1[0]
            out[:, 1] = 2 * ys + p1[1]
            out[:, 2] = 2 * xs + p2[0]
            out[:, 3] = 2 * ys + p2[1]
            segs.append(out)
    if not segs:
        return np.empty((0, 4), dtype=np.int64)
    return np.concatenate(segs)


def contours(
    raster: DataFrame, threshold: float, tile_size: int = 256
) -> DataFrame:
    """(z, x, y, x1, y1, x2, y2) contour segments per tile.

    Coordinates are half-pixel units within the tile. One pandas group per
    tile; tiles parallelize across the cluster.
    """

    def per_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        z, x, y = key
        grid = np.zeros((tile_size, tile_size), dtype=np.float64)
        grid[pdf["py"].to_numpy(), pdf["px"].to_numpy()] = pdf["cnt"].to_numpy()
        segs = marching_squares_np(grid, threshold)
        return pd.DataFrame(
            {
                "z": np.full(len(segs), z, dtype=np.int32),
                "x": np.full(len(segs), x, dtype=np.int64),
                "y": np.full(len(segs), y, dtype=np.int64),
                "x1": segs[:, 0],
                "y1": segs[:, 1],
                "x2": segs[:, 2],
                "y2": segs[:, 3],
            }
        )

    return raster.groupBy("z", "x", "y").applyInPandas(
        per_tile, "z int, x long, y long, x1 long, y1 long, x2 long, y2 long"
    )
