"""S2-style cube-face quadtree cell index, pure numpy.

Implements the published S2 geometry construction (Hilbert curve on the six
faces of a cube circumscribing the sphere, quadratic ST↔UV projection):
lat/lon → unit XYZ → face + (u,v) → (s,t) → (i,j) → Hilbert position. See
the public s2geometry design docs for the math; this is an independent
reimplementation — cell ids are deterministic but not bit-compatible with
the C++ library (unavailable in this container; fixtures pin ids).

Cell id layout (64-bit signed long, always positive):
    id = ((face * 4^level + hilbert_pos) << 5) | level
so ids at different levels never collide and the level is recoverable.
Level 13 is the engine default for page/node point indexing
(BASELINE.json:6: "S2 level-13 cells").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

DEFAULT_LEVEL = 13


def _face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    """Largest-|component| face selection + gnomonic (u,v) per face."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= np.maximum(ay, az), 0, np.where(ay >= az, 1, 2))
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face).astype(np.int64)

    u = np.empty_like(x)
    v = np.empty_like(x)
    # Face basis follows the standard S2 convention.
    m = face == 0
    u[m], v[m] = y[m] / x[m], z[m] / x[m]
    m = face == 1
    u[m], v[m] = -x[m] / y[m], z[m] / y[m]
    m = face == 2
    u[m], v[m] = -x[m] / z[m], -y[m] / z[m]
    m = face == 3
    u[m], v[m] = z[m] / x[m], y[m] / x[m]
    m = face == 4
    u[m], v[m] = z[m] / y[m], -x[m] / y[m]
    m = face == 5
    u[m], v[m] = -y[m] / z[m], -x[m] / z[m]
    return face, u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2 quadratic projection: equalizes cell area across a face."""
    return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def _hilbert_pos(i: np.ndarray, j: np.ndarray, level: int) -> np.ndarray:
    """Hilbert curve position of (i,j) on a 2^level grid (vectorized).

    Classic iterative xy→d algorithm; self-similar, so floor(d/4) is the
    parent cell's position — prefix truncation gives coarser levels.
    """
    x = i.astype(np.int64).copy()
    y = j.astype(np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (level - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # Rotate quadrant.
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f, y_f = x.copy(), y.copy()
        x[flip] = s - 1 - x_f[flip]
        y[flip] = s - 1 - y_f[flip]
        x_s, y_s = x.copy(), y.copy()
        x[swap], y[swap] = y_s[swap], x_s[swap]
        s >>= 1
    return d


def s2_cell_np(lat: np.ndarray, lon: np.ndarray, level: int = DEFAULT_LEVEL) -> np.ndarray:
    """Vectorized S2-style cell id for degree lat/lon arrays."""
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    lon_r = np.radians(np.asarray(lon, dtype=np.float64))
    cos_lat = np.cos(lat_r)
    x = cos_lat * np.cos(lon_r)
    y = cos_lat * np.sin(lon_r)
    z = np.sin(lat_r)
    face, u, v = _face_uv(x, y, z)
    n = np.int64(1) << level
    i = np.clip((_uv_to_st(u) * n).astype(np.int64), 0, n - 1)
    j = np.clip((_uv_to_st(v) * n).astype(np.int64), 0, n - 1)
    pos = _hilbert_pos(i, j, level)
    return ((face * (n * n) + pos) << 5) | np.int64(level)


def s2_parent_np(cell: np.ndarray, level: int, parent_level: int) -> np.ndarray:
    """Coarsen a cell id to an ancestor level (Hilbert prefix truncation)."""
    body = np.asarray(cell, dtype=np.int64) >> 5
    n2 = np.int64(1) << (2 * level)
    face, pos = body // n2, body % n2
    pos >>= 2 * (level - parent_level)
    pn2 = np.int64(1) << (2 * parent_level)
    return ((face * pn2 + pos) << 5) | np.int64(parent_level)


def s2_cell_udf(level: int = DEFAULT_LEVEL):
    """pandas UDF (double, double) → long cell id."""

    @F.pandas_udf(LongType())
    def _udf(lat: pd.Series, lon: pd.Series) -> pd.Series:
        out = s2_cell_np(lat.to_numpy(np.float64), lon.to_numpy(np.float64), level)
        res = pd.Series(out)
        res[lat.isna() | lon.isna()] = None
        return res

    return _udf


def s2_cell(lat: Column | str, lon: Column | str, level: int = DEFAULT_LEVEL) -> Column:
    la = F.col(lat) if isinstance(lat, str) else lat
    lo = F.col(lon) if isinstance(lon, str) else lon
    return s2_cell_udf(level)(la, lo)
