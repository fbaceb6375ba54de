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
    # np.where evaluates both branches, so each sqrt sees the other
    # branch's out-of-domain values — suppress the spurious warning.
    with np.errstate(invalid="ignore"):
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


def s2_cell_cols(
    df,
    lat: str = "lat",
    lon: str = "lon",
    level: int = DEFAULT_LEVEL,
    out: str = "s2",
):
    """Pure-Column S2 encode as a DataFrame transform (no Python).

    Same math as ``s2_cell_np`` term for term. The Hilbert xy→d loop is
    ``level`` chained ``withColumns`` projections — column-at-a-time so
    each iteration's x/y/d are named attributes, not a re-inlined
    expression tree (CollapseProject's duplication guard keeps non-cheap
    multi-referenced projections un-collapsed, so the plan stays linear
    in ``level``). Whole-stage codegen fuses the chain into one stage:
    the hot path pays zero Arrow round trips, matching the
    ``hex_cell_expr`` design. Integer ops are bit-exact across engines;
    the float prefix (trig, gnomonic projection) is IEEE-identical in
    op order to the numpy form (bit-equality tested on fixtures).
    """
    la, lo = F.radians(F.col(lat)), F.radians(F.col(lon))
    cx = F.cos(la) * F.cos(lo)
    cy = F.cos(la) * F.sin(lo)
    cz = F.sin(la)
    df = df.withColumns({"_cx": cx, "_cy": cy, "_cz": cz})
    ax, ay, az = F.abs(F.col("_cx")), F.abs(F.col("_cy")), F.abs(F.col("_cz"))
    f0 = (
        F.when(ax >= F.greatest(ay, az), F.lit(0))
        .when(ay >= az, F.lit(1))
        .otherwise(F.lit(2))
    )
    df = df.withColumns({"_f0": f0})
    major = (
        F.when(F.col("_f0") == 0, F.col("_cx"))
        .when(F.col("_f0") == 1, F.col("_cy"))
        .otherwise(F.col("_cz"))
    )
    df = df.withColumns(
        {"_face": F.when(major < 0, F.col("_f0") + 3).otherwise(F.col("_f0")).cast("long")}
    )
    x, y, z = F.col("_cx"), F.col("_cy"), F.col("_cz")
    u = (
        F.when(F.col("_face") == 0, y / x)
        .when(F.col("_face") == 1, -x / y)
        .when(F.col("_face") == 2, -x / z)
        .when(F.col("_face") == 3, z / x)
        .when(F.col("_face") == 4, z / y)
        .otherwise(-y / z)
    )
    v = (
        F.when(F.col("_face") == 0, z / x)
        .when(F.col("_face") == 1, z / y)
        .when(F.col("_face") == 2, -y / z)
        .when(F.col("_face") == 3, y / x)
        .when(F.col("_face") == 4, -x / y)
        .otherwise(-x / z)
    )
    df = df.withColumns({"_u": u, "_v": v})

    def st(c):
        return F.when(c >= 0, 0.5 * F.sqrt(1.0 + 3.0 * c)).otherwise(
            1.0 - 0.5 * F.sqrt(1.0 - 3.0 * c)
        )

    n = np.int64(1) << level
    clip = lambda c: F.least(F.greatest(c, F.lit(0).cast("long")), F.lit(int(n - 1)))  # noqa: E731
    df = df.withColumns(
        {
            "_hx": clip((st(F.col("_u")) * float(n)).cast("long")),
            "_hy": clip((st(F.col("_v")) * float(n)).cast("long")),
            "_hd": F.lit(0).cast("long"),
        }
    )
    s = int(n) >> 1
    while s > 0:
        hx, hy = F.col("_hx"), F.col("_hy")
        rx = F.when(hx.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        ry = F.when(hy.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        df = df.withColumns({"_rx": rx, "_ry": ry})
        flip = (F.col("_ry") == 0) & (F.col("_rx") == 1)
        xf = F.when(flip, F.lit(s - 1) - F.col("_hx")).otherwise(F.col("_hx"))
        yf = F.when(flip, F.lit(s - 1) - F.col("_hy")).otherwise(F.col("_hy"))
        df = df.withColumns({"_xf": xf, "_yf": yf})
        swap = F.col("_ry") == 0
        df = df.withColumns(
            {
                "_hd": F.col("_hd")
                + F.lit(s) * F.lit(s) * (3 * F.col("_rx")).bitwiseXOR(F.col("_ry")),
                "_hx": F.when(swap, F.col("_yf")).otherwise(F.col("_xf")),
                "_hy": F.when(swap, F.col("_xf")).otherwise(F.col("_yf")),
            }
        )
        s >>= 1
    cell = F.shiftleft(
        F.col("_face") * F.lit(int(n) * int(n)) + F.col("_hd"), 5
    ).bitwiseOR(F.lit(level).cast("long"))
    drop = ["_cx", "_cy", "_cz", "_f0", "_face", "_u", "_v", "_hx", "_hy", "_hd", "_rx", "_ry", "_xf", "_yf"]
    return df.withColumns({out: cell}).drop(*drop)


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
