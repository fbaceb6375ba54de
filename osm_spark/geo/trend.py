"""First-order trend surface (spatial OLS) + residual map over the tile
raster — the regression member of the raster-statistics family.

Trend-surface analysis (Chorley & Haggett 1965; standard in raster GIS)
fits density = a + b·x + c·y over the occupied tiles and maps the
residuals: the detrended surface that separates "dense because the whole
region slopes dense" from "dense beyond its regional trend" — the
preflight for hotspot_gi (which assumes a stationary mean) and the
de-biasing step before comparing city rasters.

Exactness design (same discipline as `geo/moran.py`): the normal
equations are solved by Cramer's rule, so the coefficients are RATIOS OF
INTEGER DETERMINANTS — every data-sized sum (Σu, Σu², Σcnt·u, …) is an
integer aggregate in decimal(38,0) (DuckDB replays in HUGEINT), the
determinants are integer products of those sums, and the per-tile
residual has the exact integer numerator

    num_i = cnt_i·D − (D_a + D_b·u_i + D_c·v_i),   resid_i = num_i / D

so the ONLY float ops are the closing cast/divide/round in one pinned
expression — micro-quantized, value-hash gateable.  A rank-deficient
tile set (D = 0: all tiles collinear) yields NULL residuals rather than
a fabricated fit.

Plan shape: one point-table groupBy (map-side combined) → ONE
single-row aggregate of nine sums → 1-row broadcast back to the tiles
(the engine's stat-broadcast pattern) → per-tile closed-form residual.
Nothing after the rasterization scales beyond the occupied-tile count;
magnitudes stay inside decimal(38,0) for z ≤ 14 rasters with planetary
counts (per-term bound n·(2^z)⁴ — document and drop z, not precision,
if a deeper raster is ever needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_spark.geo.hotspot import tile_count_grid

__all__ = ["trend_surface"]

_DEC = "decimal(38,0)"


def trend_surface(points: DataFrame, z: int) -> DataFrame:
    """(z, x, y, cnt, resid_micro) — per-tile OLS plane residuals.

    ``resid_micro`` = round(1e6 · (cnt − fitted)) as bigint; NULL when
    the occupied tiles are collinear (singular normal equations).
    """
    # Pin the rasterization: counts feeds BOTH the nine-sum stat row and
    # the per-tile residual output — without the checkpoint Spark plans
    # two full point-table scans (plan-pinned in tests/test_plans_r5.py;
    # the simjoin weights-table precedent).
    counts = tile_count_grid(points, z).localCheckpoint()

    u = F.col("x").cast(_DEC)
    v = F.col("y").cast(_DEC)
    c = F.col("cnt").cast(_DEC)
    sums = counts.agg(
        F.count(F.lit(1)).cast(_DEC).alias("s0"),
        F.sum(u).alias("su"),
        F.sum(v).alias("sv"),
        F.sum(u * u).alias("suu"),
        F.sum(u * v).alias("suv"),
        F.sum(v * v).alias("svv"),
        F.sum(c).alias("sc"),
        F.sum(c * u).alias("scu"),
        F.sum(c * v).alias("scv"),
    )

    def det3(
        a1: Column, a2: Column, a3: Column,
        b1: Column, b2: Column, b3: Column,
        c1: Column, c2: Column, c3: Column,
    ) -> Column:
        return (
            a1 * (b2 * c3 - b3 * c2)
            - a2 * (b1 * c3 - b3 * c1)
            + a3 * (b1 * c2 - b2 * c1)
        )

    s0, su, sv = F.col("s0"), F.col("su"), F.col("sv")
    suu, suv, svv = F.col("suu"), F.col("suv"), F.col("svv")
    sc, scu, scv = F.col("sc"), F.col("scu"), F.col("scv")
    dets = sums.select(
        det3(s0, su, sv, su, suu, suv, sv, suv, svv).alias("dd"),
        det3(sc, su, sv, scu, suu, suv, scv, suv, svv).alias("da"),
        det3(s0, sc, sv, su, scu, suv, sv, scv, svv).alias("db"),
        det3(s0, su, sc, su, suu, scu, sv, suv, scv).alias("dc"),
    )

    j = counts.crossJoin(F.broadcast(dets))
    num = (
        F.col("cnt").cast(_DEC) * F.col("dd")
        - F.col("da")
        - F.col("db") * F.col("x").cast(_DEC)
        - F.col("dc") * F.col("y").cast(_DEC)
    )
    resid = F.when(
        F.col("dd") != 0,
        F.round(num.cast("double") / F.col("dd").cast("double") * 1e6, 0).cast("long"),
    ).otherwise(F.lit(None).cast("long"))
    return j.select(
        F.lit(z).alias("z"), "x", "y", "cnt", resid.alias("resid_micro")
    )
