"""Getis-Ord Gi* hotspot detection over the slippy-tile density raster.

The spatial-statistics step after rasterization (geo/tiles.py): which
tiles hold significantly MORE points than chance — page-density
hotspots worth a deeper crawl, denser tile pyramid, or skew salting.
Graft-mandated family SURVEY.md §2.10 (raster analytics over the page
table); no reference counterpart.

Statistic (Getis & Ord 1992/1995, binary 3×3 queen contiguity,
self-included — the Gi* variant):

    z_i = (G_i − x̄·W_i) / (S · sqrt((N·W_i − W_i²) / (N−1)))

    G_i = Σ_{j ∈ nbr(i)} x_j     (sum over OCCUPIED 3×3 neighbors, self
                                  included; W_i = how many there are)
    x̄  = Σx / N,   S = sqrt(Σx² / N − x̄²)

The statistical universe is the OCCUPIED tile set (N = #occupied): at
planet scale "all tiles at z" is 4^z ≫ data and would drown the mean in
structural zeros; occupied-only is the standard sparse-raster practice
and is what a DuckDB oracle can replay exactly. Edge/corner tiles have
smaller W_i — handled by the formula, no padding needed.

Everything upstream of the final z expression is INTEGER arithmetic
(tile counts, neighbor sums, Σx, Σx²), so the only float ops are the
closing divisions/sqrt — correctly-rounded IEEE ops with no libm trig,
bit-identical across engines given the written op order. The gated
output quantizes z to micro-units anyway (1 µz), following the lm_score
precedent.

Plan: two combiner-reduced shuffles (tile counts; 9-way neighbor-offset
explode re-keyed by target tile) + one single-row global aggregate that
broadcasts back. Nothing scales with more than the occupied-tile count;
the point table is touched once by the tile groupBy.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_spark.geo.tiles import tile_xy


def tile_count_grid(points: DataFrame, z: int) -> DataFrame:
    """(x, y, cnt) — occupied slippy tiles at zoom ``z`` with point
    counts. One partial-aggregated shuffle over (x, y)."""
    t = tile_xy("lat", "lon", z)
    return (
        points.select(t.getField("x").alias("x"), t.getField("y").alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def hotspot_gi(points: DataFrame, z: int) -> DataFrame:
    """(x, y, cnt, w, g, z_micro) — Gi* per occupied tile; ``z_micro``
    is round(z_i · 1e6) as BIGINT (NULL when S == 0 or N == 1, i.e. a
    constant raster where the statistic is undefined)."""
    counts = tile_count_grid(points, z)

    # Each occupied tile scatters its count to its 9 neighbor targets;
    # re-keying by target is the second (and last) data-sized shuffle.
    offs = F.array(
        *[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in _OFFSETS]
    )
    scattered = counts.select("x", "y", "cnt", F.explode(offs).alias("o")).select(
        (F.col("x") + F.col("o.dx")).alias("tx"),
        (F.col("y") + F.col("o.dy")).alias("ty"),
        "cnt",
    )
    nbr = scattered.groupBy("tx", "ty").agg(
        F.sum("cnt").alias("g"), F.count(F.lit(1)).alias("w")
    )
    occ = counts.join(
        nbr.hint("shuffle_hash"),
        (counts["x"] == nbr["tx"]) & (counts["y"] == nbr["ty"]),
    ).select("x", "y", "cnt", "g", "w")

    glob = counts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("sx"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sx2"),
    )
    j = occ.crossJoin(F.broadcast(glob))

    n = F.col("n").cast("double")
    mean = F.col("sx").cast("double") / n
    s = F.sqrt(F.col("sx2").cast("double") / n - mean * mean)
    w = F.col("w").cast("double")
    denom = s * F.sqrt((n * w - w * w) / (n - F.lit(1.0)))
    zscore = (F.col("g").cast("double") - mean * w) / denom
    z_micro = F.when(
        (F.col("n") > 1) & (s > 0), F.round(zscore * 1e6, 0).cast("long")
    ).otherwise(F.lit(None).cast("long"))
    return j.select("x", "y", "cnt", "w", "g", z_micro.alias("z_micro"))
