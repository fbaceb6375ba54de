"""Emerging-hotspot analysis — per-tile Mann-Kendall trend over the
space-time cube.

The spatio-temporal capstone of the hotspot family: hotspot.py's Gi*
says WHICH tiles are hot NOW; this says which tiles are HEATING or
COOLING — the ArcGIS "emerging hot spot" read-out (Esri space-time
cube) built from the textbook Mann-Kendall test (Mann 1945; Kendall
1975) per tile over fixed-width time buckets:

    S_tile = Σ_{i<j} sign(c_j − c_i)          (buckets i < j)
    var(S) = [n(n−1)(2n+5) − Σ_k t_k(t_k−1)(2t_k+5)] / 18
    z = (S − sign(S)) / sqrt(var(S))          (continuity-corrected)

with the tie correction over groups of equal counts (zeros from empty
buckets form a tie group like any other value — the cube densifies
every tile to the GLOBAL bucket range, so each tile's series has the
same length and absences mean zero, not missing).

Exactness: counts, S, and the 18·var numerator are exact bigints
(pair signs and tie-group products are integer arithmetic); z closes
with one IEEE double expression, micro-quantized — hash-gateable (the
morans_i convention). ``trend`` classifies at the two-sided 5% level
(|z| > 1.96), NULL when var = 0 (constant series).

Scale shape: the cube aggregate is ONE map-side-combined exchange on
(x, y, bucket); densification is per-tile sequence/explode over the
global bucket range (a 1-row min/max stat, broadcast — never a
collect); the pair join is per-tile with n = span/width rows a side,
so the pair volume is tiles · n² — n is the TIME axis (tens to
hundreds of buckets by construction; pick width accordingly), never
data-sized, and the join key (x, y) spreads tiles across tasks. Tie
groups fold from the per-tile value histogram — bounded by n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.geo.hotspot import tile_xy
from osm_spark.pipeline.rollup import time_bucket

Z_SCALE = 1_000_000  # micro-units carried by the MK z statistic

__all__ = ["space_time_cube", "emerging_hotspots"]


def space_time_cube(
    points: DataFrame,
    z: int,
    *,
    ts_col: str = "ts",
    width_s: int = 86400,
) -> DataFrame:
    """(x, y, bucket, cnt) DENSE over each occupied tile × the global
    bucket range — the space-time cube. One counting exchange, then a
    per-tile sequence over the broadcast global range."""
    t = tile_xy("lat", "lon", z)
    counts = (
        points.select(
            t.getField("x").alias("x"),
            t.getField("y").alias("y"),
            time_bucket(F.col(ts_col), width_s).alias("bucket"),
        )
        .groupBy("x", "y", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rng = counts.agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    tiles = counts.select("x", "y").distinct()
    grid = tiles.crossJoin(F.broadcast(rng)).select(
        "x", "y", F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("bucket")
    )
    return grid.join(counts.hint("shuffle_hash"), ["x", "y", "bucket"], "left").select(
        "x", "y", "bucket", F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cnt")
    )


def emerging_hotspots(
    points: DataFrame,
    z: int,
    *,
    ts_col: str = "ts",
    width_s: int = 86400,
    crit_micro: int = 1_960_000,
) -> DataFrame:
    """(x, y, n_buckets, s, var18, z_micro, trend) per occupied tile:
    Mann-Kendall over the tile's dense bucket series. trend ∈
    ('heating', 'cooling', NULL) at |z| > crit (default 1.96 micro)."""
    cube = space_time_cube(points, z, ts_col=ts_col, width_s=width_s)

    a = cube.select("x", "y", F.col("bucket").alias("b1"), F.col("cnt").alias("c1"))
    b = cube.select("x", "y", F.col("bucket").alias("b2"), F.col("cnt").alias("c2"))
    pairs = a.join(b.hint("shuffle_hash"), ["x", "y"]).where(
        F.col("b1") < F.col("b2")
    )
    s = pairs.groupBy("x", "y").agg(
        F.sum(F.signum(F.col("c2") - F.col("c1")).cast("long")).alias("s"),
        ((F.count(F.lit(1)) * 2).cast("long")).alias("_n2"),  # n(n-1)
    )
    # tie groups from the per-tile value histogram (bounded by n)
    ties = (
        cube.groupBy("x", "y", "cnt")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).alias("_groups"),
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_sum"),
            F.sum("t").alias("n_buckets"),
        )
    )
    j = s.join(ties.hint("shuffle_hash"), ["x", "y"])
    n = F.col("n_buckets")
    var18 = (n * (n - 1) * (2 * n + 5) - F.col("tie_sum")).alias("var18")
    out = j.select("x", "y", "n_buckets", "s", var18)
    zval = (
        (F.col("s").cast("double") - F.signum(F.col("s")).cast("double"))
        / F.sqrt(F.col("var18").cast("double") / F.lit(18.0))
    )
    z_micro = F.when(
        F.col("var18") > 0,
        F.round(zval * Z_SCALE, 0).cast("long"),
    )
    trend = F.when(
        F.col("var18") > 0,
        F.when(z_micro > F.lit(int(crit_micro)), F.lit("heating")).when(
            z_micro < -F.lit(int(crit_micro)), F.lit("cooling")
        ),
    )
    return out.select(
        "x", "y", "n_buckets", "s", "var18",
        z_micro.alias("z_micro"),
        trend.alias("trend"),
    )
