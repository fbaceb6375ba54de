"""Join-count statistics (Cliff & Ord 1981) — spatial autocorrelation
for CATEGORICAL rasters, completing the autocorrelation family
(`geo/moran.py` handles interval data; Gi*/LISA localize it; this is
the black/white-cell test: "are same-class tiles adjacent more often
than chance?").

For each class c over the occupied-tile universe (any-class tiles),
color tiles B (in c's dissolved surface) / W (occupied, not in c) and
count rook-adjacent joins: BB, BW, WW.  Under free (binomial) sampling
with p = n_B/n, the classic moments give the BB z-score:

    E[BB]   = J·p²
    var[BB] = J·p² + 2K·p³ − (J + 2K)·p⁴

with J = total adjacent pairs and K = Σ_i deg_i·(deg_i−1)/2 (the
incident-pair count) — BOTH pure integer aggregates of the adjacency
structure, shared by every class.  A positive z means c clusters.

Exactness: adjacency, degrees, J, K, BB/BW/WW and n_B are all integer
aggregates (the dissolve module's 4-offset scatter + tile-keyed joins);
E/var/z close in ONE pinned float expression per class, micro-quantized
— the moran/hotspot discipline.  Degenerate variance (p ∈ {0, 1} or a
pairless raster) yields NULL z.

Scale shape: the universe build and the adjacency pair set are the
sparse-raster family's standard scatter + equi-join (work = occupied
tiles × 4, pairs keyed by tile); per-class coloring is a broadcast-free
left join against the class surface keyed on the SAME tile key; J/K are
1-row stats re-broadcast (the engine's stat pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_spark.geo.dissolve import burn_tiles

__all__ = ["join_counts"]


def join_counts(
    polygons: DataFrame, z: int, class_col: Column | str = "landuse"
) -> DataFrame:
    """(cls, n_b, n_total, bb, bw, ww, z_bb_milli) per class — rook
    join counts over the occupied-tile universe with the free-sampling
    BB z-score."""
    cls = F.col(class_col) if isinstance(class_col, str) else class_col
    surface = burn_tiles(polygons.withColumn("cls", cls), z, ["cls"]).distinct()
    univ = surface.select("x", "y").distinct()

    # Rook adjacency among occupied tiles, each unordered pair once:
    # scatter east/south only (dedup-free by construction).
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in ((1, 0), (0, 1))
        ]
    )
    nbr = (
        univ.select("x", "y", F.explode(offs).alias("o"))
        .select(
            "x",
            "y",
            (F.col("x") + F.col("o.dx")).alias("nx"),
            (F.col("y") + F.col("o.dy")).alias("ny"),
        )
        .join(
            univ.select(
                F.col("x").alias("nx"), F.col("y").alias("ny")
            ).hint("shuffle_hash"),
            ["nx", "ny"],
        )
        .select("x", "y", "nx", "ny")
    )

    deg = (
        nbr.select(F.col("x").alias("dx_"), F.col("y").alias("dy_"))
        .unionByName(nbr.select(F.col("nx").alias("dx_"), F.col("ny").alias("dy_")))
        .groupBy("dx_", "dy_")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    stats = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("long").alias("kk"),
    ).crossJoin(nbr.agg(F.count(F.lit(1)).alias("jj"))).crossJoin(
        univ.agg(F.count(F.lit(1)).alias("n_total"))
    )

    classes = surface.select("cls").distinct()
    # color every pair for every class: pair × class via the class
    # surface membership of each endpoint (two tile-keyed left joins)
    sa = surface.select("cls", F.col("x").alias("x"), F.col("y").alias("y"),
                        F.lit(1).alias("in_a"))
    sb = surface.select(F.col("cls").alias("cls_b"), F.col("x").alias("nx"),
                        F.col("y").alias("ny"), F.lit(1).alias("in_b"))
    pc = (
        classes.crossJoin(nbr)
        .join(sa.hint("shuffle_hash"), ["cls", "x", "y"], "left")
        .join(
            sb.withColumnRenamed("cls_b", "cls").hint("shuffle_hash"),
            ["cls", "nx", "ny"],
            "left",
        )
        .select(
            "cls",
            F.coalesce("in_a", F.lit(0)).alias("a"),
            F.coalesce("in_b", F.lit(0)).alias("b"),
        )
    )
    counts = pc.groupBy("cls").agg(
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0))
        .cast("long").alias("bb"),
        F.sum(F.when(F.col("a") != F.col("b"), 1).otherwise(0))
        .cast("long").alias("bw"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 0), 1).otherwise(0))
        .cast("long").alias("ww"),
    )
    nb = surface.groupBy("cls").agg(F.count(F.lit(1)).alias("n_b"))

    j = counts.join(F.broadcast(nb), "cls").crossJoin(F.broadcast(stats))
    p = F.col("n_b").cast("double") / F.col("n_total").cast("double")
    jjd = F.col("jj").cast("double")
    kkd = F.col("kk").cast("double")
    e_bb = jjd * p * p
    var_bb = jjd * p * p + 2.0 * kkd * p * p * p - (jjd + 2.0 * kkd) * (
        p * p * p * p
    )
    z_bb = F.when(
        var_bb > 0,
        F.round((F.col("bb").cast("double") - e_bb) / F.sqrt(var_bb) * 1000.0, 0)
        .cast("long"),
    )
    return j.select(
        "cls", "n_b", "n_total", "bb", "bw", "ww", z_bb.alias("z_bb_milli")
    )
