"""Attribute dissolve over the tile raster: the GIS "dissolve by class"
(merge all landuse=park polygons into one park surface) computed as a
rasterized union with boundary extraction.

Exact vector dissolve needs polygon union — a global sweep no engine
distributes well.  The raster form is the Spark-native shape: burn each
polygon onto zoom-``z`` tiles (center-in-polygon), union per class with
ONE distinct, and mark boundary cells by 4-neighbourhood presence — the
standard polygon→raster→region pipeline, converging to the vector
dissolve as z grows.

Geometry runs in MERCATOR TILE SPACE, not lat/lon: tile centers are
(x+0.5, y+0.5) — EXACT doubles — so the only transcendental work is the
forward Mercator transform of the polygon vertices (the same spelling
every gated tile operator uses), and the even-odd ray cast compares
exact centers against once-transformed vertex coordinates.  The cast
itself mirrors the engine's PIP refine arithmetic (spatial_join.py) with
the identical division guard, so a DuckDB replay is bit-faithful.

Scale design:

- Per-way fanout is its bbox tile count at z — the polygon's own area,
  independent of corpus size (the adaptive-covering ladder's budget
  argument applies: drop z, not coverage, for continent-sized ways).
- The burn is explode + pure Column math (no UDF); the union is one
  map-side-combined distinct keyed by (class, x, y); the boundary pass
  is a 4-offset scatter + self equi-join on the SAME key — the sparse
  raster family's standard two-shuffle shape (`geo/focal.py`).
- Hot classes (a class owning most tiles) skew the distinct/join keys;
  both are (class, x, y)-keyed so the cell component spreads them —
  AQE backstop, `pipeline/salting` applicable unchanged.

Reference parity: way tag maps ARE the reference's Osm::Way semantics
(robertgauld/osm lib/osm/way.rb); dissolve-by-tag is the canonical
downstream consumer.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_spark.geo.tiles import MAX_MERCATOR_LAT

__all__ = ["dissolve_raster", "burn_tiles", "buffer_raster", "class_overlap"]


def _fy(la: Column, n: float) -> Column:
    la = F.greatest(F.least(la, F.lit(MAX_MERCATOR_LAT)), F.lit(-MAX_MERCATOR_LAT))
    return (1.0 - F.asinh(F.tan(F.radians(la))) / math.pi) / 2.0 * n


def burn_tiles(polygons: DataFrame, z: int, keep_cols: list[str]) -> DataFrame:
    """(``keep_cols``…, x, y) — zoom-``z`` tiles whose center lies inside
    the ring (even-odd rule). ``polygons``: (vlat, vlon) vertex arrays
    plus any carry-through columns."""
    n = float(1 << z)
    nmax = (1 << z) - 1

    fx = F.transform(F.col("vlon"), lambda lo: (lo + 180.0) / 360.0 * F.lit(n))
    fy = F.transform(F.col("vlat"), lambda la: _fy(la, n))
    clamp = lambda c: F.least(F.greatest(c, F.lit(0)), F.lit(nmax))  # noqa: E731
    p = polygons.select(
        *keep_cols,
        fx.alias("fx"),
        fy.alias("fy"),
    ).select(
        *keep_cols,
        "fx",
        "fy",
        F.size("fx").alias("nv"),
        clamp(F.floor(F.array_min("fx")).cast("long")).alias("x0"),
        clamp(F.floor(F.array_max("fx")).cast("long")).alias("x1"),
        clamp(F.floor(F.array_min("fy")).cast("long")).alias("y0"),
        clamp(F.floor(F.array_max("fy")).cast("long")).alias("y1"),
    )

    tiles = p.select(
        *keep_cols,
        "fx",
        "fy",
        "nv",
        F.explode(F.sequence("x0", "x1")).alias("x"),
        "y0",
        "y1",
    ).select(
        *keep_cols,
        "fx",
        "fy",
        "nv",
        "x",
        F.explode(F.sequence("y0", "y1")).alias("y"),
    )

    cx = F.col("x").cast("double") + 0.5
    cy = F.col("y").cast("double") + 0.5

    def crossing(acc: Column, i: Column) -> Column:
        ax = F.element_at("fx", (i + 1).cast("int"))
        ay = F.element_at("fy", (i + 1).cast("int"))
        bx = F.element_at("fx", ((i + 1) % F.col("nv") + 1).cast("int"))
        by = F.element_at("fy", ((i + 1) % F.col("nv") + 1).cast("int"))
        abx, aby, apy = bx - ax, by - ay, cy - ay
        crossed = ((ay > cy) != (by > cy)) & (
            cx < abx * apy / F.when(aby == 0, F.lit(1.0)).otherwise(aby) + ax
        )
        return acc + F.when(crossed, F.lit(1)).otherwise(F.lit(0))

    parity = F.aggregate(
        F.sequence(F.lit(0), F.col("nv") - 1), F.lit(0), crossing
    )
    return tiles.where(parity % 2 == 1).select(*keep_cols, "x", "y")


def dissolve_raster(
    polygons: DataFrame, z: int, class_col: Column | str = "landuse"
) -> DataFrame:
    """(cls, x, y, boundary) — per-class union of polygon rasters with
    4-neighbourhood boundary flags.

    ``class_col``: the dissolve key (a column name or expression over the
    polygon rows, e.g. ``F.col("tags")["landuse"]``).  ``boundary`` is
    true where any 4-neighbour tile is outside the class surface —
    including the raster's clamp edges (a surface truncated by the
    address space IS cut there).
    """
    cls = F.col(class_col) if isinstance(class_col, str) else class_col
    burned = burn_tiles(polygons.withColumn("cls", cls), z, ["cls"])
    surface = burned.distinct()

    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in ((-1, 0), (1, 0), (0, -1), (0, 1))
        ]
    )
    scattered = surface.select("cls", "x", "y", F.explode(offs).alias("o")).select(
        "cls",
        "x",
        "y",
        (F.col("x") + F.col("o.dx")).alias("nx"),
        (F.col("y") + F.col("o.dy")).alias("ny"),
    )
    present = surface.select(
        F.col("cls").alias("cls2"), F.col("x").alias("nx"), F.col("y").alias("ny")
    )
    nbr = (
        scattered.join(
            present.hint("shuffle_hash"),
            (F.col("cls") == F.col("cls2"))
            & (scattered["nx"] == present["nx"])
            & (scattered["ny"] == present["ny"]),
            "left",
        )
        .groupBy("cls", "x", "y")
        .agg(F.sum(F.when(F.col("cls2").isNotNull(), 1).otherwise(0)).alias("n_in"))
    )
    return nbr.select("cls", "x", "y", (F.col("n_in") < 4).alias("boundary"))


def buffer_raster(
    polygons: DataFrame,
    z: int,
    radius_tiles: int,
    class_col: Column | str = "landuse",
) -> DataFrame:
    """(cls, x, y, in_core) — the GIS buffer: per-class dissolved surface
    dilated by a Euclidean tile disk of ``radius_tiles`` (center-to-center
    dx²+dy² ≤ r², integer arithmetic).  ``in_core`` marks cells of the
    original surface; false rows are the buffer ring ("within r tiles of
    any <class> area").

    Morphological dilation over the sparse raster: scatter each surface
    cell over its (2r+1)²-bounded disk footprint (closed-form offsets, no
    UDF), ONE distinct on (class, x, y) — the same two-shuffle shape as
    the dissolve's boundary pass, with work |surface| × |disk| and the
    address-space clamp applied at the edges.  Erosion is the boundary
    complement (``dissolve_raster``'s boundary=false cells); opening and
    closing compose the two.
    """
    if radius_tiles < 1:
        raise ValueError(f"radius_tiles must be >= 1, got {radius_tiles}")
    cls = F.col(class_col) if isinstance(class_col, str) else class_col
    surface = burn_tiles(polygons.withColumn("cls", cls), z, ["cls"]).distinct()
    nmax = (1 << z) - 1

    r2 = radius_tiles * radius_tiles
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in range(-radius_tiles, radius_tiles + 1)
            for dy in range(-radius_tiles, radius_tiles + 1)
            if dx * dx + dy * dy <= r2
        ]
    )
    dilated = (
        surface.select("cls", "x", "y", F.explode(offs).alias("o"))
        .select(
            "cls",
            (F.col("x") + F.col("o.dx")).alias("x"),
            (F.col("y") + F.col("o.dy")).alias("y"),
        )
        .where(
            (F.col("x") >= 0) & (F.col("x") <= nmax)
            & (F.col("y") >= 0) & (F.col("y") <= nmax)
        )
        .distinct()
    )
    core = surface.select(
        F.col("cls").alias("c2"), F.col("x").alias("x2"), F.col("y").alias("y2"),
        F.lit(True).alias("in_core"),
    )
    return (
        dilated.join(
            core.hint("shuffle_hash"),
            (F.col("cls") == F.col("c2"))
            & (F.col("x") == F.col("x2")) & (F.col("y") == F.col("y2")),
            "left",
        )
        .select("cls", "x", "y", F.coalesce("in_core", F.lit(False)).alias("in_core"))
    )


def class_overlap(
    polygons: DataFrame, z: int, class_col: Column | str = "landuse"
) -> DataFrame:
    """(cls_a, cls_b, n_a, n_b, n_shared, jaccard_micro) — the pairwise
    surface-overlap matrix between dissolve classes (cls_a < cls_b):
    how much of the residential raster is also commercial, etc. — the
    class-level companion of `geo/overlay.py`'s polygon-pair overlay.

    Shape: the per-class surface (one distinct), a self equi-join ON THE
    TILE KEY ONLY (work = Σ per-tile class-count², bounded by the class
    cardinality, not the raster), and per-class totals re-attached by a
    broadcast of the class-count dim.  Jaccard closes as one rounded
    division over exact integer counts.
    """
    cls = F.col(class_col) if isinstance(class_col, str) else class_col
    surface = burn_tiles(polygons.withColumn("cls", cls), z, ["cls"]).distinct()

    totals = surface.groupBy("cls").agg(F.count(F.lit(1)).alias("n"))
    a = surface.select(F.col("cls").alias("cls_a"), "x", "y")
    b = surface.select(F.col("cls").alias("cls_b"), "x", "y")
    shared = (
        a.join(b.hint("shuffle_hash"), ["x", "y"])
        .where(F.col("cls_a") < F.col("cls_b"))
        .groupBy("cls_a", "cls_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    ta = totals.select(F.col("cls").alias("cls_a"), F.col("n").alias("n_a"))
    tb = totals.select(F.col("cls").alias("cls_b"), F.col("n").alias("n_b"))
    j = (
        shared.join(F.broadcast(ta), "cls_a").join(F.broadcast(tb), "cls_b")
    )
    union = F.col("n_a") + F.col("n_b") - F.col("n_shared")
    return j.select(
        "cls_a",
        "cls_b",
        "n_a",
        "n_b",
        "n_shared",
        F.round(F.col("n_shared").cast("double") / union.cast("double") * 1e6, 0)
        .cast("long")
        .alias("jaccard_micro"),
    )
