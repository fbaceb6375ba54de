"""Voronoi (nearest-facility) partition of the slippy-tile raster.

The service-area operator of the raster family: every occupied zoom-z
tile is assigned to its nearest seed facility (OSM amenity node), giving
the discrete Voronoi diagram / catchment map that drives "which branch
serves this block" analyses.  The raster discretisation is what makes
the distributed form clean — the exact polygon Voronoi diagram needs a
global sweep, while the tile form is an embarrassingly parallel argmin
per tile, converging to the true diagram as z grows.

Geometry: distances are measured in the Mercator grid metric (sub-cell
integer units from `tile_pixel`, tile centers at half-tile offsets) —
the raster family's native metric (`geo/kde.py`, `geo/focal.py`), NOT
haversine; `geo/knn.py` is the haversine point-to-point engine and
`knn_join(k=1)` on tile centers is the planetary-scale route for seed
sets too large to broadcast.  Integer squared distances + the
(d2, seed_id) struct-min tie-break make the assignment value-hash exact
with no float caveats.

Scale design: seeds (facilities) are a classic small dim — broadcast
nested-loop against the distinct-tile table, argmin as ONE map-side
combined struct-min aggregate keyed by tile (no window, no shuffle of
the seed side).  Work is |occupied tiles| × |seeds|; the distinct-tile
pre-aggregate caps the left side at the occupied address space
regardless of point volume.

Reference parity: nodes-with-amenity-tags are the reference's
Osm::Node tag queries (robertgauld/osm lib/osm/node.rb); the catchment
assignment is the engine-side spatial generalisation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.geo.tiles import tile_pixel

__all__ = ["voronoi_regions"]


def voronoi_regions(
    points: DataFrame,
    seeds: DataFrame,
    z: int,
    tile_size: int = 256,
    id_col: str = "id",
) -> DataFrame:
    """(z, x, y, seed_id, d2) — nearest seed per occupied tile.

    ``points(lat, lon)`` defines the occupied-tile universe;
    ``seeds(id, lat, lon)`` the facilities.  ``d2`` is the integer
    squared Mercator-grid distance (sub-cell units) from the tile center
    to the seed; ties break on the smaller seed id.
    """
    t = tile_pixel("lat", "lon", z, tile_size)
    tiles = (
        points.select(t.alias("t"))
        .select(F.col("t.x").alias("x"), F.col("t.y").alias("y"))
        .distinct()
    )
    s = seeds.select(
        F.col(id_col).alias("seed_id"),
        tile_pixel("lat", "lon", z, tile_size).alias("st"),
    ).select(
        "seed_id",
        (F.col("st.x") * tile_size + F.col("st.px")).cast("long").alias("sqx"),
        (F.col("st.y") * tile_size + F.col("st.py")).cast("long").alias("sqy"),
    )

    half = tile_size // 2
    ddx = (F.col("x") * tile_size + half) - F.col("sqx")
    ddy = (F.col("y") * tile_size + half) - F.col("sqy")
    d2 = (ddx * ddx + ddy * ddy).alias("d2")

    pick = F.min(F.struct(F.col("d2"), F.col("seed_id"))).alias("_m")
    return (
        tiles.join(F.broadcast(s))
        .select("x", "y", "seed_id", d2)
        .groupBy("x", "y")
        .agg(pick)
        .select(
            F.lit(z).alias("z"),
            "x",
            "y",
            F.col("_m.seed_id").alias("seed_id"),
            F.col("_m.d2").alias("d2"),
        )
    )
