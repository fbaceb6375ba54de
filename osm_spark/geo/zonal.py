"""Zonal statistics beyond counts: per-polygon centroid and bounding box
of the contained points — "where inside the region do its pages
actually sit" (service placement, label anchoring, region drift
monitoring vs the geometric centroid).

Composes the salted PIP join (the engine's containment primitive) with
integer-exact position aggregation: coordinates quantize to e7
(~1.1 cm — the `geo/ellipse.py` precedent) BEFORE any sum, so the sums
are order-independent bigints (|Σ| ≤ n·1.8e9 — inside long for any
per-region membership below ~5·10^9 points; the planetary form promotes
to decimal(38,0), the trend-surface discipline) and only the closing
mean divisions are float.  Min/max bbox corners are pure integer
selections.

Scale shape: inherits the PIP join's ladder (broadcast / adaptive /
salted); the position attach is a url-keyed shuffle-hash join of the
pair table against the already-scanned point projection; the zonal
aggregate is ONE map-side-combined exchange keyed by way_id.  Zero-hit
zones survive through the polygon-dim left join (the zonal_counts
convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["zonal_centroid"]


def zonal_centroid(
    pairs: DataFrame,
    points: DataFrame,
    polygons: DataFrame,
) -> DataFrame:
    """(way_id, n_points, clat_e7, clon_e7, min_lat_e7, max_lat_e7,
    min_lon_e7, max_lon_e7) per polygon.

    ``pairs``: (url, way_id) PIP pairs; ``points``: (url, lat, lon);
    ``polygons``: the dim carrying way_id (zero-hit zones keep NULL
    stats and n_points = 0).
    """
    pos = points.select(
        "url",
        F.round(F.col("lat") * 1e7, 0).cast("long").alias("lat_e7"),
        F.round(F.col("lon") * 1e7, 0).cast("long").alias("lon_e7"),
    )
    j = pairs.join(pos.hint("shuffle_hash"), "url")
    agg = j.groupBy("way_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("lat_e7").alias("_sla"),
        F.sum("lon_e7").alias("_slo"),
        F.min("lat_e7").alias("min_lat_e7"),
        F.max("lat_e7").alias("max_lat_e7"),
        F.min("lon_e7").alias("min_lon_e7"),
        F.max("lon_e7").alias("max_lon_e7"),
    )
    mean = lambda s: F.round(  # noqa: E731
        F.col(s).cast("double") / F.col("n_points").cast("double"), 0
    ).cast("long")
    stats = agg.select(
        "way_id",
        "n_points",
        mean("_sla").alias("clat_e7"),
        mean("_slo").alias("clon_e7"),
        "min_lat_e7",
        "max_lat_e7",
        "min_lon_e7",
        "max_lon_e7",
    )
    return (
        polygons.select("way_id")
        .join(stats, "way_id", "left")
        .select(
            "way_id",
            F.coalesce("n_points", F.lit(0).cast("long")).alias("n_points"),
            "clat_e7",
            "clon_e7",
            "min_lat_e7",
            "max_lat_e7",
            "min_lon_e7",
            "max_lon_e7",
        )
    )
