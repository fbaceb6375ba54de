"""Grid-partitioned kNN join: nearest OSM amenity nodes per page.

Candidate generation joins page cells against node cells expanded by a
k-ring (the hex ``grid_disk``), so the pages side streams through a hash
join keyed by cell instead of a cross join. Guarantee check: a page's kth
candidate is final only when its distance is smaller than the minimum
possible distance to any node *outside* the searched disk; pages that fail
escalate to a wider ring, and the (rare) stragglers fall back to a
broadcast scan of the full node table — which in this engine is always a
small dim (SURVEY.md §2.10).

Distance is haversine, computed as pure Column math (codegen); ties break
on node id so output is deterministic (SURVEY.md §7 "ordering ties").
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from osm_spark.geo.hexgrid import edge_deg, hex_cell_udf, hex_disk_udf

EARTH_RADIUS_M = 6371000.0
DEG_M = 111320.0  # meters per degree of latitude


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters (pure Column math)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2.0
    dlon = F.radians(lon2 - lon1) / 2.0
    a = F.sin(dlat) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) ** 2
    return 2.0 * EARTH_RADIUS_M * F.asin(F.sqrt(a))


def haversine_m_py(lat1, lon1, lat2, lon2):
    """numpy oracle using the same formula/operation order."""
    import numpy as np

    rlat1, rlat2 = np.radians(lat1), np.radians(lat2)
    dlat = np.radians(lat2 - lat1) / 2.0
    dlon = np.radians(lon2 - lon1) / 2.0
    a = np.sin(dlat) ** 2 + np.cos(rlat1) * np.cos(rlat2) * np.sin(dlon) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


def _guarantee_radius_m(ring: int, res: int, lat: Column) -> Column:
    """Lower bound (meters) on distance to any node outside the ring disk.

    A node at grid distance ≥ ring+1 has center ≥ (ring+1)·(3/2)·edge away
    in degree space; subtracting two circumradii (one per endpoint) bounds
    point-to-point distance. Longitude degrees shrink by cos(lat), so the
    conservative meter bound scales by cos(lat).
    """
    a = edge_deg(res)
    deg = max((ring + 1) * 1.5 * a - 2.0 * a, 0.0)
    return F.lit(deg * DEG_M) * F.cos(F.radians(lat))


def _rank_topk(cand: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("url").orderBy(F.col("dist_m").asc(), F.col("node_id").asc())
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def knn_join(
    points: DataFrame,
    nodes: DataFrame,
    k: int = 3,
    res: int = 7,
    rings: tuple[int, ...] = (1, 4),
) -> DataFrame:
    """(url, node_id, dist_m, rank) — k nearest nodes per page point.

    ``points``: url, lat, lon. ``nodes``: id, lat, lon (small dim,
    broadcast). ``res`` is the search-grid resolution (coarser than the
    index res; res 7 ≈ 1.2 km edge).
    """
    n = (
        nodes.select(
            F.col("id").alias("node_id"),
            F.col("lat").alias("nlat"),
            F.col("lon").alias("nlon"),
        )
        .withColumn("ncell", hex_cell_udf(res)("nlat", "nlon"))
    )
    pts = points.select("url", "lat", "lon").withColumn(
        "pcell", hex_cell_udf(res)("lat", "lon")
    )

    remaining = pts
    results = []
    for ring in rings:
        cells = hex_disk_udf(res, ring)("pcell")
        cand = (
            remaining.withColumn("scell", F.explode(cells))
            .join(F.broadcast(n), F.col("scell") == n["ncell"], "inner")
            .select(
                "url",
                "lat",
                "lon",
                "pcell",
                "node_id",
                haversine_m(F.col("lat"), F.col("lon"), F.col("nlat"), F.col("nlon")).alias(
                    "dist_m"
                ),
            )
        )
        topk = _rank_topk(cand, k)
        guarantee = _guarantee_radius_m(ring, res, F.col("lat"))
        per_url = topk.groupBy("url").agg(
            F.count("*").alias("n_cand"), F.max("dist_m").alias("kth")
        )
        resolved_urls = (
            topk.join(per_url, "url")
            .filter((F.col("n_cand") >= k) & (F.col("kth") <= guarantee))
            .select("url", "node_id", "dist_m", "rank")
        )
        results.append(resolved_urls)
        remaining = remaining.join(
            resolved_urls.select("url").distinct(), "url", "left_anti"
        )

    # Fallback: exhaustive broadcast scan for stragglers (empty regions).
    fb_cand = remaining.crossJoin(F.broadcast(n.select("node_id", "nlat", "nlon"))).select(
        "url",
        "node_id",
        haversine_m(F.col("lat"), F.col("lon"), F.col("nlat"), F.col("nlon")).alias("dist_m"),
    )
    results.append(_rank_topk(fb_cand, k).select("url", "node_id", "dist_m", "rank"))

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
