"""Grid-partitioned kNN join: nearest OSM amenity nodes per page.

Two-phase plan (filter-and-refine, cell-level prune):

1. **Cell pre-pass** — over the *occupied cells* (distinct point cells —
   orders of magnitude fewer rows than points): rank nodes by distance
   from each cell center, take the kth distance, and keep exactly the
   nodes within ``kth_center + 2·circumradius``. Triangle inequality
   (haversine is a metric): for any point p in cell c,
   ``kth(p) ≤ kth(center) + circum``, so every node that can be in p's
   top-k lies within ``kth(center) + 2·circum`` of the center — the kept
   set is a *provably sufficient* candidate set for every point in the
   cell. Typical size ≈ k+ε instead of "all nodes in a fixed ring".
2. **Point refine** — points equi-join the per-cell candidate sets on
   cell id (broadcast — the set is ≤ nodes × occupied-cells fanout),
   exact haversine, ``row_number`` top-k per url. The window input is
   ≈ (k+ε)·|points| rows, data-driven rather than ring-guess-driven.

This replaces a fixed-ring escalation loop: the search radius adapts to
local node density per cell (dense city cells get tight radii, sparse
rural cells wide ones) with zero stragglers and no fallback scan. At
planet scale phase 1 is itself a distributed job over (cells × nearby
nodes); phase 2 — the only stage that touches the 10^12-row side — stays
one broadcast hash join + one shuffle on url.

Distance is haversine, computed as pure Column math (codegen); ties break
on node id so output is deterministic (SURVEY.md §7 "ordering ties").
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from osm_spark.geo.hexgrid import edge_deg, hex_cell_expr, hex_center_expr

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


def circum_m(res: int) -> float:
    """Upper bound (meters) on the distance from any point in a cell to
    its center: circumradius = edge (degree space); a degree-space
    displacement of d° is ≤ d·111320 m in any direction (longitude
    degrees are shorter by cos(lat)). 5% slack absorbs the
    haversine-vs-planar difference at cell scale."""
    return edge_deg(res) * DEG_M * 1.05


def _rank_topk(cand: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("url").orderBy(F.col("dist_m").asc(), F.col("node_id").asc())
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cell_candidates(
    pts: DataFrame, n: DataFrame, k: int, res: int
) -> DataFrame:
    """Phase 1: sufficient candidate node set per occupied cell.

    (pcell, node_id, nlat, nlon) where node is within
    ``kth_center + 2·circum`` of the cell center — provably a superset of
    every in-cell point's true top-k (see module docstring). Cost is
    |occupied cells| × |nearby nodes|, independent of the point count.
    """
    cells = pts.select("pcell").distinct().withColumn(
        "ctr", hex_center_expr("pcell", res)
    )
    # Small-dim node table → broadcast cross; at planet scale substitute a
    # ring-join here (cells × nodes-in-disk) — phase 2 is unchanged.
    cand = cells.crossJoin(F.broadcast(n)).select(
        "pcell",
        "node_id",
        "nlat",
        "nlon",
        haversine_m(
            F.col("ctr.lat"), F.col("ctr.lon"), F.col("nlat"), F.col("nlon")
        ).alias("dist_c"),
    )
    w_cell = Window.partitionBy("pcell").orderBy(
        F.col("dist_c").asc(), F.col("node_id").asc()
    )
    ranked = cand.withColumn("rn", F.row_number().over(w_cell)).withColumn(
        # kth center distance (or the farthest node when < k exist)
        "kth_c",
        F.max(F.when(F.col("rn") <= k, F.col("dist_c"))).over(
            Window.partitionBy("pcell")
        ),
    )
    return ranked.filter(
        F.col("dist_c") <= F.col("kth_c") + F.lit(2.0 * circum_m(res))
    ).select("pcell", "node_id", "nlat", "nlon")


def knn_join(
    points: DataFrame,
    nodes: DataFrame,
    k: int = 3,
    res: int = 8,
) -> DataFrame:
    """(url, node_id, dist_m, rank) — k nearest nodes per page point.

    ``points``: url, lat, lon. ``nodes``: id, lat, lon (small dim,
    broadcast). ``res`` is the prune-grid resolution; correctness does
    not depend on it, only candidate fanout (finer res → tighter prune
    radius → fewer candidates, more cells in phase 1).

    Phase 2 is shuffle-free on the big side: the per-cell candidate set
    arrives as an ARRAY via broadcast join, the top-k is
    transform → array_sort → slice → posexplode — narrow Column ops in
    one codegen stage. Struct sort order (dist_m, node_id) is exactly the
    deterministic tie-break.
    """
    n = nodes.select(
        F.col("id").alias("node_id"),
        F.col("lat").alias("nlat"),
        F.col("lon").alias("nlon"),
    )
    # pts is read twice (phase 1 cells, phase 2 probe) — recomputing the
    # upstream UDF stage is cheaper than a DataFrame cache at high local
    # thread counts (block-store write contention, measured 10×).
    pts = points.select("url", "lat", "lon").withColumn(
        "pcell", hex_cell_expr("lat", "lon", res)
    )

    cand_sets = (
        cell_candidates(pts, n, k, res)
        .groupBy("pcell")
        .agg(
            F.collect_list(F.struct("node_id", "nlat", "nlon")).alias("cands")
        )
        .persist()
    )
    scored = pts.join(F.broadcast(cand_sets), "pcell").withColumn(
        "topk",
        F.slice(
            F.array_sort(
                F.transform(
                    F.col("cands"),
                    lambda c: F.struct(
                        haversine_m(
                            F.col("lat"), F.col("lon"), c["nlat"], c["nlon"]
                        ).alias("dist_m"),
                        c["node_id"].alias("node_id"),
                    ),
                )
            ),
            1,
            k,
        ),
    )
    return scored.select(
        "url", F.posexplode(F.col("topk")).alias("pos", "c")
    ).select(
        "url",
        F.col("c.node_id").alias("node_id"),
        F.col("c.dist_m").alias("dist_m"),
        (F.col("pos") + 1).alias("rank"),
    )
