"""Reverse geocoding: assign each point the SMALLEST containing polygon.

A point inside nested admin/landuse polygons (park ⊂ district ⊂ city)
matches them all in a plain PIP join; the reverse-geocode answer users
want is the most specific one — standard smallest-enclosing-area
semantics. Reference analog: the way polygons this ranks are the
assembled `lib/osm/way.rb` rings (SURVEY.md §1.4); the pick itself is
Spark-first composition.

Plan shape: ``pip_join`` (auto broadcast/salted — the 10^12-point side
never shuffles on the broadcast path) produces (url, way_id) pairs;
``way_geometry_stats`` computes each polygon's area once over the
polygon DIM (zero-shuffle codegen folds); areas broadcast back onto the
pairs; the per-point argmin runs as one partial-aggregated ``min(struct
(area_m2, way_id, ...))`` — a map-side-combined shuffle of one row per
point per partition, never a window over the pair list.

Determinism: area arithmetic is IEEE-identical across engines (the
``way_geometry`` oracle replays the same fold), and ties on equal area
break by way_id via the struct ordering, so the picked polygon is
value-hash exact even though no float rides the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.geo.measure import way_geometry_stats
from osm_spark.pipeline.spatial_join import (
    BROADCAST_MAX_CELLS,
    attach_polygon_dim,
    estimate_covering_cells,
    pip_join,
)


def reverse_geocode(
    points: DataFrame,
    polygons: DataFrame,
    way_cells: DataFrame | None = None,
    strategy: str = "auto",
    budget: int = 4096,
) -> DataFrame:
    """(url, way_id) — the smallest-area polygon covering each point;
    points covered by no polygon are absent (semantics of a geocoder
    miss). ``strategy`` is resolved ONCE here (same estimate ladder as
    ``pip_join``'s auto) and governs both the PIP prejoin and the area
    attach: the area dim is one row per polygon, so when the polygon
    side outgrew the broadcast ceiling the areas hash-join on way_id
    instead of broadcasting (10^8 ways × 16 B is past any sane
    broadcast — the same reasoning as the vertex dim), two-side-salted
    by the same way-level factors (BENCH.md finding #15).

    With no ``way_cells``, auto climbs ``pip_join``'s ladder: flat
    broadcast → adaptive mixed-res broadcast (the area dim has ≤ one
    row per covering row, so it broadcasts whenever the adaptive
    covering does) → adaptive salted (the area attach inherits the
    multi-level way salts)."""
    from osm_spark.pipeline.spatial_join import (
        _adaptive_candidates,
        _refine_pip_expr,
    )

    areas = way_geometry_stats(polygons).select("way_id", "area_m2")
    vx = polygons.select("way_id", "vlat", "vlon")
    if way_cells is None and strategy == "auto":
        from osm_spark.pipeline.geometry import build_way_cells_adaptive

        if estimate_covering_cells(polygons) > BROADCAST_MAX_CELLS:
            index = build_way_cells_adaptive(polygons, budget=budget)
            fits = (
                estimate_covering_cells(polygons, cap=budget)
                <= BROADCAST_MAX_CELLS
            )
            cand, way_salts = _adaptive_candidates(
                points, index, "broadcast" if fits else "salted", None
            )
            if way_salts is None:
                cand = attach_polygon_dim(cand, vx, "way_id", "broadcast")
                pairs = _refine_pip_expr(cand)
                scored = attach_polygon_dim(pairs, areas, "way_id", "broadcast")
            else:
                cand = attach_polygon_dim(
                    cand, vx, "way_id", "shuffle", way_salts=way_salts
                )
                pairs = _refine_pip_expr(cand)
                scored = attach_polygon_dim(
                    pairs, areas, "way_id", "shuffle", way_salts=way_salts
                )
            return _pick_smallest(scored)
        strategy = "broadcast"
    if strategy == "auto":
        strategy = (
            "broadcast"
            if estimate_covering_cells(polygons) <= BROADCAST_MAX_CELLS
            else "salted"
        )
    pairs = pip_join(points, polygons, way_cells, strategy=strategy)
    if strategy == "broadcast":
        scored = attach_polygon_dim(pairs, areas, "way_id", "broadcast")
    else:
        # shuffle attach, two-side-salted: a hot cell's point mass lands
        # on its containing polygons' ids, so the area join inherits the
        # same way-level split factors the vertex attach uses
        from osm_spark.pipeline.geometry import build_way_cells
        from osm_spark.pipeline.spatial_join import salt_plan, way_salt_plan

        if way_cells is None:
            way_cells = build_way_cells(polygons)
        scored = attach_polygon_dim(
            pairs,
            areas,
            "way_id",
            "shuffle",
            way_salts=way_salt_plan(way_cells, salt_plan(points)),
        )
    return _pick_smallest(scored)


def _pick_smallest(scored: DataFrame) -> DataFrame:
    best = scored.groupBy("url").agg(
        F.min(F.struct("area_m2", "way_id")).alias("best")
    )
    return best.select("url", F.col("best.way_id").alias("way_id"))
