"""Mixed-resolution (adaptive) covering index: per-polygon size bounded,
join results identical to the flat fine-res covering on both strategies.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_spark.pipeline.geometry import (
    build_way_cells,
    build_way_cells_adaptive,
    synth_polygons,
)
from osm_spark.pipeline.pages import synth_pages
from osm_spark.pipeline.spatial_join import (
    covering_levels,
    extract_points,
    pip_join_adaptive,
    pip_join_broadcast,
)


def _big_polygon(spark):
    # 0.5°-wide square around London: ~10^5 res-9 bbox cells, far past a
    # small budget — the adaptive builder must coarsen it.
    return spark.createDataFrame(
        [(77777, [51.3, 51.3, 51.8, 51.8], [-0.4, 0.1, 0.1, -0.4])],
        "way_id long, vlat array<double>, vlon array<double>",
    )


def test_adaptive_covering_respects_budget_and_coarsens(spark):
    rows = build_way_cells_adaptive(_big_polygon(spark), budget=256).collect()
    levels = {r.cell >> 58 for r in rows}
    assert levels and max(levels) < 9  # coarsened below fine_res
    # bbox-grid estimate bounds the polyfill output
    assert 0 < len(rows) <= 256


def test_adaptive_join_equals_flat_both_strategies(spark, sf_small_dir):
    pts = extract_points(synth_pages(spark, sf_small_dir)).cache()
    polys = (
        synth_polygons(spark)
        .select("way_id", "vlat", "vlon")
        .unionByName(_big_polygon(spark))
    )
    flat = build_way_cells(polys).cache()
    adaptive = build_way_cells_adaptive(polys, budget=256).cache()
    # the big polygon shrinks the index: adaptive strictly smaller
    assert adaptive.count() < flat.count()
    assert len(covering_levels(adaptive)) >= 2  # genuinely mixed-res

    want = {(r.url, r.way_id) for r in pip_join_broadcast(pts, polys, flat).collect()}
    got_b = {
        (r.url, r.way_id)
        for r in pip_join_adaptive(pts, polys, adaptive, "broadcast").collect()
    }
    got_s = {
        (r.url, r.way_id)
        for r in pip_join_adaptive(pts, polys, adaptive, "salted").collect()
    }
    assert got_b == want
    assert got_s == want
    # the coarsened polygon really participates (London pages fall inside)
    assert any(w == 77777 for _, w in want)


def test_adaptive_multipolygon_equals_flat(spark, sf_small_dir):
    """Mixed-res ring covering: a big outer ring coarsens, its small
    hole stays fine — the multipolygon join must return the identical
    relation pick set as the flat res-9 covering."""
    from osm_spark.pipeline.spatial_join import pip_join_multipolygon

    # outer = the 0.5° London square; hole = a small square inside it
    rings = spark.createDataFrame(
        [
            (600, "outer", 8001, [51.3, 51.3, 51.8, 51.8], [-0.4, 0.1, 0.1, -0.4]),
            (600, "inner", 8002, [51.49, 51.49, 51.51, 51.51],
             [-0.15, -0.12, -0.12, -0.15]),
        ],
        "relation_id long, role string, way_id long, "
        "vlat array<double>, vlon array<double>",
    )
    pts = extract_points(synth_pages(spark, sf_small_dir)).cache()
    ring_geo = rings.select("way_id", "vlat", "vlon")
    flat = build_way_cells(ring_geo).cache()
    adaptive = build_way_cells_adaptive(ring_geo, budget=256).cache()
    assert adaptive.count() < flat.count()
    levels = covering_levels(adaptive)
    assert len(levels) == 2  # outer coarsened, hole fine

    want = {
        (r.url, r.relation_id)
        for r in pip_join_multipolygon(pts, rings, flat, "broadcast").collect()
    }
    for strat in ("broadcast", "salted"):
        got = {
            (r.url, r.relation_id)
            for r in pip_join_multipolygon(
                pts, rings, adaptive, strat, levels=levels
            ).collect()
        }
        assert got == want, strat
    assert len(want) > 0  # London pages inside the ring (minus the hole)


def test_pip_join_auto_upgrades_to_adaptive_broadcast(spark, sf_small_dir, monkeypatch):
    """When the flat covering estimate exceeds the broadcast ceiling but
    the budget-capped one fits, pip_join's auto ladder must take the
    adaptive-broadcast rung (zero point shuffle) instead of falling to
    the salted shuffle — and return the identical pair set."""
    import osm_spark.pipeline.spatial_join as sj

    pts = extract_points(synth_pages(spark, sf_small_dir)).cache()
    polys = (
        synth_polygons(spark)
        .select("way_id", "vlat", "vlon")
        .unionByName(_big_polygon(spark))
    )
    flat_est = sj.estimate_covering_cells(polys)
    capped_est = sj.estimate_covering_cells(polys, cap=256)
    # pick a ceiling between the two so the fixture exercises rung 2
    assert capped_est < flat_est
    monkeypatch.setattr(sj, "BROADCAST_MAX_CELLS", (capped_est + flat_est) // 2)

    out = sj.pip_join(pts, polys, budget=256)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Generate explode" in plan
    assert "Exchange hashpartitioning" not in plan, plan

    want = {
        (r.url, r.way_id)
        for r in pip_join_broadcast(pts, polys, build_way_cells(polys)).collect()
    }
    assert {(r.url, r.way_id) for r in out.collect()} == want


def test_multipolygon_auto_ladder(spark, sf_small_dir, monkeypatch):
    """With the flat ring-covering estimate past the ceiling, the
    multipolygon auto strategy must climb to the adaptive covering and
    still return the identical relation picks."""
    import osm_spark.pipeline.spatial_join as sj
    from osm_spark.pipeline.spatial_join import pip_join_multipolygon

    rings = spark.createDataFrame(
        [
            (600, "outer", 8001, [51.3, 51.3, 51.8, 51.8], [-0.4, 0.1, 0.1, -0.4]),
            (600, "inner", 8002, [51.49, 51.49, 51.51, 51.51],
             [-0.15, -0.12, -0.12, -0.15]),
        ],
        "relation_id long, role string, way_id long, "
        "vlat array<double>, vlon array<double>",
    )
    pts = extract_points(synth_pages(spark, sf_small_dir)).cache()
    want = {
        (r.url, r.relation_id)
        for r in pip_join_multipolygon(pts, rings, strategy="broadcast").collect()
    }
    ring_geo = rings.select("way_id", "vlat", "vlon")
    capped = sj.estimate_covering_cells(ring_geo, cap=4096)
    flat_est = sj.estimate_covering_cells(ring_geo)
    assert capped < flat_est
    monkeypatch.setattr(sj, "BROADCAST_MAX_CELLS", (capped + flat_est) // 2)
    got = {
        (r.url, r.relation_id)
        for r in pip_join_multipolygon(pts, rings, strategy="auto").collect()
    }
    assert got == want and len(want) > 0


def test_overlay_mixed_res_equals_flat(spark):
    """Cross-resolution overlay prejoin (disk-1 expansion of the finer
    side) must produce the identical intersect pair set as the flat
    res-9 covering join, on both strategies."""
    from osm_spark.geo.overlay import overlay_join
    from osm_spark.pipeline.spatial_join import covering_levels

    a = (
        synth_polygons(spark)
        .select("way_id", "vlat", "vlon")
        .unionByName(_big_polygon(spark))  # forces a coarse level in A
    )
    b = synth_polygons(spark, seed=7).select(
        (F.col("way_id") + 50000).alias("way_id"), "vlat", "vlon"
    )
    fa, fb = build_way_cells(a).cache(), build_way_cells(b).cache()
    aa = build_way_cells_adaptive(a, budget=256).cache()
    ab = build_way_cells_adaptive(b, budget=256).cache()
    la, lb = covering_levels(aa), covering_levels(ab)
    assert len(la) >= 2  # A genuinely mixed-res

    want = {
        (r.a_id, r.b_id)
        for r in overlay_join(a, b, fa, fb, "broadcast").collect()
    }
    assert want and any(x == 77777 for x, _ in want)  # big ring overlaps B polys
    for strat in ("broadcast", "shuffle"):
        got = {
            (r.a_id, r.b_id)
            for r in overlay_join(
                a, b, aa, ab, strat, levels_a=la, levels_b=lb
            ).collect()
        }
        assert got == want, strat


def test_adaptive_broadcast_path_never_shuffles_points(spark, sf_small_dir):
    """The multi-level expansion must stay inside the codegen pipeline:
    explode → broadcast hash probe, no shuffle anywhere on the broadcast
    path (the refine is a filter, the attach a broadcast)."""
    pts = extract_points(synth_pages(spark, sf_small_dir))
    polys = (
        synth_polygons(spark)
        .select("way_id", "vlat", "vlon")
        .unionByName(_big_polygon(spark))
    )
    adaptive = build_way_cells_adaptive(polys, budget=256)
    out = pip_join_adaptive(pts, polys, adaptive, "broadcast")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Generate explode" in plan
    assert "Exchange hashpartitioning" not in plan, plan
