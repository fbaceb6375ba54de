"""Vector-tile segment clipping: DuckDB parity, geometry, guards, plan."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from osm_spark.geo.cliptiles import clip_segments_to_tiles, clip_tiles_sql

KEY = ["way_id", "seg_idx", "z", "tx", "ty", "x0", "y0", "x1", "y1"]


def _canon(pdf):
    return pdf[KEY].astype("int64").sort_values(KEY).reset_index(drop=True)


def test_clip_matches_duckdb_replay(spark):
    from osm_spark.pipeline.geometry import synth_polygons, synth_polygons_pdf

    ways = synth_polygons(spark).select("way_id", "vlat", "vlon")
    got = _canon(clip_segments_to_tiles(ways, z=13, closed=True).toPandas())
    con = duckdb.connect()
    con.register("polys", synth_polygons_pdf()[["way_id", "vlat", "vlon"]])
    want = _canon(con.sql(clip_tiles_sql("polys", 13, closed=True)).df())
    assert len(got) > 500
    assert got.equals(want)


def test_clip_segment_inside_one_tile_is_unclipped(spark):
    # z=1: tile x in [0,2), y in [0,2); a short segment near lat 0 lon 0
    ways = spark.createDataFrame(
        [(1, [0.5, 0.6], [0.5, 0.7])], "way_id long, vlat array<double>, vlon array<double>"
    )
    rows = clip_segments_to_tiles(ways, z=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.tx, r.ty) == (1, 0)  # east of lon 0, north of lat 0
    # whole segment kept: endpoints are the projected originals
    assert 0 <= min(r.x0, r.y0, r.x1, r.y1) and max(r.x0, r.y0, r.x1, r.y1) <= 4096
    assert (r.x0, r.y0) != (r.x1, r.y1)


def test_clip_crossing_is_continuous_at_tile_border(spark):
    # horizontal segment crossing several z=6 tiles along lat 0
    ways = spark.createDataFrame(
        [(1, [0.0, 0.0], [-10.0, 10.0])], "way_id long, vlat array<double>, vlon array<double>"
    )
    rows = sorted(clip_segments_to_tiles(ways, z=6).collect(), key=lambda r: r.tx)
    assert len(rows) >= 3
    for a, b in zip(rows, rows[1:]):
        assert b.tx == a.tx + 1 and a.ty == b.ty
        assert a.x1 == 4096 and b.x0 == 0  # exit right edge, enter left edge
        assert a.y1 == b.y0  # same crossing height


def test_clip_short_arrays_and_empty(spark):
    ways = spark.createDataFrame(
        [(1, [0.5], [0.5]), (2, [], [])],
        "way_id long, vlat array<double>, vlon array<double>",
    )
    assert clip_segments_to_tiles(ways, z=10).count() == 0


def test_clip_closed_adds_wrap_segment(spark):
    ways = spark.createDataFrame(
        [(1, [0.1, 0.2, 0.2], [0.1, 0.1, 0.2])],
        "way_id long, vlat array<double>, vlon array<double>",
    )
    open_n = clip_segments_to_tiles(ways, z=4).select("seg_idx").distinct().count()
    closed_n = clip_segments_to_tiles(ways, z=4, closed=True).select("seg_idx").distinct().count()
    assert (open_n, closed_n) == (2, 3)


def test_clip_max_tiles_guard_raises(spark):
    ways = spark.createDataFrame(
        [(1, [0.0, 0.0], [-179.0, 179.0])], "way_id long, vlat array<double>, vlon array<double>"
    )
    with pytest.raises(Exception, match="covers more than"):
        clip_segments_to_tiles(ways, z=13, max_tiles=100).count()


def test_clip_plan_is_shuffle_free(spark):
    from osm_spark.pipeline.geometry import synth_polygons

    ways = synth_polygons(spark).select("way_id", "vlat", "vlon")
    plan = (
        clip_segments_to_tiles(ways, z=13, closed=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_route_density_sums_clipped_lengths(spark):
    import math

    from osm_spark.geo.cliptiles import (
        clip_segments_to_tiles,
        route_density,
    )

    from osm_spark.pipeline.geometry import synth_polygons

    ways = synth_polygons(spark).select("way_id", "vlat", "vlon")
    clipped = clip_segments_to_tiles(ways, z=13, closed=True).toPandas()
    want: dict[tuple, list[int]] = {}
    for r in clipped.itertuples():
        want.setdefault((r.z, r.tx, r.ty), []).append(
            int(round(math.hypot(r.x1 - r.x0, r.y1 - r.y0)))
        )
    got = route_density(ways, z=13, closed=True).toPandas()
    assert len(got) == len(want) > 1
    for r in got.itertuples():
        ls = want[(r.z, r.tx, r.ty)]
        assert (r.n_segments, r.length_eu) == (len(ls), sum(ls))
