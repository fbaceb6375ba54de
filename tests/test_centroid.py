"""Polygon centroid (geo/measure.py way_centroid): known figures,
winding-order invariance, translation equivariance, degenerate
fallback, and zero-shuffle plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_spark.geo.measure import way_centroid


def _run(spark, rings):
    df = spark.createDataFrame(
        rings, "way_id long, vlat array<double>, vlon array<double>"
    )
    return {
        r.way_id: (r.c_lat, r.c_lon) for r in way_centroid(df).collect()
    }


def test_known_figures(spark):
    got = _run(
        spark,
        [
            # unit square (open ring), centroid at (0.5, 0.5)
            (1, [0.0, 0.0, 1.0, 1.0], [0.0, 1.0, 1.0, 0.0]),
            # right triangle (0,0)(0,3)(3,0): centroid (1, 1)
            (2, [0.0, 0.0, 3.0], [0.0, 3.0, 0.0]),
        ],
    )
    assert got[1] == (pytest.approx(0.5), pytest.approx(0.5))
    assert got[2] == (pytest.approx(1.0), pytest.approx(1.0))


def test_winding_and_translation(spark):
    sq_ccw = (1, [10.0, 10.0, 11.0, 11.0], [20.0, 21.0, 21.0, 20.0])
    sq_cw = (2, list(reversed(sq_ccw[1])), list(reversed(sq_ccw[2])))
    got = _run(spark, [sq_ccw, sq_cw])
    assert got[1] == (pytest.approx(10.5), pytest.approx(20.5))
    assert got[2] == (pytest.approx(10.5), pytest.approx(20.5))


def test_degenerate_falls_back_to_vertex_mean(spark):
    got = _run(
        spark,
        [
            (1, [0.0, 2.0], [0.0, 4.0]),          # 2 vertices
            (2, [0.0, 1.0, 2.0], [0.0, 1.0, 2.0]),  # collinear
            (3, [], []),                           # empty -> NULLs
        ],
    )
    assert got[1] == (pytest.approx(1.0), pytest.approx(2.0))
    assert got[2] == (pytest.approx(1.0), pytest.approx(1.0))
    assert got[3] == (None, None)


def test_nonconvex_centroid_outside_vertex_mean(spark):
    # L-shape: area centroid differs from the vertex mean — the shoelace
    # weighting must win. L covering [0,2]x[0,1] plus [0,1]x[1,2]:
    # area 3, centroid at (cx, cy) = ((2*.5*1 + 1*... )) computed:
    # rect A [0,2]x[0,1] area 2 centroid (1.0, 0.5); rect B [0,1]x[1,2]
    # area 1 centroid (0.5, 1.5) -> combined ((2*1+1*.5)/3, (2*.5+1*1.5)/3)
    # = (2.5/3, 2.5/3).
    lat = [0.0, 0.0, 1.0, 1.0, 2.0, 2.0]
    lon = [0.0, 2.0, 2.0, 1.0, 1.0, 0.0]
    got = _run(spark, [(1, lat, lon)])
    assert got[1] == (pytest.approx(2.5 / 3), pytest.approx(2.5 / 3))


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 1.0], [0.0, 1.0, 0.0])],
        "way_id long, vlat array<double>, vlon array<double>",
    )
    plan = way_centroid(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
