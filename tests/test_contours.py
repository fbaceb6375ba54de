"""Raster density + marching-squares contour tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_spark.geo.contours import (
    contours,
    density_raster,
    marching_squares_np,
    tile_density,
)
from osm_spark.geo.tiles import tile_xy_py
from osm_spark.pipeline.pages import synth_pages
from osm_spark.pipeline.spatial_join import extract_points


@pytest.fixture(scope="module")
def points(spark, sf_small_dir):
    return extract_points(synth_pages(spark, sf_small_dir)).cache()


def test_tile_density_matches_oracle(points):
    got = {
        (r.z, r.x, r.y): r.density for r in tile_density(points, 8).collect()
    }
    exp: dict = {}
    for r in points.collect():
        key = tile_xy_py(r.lat, r.lon, 8)
        exp[key] = exp.get(key, 0) + 1
    assert got == {k: float(v) for k, v in exp.items()}


def test_marching_squares_single_cell():
    # One hot pixel in the middle → a small closed loop of 4+ segments.
    grid = np.zeros((5, 5))
    grid[2, 2] = 10
    segs = marching_squares_np(grid, 5)
    assert len(segs) == 4  # diamond around the pixel
    # Segments form a closed loop: every endpoint appears exactly twice.
    pts = {}
    for x1, y1, x2, y2 in segs:
        pts[(x1, y1)] = pts.get((x1, y1), 0) + 1
        pts[(x2, y2)] = pts.get((x2, y2), 0) + 1
    assert all(v == 2 for v in pts.values())


def test_marching_squares_separates_regions():
    grid = np.zeros((4, 6))
    grid[:, :3] = 9  # left half hot
    segs = marching_squares_np(grid, 5)
    # Vertical boundary between x=2 and x=3 → all segments at x == 5 (half-pixel).
    assert len(segs) == 3
    assert all(s[0] == 5 and s[2] == 5 for s in segs)


def test_contours_end_to_end(spark, points):
    raster = density_raster(points, 12).cache()
    assert raster.count() > 0
    out = contours(raster, threshold=1.0).cache()
    n = out.count()
    assert n > 0
    # Determinism: re-running yields the identical segment multiset.
    out2 = contours(raster, threshold=1.0)
    assert out.exceptAll(out2).count() == 0 and out2.exceptAll(out).count() == 0
    # Each tile's segments stay within tile bounds (half-pixel units).
    bad = out.filter(
        (F.col("x1") < 0) | (F.col("x1") > 511) | (F.col("y2") < 0) | (F.col("y2") > 511)
    ).count()
    assert bad == 0
