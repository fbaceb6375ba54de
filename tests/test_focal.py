"""Focal raster convolution (osm_spark/geo/focal.py) vs a dict replay."""

from __future__ import annotations

import pandas as pd
import pytest

from osm_spark.geo.focal import BINOMIAL_5X5, focal_sum


@pytest.fixture(scope="module")
def grid(spark):
    cells = {(10, 10): 5, (10, 11): 3, (11, 10): 2, (14, 14): 7, (20, 5): 1}
    pdf = pd.DataFrame(
        [{"x": x, "y": y, "cnt": v} for (x, y), v in cells.items()]
    )
    return cells, spark.createDataFrame(pdf)


def _replay(cells, kernel, keep):
    out: dict[tuple[int, int], int] = {}
    for (x, y), v in cells.items():
        for (dx, dy), w in kernel.items():
            t = (x + dx, y + dy)
            out[t] = out.get(t, 0) + v * w
    if keep == "occupied":
        out = {t: s for t, s in out.items() if t in cells}
    return out


@pytest.mark.parametrize("keep", ["dilated", "occupied"])
def test_focal_matches_replay(spark, grid, keep):
    cells, df = grid
    got = {
        (r.x, r.y): r.focal for r in focal_sum(df, keep=keep).collect()
    }
    assert got == _replay(cells, BINOMIAL_5X5, keep)


def test_focal_identity_kernel(spark, grid):
    cells, df = grid
    got = {(r.x, r.y): r.focal for r in focal_sum(df, kernel={(0, 0): 1}).collect()}
    assert got == cells


def test_focal_kernel_sum_preserved(spark, grid):
    """A convolution redistributes mass: total = Σvalues × Σweights."""
    cells, df = grid
    total = sum(
        r.focal for r in focal_sum(df, keep="dilated").collect()
    )
    assert total == sum(cells.values()) * sum(BINOMIAL_5X5.values())


def test_focal_validation(spark, grid):
    _, df = grid
    with pytest.raises(ValueError):
        focal_sum(df, kernel={})
    with pytest.raises(ValueError):
        focal_sum(df, kernel={(0, 0): 1.5})
    with pytest.raises(ValueError):
        focal_sum(df, keep="bogus")
