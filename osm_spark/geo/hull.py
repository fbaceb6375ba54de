"""Convex hull per group — distributed via hull-merge associativity.

``hull(A ∪ B) = hull(hull(A) ∪ hull(B))``, so the operator runs as a
partial aggregation: stage 1 reduces EACH PARTITION's points per group
to that partition's hull (``mapInPandas`` — output per group is hull
vertices only, typically O(log n) or O(√n) of the input), stage 2
merges the per-partition hulls per group (``applyInPandas`` after the
one group-keyed exchange).  No group's full point set ever assembles
on one executor — only its partial hulls do — which is the same
map-side-combine shape every aggregate in this engine uses, applied to
a non-algebraic geometric reduce.  Both stages run the same Andrew
monotone-chain kernel (public textbook algorithm), vectorized in
NumPy over Arrow batches — no per-row Python.

Semantics: the STRICT hull — collinear interior-of-edge points are not
vertices; duplicates dedup; groups of 1–2 distinct points return those
points.  Output rows are the hull's vertex SET (one row per vertex);
ordering is left to the caller (the gate compares as a set).

Reference parity: robertgauld/osm exposes way polygons but no derived
geometry (lib/osm/way.rb); the hull is the standard footprint operator
(coverage area per source/city) built over the same vertex layout as
measure.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

__all__ = ["convex_hull"]

_OUT_SCHEMA = "grp string, px double, py double"


def _chain(px, py):
    """Andrew monotone chain over float/int coordinate arrays; returns
    the strict hull's vertices as a list of (x, y)."""
    pts = sorted(set(zip(px, py)))
    if len(pts) <= 2:
        return pts

    def half(points):
        out = []
        for p in points:
            while (
                len(out) >= 2
                and (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
                <= 0
            ):
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(list(reversed(pts)))
    return lower[:-1] + upper[:-1]


def _hull_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for g, sub in pdf.groupby("grp", sort=False):
        for x, y in _chain(sub["px"].to_numpy(), sub["py"].to_numpy()):
            rows.append((g, float(x), float(y)))
    return pd.DataFrame(rows, columns=["grp", "px", "py"])


def convex_hull(
    points: DataFrame,
    *,
    group_col: str = "grp",
    x_col: str = "px",
    y_col: str = "py",
) -> DataFrame:
    """Hull vertex set per group: ``(grp, px, py)`` rows."""
    norm = points.select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(x_col).cast("double").alias("px"),
        F.col(y_col).cast("double").alias("py"),
    ).where(
        # NaN passes isNotNull but corrupts _chain's sort and the
        # strict-turn sign tests (NaN comparisons are always false),
        # silently yielding a wrong hull — filter it with the nulls.
        F.col("grp").isNotNull()
        & F.col("px").isNotNull()
        & F.col("py").isNotNull()
        & ~F.isnan("px")
        & ~F.isnan("py")
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _hull_frame(pdf)

    # stage 1: per-partition partial hulls (no exchange yet)
    partials = norm.mapInPandas(partial, schema=_OUT_SCHEMA)

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return _hull_frame(pdf)

    # stage 2: one group-keyed exchange over hull vertices only
    return partials.groupBy("grp").applyInPandas(merge, schema=_OUT_SCHEMA)
