"""Ripley's K function — multi-scale point-pattern clustering statistic.

K(r) estimates how many neighbors a typical point has within radius r,
normalized by intensity: for a homogeneous Poisson process K(r) = πr²,
so K̂ above that curve means clustering at scale r and below means
dispersion (Ripley 1976 / Besag's L transform — textbook spatial
statistics, same public-method family as the engine's Gi* hotspots
(geo/hotspot.py) and Moran's I (geo/moran.py)).

Estimator (the plain, uncorrected form):

    K̂(r) = A / (n·(n−1)) · Σ_{i≠j} 1[d_ij ≤ r]
    L̂(r) = sqrt(K̂(r) / π)

where A is the study-area size in m² and the sum counts ORDERED pairs.
No edge correction is applied (the Ripley isotropic correction needs
per-pair boundary arcs; on web-scale city extracts the border band is
negligible and the uncorrected estimator is the standard first pass —
documented bias, not an approximation of the sum itself).

Scale design: the pair sum is the engine's cell-prejoined radius join
(geo/radius.py) at r_max = max(radii) — candidate volume is
|points| × disk(K), never all-pairs — and the radius ladder collapses
in ONE map-side-combined conditional-sum aggregate over the pair
stream (no per-radius rescans). The only driver-visible data is the
1×(m+1) result row. Hot urban cells inherit radius_join's full
strategy ladder (broadcast / shuffle_hash / salted).

Determinism: pair counts are exact longs (the haversine refine is the
same IEEE op order as the DuckDB oracle); K̂/L̂ are single
multiply-divide chains over exact integers, rounded to 6 decimals —
the engine's standard float-rendering trade.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.geo.radius import radius_join

__all__ = ["cross_k", "ripley_k"]


def ripley_k(
    points: DataFrame,
    radii: list[float],
    area_m2: float,
    *,
    id_col: str = "url",
    strategy: str = "auto",
    n_points: int | None = None,
) -> DataFrame:
    """One row per radius: (r_m, n_pairs, k_hat, l_hat).

    ``points``: (``id_col``, lat, lon) — ids must be distinct (each
    unordered pair is counted twice, once per direction, which is the
    Σ_{i≠j} in the estimator). ``area_m2``: the study-area size the
    intensity is normalized by. ``strategy``/``n_points`` thread
    through to the self radius-join exactly as in ``radius_join``
    (``n_points`` doubles as its candidate-size estimate; the point
    table is both sides here).
    """
    rs, pairs = _ladder_pairs(
        points, points, radii, area_m2, id_col, id_col, strategy, n_points
    )
    pairs = pairs.filter(F.col("url") != F.col("node_id"))
    return _k_table(pairs, rs, area_m2, _self_norm(points))


def cross_k(
    points_a: DataFrame,
    points_b: DataFrame,
    radii: list[float],
    area_m2: float,
    *,
    a_id_col: str = "url",
    b_id_col: str = "id",
    strategy: str = "auto",
    n_points_b: int | None = None,
) -> DataFrame:
    """Bivariate (cross-type) K — co-location of two point processes:

        K̂_AB(r) = A / (n_a · n_b) · Σ_{i∈A, j∈B} 1[d_ij ≤ r]

    "are geotagged pages clustered AROUND amenities at scale r" — above
    π r² means attraction between the types, below means repulsion
    (Lotwick–Silverman 1982, the standard bivariate extension). Same
    output shape, exactness and plan as ``ripley_k``; the pair stream
    is one A×B radius join (B is the dim side — amenities — so its
    candidate table drives the broadcast/shuffle/salted choice via
    ``n_points_b``)."""
    rs, pairs = _ladder_pairs(
        points_a,
        points_b,
        radii,
        area_m2,
        a_id_col,
        b_id_col,
        strategy,
        n_points_b,
    )
    norm = points_a.agg(F.count(F.lit(1)).alias("_na")).crossJoin(
        points_b.agg(F.count(F.lit(1)).alias("_nb"))
    ).select((F.col("_na") * F.col("_nb")).alias("_norm"))
    return _k_table(pairs, rs, area_m2, norm)


def _self_norm(points: DataFrame) -> DataFrame:
    return points.agg(F.count(F.lit(1)).alias("_n")).select(
        (F.col("_n") * (F.col("_n") - F.lit(1))).alias("_norm")
    )


def _ladder_pairs(
    points_a, points_b, radii, area_m2, a_id_col, b_id_col, strategy, n_b
):
    if not radii:
        raise ValueError("radii must be non-empty")
    if any(r <= 0 for r in radii):
        raise ValueError(f"radii must all be > 0, got {radii}")
    if area_m2 <= 0:
        raise ValueError(f"area_m2 must be > 0, got {area_m2}")
    rs = sorted(float(r) for r in radii)
    pairs = radius_join(
        points_a.select(F.col(a_id_col).alias("url"), "lat", "lon"),
        points_b.select(F.col(b_id_col).alias("id"), "lat", "lon"),
        rs[-1],
        strategy=strategy,
        n_nodes=n_b,
    )
    return rs, pairs


def _k_table(pairs, rs, area_m2, norm):
    """(r_m, n_pairs, k_hat, l_hat) from the pair stream: one
    conditional-sum aggregate + the 1-row normalization cross join."""
    counts = pairs.agg(
        *[
            F.sum(
                F.when(F.col("dist_m") <= F.lit(r), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias(f"_c{i}")
            for i, r in enumerate(rs)
        ]
    )
    ladder = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r_m"),
                    F.coalesce(F.col(f"_c{i}"), F.lit(0)).alias("n_pairs"),
                )
                for i, r in enumerate(rs)
            ]
        )
    ).alias("_e")
    k_hat = (
        F.lit(float(area_m2))
        * F.col("_e.n_pairs").cast("double")
        / F.col("_norm").cast("double")
    )
    return (
        counts.crossJoin(norm)
        .select(ladder, "_norm")
        .select(
            F.col("_e.r_m").alias("r_m"),
            F.col("_e.n_pairs").alias("n_pairs"),
            F.round(k_hat, 6).alias("k_hat"),
            F.round(F.sqrt(k_hat / F.lit(math.pi)), 6).alias("l_hat"),
        )
    )
