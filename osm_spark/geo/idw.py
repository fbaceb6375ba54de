"""Inverse-distance-weighted (IDW) spatial interpolation.

Estimate a field value at every query point from nearby measurement
nodes — "expected amenity density / sensor reading at this page's
coordinate" — the interpolation member of the spatial family (PIP =
containment, kNN = nearest, radius = within, snap = nearest segment,
IDW = weighted field estimate). Shepard (1968) weights w = 1/d².

Candidate generation delegates to ``radius_join`` (geo/radius.py) —
K-disk covering, one hash join touching the big side — so scale
behavior is inherited, not re-derived.

Exactness design (the float-sum trap): a naive Σ wᵢvᵢ over doubles is
ORDER-DEPENDENT — Spark's partial aggregation and DuckDB's scan order
round differently, so the result could never hash-gate. Instead the
weights are quantized to integers FIRST (the lm_score micro-nat
precedent, text/lm.py):

    d_mm  = round(dist · 1000)                 — integer millimeters
    d_eff = max(d_mm, MIN_D_MM)                — 1 m clamp (standard IDW
                                                 practice near the node)
    w     = floor(scale / d_eff²),  scale = radius_mm² · W_RES
    est   = round(10⁶ · Σ w·v / Σ w)           — one double division last

The radius-relative scale guarantees every in-radius node keeps w ≥
W_RES − 1 ≈ 0.1 % weight resolution (a fixed scale lets far weights
quantize to ZERO — found as an ANSI divide-by-zero when a whole
neighborhood quantized away). Integer sums are associative, so the
estimate is partition-order independent and bit-identical in any
engine. Overflow headroom: w ≤ radius_mm²·W_RES/MIN_D_MM², so Σ w·v
stays under long range for |v| ≤ 10⁶ and radii ≤ tens of km.

A query sitting EXACTLY on a node (d_mm = 0) short-circuits to that
node's value (the IDW limit); the minimum value wins if several nodes
coincide — deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.geo.radius import radius_join

MIN_D_MM = 1000  # 1 m clamp
W_RES = 1000  # weight units carried by the farthest in-radius node


def idw_scale(radius_m: float) -> int:
    """Integer weight scale: the farthest in-radius node gets ~W_RES."""
    radius_mm = int(round(radius_m * 1000.0))
    return radius_mm * radius_mm * W_RES


def idw_interpolate(
    points: DataFrame,
    nodes: DataFrame,
    radius_m: float,
    value: str = "val",
    strategy: str = "auto",
    n_nodes: int | None = None,
) -> DataFrame:
    """(url, n_nbrs, est_micro) — IDW estimate × 10⁶ as BIGINT at every
    query point with ≥1 node within ``radius_m``.

    ``points``: url, lat, lon (big side). ``nodes``: id, lat, lon plus
    an integer ``value`` column (quantize float measurements upstream —
    the same contract as the weights)."""
    pairs = radius_join(
        points, nodes, radius_m, strategy=strategy, n_nodes=n_nodes
    )
    return idw_estimate_from_pairs(pairs, nodes, radius_m, value)


def idw_estimate_from_pairs(
    pairs: DataFrame,
    nodes: DataFrame,
    radius_m: float,
    value: str = "val",
) -> DataFrame:
    """The weight/estimate chain given (url, node_id, dist_m) candidate
    pairs — factored so LOOCV can drop self-pairs before estimating."""
    vals = nodes.select(F.col("id").alias("node_id"), F.col(value).alias("v"))
    cand = pairs.join(vals.hint("shuffle_hash"), "node_id")

    scale = idw_scale(radius_m)
    d_mm = F.round(F.col("dist_m") * 1000.0, 0).cast("long")
    d_eff = F.greatest(d_mm, F.lit(MIN_D_MM))
    # double division (ANSI long/long raises on 0 even under a when
    # guard once folded); floor(double/double) is bit-identical to the
    # oracle's, which also divides as double
    w = F.floor(
        F.lit(float(scale)) / (d_eff * d_eff).cast("double")
    ).cast("long")
    terms = cand.select(
        "url",
        "v",
        d_mm.alias("d_mm"),
        F.when(d_mm > 0, w).alias("w"),
    )
    agg = terms.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_nbrs"),
        F.sum(F.col("w") * F.col("v")).alias("num"),
        F.sum("w").alias("den"),
        F.min(F.when(F.col("d_mm") == 0, F.col("v"))).alias("exact_v"),
    )
    est = F.when(
        F.col("exact_v").isNotNull(), F.col("exact_v") * F.lit(1_000_000)
    ).otherwise(
        F.round(
            F.lit(1e6) * F.col("num").cast("double") / F.col("den").cast("double"),
            0,
        ).cast("long")
    )
    return agg.select("url", "n_nbrs", est.alias("est_micro"))


def idw_loocv(
    nodes: DataFrame,
    radius_m: float,
    value: str = "val",
    strategy: str = "auto",
    n_nodes: int | None = None,
) -> DataFrame:
    """(node_id, n_nbrs, est_micro, err_micro) — leave-one-out
    cross-validation of the IDW field: every node is predicted from its
    OTHER in-radius neighbours and scored against its own value
    (err = est − 10⁶·v) — the standard interpolation-quality audit
    (pick the radius/power whose LOOCV error is lowest) run as ONE
    self radius-join, not n refits.

    Same scale shape as the interpolation (the nodes table plays both
    sides of ``radius_join``); the self-pair is dropped by id equality,
    so coincident twin nodes still predict each other through the exact
    d=0 branch — the correct LOOCV limit.  Nodes with no neighbour emit
    no row (no prediction exists).
    """
    pts = nodes.select(F.col("id").alias("url"), "lat", "lon")
    pairs = radius_join(
        pts, nodes, radius_m, strategy=strategy, n_nodes=n_nodes
    ).where(F.col("url") != F.col("node_id"))
    est = idw_estimate_from_pairs(pairs, nodes, radius_m, value)
    truth = nodes.select(
        F.col("id").alias("url"), (F.col(value) * F.lit(1_000_000)).alias("tv")
    )
    return est.join(truth.hint("shuffle_hash"), "url").select(
        F.col("url").alias("node_id"),
        "n_nbrs",
        "est_micro",
        (F.col("est_micro") - F.col("tv")).cast("long").alias("err_micro"),
    )
