"""Street-grid orientation histograms (the Boeing-style bearing rose,
"Urban spatial order: street network orientation" — public analysis
family): per-region histograms of way-segment compass orientation,
length-weighted — does the road network run on a grid, and which way
is it rotated?

Exactness design — NO transcendental parity: the obvious
``atan2 → degrees → floor`` chain is cross-engine UNSAFE (measured in
this container: Java's and DuckDB's atan2 disagree in the last ulp on
~16 % of integer inputs, enough to flip a bin at a boundary). Instead
the 10°-bin index is decided by SLOPE COMPARISONS: with quantized
integer endpoints, dx and dy are exact int64-valued doubles, and
``dx ≥ dy · tan(10°k)`` evaluates one shared literal multiply + one
compare — bit-identical in any IEEE engine. Orientation folds to
[0°, 180°) (a street's bearing is undirected), 18 bins.

Bin math (after folding the representative so dy ≥ 0):
- ``dy = 0`` → pure east-west, φ = 90° → bin 9.
- ``dx ≥ 0`` → φ = atan(dx/dy) ∈ [0°, 90°): φ ≥ 10k ⇔ dx ≥ dy·tan(10k)
  (tan increasing, dy > 0) — a 9-step ladder, bins 0..8.
- ``dx < 0`` → φ ∈ (90°, 180°): φ ≥ 10k ⇔ dx ≥ dy·tan(10k − 180°) —
  the same ladder with the negative-tangent literals, bins 9..17.

Zero-length segments (identical quantized endpoints) have no
orientation and are dropped. Lengths are integer millimeters (the
trip_stats quantize-early idiom), so the per-bin sums are exact.

Plan shape: segment explode → pure-Column bin ladder → one map-side-
combined groupBy (region, bin); zero UDFs, zero extra shuffles.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_spark.geo.crossings import way_segments
from osm_spark.geo.knn import haversine_m

__all__ = ["orientation_bin_expr", "orientation_histogram", "orientation_entropy", "TAN_LITERALS"]

# tan(10°k) for k = 1..8, shared verbatim with the SQL oracle
TAN_LITERALS = [math.tan(math.radians(10 * k)) for k in range(1, 9)]


def orientation_bin_expr(dx: Column, dy: Column) -> Column:
    """18-bin folded-orientation index from exact integer deltas —
    pure comparisons against shared tangent literals (module
    docstring). Returns NULL for dx = dy = 0."""
    # fold to dy >= 0
    flip = (dy < 0) | ((dy == 0) & (dx < 0))
    fx = F.when(flip, -dx).otherwise(dx).cast("double")
    fy = F.when(flip, -dy).otherwise(dy).cast("double")

    def ladder(base: int, sign: int) -> Column:
        # bins base..base+8; for sign=+1 thresholds tan(10..80),
        # for sign=-1 thresholds tan(-80..-10) walked upward
        expr = F.lit(base + 8)
        for k in range(8, 0, -1):
            t = F.lit(sign * TAN_LITERALS[k - 1] if sign > 0 else -TAN_LITERALS[8 - k])
            expr = F.when(fx < fy * t, F.lit(base + k - 1)).otherwise(expr)
        return expr

    return (
        F.when((dx == 0) & (dy == 0), F.lit(None).cast("int"))
        .when(fy == 0, F.lit(9))  # pure east-west
        .when(fx >= 0, ladder(0, +1))
        .otherwise(ladder(9, -1))
        .cast("int")
    )


def orientation_histogram(
    ways: DataFrame,
    region: Column,
    *,
    scale: int = 100_000,
    closed: bool = True,
    id_col: str = "way_id",
) -> DataFrame:
    """(region, bin, n_segments, len_mm) — length-weighted 18-bin
    folded-orientation histogram per region. ``ways``: id +
    ``vlat``/``vlon`` arrays; ``region`` is any Column over ``way_id``
    (city key, admin area id)."""
    segs = way_segments(ways, scale=scale, id_col=id_col, closed=closed)
    dx = F.col("x1") - F.col("x0")
    dy = F.col("y1") - F.col("y0")
    # exact mm length from the UNQUANTIZED idiom is unavailable here
    # (segments carry quantized ints) — use the quantized endpoints'
    # haversine, consistent in both engines by construction
    len_mm = F.round(
        haversine_m(
            F.col("y0") / float(scale),
            F.col("x0") / float(scale),
            F.col("y1") / float(scale),
            F.col("x1") / float(scale),
        )
        * 1000.0
    ).cast("long")
    return (
        segs.withColumn("bin", orientation_bin_expr(dx, dy))
        .where(F.col("bin").isNotNull())
        .withColumn("region", region)
        .withColumn("len_mm", len_mm)
        .groupBy("region", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("len_mm").alias("len_mm"),
        )
    )


def orientation_entropy(
    ways: DataFrame,
    region: Column,
    *,
    scale: int = 100_000,
    closed: bool = True,
    id_col: str = "way_id",
) -> DataFrame:
    """(region, total_m, n_bins, entropy_micro) — natural-log Shannon
    entropy of each region's length-weighted orientation distribution
    in micro-nats (the Boeing grid-order metric's core: a perfect grid
    concentrates mass in 2 of 18 bins → low entropy; an organic
    medieval network spreads it → high). Weights are integer METERS
    (``len_mm div 1000`` — meter granularity keeps every quantized
    ``w·ln(w)`` micro-nat product far inside exact-double range, which
    millimeter weights would not); zero-meter bins drop (no mass at
    this granularity). The exactness recipe is text/entropy.py's: each
    bin's ``w·ln(w)`` quantizes to integer micro-nats FIRST, the sum is
    an exact long sum (order-independent under partial aggregation),
    and the closing ``ln(T)·1e6 − s/T`` is single-shot pinned-order
    float arithmetic."""
    hist = orientation_histogram(
        ways, region, scale=scale, closed=closed, id_col=id_col
    )
    w = F.expr("len_mm div 1000").cast("long")
    binned = hist.select("region", w.alias("w")).where(F.col("w") > 0)
    wlogw = F.round(
        F.col("w").cast("double") * F.log(F.col("w").cast("double")) * 1e6, 0
    ).cast("long")
    agg = binned.groupBy("region").agg(
        F.sum("w").alias("total_m"),
        F.count(F.lit(1)).alias("n_bins"),
        F.sum(wlogw).alias("_s"),
    )
    t = F.col("total_m").cast("double")
    h_micro = F.round(
        F.log(t) * 1e6 - F.col("_s").cast("double") / t, 0
    ).cast("long")
    return agg.select(
        "region", "total_m", "n_bins", h_micro.alias("entropy_micro")
    )
