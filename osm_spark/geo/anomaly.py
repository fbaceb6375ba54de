"""Per-tile temporal anomaly detection: which tiles had an unusual day.

The spatio-temporal member of the raster-statistics family (hotspot_gi
asks "hot relative to SPACE", this asks "hot relative to the tile's own
HISTORY") — event-spike surfacing over geotagged streams: a normally
quiet tile lighting up is a breaking event, a crawl trap, or a bot farm.

Statistic: per (tile, day) count x against the tile's own day series —
the one-sample z-score with the sample std:

    z = (x − μ) / σ,  μ = S/n,  σ² = (Σx² − S²/n) / (n−1)

Day universe and zero-fill: the series is zero-FILLED over the GLOBAL
observed-day set (a tile missing a day means "0 events that day", which
is exactly the baseline an anomaly needs; a tile's σ computed only over
its active days would hide every "normally silent" spike). The global
day list is bounded by the time range — broadcast as a literal-sized
dim, never a data-sized join.

Exactness (the hotspot recipe): counts, S = Σx, Q = Σx² are exact
integers; with d = n·x − S the score is

    z = d / sqrt(n·(n·Q − S²) / (n−1))

ONE closing float expression over double-cast integers, micro-quantized
— value-hash gateable. σ = 0 (constant series) yields NULL.

Plan: one (tile, day) groupBy over the points (map-side combined), a
distinct-day 1-column broadcast, tiles × days zero-fill as a broadcast
nested-loop over the DAY DIM ONLY (|days| rows — bounded by calendar
time, not data), one tile-keyed aggregate for (n, S, Q), one tile-keyed
shuffle-hash join back. Nothing scales past |tiles|·|days|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.geo.tiles import tile_xy


def tile_day_counts(points: DataFrame, z: int, ts: str = "ts") -> DataFrame:
    """(x, y, day, cnt) — occupied (tile, day) cells only."""
    t = tile_xy("lat", "lon", z)
    return (
        points.select(
            t.getField("x").alias("x"),
            t.getField("y").alias("y"),
            F.date_trunc("day", F.col(ts)).cast("date").alias("day"),
        )
        .groupBy("x", "y", "day")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def tile_anomalies(
    points: DataFrame,
    z: int,
    ts: str = "ts",
    threshold_sigma: float = 2.0,
) -> DataFrame:
    """(x, y, day, cnt, z_micro) — zero-filled per-tile day series,
    rows whose |z| ≥ threshold_sigma. z_micro = round(z · 1e6)."""
    counts = tile_day_counts(points, z, ts)
    days = counts.select("day").distinct()
    tiles = counts.select("x", "y").distinct()
    filled = (
        tiles.crossJoin(F.broadcast(days))
        .join(counts.hint("shuffle_hash"), ["x", "y", "day"], "left")
        .select(
            "x", "y", "day",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
    )
    stats = filled.groupBy("x", "y").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("q"),
    )
    j = filled.join(stats.hint("shuffle_hash"), ["x", "y"])

    n = F.col("n").cast("double")
    d = (F.col("n") * F.col("cnt") - F.col("s")).cast("double")
    var_num = (
        F.col("n").cast("double")
        * (
            F.col("n").cast("double") * F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
        )
        / (n - 1.0)
    )
    zscore = d / F.sqrt(var_num)
    z_micro = F.when(
        (F.col("n") > 1) & (var_num > 0), F.round(zscore * 1e6, 0).cast("long")
    ).otherwise(F.lit(None).cast("long"))
    return (
        j.select("x", "y", "day", "cnt", z_micro.alias("z_micro"))
        .where(
            F.col("z_micro").isNotNull()
            & (F.abs(F.col("z_micro")) >= int(round(threshold_sigma * 1e6)))
        )
    )
