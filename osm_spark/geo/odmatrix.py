"""Origin–destination flow matrix over raster tile cells.

The aggregate view of the trajectory layer (geo/trips.py gives per-user
stats; this gives the corpus-level movement structure): each user's
consecutive pings become one directed (origin cell → destination cell)
transition, and the matrix is the count of transitions plus the number
of distinct users per flow — the standard OD matrix of transport
analysis, here over slippy z-tiles so the cell assignment is the same
closed-form Web-Mercator arithmetic the raster family already uses
(geo/tiles.py, pure codegen — no UDF).

Plan shape, and why it scales:

- ONE user-keyed hash exchange for the LAG window (identical to
  trip_stats — each partition sorts only its own users' pings; no
  global sort; skewed power users are the standard AQE skew shape).
- ONE flow-keyed aggregation exchange. n_trips is map-side combined;
  n_users is an exact COUNT(DISTINCT user) — Spark plans it as the
  two-phase partial-distinct expand, so the shuffle carries
  (flow, user) once per distinct pair, never per ping. At planet scale
  the distinct-pair cardinality is bounded by |flows observed|, which
  the dwell filter already collapses (consecutive pings inside one
  cell produce NO transition when drop_dwell=True, and GPS jitter
  dwells dominate raw ping streams).
- Nothing else touches the event table; the output is one row per
  OBSERVED flow — sparse, never the dense |cells|² matrix.

Reference parity: composes the engine's latest-per-key window idiom
(SURVEY.md §2.5, lib/osm/online_payment.rb latest-status shape) with
the §2.10 raster cell assignment; there is no Ruby-side analog to cite
beyond those — the operator is part of the graft's trajectory family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm_spark.geo.tiles import tile_xy


def od_flows(
    points: DataFrame,
    z: int = 12,
    user: str = "user_id",
    ts: str = "ts",
    order_id: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
    drop_dwell: bool = True,
) -> DataFrame:
    """Per-transition long form: (user, o_x, o_y, d_x, d_y) — one row
    per consecutive ping pair in (ts, order_id) order. Each user's
    first ping has no origin and is dropped. ``drop_dwell`` removes
    within-cell transitions (origin == destination)."""
    cell = tile_xy(lat, lon, z)
    w = Window.partitionBy(user).orderBy(ts, order_id)
    pts = points.select(
        F.col(user).alias("user"),
        F.col(ts).alias("_ts"),
        F.col(order_id).alias("_oid"),
        cell.alias("d"),
    )
    flows = (
        pts.select(
            "user",
            F.lag("d").over(
                Window.partitionBy("user").orderBy("_ts", "_oid")
            ).alias("o"),
            "d",
        )
        .where(F.col("o").isNotNull())
    )
    if drop_dwell:
        flows = flows.where(
            (F.col("o.x") != F.col("d.x")) | (F.col("o.y") != F.col("d.y"))
        )
    return flows.select(
        "user",
        F.col("o.x").alias("o_x"),
        F.col("o.y").alias("o_y"),
        F.col("d.x").alias("d_x"),
        F.col("d.y").alias("d_y"),
    )


def od_matrix(
    points: DataFrame,
    z: int = 12,
    user: str = "user_id",
    ts: str = "ts",
    order_id: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
    drop_dwell: bool = True,
) -> DataFrame:
    """(o_x, o_y, d_x, d_y, n_trips, n_users) — directed flow counts
    between z-tiles, one row per observed flow. All-integer output, so
    the operator is value-hash gateable end to end."""
    flows = od_flows(
        points, z=z, user=user, ts=ts, order_id=order_id,
        lat=lat, lon=lon, drop_dwell=drop_dwell,
    )
    return flows.groupBy("o_x", "o_y", "d_x", "d_y").agg(
        F.count(F.lit(1)).alias("n_trips"),
        F.countDistinct("user").alias("n_users"),
    )
