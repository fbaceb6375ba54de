"""Per-user trajectory statistics: ordered ping sequences → step
distances → trip aggregates.

The trajectory layer of a geotagged-event pipeline — "how far did each
user move, how many real moves vs dwells" — composing the engine's
window idiom (latest-per-key family, SURVEY.md §2.5) with the geo
distance kernel. Steps are integer millimeters (rounded haversine), so
every downstream aggregate is exact integer arithmetic and the operator
is value-hash gateable end to end.

Plan shape: ONE window over (user, ts, id) — partition-keyed, so the
shuffle is a hash exchange on user_id and each partition sorts only its
own users' pings (no global sort; skewed power users are the standard
AQE skew shape). The aggregate after it reuses the same partitioning —
Catalyst elides the second exchange. Nothing else touches the event
table.

Dwell vs move: a step under ``stay_m`` is a dwell (GPS jitter around a
stay point — Li et al. 2008's stay-point threshold idiom); ``n_moves``
counts real displacements only. First ping per user has no step and
contributes to ``n_pings`` alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm_spark.geo.knn import haversine_m


def trip_steps(
    points: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    order_id: str = "event_id",
) -> DataFrame:
    """(user, order_id, step_mm) — integer-millimeter distance from the
    previous ping in (ts, order_id) order; NULL for each user's first
    ping. ``order_id`` breaks timestamp ties deterministically."""
    w = Window.partitionBy(user).orderBy(ts, order_id)
    plat, plon = F.lag("lat").over(w), F.lag("lon").over(w)
    step = F.round(
        haversine_m(plat, plon, F.col("lat"), F.col("lon")) * 1000.0, 0
    ).cast("long")
    return points.select(user, order_id, step.alias("step_mm"))


def trip_stats(
    points: DataFrame,
    stay_m: float = 50.0,
    user: str = "user_id",
    ts: str = "ts",
    order_id: str = "event_id",
) -> DataFrame:
    """(user, n_pings, n_moves, total_mm, max_step_mm) per user;
    ``n_moves`` counts steps ≥ ``stay_m`` meters, ``total_mm`` and
    ``max_step_mm`` cover ALL steps (dwell jitter included — the
    filtered variant is one `where` upstream)."""
    stay_mm = int(round(stay_m * 1000.0))
    steps = trip_steps(points, user=user, ts=ts, order_id=order_id)
    return steps.groupBy(user).agg(
        F.count(F.lit(1)).alias("n_pings"),
        F.count(F.when(F.col("step_mm") >= stay_mm, 1)).alias("n_moves"),
        F.coalesce(F.sum("step_mm"), F.lit(0)).cast("long").alias("total_mm"),
        F.max("step_mm").alias("max_step_mm"),
    )
