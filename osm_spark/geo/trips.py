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


def stay_points(
    points: DataFrame,
    stay_m: float = 50.0,
    min_dur_s: float = 300.0,
    user: str = "user_id",
    ts: str = "ts",
    order_id: str = "event_id",
) -> DataFrame:
    """Stay-point (dwell episode) detection along each user's trajectory.

    The episodic view of the same threshold trip_stats uses (Li et al.
    2008, "Mining user similarity based on location history" — the
    stay-point idiom): consecutive pings whose step distance stays
    under ``stay_m`` belong to one dwell episode; an episode lasting at
    least ``min_dur_s`` is a stay point. Classic gaps-and-islands:

        move flag  = step_mm >= stay_mm OR first ping (no step)
        episode id = running sum of move flags per user

    Plan shape: the LAG and the running sum share one (user)-partitioned
    (ts, order_id)-ordered window spec, so Catalyst plans ONE hash
    exchange + per-partition sort for both; the episode aggregate then
    re-keys on (user, episode). No global sort, no UDF.

    Output (all-integer, value-hash gateable):
      (user, stay_id, t_start_us, t_end_us, dur_us, n_pings,
       sum_lat_e7, sum_lon_e7) — one row per qualifying episode.
    ``stay_id`` is the running move count (deterministic, not
    re-contiguous after the duration filter); centroid is reported as
    exact integer sums of 1e-7-degree coordinates (mean = sum/n is the
    caller's one division — kept out of the gate so the output is
    order-independent end to end).
    """
    stay_mm = int(round(stay_m * 1000.0))
    min_dur_us = int(round(min_dur_s * 1e6))
    w = Window.partitionBy(user).orderBy(ts, order_id)
    plat, plon = F.lag("lat").over(w), F.lag("lon").over(w)
    step = F.round(
        haversine_m(plat, plon, F.col("lat"), F.col("lon")) * 1000.0, 0
    ).cast("long")
    moved = F.when(
        step.isNull() | (step >= F.lit(stay_mm)), F.lit(1)
    ).otherwise(F.lit(0))
    # Two selects: window functions cannot nest in one expression. Both
    # specs reference the SAME (user, ts, order_id) attributes — not
    # re-aliased copies — so Catalyst stacks the two Window operators
    # over ONE exchange + per-partition sort (plan-pinned in tests).
    flagged = points.select(
        F.col(user),
        F.col(ts),
        F.col(order_id),
        # parquet event timestamps are TIMESTAMP_NTZ; the session pins
        # spark.sql.session.timeZone=UTC so this cast is the identity
        # reinterpretation and matches DuckDB's epoch_us(ts) exactly.
        F.unix_micros(F.col(ts).cast("timestamp")).alias("ts_us"),
        F.round(F.col("lat") * 1e7, 0).cast("long").alias("lat_e7"),
        F.round(F.col("lon") * 1e7, 0).cast("long").alias("lon_e7"),
        moved.alias("_moved"),
    ).select(
        F.col(user).alias("user"),
        "ts_us", "lat_e7", "lon_e7",
        F.sum("_moved").over(
            Window.partitionBy(user)
            .orderBy(ts, order_id)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("stay_id"),
    )
    return (
        flagged.groupBy("user", "stay_id")
        .agg(
            F.min("ts_us").alias("t_start_us"),
            F.max("ts_us").alias("t_end_us"),
            F.count(F.lit(1)).alias("n_pings"),
            F.sum("lat_e7").alias("sum_lat_e7"),
            F.sum("lon_e7").alias("sum_lon_e7"),
        )
        .withColumn("dur_us", F.col("t_end_us") - F.col("t_start_us"))
        .where(F.col("dur_us") >= F.lit(min_dur_us))
        .select(
            "user", "stay_id", "t_start_us", "t_end_us", "dur_us",
            "n_pings", "sum_lat_e7", "sum_lon_e7",
        )
    )


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
