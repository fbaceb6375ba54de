"""Streaming geofence: watermarked tumbling-window counts of events
inside each polygon — the streaming × spatial integration (which zones
are hot RIGHT NOW), composing the PIP join's broadcast prejoin + codegen
ray-cast refine with the windowed-aggregation state machinery.

Reference analog: the attendance-per-event rollup
(`lib/osm/event.rb` attendance grid; SURVEY.md §3.4) re-expressed as an
unbounded stream; the spatial predicate is graft-mandated (§2.10).

Scale design: the stream side is joined ONLY via stream-static
broadcast equi-joins (covering cells, then polygon vertices) and a
codegen filter — no stream-stream join, no shuffle before the window
aggregation, which shuffles (window, way_id) partial counts bounded by
``windows-in-flight × zones``. The watermark bounds state exactly as in
``windowed_counts``; ``availableNow`` replays the same plan as a
bounded backfill, which is what makes the operator SQL-oracle-checkable
(stream result ≡ batch brute-force PIP + date_trunc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.pipeline.spatial_join import pip_cover_expr


def geofence_counts(
    points: DataFrame,
    polygons: DataFrame,
    way_cells: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    strategy: str = "broadcast",
) -> DataFrame:
    """(window_start, way_id, n_events) — events inside each polygon per
    tumbling window. ``points``: ts + lat/lon + h3_9 cell (stream or
    batch — same plan either way); ``polygons``/``way_cells``: the
    static dims of the PIP join.

    ``strategy='broadcast'`` (default) is the design point for curated
    geofence sets (bounded fences — the usual streaming shape): the
    stream never shuffles. ``'shuffle'`` is the scale path when the
    fence set is a whole polygon catalog past the broadcast ceiling:
    the covering and vertex dims hash-join (shuffle_hash hints — the
    stream side is skinny and must not sort). A pre-aggregated salt
    plan cannot exist over an unbounded stream, so hot cells inside a
    micro-batch rely on AQE's runtime skew split; for a known-hot
    deployment, run the batch ``pip_join_salted`` over short
    availableNow windows instead."""
    src = points
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    if strategy == "broadcast":
        wc, vx = F.broadcast(way_cells), F.broadcast(
            polygons.select("way_id", "vlat", "vlon")
        )
    elif strategy == "shuffle":
        wc = way_cells.hint("shuffle_hash")
        vx = polygons.select("way_id", "vlat", "vlon").hint("shuffle_hash")
    else:
        raise ValueError(f"unknown geofence_counts strategy: {strategy!r}")
    cand = src.join(wc, src["h3_9"] == way_cells["cell"], "inner").select(
        ts_col, "lat", "lon", "way_id"
    )
    cand = cand.join(vx, "way_id")
    hits = cand.filter(
        pip_cover_expr(F.col("lat"), F.col("lon"), F.col("vlat"), F.col("vlon"))
    )
    return (
        hits.groupBy(F.window(ts_col, window).alias("w"), "way_id")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "way_id", "n_events")
    )


def run_stream_to_memory(df: DataFrame, output_mode: str = "complete") -> DataFrame:
    """availableNow bounded run of a streaming aggregate into a memory
    sink; returns the materialized table (the windowed.py runner shape,
    generalized)."""
    import uuid

    sink = f"gf_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(sink)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(sink)
