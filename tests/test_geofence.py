"""Streaming geofence: stream ≡ batch, watermark in plan, memory runner."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from osm_spark.geo.hexgrid import hex_cell_expr
from osm_spark.pipeline.geometry import build_way_cells, synth_polygons
from osm_spark.streaming.geofence import geofence_counts, run_stream_to_memory
from osm_spark.streaming.windowed import stream_events


def _points(src):
    did = F.col("event_id")
    from osm_spark.pipeline.pages import CITIES

    city = (did % 10).cast("int")
    clat = F.element_at(F.array(*[F.lit(x[1]) for x in CITIES]), city + 1)
    clon = F.element_at(F.array(*[F.lit(x[2]) for x in CITIES]), city + 1)
    lat = clat + (did * 2654435761 % 2001 - 1000) / 1000.0 * 0.05
    lon = clon + (did * 40503 % 2001 - 1000) / 1000.0 * 0.05
    return src.select(F.col("ts"), lat.alias("lat"), lon.alias("lon")).withColumn(
        "h3_9", hex_cell_expr("lat", "lon", 9)
    )


def test_geofence_stream_equals_batch(spark, sf_small_dir):
    polygons = synth_polygons(spark)
    cells = build_way_cells(polygons)
    events_path = os.path.join(sf_small_dir, "events.parquet")

    batch = geofence_counts(
        _points(spark.read.parquet(events_path)), polygons, cells
    )
    want = {
        (r.window_start, r.way_id): r.n_events for r in batch.collect()
    }
    stream = geofence_counts(
        _points(stream_events(spark, events_path)), polygons, cells
    )
    got = {
        (r.window_start, r.way_id): r.n_events
        for r in run_stream_to_memory(stream).collect()
    }
    assert len(want) > 0
    assert got == want

    # scale path: shuffle strategy (fence catalog past the broadcast
    # ceiling) — identical counts, and no dim rides a BroadcastExchange
    shuf = geofence_counts(
        _points(spark.read.parquet(events_path)), polygons, cells,
        strategy="shuffle",
    )
    got_shuf = {(r.window_start, r.way_id): r.n_events for r in shuf.collect()}
    assert got_shuf == want
    plan = shuf._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan, plan


def test_geofence_stream_plan_has_watermark_and_state(spark, sf_small_dir):
    polygons = synth_polygons(spark)
    cells = build_way_cells(polygons)
    stream = geofence_counts(
        _points(stream_events(spark, os.path.join(sf_small_dir, "events.parquet"))),
        polygons,
        cells,
    )
    assert stream.isStreaming
    plan = stream._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan
