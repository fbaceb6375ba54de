"""Streaming twin of the hypertable OHLC rollup (pipeline/rollup.py).

The continuous-aggregate ingestion path: events arrive as a stream,
tumbling event-time windows accumulate the same algebraic OHLC state
the batch rollup computes, watermarked for late data. Because every
aggregate is algebraic (struct-min/max picks, extrema, quantized bigint
sum), the streaming plan's state is EXACTLY the batch `rollup_state`
row — so stream ≡ batch is a provable contract, gated against the same
DuckDB oracle as the batch query (the engine's streaming convention,
cf. windowed.py run_windowed_counts_batchlike).

Scale: state per live (key, window) only; watermark bounds state
retention; the shuffle is the same single (key, window) exchange as
batch with streaming partial aggregation in front.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_spark.pipeline.rollup import SUM_SCALE

__all__ = ["stream_ohlc", "run_stream_ohlc_batchlike"]


def stream_ohlc(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
    width_s: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window OHLC — same output schema and values
    as the batch ``rollup_ohlc`` (works on a stream or batch frame)."""
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    pick = F.struct(
        F.col(ts_col).alias("t"),
        F.col(id_col).alias("i"),
        F.col(val_col).cast("double").alias("v"),
    )
    width_us = int(width_s) * 1_000_000
    agged = (
        src.select(
            F.col(key_col).alias("key"),
            F.col(ts_col),
            pick.alias("_p"),
            F.col(val_col).cast("double").alias("_v"),
        )
        .groupBy(F.window(ts_col, f"{width_s} seconds").alias("w"), F.col("key"))
        .agg(
            F.min("_p").alias("open_pick"),
            F.max("_v").alias("high"),
            F.min("_v").alias("low"),
            F.max("_p").alias("close_pick"),
            F.sum(F.round(F.col("_v") * SUM_SCALE, 0).cast("long")).alias(
                "sum_micro"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return agged.select(
        "key",
        (F.unix_micros(F.col("w.start")) / F.lit(width_us))
        .cast("long")
        .alias("bucket"),
        F.col("open_pick").getField("v").alias("open"),
        "high",
        "low",
        F.col("close_pick").getField("v").alias("close"),
        "sum_micro",
        "n",
    )


def run_stream_ohlc_batchlike(
    spark: SparkSession, events_path: str, width_s: int = 3600
) -> DataFrame:
    """availableNow backfill of the streaming OHLC plan into a memory
    sink (complete mode) — bounded, deterministic, SQL-oracle-checkable
    against the batch rollup's oracle."""
    import uuid

    from osm_spark.streaming.windowed import stream_events

    sink = f"ohlc_{uuid.uuid4().hex[:8]}"
    q = (
        stream_ohlc(stream_events(spark, events_path), width_s=width_s)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)
