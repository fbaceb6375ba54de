"""Structured Streaming layer (SURVEY.md §2.9)."""

from osm_spark.streaming.windowed import (
    stream_events,
    windowed_counts,
    run_windowed_counts_batchlike,
    sessionize,
)

__all__ = [
    "stream_events",
    "windowed_counts",
    "run_windowed_counts_batchlike",
    "sessionize",
]
