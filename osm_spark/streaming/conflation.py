"""Streaming geometry conflation: a stream of edited way geometries is
checked against a STATIC way layer for segment crossings as the edits
arrive — the live QA monitor behind the batch ``geo/crossings.py``
operator (a new road crossing a river without a bridge node should
alert on ingest, not at the next nightly conflation run). Completes
the streaming × spatial integration family (geofence counts, trending
terms, streaming map matching, corpus admission).

Scale design (the geofence_counts conventions): the stream side is
joined ONLY via a stream-static equi-join on the packed grid-cell key
— no stream-stream join; everything before the join is stateless
per-row codegen (segment explode → int64 quantization → bbox cell
cover, exactly the batch operator's pipeline stages 1-2). The exact
four-orientation refine is a stateless filter. The only stateful
operator is the final ``dropDuplicates`` on the 4-int pair id (a pair
sharing several cover cells must emit once); its state is bounded by
the emitted pair set — the right bound for an edit stream (each way
revision arrives once), and a keyed production deployment would age it
with a watermark on the edit timestamp.

Exactness: identical arithmetic to ``segment_crossings`` —
``availableNow`` over the same rows must equal the batch answer, which
is what the gate checks (stream result ≡ the batch integer-exact
DuckDB replay restricted to stream×static pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.geo.crossings import (
    DEFAULT_CELL_UNITS,
    DEFAULT_SCALE,
    _cover,
    segments_intersect_pred,
    way_segments,
)

__all__ = ["stream_crossings"]


def stream_crossings(
    ways_stream: DataFrame,
    static_ways: DataFrame,
    *,
    scale: int = DEFAULT_SCALE,
    cell_units: int = DEFAULT_CELL_UNITS,
    max_cells: int = 4096,
    closed: bool = True,
    id_col: str = "way_id",
) -> DataFrame:
    """(way_a, seg_a, way_b, seg_b) — way_a from the edit STREAM, way_b
    from the static layer; every quantized segment intersection
    (touching included), deduplicated across cover cells. Both inputs:
    id + ``vlat``/``vlon`` vertex arrays."""
    a = _cover(
        way_segments(ways_stream, scale=scale, id_col=id_col, closed=closed),
        cell_units,
        max_cells,
    ).select(
        F.col("way_id").alias("way_a"),
        F.col("seg_idx").alias("seg_a"),
        F.struct("x0", "y0", "x1", "y1").alias("a"),
        "cellk",
    )
    b = _cover(
        way_segments(static_ways, scale=scale, id_col=id_col, closed=closed),
        cell_units,
        max_cells,
    ).select(
        F.col("way_id").alias("way_b"),
        F.col("seg_idx").alias("seg_b"),
        F.struct("x0", "y0", "x1", "y1").alias("b"),
        "cellk",
    )
    hits = (
        a.join(b, "cellk")
        .where(segments_intersect_pred("a", "b"))
        .select("way_a", "seg_a", "way_b", "seg_b")
    )
    return hits.dropDuplicates(["way_a", "seg_a", "way_b", "seg_b"])
