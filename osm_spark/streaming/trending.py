"""Streaming trending terms: watermarked tumbling-window term counts
over a document stream, ranked per window after materialization.

The stream × text composition (streaming/windowed.py aggregates typed
events; this tokenizes free text in-stream): "what is the corpus talking
about THIS hour" — trend detection over a crawl feed, the streaming
sibling of text/keywords.py.

Structure, and why it is split in two:

- ``trending_term_counts`` is the STREAMING-SAFE part: tokenize + explode
  (stateless, map-side), then ONE watermarked windowed aggregation keyed
  on (window, term) with partial aggregation — the state bound is
  windows-in-flight × vocabulary, independent of stream length.
- ``rank_trending`` is the per-window top-k — a rank over the
  MATERIALIZED window results. Ranking cannot run inside the streaming
  agg (window functions are unsupported on update-mode streams and a
  global top-k per window is only final when the window closes); ranking
  the sink output is the standard pattern, and the input is
  aggregate-sized (windows × vocabulary), not stream-sized. Ties break
  on the term so the output is deterministic.

Bounded-backfill mode (availableNow into a memory sink) runs the same
streaming plan to completion, which is what makes the composed operator
oracle-checkable in plain SQL (the windowed.py precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def stream_documents(spark: SparkSession, docs_path: str) -> DataFrame:
    """File-source stream over a documents parquet directory or file
    (the Kafka/CDC stand-in, mirroring windowed.stream_events)."""
    import os

    reader = spark.readStream.schema(DOCS_SCHEMA).option("maxFilesPerTrigger", 4)
    if os.path.isfile(docs_path):
        reader = reader.option("pathGlobFilter", os.path.basename(docs_path))
        docs_path = os.path.dirname(docs_path)
    return reader.parquet(docs_path)


def with_synthetic_ts(docs: DataFrame) -> DataFrame:
    """Deterministic arrival time for the timestamp-less documents
    table: doc_id minutes past 2024-01-01 (tests/oracle replay the same
    arithmetic; a real feed supplies its own event time instead)."""
    return docs.withColumn(
        "ts",
        F.expr(
            "timestamp'2024-01-01 00:00:00'"
            " + make_interval(0, 0, 0, 0, 0, doc_id, 0)"
        ),
    )


def trending_term_counts(
    docs: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """(window_start, term, n) — tumbling-window term occurrence counts;
    tokenization matches the text layer (lower + single-space split).
    Streaming-safe: stateless explode, one watermarked aggregation."""
    src = docs
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.select(
            F.col(ts_col),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
        )
        .groupBy(F.window(ts_col, window).alias("w"), "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "term", "n")
    )


def rank_trending(counts: DataFrame, k: int = 5) -> DataFrame:
    """(window_start, term, n, rank) — top ``k`` terms per window from
    materialized window counts, ties broken by term ascending."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy("window_start").orderBy(
        F.desc("n"), F.asc("term")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("window_start", "term", "n", "rank")
    )


def run_trending_batchlike(
    spark: SparkSession,
    docs_path: str,
    window: str = "1 hour",
    k: int = 5,
) -> DataFrame:
    """availableNow bounded backfill of the streaming plan into a memory
    sink, then the per-window rank — identical results to the batch
    plan, so it is oracle-checkable in plain SQL."""
    import uuid

    sink = f"tr_{uuid.uuid4().hex[:8]}"
    q = (
        trending_term_counts(
            with_synthetic_ts(stream_documents(spark, docs_path)), window
        )
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rank_trending(spark.table(sink), k=k)
