"""RAG-style document chunking with overlap.

Splits each document's token stream into fixed-size windows every
``stride`` tokens (``stride < size`` ⇒ overlapping chunks, the retrieval
shape; ``stride == size`` ⇒ an exact partition).  Entirely row-local
pure-Column work — tokenize, ``sequence`` of window starts,
``posexplode``, ``slice`` — so there is NO shuffle at all and the
operator trivially scales: a 100 TB corpus chunks at scan speed with
output size bounded by ``ceil(size/stride)`` × input tokens.

Tokenization is the engine-wide single-space split (same as token_stats
/ lm / ngrams — `F.split(text, " ")` ↔ DuckDB `string_split`), so the
stride-==-size setting reassembles the ORIGINAL text byte-exactly when
chunks are re-joined (consecutive spaces become empty tokens and
survive the round trip) — that byte-identity is the reference's
extracted-text invariant carried through the chunker, and a test pins
it.

Reference parity: robertgauld/osm returns full documents (badge
requirement texts, lib/osm/badge.rb); chunking is the
retrieval-pipeline extension a web-scale corpus needs before embedding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["chunk_documents"]


def chunk_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """One row per (document, window): ``(id, chunk_id, start,
    n_tokens, chunk)``.  ``chunk_id`` counts windows from 0; ``start``
    is the 0-based token offset (= chunk_id × stride); the final window
    may be shorter than ``size``.  Null texts produce no chunks (the
    explicit-null policy the other text operators use); an empty string
    is one empty token, hence one chunk — matching the tokenizer's
    behavior everywhere else in the engine."""
    if size < 1:
        raise ValueError("size must be >= 1")
    if stride < 1:
        raise ValueError("stride must be >= 1")
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    starts = F.sequence(F.lit(0), n - 1, F.lit(stride))
    out = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            toks.alias("_toks"),
            F.posexplode(starts).alias("chunk_id", "start"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.col("start").cast("int").alias("start"),
            F.slice(F.col("_toks"), F.col("start") + 1, size).alias("_w"),
        )
    )
    return out.select(
        id_col,
        "chunk_id",
        "start",
        F.size("_w").alias("n_tokens"),
        F.array_join("_w", " ").alias("chunk"),
    )
