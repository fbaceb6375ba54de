"""Positional inverted index + exact phrase search.

``positional_index`` explodes each document into ``(tok, doc_id, pos)``
postings — the classic search-index layout, partitionable by token so a
100 TB corpus's postings shard by term.  ``phrase_search`` answers an
exact consecutive-tokens query by the standard positional-intersection
plan: filter the postings to the phrase's terms FIRST (a pushdown-able
``isin`` — only the queried terms' postings ever leave the scan), then
chain ``m-1`` equi-joins on ``(doc_id, pos)`` with the position offset
folded into the join key.  Work is proportional to the queried terms'
posting lists, never to the corpus; every join is keyed (no cartesian,
no window over the corpus).

Overlapping occurrences count separately ("a a a" contains "a a"
twice), single-term phrases degrade to a postings count, and matching
is case-insensitive under the engine-wide lowercase single-space
tokenizer — all pinned by tests and by the DuckDB position-replay
oracle (which re-derives postings from ``generate_series`` subscripts,
NOT from substring search, so tokenization semantics stay identical).

Reference parity: robertgauld/osm filters badge requirement text by
exact string compare (lib/osm/badge.rb); phrase search is the indexed
generalization, complementing BM25 (text/ranking.py) which ranks
bag-of-words matches but cannot express adjacency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["positional_index", "phrase_search"]


def positional_index(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Postings ``(tok, doc_id, pos)`` with 0-based token positions;
    null texts contribute nothing."""
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.lower(text_col), " ")).alias(
                "pos", "tok"
            ),
        )
        .select("tok", "doc_id", F.col("pos").cast("int").alias("pos"))
    )


def phrase_search(
    docs: DataFrame,
    phrase: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents containing ``phrase`` as consecutive tokens:
    ``(doc_id, n_matches, first_pos)`` where ``first_pos`` is the
    0-based token offset of the earliest occurrence."""
    if not phrase:
        raise ValueError("phrase must be a non-empty token sequence")
    # the phrase is tokenized exactly like a document, so a phrase with
    # doubled spaces searches for the corresponding empty token
    terms = phrase.lower().split(" ")
    idx = positional_index(docs, id_col=id_col, text_col=text_col)
    # prune to queried terms before anything shuffles
    idx = idx.where(F.col("tok").isin(terms))
    base = idx.where(F.col("tok") == terms[0]).select("doc_id", "pos")
    for i, t in enumerate(terms[1:], start=1):
        nxt = (
            idx.where(F.col("tok") == t)
            # fold the offset into the join key: occurrence start pos
            .select("doc_id", (F.col("pos") - i).alias("pos"))
        )
        base = base.join(nxt, on=["doc_id", "pos"])
    return base.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_matches"),
        F.min("pos").cast("int").alias("first_pos"),
    )
