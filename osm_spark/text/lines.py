"""Line/paragraph-level corpus deduplication (CCNet-style).

Web-text curation removes BOILERPLATE at sub-document granularity:
navigation strings, cookie banners, and licence footers repeat across
millions of pages, so document-level dedup (text/dedup.py) never sees
them. The CCNet/C4 recipe is: split every document into lines
(paragraphs), hash each line, and drop every occurrence of a duplicated
line except the globally first one, then reassemble the cleaned text.
Re-expresses the reference's duplicate-suppression idiom (the per-key
keep-one semantics of lib/osm/api.rb's result caching, SURVEY §2.3 J1)
at line granularity over the corpus.

Scale design (10^12-doc design point)
-------------------------------------
- The exploded line table is the corpus; it is shuffled exactly twice:
  once on the 16-byte line digest (first-occurrence aggregate, map-side
  combined: each partition pre-reduces to one candidate per digest), and
  once on doc_id for reassembly.
- The digest→first-occurrence table has one row per DISTINCT line. The
  join back is a shuffle_hash equi-join building on that (unique-key)
  side — never sort-merge, which would re-sort the full occurrence
  table for a join whose output is consumed once.
- Line content never rides through the digest aggregate (16-byte md5 +
  8-byte positions only); full text re-attaches only on the already
  digest-partitioned join.
- Keep-first is decided by min(struct(doc_id, line_no)) — associative,
  so partial aggregation is exact, and deterministic (positions are
  unique), so the result is replayable by any SQL engine: the operator
  gets a full value-hash oracle despite being a corpus-global dedup.

md5 collisions would merge unrelated lines (~2^-64 at corpus scale per
pair); acceptable for boilerplate removal, same trade as exact_dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Explode documents to (id, line_no, line) — line_no is the
    0-based position of the line within its document."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("line_no", "line"),
    )


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-global keep-first line dedup.

    Returns one row per input document: (id, clean_text, n_lines,
    n_kept). A line occurrence survives iff it is the globally first
    occurrence of its content — first by (doc_id, line_no) — so each
    distinct line remains exactly once in the whole corpus and document
    line order is preserved. Documents whose every line was seen
    earlier come back with clean_text = '' and n_kept = 0.
    """
    pos = F.struct(F.col(id_col).alias("d"), F.col("line_no").alias("p"))
    occ = split_lines(docs, id_col, text_col, sep).withColumn("h", F.md5("line"))
    first = occ.groupBy("h").agg(F.min(pos).alias("first_at"))
    keep = pos == F.col("first_at")
    # no doc-resurrection join needed: split() always yields >= 1 line,
    # and every occurrence matches its own digest group, so the final
    # aggregate has exactly one row per input document
    return (
        occ.join(first.hint("shuffle_hash"), "h")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(keep.cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(keep, F.struct("line_no", "line"))
                        )
                    ),
                    lambda x: x["line"],
                ),
                sep,
            ).alias("clean_text"),
        )
        .select(id_col, "clean_text", "n_lines", "n_kept")
    )


def line_dedup_within(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """WITHIN-document keep-first line dedup — the intra-page
    counterpart of :func:`line_dedup`: repeated nav strings, footers
    and boilerplate that recur INSIDE one page collapse to their first
    occurrence, document order preserved. CCNet applies this pass
    before the corpus-global one (a page's own repetition should not
    consume the corpus-global first-occurrence slot).

    Scale shape: a document's lines already live in its own row, so
    this is a PURE per-row Column program — zero shuffle, zero Python,
    whole-stage codegen. The first-occurrence test is
    ``array_position(lines, line) == index`` (first 1-based position),
    O(lines²) per document in the worst case — lines per page are
    bounded (thousands), not corpus-scale, so per-row cost is constant
    in corpus size.

    Output per document: (id, clean_text, n_lines, n_kept).
    """
    lines = F.split(F.col(text_col), sep)
    kept = F.filter(
        lines, lambda x, i: F.array_position(lines, x) == i + F.lit(1)
    )
    return docs.select(
        F.col(id_col),
        F.array_join(kept, sep).alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
    )
