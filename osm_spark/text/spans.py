"""Exact-substring (token-window) span deduplication — the
"deduplicating training data" recipe at span granularity: any W-token
run that occurs elsewhere in the corpus is removed from every
occurrence except the globally first one.

Document-level dedup (text/dedup.py) misses partially-copied text;
line dedup (text/lines.py) only catches copies aligned to line breaks.
Span dedup slides a W-token window over every document, so a quoted
paragraph embedded mid-page is caught wherever it starts. Published
recipe: Lee et al. 2022 ("Deduplicating Training Data Makes Language
Models Better") use suffix arrays for minimum-length-L matches; the
fixed-window form here is the standard distributed approximation — a
duplicated run of length ≥ W is caught exactly (every W-window inside
it is duplicated), shorter overlaps are below the threshold by design.

Semantics
---------
Token t (0-based position i) in document d is **dup-covered** iff some
window occurrence [s, s+W) of d with s ≤ i < s+W has window content
that first occurred (by min (doc_id, start)) somewhere else. Output is
one row per document: (doc_id, n_tokens, n_dup_tokens, clean_text)
where clean_text keeps exactly the non-covered tokens in order. The
globally-first occurrence of every distinct window survives, so no
content is lost from the corpus — later copies are cut.

Scale design (10^12-doc design point)
-------------------------------------
- Windows are built as ONE pure-Column array projection per document
  (transform over sequence + slice + md5) — no explode until the
  digest shuffle, and the 16-byte digest + 8-byte start are the ONLY
  payload that rides it (never window text).
- Shuffle 1: digest → min(struct(doc_id, start)) — map-side combined,
  one row per distinct window per partition.
- Shuffle 2 (shuffle_hash, building on the unique-digest side): join
  first-occurrence back to occurrences; non-first starts aggregate to
  one sorted array per document (map-side combined).
- The coverage mask is computed per-document from that starts array —
  pure Column, O(n_tokens × n_dup_windows) worst case but zero extra
  shuffle; the text attaches via ONE equi-join on doc_id.
- Keep-first is min(struct) — associative and deterministic, so the
  whole corpus-global operator is exactly SQL-replayable (full
  value-hash oracle, same as line_dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def window_digests(
    docs: DataFrame, w: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, start, h): every W-token window occurrence, digest only.
    Documents shorter than W tokens emit nothing (they can never match
    a full window)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    digests = F.when(
        n >= w,
        F.transform(
            F.sequence(F.lit(0), n - w),
            lambda s: F.md5(F.array_join(F.slice(toks, s + 1, w), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col(id_col), F.posexplode(digests).alias("start", "h")
    )


def span_dedup(
    docs: DataFrame, w: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-global keep-first span dedup (module docstring). One row
    per input document: (doc_id, n_tokens, n_dup_tokens, clean_text)."""
    occ = window_digests(docs, w, id_col, text_col)
    pos = F.struct(F.col(id_col).alias("d"), F.col("start").alias("p"))
    first = occ.groupBy("h").agg(F.min(pos).alias("first_at"))
    dups = (
        occ.join(first.hint("shuffle_hash"), "h")
        .filter(pos != F.col("first_at"))
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list("start")).alias("dup_starts"))
    )
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    starts = F.coalesce(
        F.col("dup_starts"), F.array().cast("array<int>")
    )
    covered = lambda i: F.exists(  # noqa: E731
        starts, lambda s: (s <= i) & (i < s + w)
    )
    kept = F.filter(toks, lambda _t, i: ~covered(i))
    n_dup = F.size(toks) - F.size(kept)
    return (
        docs.join(dups, id_col, "left")
        .select(
            F.col(id_col),
            n.cast("long").alias("n_tokens"),
            n_dup.cast("long").alias("n_dup_tokens"),
            F.array_join(kept, " ").alias("clean_text"),
        )
    )
