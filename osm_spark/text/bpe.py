"""BPE tokenizer vocabulary induction (the merge-table trainer).

Byte-pair encoding (Sennrich, Haddow & Birch, ACL 2016 — the public
subword algorithm, independently implemented): start from characters,
repeatedly (1) count adjacent symbol pairs over the corpus weighted by
word frequency, (2) take the most frequent pair — ties broken
(count DESC, left ASC, right ASC) so training is deterministic — and
(3) merge its non-overlapping left-to-right occurrences in every word.
The output is the merge table, which IS the tokenizer.

Scale shape: the corpus collapses to the word-frequency table in its
first exchange (vocabulary-sized — the same reduction token_stats/lm
use), so every round's pair count is an aggregate over the VOCABULARY,
not the corpus; the winning pair is one row (collected driver-side —
the bounded-scalar pattern of ivf.py's centroids: k rows total for k
merges) and the merge application is a pure-Column array fold with the
winner inlined as literals.  Per-round lineage truncation keeps the
iterative plan bounded (graph/iterate.py).

The left-to-right greedy merge is the sequential ``F.aggregate`` fold:
append, or coalesce the accumulator's last element when (last == left,
current == right) — merged symbols are ≥ 2 chars so they can never be
re-matched as a bare left within the same pass, which is exactly the
non-overlap rule ("aaa" + merge(a,a) → "aa","a").  The DuckDB oracle
cannot fold lists, so it replays the SAME semantics positionally:
matches, maximal match streaks (overlap exists only when left == right,
so within a streak merges start at even offsets), then renumbered
positions — two window functions per round, generated and unrolled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from osm_spark.graph.iterate import drop_truncated, truncate_lineage

__all__ = ["bpe_train", "bpe_encode", "word_frequencies"]


def word_frequencies(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, freq) over the engine-wide lowercase single-space
    tokenizer; empty tokens (doubled spaces) are dropped — a zero-char
    word has no pairs and would only pollute the symbol table."""
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(F.explode(F.split(F.lower(text_col), " ")).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


def _merge_fold(syms, left: str, right: str):
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.slice(syms, 1, 0),  # empty array<string> of the right type
        # try_element_at: NULL (never ANSI-throws) on the empty
        # accumulator; NULL == left is NULL, so `when` falls through
        lambda acc, s: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    docs: DataFrame,
    *,
    n_merges: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The merge table ``(step, left, right, pair_count)`` for
    ``n_merges`` BPE rounds (fewer if the corpus runs out of pairs)."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    spark = docs.sparkSession
    wf = word_frequencies(docs, id_col=id_col, text_col=text_col)
    words = wf.select(
        "word",
        "freq",
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.substring(F.col("word"), i, 1),
        ).alias("syms"),
    )
    merges: list[tuple[int, str, str, int]] = []
    prev = None
    for step in range(1, n_merges + 1):
        # adjacent pairs via zipped shifted slices — single-symbol
        # words yield empty arrays without touching the
        # sequence(1, 0)-DESCENDS trap (see text/ngrams.py)
        s = F.col("syms")
        pair_arr = F.zip_with(
            F.slice(s, 1, F.size(s) - 1),
            F.slice(s, 2, F.size(s) - 1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        )
        pairs = (
            words.select("freq", F.explode(pair_arr).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
        )
        # winner: one row, bounded driver collect (the ivf centroid
        # pattern); the pair table is vocabulary-sized, so the sort is
        # small by construction (the int_quantiles argument)
        top = pairs.orderBy(
            F.desc("cnt"), F.asc("l"), F.asc("r")
        ).limit(1).collect()
        if not top:
            break
        l, r, cnt = top[0].l, top[0].r, int(top[0].cnt)
        merges.append((step, l, r, cnt))
        words = truncate_lineage(
            words.select("word", "freq", _merge_fold(F.col("syms"), l, r).alias("syms"))
        )
        if prev is not None:
            drop_truncated(prev)
        prev = words
    if prev is not None:
        drop_truncated(prev)
    return spark.createDataFrame(
        merges, "step int, left string, right string, pair_count bigint"
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained merge list to the corpus and return the subword
    vocabulary usage ``(sym, n_occurrences)`` — the table a tokenizer
    ships with.  ``merges`` is ordered (step order matters: later
    merges see earlier merges' symbols); each is applied as the same
    greedy fold ``bpe_train`` used, inlined as literals, so encode is a
    single zero-join pass over the word-frequency table no matter how
    many merges were trained."""
    wf = word_frequencies(docs, id_col=id_col, text_col=text_col)
    syms = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substring(F.col("word"), i, 1),
    )
    for left, right in merges:
        syms = _merge_fold(syms, left, right)
    return (
        wf.select("freq", F.explode(syms).alias("sym"))
        .groupBy("sym")
        .agg(F.sum("freq").cast("bigint").alias("n_occurrences"))
    )
