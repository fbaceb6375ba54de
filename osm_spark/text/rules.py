"""Named web-text curation rule sets: Gopher quality rules and C4 line
cleaning — the two most-cited deterministic filter recipes in LLM corpus
construction, as engine operators.

``gopher_rules`` implements the repetition-free subset of the Gopher
document-quality heuristics (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", table A1 — public
paper; the n-gram repetition rules live in ``analysis.repetition_stats``
already). ``c4_line_filter`` implements C4's line-level cleaning
(Raffel et al. 2020, "Exploring the Limits of Transfer Learning" §2.2):
keep lines that end in terminal punctuation, have ≥ ``min_words`` words
and are free of boilerplate markers; keep pages that retain ≥
``min_lines`` lines.

Exactness discipline: every threshold is evaluated as an INTEGER
comparison (e.g. mean word length ∈ [3, 10] ⇔ ``3·n ≤ Σlen ≤ 10·n``),
so there is no float in any rule and the DuckDB oracles replay the
decisions bit-for-bit — the ratio-threshold float trap never opens.

Scale shape: both operators are pure per-row Column programs (zero
shuffle, whole-stage codegen, no Python); the C4 page re-assembly is
one map-side-combinable groupBy on the page key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "gopher_rules",
    "c4_line_filter",
    "c4_line_verdict",
    "GOPHER_REQUIRED_STOPWORDS",
]

# Gopher's "must contain ≥ 2 of these" stopword list (Rae et al., A1).
GOPHER_REQUIRED_STOPWORDS = [
    "the", "be", "to", "of", "and", "that", "have", "with",
]


def _nonempty_words(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda w: w != "")


def _count_occurrences(text: Column, needle: str) -> Column:
    """Non-overlapping occurrence count via replace-length delta —
    identical leftmost-non-overlapping semantics in Spark and DuckDB."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def gopher_rules(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Gopher rule flags + the keep decision.

    Rules (all thresholds from the paper, all integer-compared):
    - ``r_word_count``: 50 ≤ words ≤ 100 000
    - ``r_mean_word_len``: mean word length ∈ [3, 10]
      (``3n ≤ Σlen ≤ 10n``; Σlen = chars with all whitespace removed)
    - ``r_symbol_ratio``: (# '#' + # '...') ≤ 0.1 × words (``10s ≤ n``)
    - ``r_bullet_lines``: ≥ 90 % of lines do NOT start with a bullet
      ('- ' or '• ')  (``10b ≤ lines``)
    - ``r_ellipsis_lines``: ≤ 30 % of lines end with '...'
      (``10e ≤ 3·lines``)
    - ``r_alpha_words``: ≥ 80 % of words contain an alphabetic char
      (``5a ≥ 4n``)
    - ``r_stopwords``: ≥ 2 distinct words from
      ``GOPHER_REQUIRED_STOPWORDS`` present
    - ``keep``: every rule true.

    Zero-word documents fail ``r_word_count`` (and so ``keep``) without
    any division. Documents without newlines are one line.
    """
    t = F.col(text_col)
    words = _nonempty_words(t)
    n_words = F.size(words).cast("long")
    sum_len = F.length(F.regexp_replace(t, r"\s", "")).cast("long")
    symbols = _count_occurrences(t, "#") + _count_occurrences(t, "...")
    lines = F.split(t, "\n")
    n_lines = F.size(lines).cast("long")
    bullets = F.size(
        F.filter(
            lines,
            lambda l: l.startswith("- ") | l.startswith("• "),
        )
    ).cast("long")
    ellipses = F.size(F.filter(lines, lambda l: l.endswith("..."))).cast(
        "long"
    )
    alpha = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ).cast("long")
    lowered = F.transform(words, F.lower)
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_REQUIRED_STOPWORDS]),
            lambda s: F.array_contains(lowered, s),
        )
    ).cast("long")

    r_word_count = (n_words >= 50) & (n_words <= 100_000)
    r_mean_word_len = (sum_len >= 3 * n_words) & (sum_len <= 10 * n_words)
    r_symbol_ratio = symbols * 10 <= n_words
    r_bullet_lines = bullets * 10 <= n_lines
    r_ellipsis_lines = ellipses * 10 <= n_lines * 3
    r_alpha_words = alpha * 5 >= n_words * 4
    r_stopwords = stop_hits >= 2
    keep = (
        r_word_count
        & r_mean_word_len
        & r_symbol_ratio
        & r_bullet_lines
        & r_ellipsis_lines
        & r_alpha_words
        & r_stopwords
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        r_word_count.alias("r_word_count"),
        r_mean_word_len.alias("r_mean_word_len"),
        r_symbol_ratio.alias("r_symbol_ratio"),
        r_bullet_lines.alias("r_bullet_lines"),
        r_ellipsis_lines.alias("r_ellipsis_lines"),
        r_alpha_words.alias("r_alpha_words"),
        r_stopwords.alias("r_stopwords"),
        keep.alias("keep"),
    )


def c4_line_verdict(line: Column, min_words: int = 5) -> Column:
    """The per-line C4 retention predicate as a standalone Column —
    STATELESS, so it runs unchanged in a structured stream (the
    line-verdict stage of a streaming ingest pipeline) and inside the
    batch page re-assembly below."""
    low = F.lower(line)
    terminal = (
        line.endswith(".")
        | line.endswith("!")
        | line.endswith("?")
        | line.endswith('"')
    )
    enough_words = F.size(_nonempty_words(line)) >= min_words
    clean = (
        ~low.contains("lorem ipsum")
        & ~line.contains("{")
        & ~low.rlike(r"(^|\s)javascript(\s|$)")
    )
    return terminal & enough_words & clean


def c4_line_filter(
    lines: DataFrame,
    page_col: str = "page_id",
    pos_col: str = "pos",
    line_col: str = "line",
    min_words: int = 5,
    min_lines: int = 3,
) -> DataFrame:
    """C4 line-level cleaning over a line table ``(page, pos, line)`` —
    the shape a web extractor emits and the scalable unit of this
    filter (each line's verdict is independent; the page verdict is one
    aggregate).

    A line is RETAINED iff it ends in terminal punctuation
    (``. ! ? "``), has ≥ ``min_words`` whitespace words, and contains
    neither ``lorem ipsum`` (case-insensitive) nor a ``{`` nor the word
    ``javascript`` (case-insensitive) — the deterministic C4 rules
    (the bad-words list is licensing-external and out of scope).

    Output per page: ``(page, text, n_lines_kept, kept)`` where
    ``text`` is the retained lines joined with newline in original
    ``pos`` order (deterministic: sorted structs, not collect order)
    and ``kept`` = ``n_lines_kept ≥ min_lines`` (C4 §2.2 keeps pages
    with at least three retained sentences/lines). Pages whose lines
    are ALL dropped still return a row (empty text, kept = false).
    """
    retained = c4_line_verdict(F.col(line_col), min_words)
    per_line = lines.select(
        F.col(page_col).alias("page_id"),
        F.col(pos_col).alias("pos"),
        F.col(line_col).alias("line"),
        retained.alias("_keep"),
    )
    agg = per_line.groupBy("page_id").agg(
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("_keep"), F.struct(F.col("pos"), F.col("line"))
                )
            )
        ).alias("_kept"),
        F.count(F.lit(1)).alias("n_lines_in"),
    )
    return agg.select(
        "page_id",
        F.concat_ws(
            "\n", F.transform(F.col("_kept"), lambda s: s["line"])
        ).alias("text"),
        F.size("_kept").cast("long").alias("n_lines_kept"),
        (F.size("_kept") >= min_lines).alias("kept"),
    )
