"""Zipf rank-frequency fit — the corpus-health power-law diagnostic.

A natural-language corpus obeys freq ∝ rank^(−s) with s ≈ 1 (Zipf,
"Human behavior and the principle of least effort", 1949); machine-
generated spam, template farms and boilerplate-heavy crawls bend the
curve (Piantadosi, "Zipf's word frequency law in natural language",
Psychon Bull Rev 2014). This operator fits s by ordinary least squares
in log-log space over the ranked vocabulary — the standard one-number
corpus-quality signal next to entropy (text/entropy.py) and LM score
(text/lm.py).

Exactness contract: ln(rank) and ln(freq) quantize PER TYPE to
milli-units (bigint) before the sums, so every aggregate is an exact
integer (the lm_score quantize-then-sum convention; milli not micro so
Σx·y stays inside int64 at a 10^9-type vocabulary: (2.1e4)² · 10^9 ≈
4.4e17 < 2^63). The closing slope/intercept are one IEEE double
expression each over the exact sums, floor'd to nano — bit-identical
across engines.

Rank without a global window: rank(t) = |{t': f(t') > f(t)}| +
row_number within t's own frequency class (ordered by token). The
first term folds over the FREQUENCY HISTOGRAM — O(distinct freq
values) rows, ~O(√corpus) under Zipf, a driver-safe dim (the
token_quantiles histogram-collapse precedent) — and the intra-class
window partitions by frequency, never globally. ``min_freq`` bounds
the largest class (the freq-1 singleton tail is the vocab's majority
at web scale AND deviates from the power law — excluding it is both
the standard fitting practice and what keeps the per-class window
partition ≤ corpus_tokens/min_freq).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm_spark.text.bpe import word_frequencies

LOG_SCALE = 1_000  # milli-units carried by the quantized logs
OUT_SCALE = 1_000_000_000  # nano-units carried by slope/intercept

__all__ = ["zipf_fit", "zipf_ranks"]


def zipf_ranks(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_freq: int = 5,
) -> DataFrame:
    """(word, freq, rank): the fit's ranked vocabulary — rank 1 is the
    most frequent type, ties broken by token ascending."""
    vocab = word_frequencies(docs, id_col=id_col, text_col=text_col).where(
        F.col("freq") >= F.lit(int(min_freq))
    )
    hist = vocab.groupBy("freq").agg(F.count(F.lit(1)).alias("n_types"))
    # tokens strictly more frequent than this class: a window over the
    # HISTOGRAM (bounded by distinct frequency values, not vocab size)
    wh = (
        Window.orderBy(F.col("freq").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = hist.select(
        "freq",
        (F.sum("n_types").over(wh) - F.col("n_types")).alias("rank_base"),
    )
    wi = Window.partitionBy("freq").orderBy(F.col("word").asc())
    return (
        vocab.join(F.broadcast(base), "freq")
        .withColumn("rank", F.col("rank_base") + F.row_number().over(wi))
        .select("word", "freq", "rank")
    )


def zipf_fit(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_freq: int = 5,
) -> DataFrame:
    """One row (n_types, slope_nano, intercept_nano): OLS fit of
    ln(freq) = intercept + slope·ln(rank) over types with freq ≥
    ``min_freq``. A healthy natural corpus sits near slope ≈ −1·10^9."""
    ranked = zipf_ranks(
        docs, id_col=id_col, text_col=text_col, min_freq=min_freq
    )
    xy = ranked.select(
        F.round(F.log(F.col("rank").cast("double")) * LOG_SCALE, 0)
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("freq").cast("double")) * LOG_SCALE, 0)
        .cast("long")
        .alias("y"),
    )
    sums = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    den = n * sxx - sx * sx
    # logs are milli-scaled, so x and y each carry LOG_SCALE: the scale
    # cancels in slope; intercept keeps one LOG_SCALE factor to undo
    slope = F.when(den > 0, (n * sxy - sx * sy) / den)
    intercept = (sy - slope * sx) / n / F.lit(float(LOG_SCALE))
    return sums.select(
        F.col("n").alias("n_types"),
        F.floor(F.lit(float(OUT_SCALE)) * slope).cast("long").alias(
            "slope_nano"
        ),
        F.floor(F.lit(float(OUT_SCALE)) * intercept).cast("long").alias(
            "intercept_nano"
        ),
    )
