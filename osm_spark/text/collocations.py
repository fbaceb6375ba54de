"""PMI collocation mining: which adjacent word pairs co-occur far more
than chance — multiword expressions ("new york", "machine learning"),
boilerplate phrases, and tokenizer-merge candidates. The association
step ABOVE the raw n-gram profile (text/ngrams.py counts grams; this
scores them against their parts' marginals).

Pointwise mutual information (Church & Hanks 1990):

    PMI(a, b) = ln( P(a,b) / (P(a)·P(b)) )
              = ln( (C_ab · T · T) / (B · C_a · C_b) )

with C_ab the bigram count, C_a/C_b unigram counts, T total tokens and
B total bigrams. Exactness follows the lm_score recipe: every count is
an exact integer off combiner-reduced shuffles, the PMI is ONE closing
float expression over double-cast integers in pinned order (products
in doubles — they cannot overflow where the integer form would), and
the gated value is micro-nat quantized. The accepted cross-engine risk
is ln() differing in its last ulp exactly at a 0.5 micro-nat boundary
(same trade lm_score documents).

Scale plan (10^12 docs):

- unigram and bigram counts: one explode each, ONE hash aggregation
  keyed on the token/pair with map-side partial aggregation (hot pairs
  are capped at #partitions rows by the combiner; AQE skew-splits the
  residue). The min_count filter lands before any join.
- T and B are 1-row aggregates of the ALREADY-aggregated count tables
  (vocab-sized input, the catalog-statistic shape) broadcast back.
- marginal attach: two joins keyed on a single token against the
  unigram table — both sides vocab-bounded (≪ corpus), shuffle-hash
  hinted; nothing joins against corpus-sized data.

Tokenization matches ngrams/analysis (lower + single-space split), so
profile, LM and collocation layers agree on what a "word" is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_pairs(text) -> "F.Column":
    """array<struct<w1,w2>> of adjacent token pairs for one document."""
    toks = F.split(F.lower(text), " ")
    windows = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.struct(
            F.element_at(toks, i.cast("int")).alias("w1"),
            F.element_at(toks, (i + 1).cast("int")).alias("w2"),
        ),
    )
    # sequence(1, 0) descends instead of yielding [] — guard 1-token docs
    return F.when(F.size(toks) >= 2, windows).otherwise(
        F.array().cast("array<struct<w1:string,w2:string>>")
    )


def collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """(w1, w2, n_pair, n_w1, n_w2, pmi_micro) for every adjacent pair
    seen at least ``min_count`` times; pmi_micro = round(PMI · 1e6)."""
    toks = F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w")
    uni = docs.select(toks).groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))

    pairs = (
        docs.select(F.explode(word_pairs(F.col(text_col))).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )

    # totals BEFORE the min_count cut (they are corpus marginals, not
    # survivor marginals); both read the aggregated tables, not the docs
    tot = uni.agg(F.sum("n_w").alias("t_tokens")).crossJoin(
        pairs.agg(F.sum("n_pair").alias("b_pairs"))
    )

    surv = pairs.filter(F.col("n_pair") >= min_count)
    u1 = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2"))
    j = (
        surv.join(u1.hint("shuffle_hash"), "w1")
        .join(u2.hint("shuffle_hash"), "w2")
        .crossJoin(F.broadcast(tot))
    )

    cab = F.col("n_pair").cast("double")
    ca = F.col("n_w1").cast("double")
    cb = F.col("n_w2").cast("double")
    t = F.col("t_tokens").cast("double")
    b = F.col("b_pairs").cast("double")
    pmi_micro = F.round(F.log((cab * t * t) / (b * ca * cb)) * 1e6, 0).cast(
        "long"
    )
    return j.select(
        "w1", "w2", "n_pair", "n_w1", "n_w2", pmi_micro.alias("pmi_micro")
    )
