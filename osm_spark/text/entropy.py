"""Per-source term-distribution entropy: how repetitive is each corpus
source — the boilerplate detector at the SOURCE granularity (the
quality layer scores documents; a whole feed whose term distribution
has low Shannon entropy is template output, scraped mirrors or spam,
whatever its per-document scores say).

    H(source) = ln T − (Σ_t c_t·ln c_t) / T     (natural-log entropy)

Exactness (the lm_score recipe, applied to an entropy sum): the inner
Σ c·ln c is a FLOAT sum and float addition is order-dependent under
Spark's partial aggregation — so each term's c·ln(c) is quantized to
micro-nats FIRST (an integer, bit-identical in any engine since c is an
exact integer) and the sum is an exact long sum. The closing expression
(ln T, one division, one rounding) is single-shot float arithmetic in
pinned order. Accepted cross-engine risk: ln() last-ulp at a 0.5
micro-nat boundary, as documented for lm_score.

Plan: one (source, term) aggregation over the tokenized corpus
(map-side combined — the ngram_counts shuffle shape), then one
source-keyed aggregation over the vocab-sized result. Tokenization
matches the rest of the text layer (lower + single-space split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def source_entropy(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, n_tokens, n_terms, entropy_micro) — natural-log term
    entropy per source in micro-nats; 0 for a single-term source."""
    tc = (
        docs.select(
            F.col(group_col).alias("source"),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    clogc = F.round(
        F.col("c").cast("double") * F.log(F.col("c").cast("double")) * 1e6, 0
    ).cast("long")
    agg = tc.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(clogc).alias("s_micro"),
    )
    t = F.col("n_tokens").cast("double")
    h_micro = F.round(
        F.log(t) * 1e6 - F.col("s_micro").cast("double") / t, 0
    ).cast("long")
    return agg.select(
        "source", "n_tokens", "n_terms", h_micro.alias("entropy_micro")
    )
