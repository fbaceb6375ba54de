"""Corpus distribution drift — KL divergence between hashed n-gram
distributions of two corpus slices.

The operational companion to DSIR selection (text/dsir.py): a 100 TB
ingestion pipeline needs to DETECT when a new crawl snapshot's language
distribution has drifted from the standing corpus before admitting it
(topic shifts, spam floods, boilerplate regime changes). Both slices
are featurized with the same hashed unigram+bigram bucket fold as
dsir_weights, Laplace-smoothed over the FULL bucket space, and compared
by Kullback–Leibler divergence in both directions (Jeffreys = their
sum).

Exactness: with p = (c_b+1)/(tot+B) the divergence

    KL(cur‖ref) = Σ_b p_cur[b] · (ln p_cur[b] − ln p_ref[b])
                = Σ_b (c_b+1) · lr_micro[b]  /  (tot+B)  /  1e6

where ``lr_micro`` is the per-bucket micro-nat difference of the two
quantized log-probs (the lm.py idiom). The numerator is an exact long
sum of integer×integer terms, and one long→double division renders the
float — order-independent and engine-exact. Long range: this is a
corpus-GLOBAL sum (unlike lm_score's bounded per-doc sums), and under
Spark 4's ANSI mode an overflow past ~9.2e18 fails LOUDLY instead of
wrapping; that headroom is ~2e11 grams × a worst-case 40e6-micro-nat
ratio, and the one-line upgrade past it is casting the term product to
DECIMAL(38,0) on both engines.

Scale: two map-side-combined gram shuffles (one per slice), a
bucket-space join that is AT MOST ``num_buckets`` rows regardless of
corpus size, and a 2-row output. Nothing scales with the corpora but
the two featurization passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.text.dsir import hashed_gram_counts

__all__ = ["corpus_drift"]

_MICRO = 1_000_000.0


def corpus_drift(
    reference: DataFrame,
    current: DataFrame,
    *,
    num_buckets: int = 8192,
    id_col: str = "doc_id",
    text_col: str = "text",
    bigrams: bool = True,
) -> DataFrame:
    """Two rows — (direction, n_grams, kl_sum_micro, kl_nats) for
    ``cur_vs_ref`` (KL(current‖reference)) and ``ref_vs_cur``.

    ``n_grams`` is the direction's own slice total; ``kl_sum_micro`` is
    the exact long numerator Σ (c_b+1)·Δlogp_micro over the full
    bucket space (every bucket has Laplace mass, so unseen buckets
    contribute); ``kl_nats`` its double rendering divided by
    (n_grams + num_buckets)·1e6, rounded to 6. Always ≥ 0 up to
    micro-nat quantization (tiny negatives are possible when the true
    divergence is ~0 — a drift monitor thresholds far above that).
    """
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")
    b = int(num_buckets)

    def _bucket_totals(df: DataFrame, name: str) -> DataFrame:
        return (
            hashed_gram_counts(
                df, b, id_col=id_col, text_col=text_col, bigrams=bigrams
            )
            .groupBy("bucket")
            .agg(F.sum("cnt").alias(name))
        )

    rc = _bucket_totals(reference, "rc")
    cc = _bucket_totals(current, "cc")
    # full bucket space: unseen buckets carry Laplace mass in BOTH
    # distributions and belong in the sum
    space = reference.sparkSession.range(b).select(
        F.col("id").alias("bucket")
    )
    both = (
        space.join(rc, "bucket", "left")
        .join(cc, "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("rc"), F.lit(0)).alias("rc"),
            F.coalesce(F.col("cc"), F.lit(0)).alias("cc"),
        )
    )
    tot = both.agg(
        F.sum("rc").alias("r_total"), F.sum("cc").alias("c_total")
    )

    def _lp(cnt, total):
        return F.round(
            F.log(
                (cnt + F.lit(1)).cast("double")
                / (total + F.lit(b)).cast("double")
            )
            * F.lit(_MICRO)
        ).cast("long")

    lp_r = _lp(F.col("rc"), F.col("r_total"))
    lp_c = _lp(F.col("cc"), F.col("c_total"))
    term_cur = (F.col("cc") + F.lit(1)) * (lp_c - lp_r)
    term_ref = (F.col("rc") + F.lit(1)) * (lp_r - lp_c)
    sums = both.crossJoin(F.broadcast(tot)).agg(
        F.sum(term_cur).alias("kl_cur"),
        F.sum(term_ref).alias("kl_ref"),
        F.first(F.col("r_total")).alias("r_total"),
        F.first(F.col("c_total")).alias("c_total"),
    )
    rows = F.explode(
        F.array(
            F.struct(
                F.lit("cur_vs_ref").alias("direction"),
                F.col("c_total").alias("n_grams"),
                F.col("kl_cur").alias("kl_sum_micro"),
            ),
            F.struct(
                F.lit("ref_vs_cur").alias("direction"),
                F.col("r_total").alias("n_grams"),
                F.col("kl_ref").alias("kl_sum_micro"),
            ),
        )
    ).alias("_e")
    return sums.select(rows).select(
        F.col("_e.direction").alias("direction"),
        F.col("_e.n_grams").alias("n_grams"),
        F.col("_e.kl_sum_micro").alias("kl_sum_micro"),
        F.round(
            F.col("_e.kl_sum_micro").cast("double")
            / (F.col("_e.n_grams") + F.lit(b)).cast("double")
            / F.lit(_MICRO),
            6,
        ).alias("kl_nats"),
    )
