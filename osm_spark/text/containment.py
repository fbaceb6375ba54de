"""Set-containment join: which documents are (nearly) CONTAINED in
another — Broder's containment ``C(A→B) = |A∩B| / |A|`` over distinct
token sets. The size-skew blind spot of the whole Jaccard stack: a
quote, a syndicated article inside a portal page, or shared boilerplate
has Jaccard ≈ |A|/|B| ≈ 0 against its container but containment ≈ 1 —
MinHash/SimHash/LSH never surface it. Standard corpus-cleaning use:
drop the contained copy, keep the container (or vice versa).

Public algorithm family: Broder's containment (SEQUENCES 1997) in the
exact inverted-index form the APSS join (text/simjoin.py) established —
two documents meet once per SHARED term, the intersection count
combines map-side, no all-pairs stage exists.

Scale guard (shared with simjoin): the one blow-up axis is a
stop-word-like term in every document (~N² candidates from one term).
``max_df_ratio`` drops such terms BEFORE the self-join; the denominator
is the post-cut set size, so the ratio stays a true containment over
the operator's own vocabulary — part of the definition, replayed
identically by the oracle.

Exactness: intersection and set sizes are exact integers; the single
closing float ``|A∩B| / |A|`` is one IEEE division, ppm-rounded in both
engines, and the threshold compares against the ROUNDED value (the
simjoin boundary idiom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["token_sets", "containment_join"]


def token_sets(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_ratio: float = 0.5,
) -> DataFrame:
    """Distinct (doc_id, term) over the engine-wide tokenizer
    (lowercase, single-space split, zero-length tokens dropped — the
    ``word_frequencies`` policy), with the df-cut applied."""
    base = docs.where(F.col(text_col).isNotNull())
    toks = (
        base.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(text_col), " ")).alias("term"),
        )
        .where(F.length("term") > 0)
        .distinct()
    )
    df_t = toks.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = base.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        toks.join(df_t.hint("shuffle_hash"), "term")
        .crossJoin(F.broadcast(n_docs))
        .where(
            F.col("df").cast("double")
            <= F.lit(float(max_df_ratio)) * F.col("n_docs").cast("double")
        )
        .select("doc_id", "term")
    )


def containment_join(
    docs: DataFrame,
    threshold: float,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_ratio: float = 0.5,
    min_set: int = 1,
) -> DataFrame:
    """(contained, container, n_shared, n_contained, c_ppm) — every
    ORDERED pair of distinct documents where
    ``round(|A∩B| / |A| · 1e6) ≥ round(threshold · 1e6)`` (A = the
    contained side's post-df-cut token set). Both directions of a pair
    can appear — mutual near-containment is exactly the exact-dup
    signal. Documents whose whole vocabulary falls to the df-cut have
    no set and emit nothing.

    ``min_set`` drops documents whose post-cut set is smaller than the
    floor from BOTH sides of the join (a one-token doc is trivially
    contained everywhere — noise, and its postings only add candidate
    volume). Standard containment-join hygiene; the oracle replays it."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if min_set < 1:
        raise ValueError(f"min_set must be >= 1, got {min_set}")
    t_ppm = int(round(float(threshold) * 1e6))
    kept = token_sets(
        docs, id_col=id_col, text_col=text_col, max_df_ratio=max_df_ratio
    )
    sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    if min_set > 1:
        # semi-join the floor back onto the postings — doc-keyed and
        # shuffle_hash-hinted (the sizes table is doc-sized: never
        # broadcast the 10^12-doc axis)
        sizes = sizes.where(F.col("n") >= F.lit(int(min_set)))
        kept = kept.join(
            sizes.select("doc_id").hint("shuffle_hash"), "doc_id", "left_semi"
        )
    inter = (
        kept.alias("a")
        .join(
            kept.alias("b").hint("shuffle_hash"),
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("contained"),
            F.col("b.doc_id").alias("container"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    c_ppm = F.round(
        F.col("n_shared").cast("double") / F.col("n").cast("double") * 1e6
    ).cast("long")
    return (
        inter.join(
            sizes.select(
                F.col("doc_id").alias("contained"),
                F.col("n"),
            ).hint("shuffle_hash"),
            "contained",
        )
        .withColumn("c_ppm", c_ppm)
        .where(F.col("c_ppm") >= F.lit(t_ppm))
        .select(
            "contained",
            "container",
            "n_shared",
            F.col("n").alias("n_contained"),
            "c_ppm",
        )
    )
