"""Set-containment join: which documents are (nearly) CONTAINED in
another — Broder's containment ``C(A→B) = |A∩B| / |A|`` over distinct
token sets. The size-skew blind spot of the whole Jaccard stack: a
quote, a syndicated article inside a portal page, or shared boilerplate
has Jaccard ≈ |A|/|B| ≈ 0 against its container but containment ≈ 1 —
MinHash/SimHash/LSH never surface it. Standard corpus-cleaning use:
drop the contained copy, keep the container (or vice versa).

Public algorithm family: Broder's containment (SEQUENCES 1997) with
PREFIX-FILTERED candidate generation (Chaudhuri-Ganti-Kaushik SSJoin,
ICDE 2006) — see ``containment_join`` for the recall proof. Two scale
guards compose: ``max_df_ratio`` drops stop-word-like terms BEFORE
anything (a term in every document alone yields ~N² candidates), and
the prefix filter bounds how often each DOCUMENT can meet others (the
mid-frequency O(df²) axis a df-cut alone leaves open). The denominator
is the post-cut set size, so the ratio stays a true containment over
the operator's own vocabulary — part of the definition, replayed
identically by the oracle.

Exactness: intersection and set sizes are exact integers; the single
closing float ``|A∩B| / |A|`` is one IEEE division, ppm-rounded in both
engines, and the threshold compares against the ROUNDED value (the
simjoin boundary idiom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
    volume). Standard containment-join hygiene; the oracle replays it.

    Candidate generation is PREFIX-FILTERED (Chaudhuri-Ganti-Kaushik
    SSJoin, ICDE 2006 — public algorithm family): tokens order globally
    by (df, term) ascending, and only the contained side's first
    ``n − ⌈τ·n⌉ + 1`` rarest tokens are indexed — recall-complete
    because a pair with ``|A∩B| ≥ τ·|A|`` misses fewer than
    ``n − τ·n`` of A's tokens, so at least one PREFIX token is shared.
    The candidate join therefore meets on the rarest slice of each
    document instead of every shared term: the df-cut bounds the worst
    term, the prefix bounds how often each document can meet anything.
    The exact intersection then runs per candidate pair as a sorted-
    array ``array_intersect`` in codegen — never a second postings
    self-join."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if min_set < 1:
        raise ValueError(f"min_set must be >= 1, got {min_set}")
    t_ppm = int(round(float(threshold) * 1e6))
    kept = token_sets(
        docs, id_col=id_col, text_col=text_col, max_df_ratio=max_df_ratio
    )
    # global rarity rank — a window over the TERM table (vocabulary-
    # sized, like the quantile histograms), never over postings
    df_t = kept.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.orderBy("df", "term")
    ranked_terms = df_t.select(
        "term", F.row_number().over(w).alias("_rank")
    )
    ranked = kept.join(ranked_terms.hint("shuffle_hash"), "term")

    arrs = ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        # rank-sorted token array: position = rarity order, and the
        # array doubles as the sorted input of array_intersect
        F.transform(
            F.sort_array(F.collect_list(F.struct("_rank", "term"))),
            lambda s: s["_rank"],
        ).alias("toks"),
    )
    if min_set > 1:
        arrs = arrs.where(F.col("n") >= F.lit(int(min_set)))
    arrs = arrs.withColumn(
        "_p", F.col("n") - F.ceil(F.lit(float(threshold)) * F.col("n")).cast("long") + 1
    )
    # index only the prefix of the CONTAINED side; the container side
    # posts everything (containment is asymmetric — B must be probe-able
    # by any of A's prefix tokens)
    a_idx = arrs.select(
        F.col("doc_id").alias("contained"),
        F.explode(F.slice("toks", F.lit(1), F.col("_p"))).alias("_rank"),
    )
    b_idx = arrs.select(
        F.col("doc_id").alias("container"),
        F.explode("toks").alias("_rank"),
    )
    cand = (
        a_idx.join(b_idx.hint("shuffle_hash"), "_rank")
        .where(F.col("contained") != F.col("container"))
        .select("contained", "container")
        .distinct()
    )
    paired = (
        cand.join(
            arrs.select(
                F.col("doc_id").alias("contained"),
                F.col("n"),
                F.col("toks").alias("a_toks"),
            ).hint("shuffle_hash"),
            "contained",
        )
        .join(
            arrs.select(
                F.col("doc_id").alias("container"),
                F.col("toks").alias("b_toks"),
            ).hint("shuffle_hash"),
            "container",
        )
    )
    n_shared = F.size(F.array_intersect("a_toks", "b_toks")).cast("long")
    c_ppm = F.round(
        F.col("n_shared").cast("double") / F.col("n").cast("double") * 1e6
    ).cast("long")
    return (
        paired.withColumn("n_shared", n_shared)
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
