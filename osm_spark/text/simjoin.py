"""All-pairs sparse TF-IDF cosine similarity join (APSS).

The exact sparse-vector similarity self-join (Bayardo, Ma &
Srikant, "Scaling up all pairs similarity search", WWW 2007 — public
algorithm family, independently implemented in its inverted-index
form): candidate pairs come from the term-keyed self-join of the
inverted index — two documents meet once per SHARED term, so the join
is keyed, partial dot products combine map-side, and no all-pairs
stage exists anywhere.  This is the exact-cosine complement to the
probabilistic near-dup stack (minhash/simhash estimate Jaccard/cosine;
embedding_near_dups works on dense vectors; THIS operator is exact on
the sparse TF-IDF representation itself).

Scale guard: the one blow-up axis is a stop-word-like term shared by
every document (df ≈ N ⇒ ~N² candidate rows from that single term).
``max_df_ratio`` drops terms present in more than that fraction of the
corpus BEFORE the self-join — the standard APSS df-cut, and the right
semantics too: ubiquitous terms carry ~zero idf weight, so they add
O(N²) work for ~nothing.  The cut is part of the operator's definition
and the oracle replays it identically.

Exactness: weights are the engine's micro-quantized tf·ln(N/df) longs
(the keywords.py recipe), so dot products and squared norms are EXACT
integer sums routed through decimal(38,0) (↔ DuckDB HUGEINT — the
hits/morans overflow idiom); the single closing float expression
``dot / (√n_a·√n_b)`` is IEEE-identical across engines and rounded to
6 decimals, which is also what the threshold compares against (a pair
at the boundary is decided by the rounded value in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["tfidf_weights", "cosine_sim_join"]


def tfidf_weights(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_ratio: float = 0.5,
) -> DataFrame:
    """Micro-quantized TF-IDF inverted index ``(doc_id, term, wq)``
    over the engine-wide lowercase single-space tokenizer (empty tokens
    from doubled spaces dropped — the ``word_frequencies`` policy,
    ADVICE r4 alignment), with the df-cut applied (terms in more than
    ``max_df_ratio``·N docs drop)."""
    base = docs.where(F.col(text_col).isNotNull())
    tf = (
        base.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(text_col), " ")).alias("term"),
        )
        .where(F.length("term") > 0)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = base.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(df_t.hint("shuffle_hash"), "term")
        .crossJoin(F.broadcast(n_docs))
        .where(
            F.col("df").cast("double")
            <= F.lit(float(max_df_ratio)) * F.col("n_docs").cast("double")
        )
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf").cast("double")
                * F.log(
                    F.col("n_docs").cast("double")
                    / F.col("df").cast("double")
                )
                * 1e6,
                0,
            )
            .cast("long")
            .alias("wq"),
        )
    )


def cosine_sim_join(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_df_ratio: float = 0.5,
    materialize: bool = True,
) -> DataFrame:
    """Unordered pairs ``(id_a, id_b, sim)`` with exact TF-IDF cosine
    ``sim ≥ threshold`` (compared after round-6, see module doc).
    Documents whose entire vocabulary fell to the df-cut (zero norm)
    pair with nothing.

    The weights table feeds THREE consumers (both self-join sides and
    the norms); ``materialize`` pins it once with ``localCheckpoint``
    (the geo/knn.py idiom) so the corpus is tokenized and weighted one
    time instead of three — at 100 TB the weights table is the tokenized
    corpus, so re-deriving it per consumer would triple the dominant
    scan. Set False only to inspect the unpinned composite plan."""
    w = tfidf_weights(
        docs, id_col=id_col, text_col=text_col, max_df_ratio=max_df_ratio
    )
    if materialize:
        w = w.localCheckpoint()
    norms = (
        w.groupBy("doc_id")
        .agg(
            F.sum((F.col("wq") * F.col("wq")).cast("decimal(38,0)")).alias(
                "nq"
            )
        )
        .where(F.col("nq") > 0)
    )
    a = w.select(F.col("doc_id").alias("id_a"), "term", F.col("wq").alias("wa"))
    b = w.select(F.col("doc_id").alias("id_b"), "term", F.col("wq").alias("wb"))
    dots = (
        a.join(b, on="term")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum((F.col("wa") * F.col("wb")).cast("decimal(38,0)")).alias(
                "dot"
            )
        )
    )
    na = norms.select(F.col("doc_id").alias("id_a"), F.col("nq").alias("na"))
    nb = norms.select(F.col("doc_id").alias("id_b"), F.col("nq").alias("nb"))
    sim = F.round(
        F.col("dot").cast("double")
        / (
            F.sqrt(F.col("na").cast("double"))
            * F.sqrt(F.col("nb").cast("double"))
        ),
        6,
    )
    return (
        dots.join(na.hint("shuffle_hash"), "id_a")
        .join(nb.hint("shuffle_hash"), "id_b")
        .select("id_a", "id_b", sim.alias("sim"))
        .where(F.col("sim") >= threshold)
    )
