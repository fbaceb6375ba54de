"""Per-document TF-IDF keyword extraction.

The document-level summarization primitive (corpus profiling lives in
text/ngrams.py, association in text/collocations.py; this answers
"what is THIS page about" — tag generation, index terms, cluster
labels). Classic tf·idf with the raw-count tf and ln(N/df) idf
(Sparck Jones 1972 weighting, the Lucene/scikit default family).

Exactness: tf, df and N are exact integers off combiner-reduced
shuffles; the score is ONE closing float expression
(tf · ln(N/df), micro-quantized) and the per-doc top-k ranks on the
QUANTIZED integer score with a term tie-break — so rank order is
engine-independent by construction, not by float luck (the lm_score
micro-nat recipe applied to ranking).

Scale plan (10^12 docs):
- one explode feeds the (doc, term) tf aggregation — map-side combined,
  keyed on the pair, never wider than the tokenized corpus;
- df aggregates the ALREADY-aggregated tf table (each (doc, term) row
  is one distinct occurrence by construction — no count_distinct);
- idf attach is a term-keyed join of two vocab-bounded tables
  (shuffle-hash hinted);
- N is a 1-row broadcast;
- top-k is a doc-keyed window: hash exchange on doc_id + per-partition
  sort bounded by the longest document, the standard latest-per-key
  shape (SURVEY.md §2.5) — never a global sort.

Tokenization matches ngrams/lm/collocations (lower + single-space
split): all four text layers agree on what a "word" is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tfidf_keywords(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, tf, df, score_micro, rank) — the top ``k`` terms
    per document by quantized tf·idf, ties broken by term ascending."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))

    scored = (
        tf.join(df_t.hint("shuffle_hash"), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf").cast("double")
                * F.log(
                    F.col("n_docs").cast("double") / F.col("df").cast("double")
                )
                * 1e6,
                0,
            )
            .cast("long")
            .alias("score_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_micro"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "score_micro", "rank")
    )
