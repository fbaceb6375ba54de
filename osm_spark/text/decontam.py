"""Benchmark decontamination: flag corpus documents that share word
n-grams with an evaluation/benchmark set.

The standard pre-training hygiene step (the reference's tag-requirement
predicates, badges/badge_data.rb-style set membership, re-expressed over
text): a document is *contaminated* when any of its word n-grams appears
verbatim in the benchmark corpus — such documents leak eval answers into
training data and must be dropped or quarantined.

Scale shape (10^12-doc design point):

- The benchmark side is SMALL by construction (eval suites are 10^4-10^6
  items → ~10^6-10^7 distinct n-grams). Its distinct gram-key table
  **broadcasts**; the corpus never shuffles for the membership test.
- Join key is ``md5(gram)`` (32-hex), NOT the gram text: broadcast rows
  are fixed-width and the key computes identically in Spark and DuckDB,
  so the oracle can replay the exact join. Collisions are ignorable at
  any real scale (2^-64-ish — same argument as ``exact_dedup``).
- The corpus side explodes distinct grams once, joins against the
  broadcast, and partial-aggregates per doc BEFORE its only exchange —
  the shuffle carries one row per (doc, partition), the minhash
  precedent (BENCH.md finding #4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.text.dedup import word_ngrams


def benchmark_gram_keys(
    benchmark: DataFrame, text_col: str = "text", n: int = 5
) -> DataFrame:
    """Distinct md5 keys of the benchmark's word n-grams (the broadcast
    side). One narrow distinct over an exploded projection."""
    return (
        benchmark.select(
            F.explode(word_ngrams(text_col, n, distinct=True)).alias("gram")
        )
        .select(F.md5(F.col("gram")).alias("gram_key"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Per document: total distinct word ``n``-grams, how many of them
    occur in ``benchmark``, and the contamination flag.

    Returns ``(id_col, n_grams, n_hits, contaminated)``. Documents
    shorter than ``n`` words have zero grams and are never contaminated.
    """
    grams = docs.select(
        F.col(id_col),
        word_ngrams(text_col, n, distinct=True).alias("grams"),
    ).select(
        id_col,
        F.size("grams").alias("n_grams"),
        # explode_outer keeps zero-gram docs in the aggregate
        F.explode_outer("grams").alias("gram"),
    )
    bench = F.broadcast(benchmark_gram_keys(benchmark, bench_text_col, n))
    joined = grams.join(
        bench, F.md5(F.col("gram")) == bench.gram_key, "left"
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.first("n_grams").alias("n_grams"),
            F.count("gram_key").alias("n_hits"),
        )
        .select(
            id_col,
            "n_grams",
            "n_hits",
            (F.col("n_hits") > 0).alias("contaminated"),
        )
    )
