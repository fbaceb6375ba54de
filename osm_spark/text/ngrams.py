"""Corpus n-gram statistics — the profiling primitive under every
filtering decision a training-data pipeline makes (stop-gram lists,
boilerplate detection, contamination screens, LM vocabulary cuts).

The reference walks term→usage maps per record (`lib/osm/flexi_record.rb`
dynamic columns; SURVEY.md §2.2 P3/P4); this is the corpus-level version:
one row per distinct n-gram with corpus frequency and document frequency.

Scale design (10^12 docs): n-grams are generated row-side as one array
projection (``transform`` over an index ``sequence`` — whole-stage
codegen, no UDF, no join), then a single explode feeds ONE hash
aggregation keyed on the n-gram with map-side partial aggregation; doc
frequency rides the same shuffle (count_distinct collapses to count
because (doc, gram) pairs are pre-distinct'd map-side via the
``array_distinct`` projection). Hot grams ("of the") are exactly the
keys AQE skew handling and partial aggregation exist for — the combiner
reduces each partition's contribution to one row per gram before the
exchange, so skew is capped at #partitions rows per gram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_arrays(text, n: int):
    """(all_grams, distinct_grams) arrays for one document's text.

    Tokenization matches ``analysis._words`` (lower + single-space
    split); grams are the space-joined n-token windows.
    """
    toks = F.split(F.lower(text), " ")
    windows = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + k).cast("int")) for k in range(n)]
        ),
    )
    # F.sequence(1, 0) DESCENDS ([1, 0]) instead of yielding [] — guard
    # short documents explicitly (generate_series in the oracle is empty
    # for the same bounds).
    grams = F.when(F.size(toks) >= n, windows).otherwise(
        F.array().cast("array<string>")
    )
    return grams, F.array_distinct(grams)


def ngram_counts(
    docs: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """(ngram, count, doc_freq) over the corpus; grams below
    ``min_count`` total occurrences are dropped.

    Two narrow explodes feed one union + one aggregation: occurrence
    rows carry weight (1,0) and distinct-per-doc rows (0,1), so corpus
    count and doc frequency share a single exchange on the gram key.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    grams, dgrams = _gram_arrays(F.col(text_col), n)
    occ = docs.select(F.explode(grams).alias("ngram")).select(
        "ngram", F.lit(1).alias("c"), F.lit(0).alias("d")
    )
    per_doc = docs.select(F.explode(dgrams).alias("ngram")).select(
        "ngram", F.lit(0).alias("c"), F.lit(1).alias("d")
    )
    return (
        occ.unionByName(per_doc)
        .groupBy("ngram")
        .agg(F.sum("c").alias("count"), F.sum("d").alias("doc_freq"))
        .filter(F.col("count") >= min_count)
    )


def ngram_counts_sql(
    docs_table: str = "documents", n: int = 2, min_count: int = 2
) -> str:
    """DuckDB replay: same tokenization (lower + split on single space),
    same windows, same thresholds. DuckDB lists are 1-indexed like
    ``element_at``, so the window arithmetic is shared verbatim."""
    gram = " || ' ' || ".join(f"toks[i + {k}]" for k in range(n))
    return f"""
        WITH toks AS (
            SELECT doc_id, string_split(lower(text), ' ') AS toks
            FROM {docs_table}
        ),
        grams AS (
            SELECT doc_id, unnest(list_transform(
                generate_series(1, greatest(len(toks) - {n - 1}, 0)),
                i -> {gram})) AS ngram
            FROM toks
        )
        SELECT ngram,
               count(*) AS count,
               count(DISTINCT doc_id) AS doc_freq
        FROM grams
        GROUP BY ngram
        HAVING count(*) >= {min_count}
    """
