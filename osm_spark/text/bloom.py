"""Deterministic Bloom-filter membership — the constant-memory upgrade
of `text/decontam.py`'s broadcast gram-key join (Bloom 1970).

Decontamination broadcasts the benchmark's distinct md5 gram keys; at
~10^8 grams that broadcast is multi-GB.  The Bloom form compresses the
set to m bits (~10 bits/element for ~1% false positives): membership
tests touch a CONSTANT-size bitmap however large the benchmark set
grows, and false positives only ever flag extra docs for the exact
re-check (recall is perfect — no contaminated doc escapes).

Engine-portable construction (no RNG, no library): the k bit positions
of a gram are k disjoint 8-nibble (32-bit) slices of its md5, mod m —
identical in Spark, DuckDB, Python.  The bitmap is a table of 32-bit
words (word_idx, bits) built with ONE bit_or aggregate (order-free
integer math, hence value-hash gateable and MERGEABLE: bit_or of two
filters is the filter of the union — the hll_merge/ohlc_refresh
algebraic-state discipline).  Probing explodes each corpus gram to its
k (word_idx, mask) probes, joins the BROADCAST word table, and a doc is
flagged when any gram has all k bits set — the corpus side never
shuffles before its per-doc aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.text.dedup import word_ngrams

__all__ = ["bloom_build", "bloom_probe_docs"]


def _positions(gram: F.Column, m_bits: int, k: int) -> list[F.Column]:
    h = F.md5(gram)
    return [
        F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long") % m_bits
        for i in range(k)
    ]


def _check(m_bits: int, k: int) -> None:
    if m_bits % 32 != 0 or m_bits < 32:
        raise ValueError(f"m_bits must be a positive multiple of 32, got {m_bits}")
    if not 1 <= k <= 4:
        raise ValueError(f"k must be in 1..4 (md5 has 4 32-bit slices), got {k}")


def bloom_build(
    benchmark: DataFrame,
    m_bits: int = 1 << 16,
    k: int = 3,
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """(word_idx, bits) — the Bloom bitmap of the benchmark's word
    n-grams as 32-bit words; ≤ m_bits/32 rows, one bit_or exchange."""
    _check(m_bits, k)
    gram = F.explode(word_ngrams(text_col, n, distinct=True)).alias("gram")
    pos = F.explode(F.array(*_positions(F.col("gram"), m_bits, k))).alias("pos")
    return (
        benchmark.select(gram)
        .select(pos)
        .select(
            F.expr("CAST(pos DIV 32 AS INT)").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").cast("long").alias("bits"))
    )


def bloom_probe_docs(
    docs: DataFrame,
    bloom: DataFrame,
    m_bits: int = 1 << 16,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """(id, n_grams, n_candidates, flagged) — per-doc Bloom screening:
    a gram is a candidate iff all k probe bits are set; ``flagged`` when
    any gram is a candidate (route to the exact decontaminate join)."""
    _check(m_bits, k)
    grams = docs.select(
        F.col(id_col),
        F.explode(word_ngrams(text_col, n, distinct=True)).alias("gram"),
    )
    probes = grams.select(
        id_col,
        "gram",
        F.posexplode(F.array(*_positions(F.col("gram"), m_bits, k))).alias(
            "slice", "pos"
        ),
    ).select(
        id_col,
        "gram",
        F.expr("CAST(pos DIV 32 AS INT)").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("mask"),
    )
    hit = (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            id_col,
            "gram",
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")) != 0
            ).cast("int").alias("bit_set"),
        )
        .groupBy(id_col, "gram")
        .agg((F.sum("bit_set") == k).cast("int").alias("candidate"))
    )
    per_doc = hit.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_grams"),
        F.sum("candidate").cast("int").alias("n_candidates"),
    )
    ids = docs.select(id_col).distinct()
    return (
        ids.join(per_doc.hint("shuffle_hash"), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
            (F.coalesce("n_candidates", F.lit(0)) > 0).alias("flagged"),
        )
    )
