"""Exact heavy hitters (top-k most frequent values) without shuffling
the value multiset — the corpus-profiling primitive that survives web
scale.

The naive ``groupBy(value).count().orderBy(...).limit(k)`` map-side
combines, but its shuffle still carries one row per DISTINCT value per
partition — for web-token distributions that is ~10⁹ distinct keys and
the shuffle dwarfs the answer by many orders of magnitude. This
operator is the classic two-pass candidates-then-recount:

1. **Candidates** (one scan, zero shuffle of non-candidates): each
   partition emits its local top-``m`` values plus one marker row with
   ``t_p`` = its m-th largest local count (0 if nothing was dropped).
   A value absent from EVERY partition's top-m has global count
   ≤ B = Σ_p t_p, so the candidate union provably contains every value
   with count > B.
2. **Recount** (second scan): rows matching the broadcast candidate set
   recount exactly (map-side combine over ≤ partitions·m keys); top-k
   by (count DESC, value ASC).

The result carries its own **exactness certificate**: if the k-th
recounted count > B, the top-k is provably exact (any non-candidate
sits strictly below it). ``exact_topk`` verifies the certificate and,
when it fails (adversarially flat distributions), either raises or
falls back to the full groupBy (``on_uncertain``) — never silently
returns an approximation. For Zipf-shaped web data the certificate
holds at small m: heavy hitters are heavy in most partitions.

Two column-pruned scans beat one distinct-key shuffle at 100 TB; the
candidate table is partitions × (m+1) rows — kilobytes — and rides a
broadcast semi-join, so the big side never exchanges.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Value types the two-pass scheme supports: both the pandas candidate
# pass and the Spark recount must agree on NULL handling and round-trip
# the value losslessly through Arrow. NULLs are filtered up front (both
# paths — value_counts drops them silently, the groupBy would not).
_SUPPORTED_TYPES = ("string", "bigint", "int", "smallint", "tinyint")


def _value_type(df: DataFrame, col: str) -> str:
    vtype = df.schema[col].dataType.simpleString()
    if vtype not in _SUPPORTED_TYPES:
        raise ValueError(
            f"exact_topk supports {_SUPPORTED_TYPES} value columns, "
            f"got {col!r}: {vtype}"
        )
    return vtype


def partition_candidates(df: DataFrame, col: str, m: int) -> DataFrame:
    """Per-partition local top-m summary: top rows (value, local_cnt,
    bound=NULL) plus ONE marker row (value=NULL, local_cnt=NULL,
    bound=t_p) per non-empty partition. NULL values are excluded (the
    marker row reuses NULL as its tag, and ``exact_topk`` counts
    non-null values only — enforced by the up-front filter there)."""
    vtype = _value_type(df, col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict = {}
        for pdf in batches:
            for v, c in pdf[col].dropna().value_counts().items():
                acc[v] = acc.get(v, 0) + int(c)
        if not acc:
            return
        s = pd.Series(acc).sort_values(ascending=False, kind="stable")
        top = s.iloc[:m]
        out = pd.DataFrame(
            {"value": top.index, "local_cnt": top.values, "bound": pd.NA}
        )
        marker = pd.DataFrame(
            {
                "value": [None],
                "local_cnt": [pd.NA],
                "bound": [int(s.iloc[m - 1]) if len(s) > m else 0],
            }
        )
        yield pd.concat([out, marker], ignore_index=True)

    return df.select(F.col(col).alias(col)).filter(F.col(col).isNotNull()).mapInPandas(
        gen, f"value {vtype}, local_cnt long, bound long"
    )


def exact_topk(
    df: DataFrame,
    col: str,
    k: int,
    m: int = 64,
    on_uncertain: str = "fallback",
) -> DataFrame:
    """Exact (value, cnt) top-k of ``df[col]`` by the two-pass scheme
    (module docstring). ``on_uncertain``: 'fallback' reruns the plain
    full groupBy when the certificate fails; 'raise' errors instead
    (callers that must never shuffle the full distinct-key multiset)."""
    if on_uncertain not in ("fallback", "raise"):
        raise ValueError(
            f"on_uncertain must be 'fallback' or 'raise', got {on_uncertain!r}"
        )
    vtype = _value_type(df, col)
    # NULLs out up front so BOTH paths agree: value_counts drops them
    # silently while the fallback groupBy would count a NULL group.
    df = df.filter(F.col(col).isNotNull())
    summary = partition_candidates(df, col, m).persist()
    B = (
        summary.agg(F.sum("bound").alias("b")).collect()[0].b or 0
    )
    cand = summary.filter(F.col("value").isNotNull()).select("value").distinct()
    exact = (
        df.join(
            F.broadcast(cand), df[col] == cand["value"], "left_semi"
        )
        .groupBy(F.col(col).alias("value"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("value").asc())
        .limit(k)
    )
    rows = exact.collect()
    summary.unpersist()
    spark = df.sparkSession
    kth = rows[-1].cnt if len(rows) >= k else 0
    if len(rows) >= k and kth > B:
        return spark.createDataFrame(rows, f"value {vtype}, cnt long")
    if on_uncertain == "raise":
        raise ValueError(
            f"top-{k} certificate failed (kth count {kth} <= bound {B}); "
            "raise m or use on_uncertain='fallback'"
        )
    full = (
        df.groupBy(F.col(col).alias("value"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("value").asc())
        .limit(k)
        .collect()
    )
    return spark.createDataFrame(full, f"value {vtype}, cnt long")
