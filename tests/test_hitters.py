"""Two-pass exact heavy hitters vs the plain full groupBy."""

import pytest
from pyspark.sql import functions as F

from osm_spark.text.hitters import exact_topk, partition_candidates

SF = "/root/testdata/sf0.001"


def _tokens(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("token")
    )


def _full_topk(df, col, k):
    return (
        df.groupBy(F.col(col).alias("value"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("value").asc())
        .limit(k)
        .collect()
    )


def test_exact_topk_matches_full_groupby(spark):
    toks = _tokens(spark)
    got = exact_topk(toks, "token", 20, m=64, on_uncertain="raise").collect()
    expected = _full_topk(toks, "token", 20)
    assert [(r.value, r.cnt) for r in got] == [(r.value, r.cnt) for r in expected]


def test_certificate_fails_on_flat_distribution(spark):
    # All-distinct values across many partitions: nothing is heavy, the
    # kth recount can't clear B, and 'raise' must refuse.
    flat = spark.range(0, 2000, 1, 8).select(
        F.concat(F.lit("v"), F.col("id")).alias("x")
    )
    with pytest.raises(ValueError, match="certificate failed"):
        exact_topk(flat, "x", 5, m=2, on_uncertain="raise")
    # fallback still returns the exact answer
    got = exact_topk(flat, "x", 5, m=2, on_uncertain="fallback").collect()
    assert [(r.value, r.cnt) for r in got] == [
        (r.value, r.cnt) for r in _full_topk(flat, "x", 5)
    ]


def test_partition_candidates_markers(spark):
    df = spark.range(0, 100, 1, 4).select(
        F.concat(F.lit("t"), (F.col("id") % 3)).alias("x")
    )
    rows = partition_candidates(df, "x", 2).collect()
    markers = [r for r in rows if r.value is None]
    tops = [r for r in rows if r.value is not None]
    assert 1 <= len(markers) <= 4  # one per non-empty partition
    assert all(r.bound is not None and r.bound >= 0 for r in markers)
    assert all(r.local_cnt >= 1 and r.bound is None for r in tops)
