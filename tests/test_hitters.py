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


def test_exact_topk_ignores_nulls_on_both_paths(spark):
    """NULL handling must agree between the certificate path (pandas
    value_counts drops NULLs) and the fallback groupBy (which would
    count a NULL group): both now exclude NULLs up front."""
    rows = [("a",)] * 50 + [("b",)] * 30 + [(None,)] * 100 + [("c",)] * 10
    df = spark.createDataFrame(rows, "v string")
    cert = {(r.value, r.cnt) for r in exact_topk(df, "v", 2, m=8, on_uncertain="raise").collect()}
    assert cert == {("a", 50), ("b", 30)}
    # force the fallback with an impossible certificate (k > distinct)
    fb = {(r.value, r.cnt) for r in exact_topk(df, "v", 3, m=1, on_uncertain="fallback").collect()}
    assert fb == {("a", 50), ("b", 30), ("c", 10)}


def test_exact_topk_long_column(spark):
    """The output schema derives from the input column type — long
    values survive the round trip (previously hardcoded string-only)."""
    rows = [(7,)] * 40 + [(13,)] * 25 + [(99,)] * 5
    df = spark.createDataFrame(rows, "v bigint")
    out = exact_topk(df, "v", 2, m=8)
    assert out.schema["value"].dataType.simpleString() == "bigint"
    assert {(r.value, r.cnt) for r in out.collect()} == {(7, 40), (13, 25)}


def test_exact_topk_rejects_unsupported_type(spark):
    df = spark.createDataFrame([(1.5,)], "v double")
    with pytest.raises(ValueError, match="supports"):
        exact_topk(df, "v", 1)
