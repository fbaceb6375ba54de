"""memoized_count / memoized_first (pipeline/stats.py): one job per
semantically identical plan per session, stable across fresh DataFrame
objects; count and first memos never collide on one plan."""

from __future__ import annotations

from osm_spark.pipeline import stats
from osm_spark.pipeline.stats import memoized_count, memoized_first


def test_memoizes_across_fresh_dataframes(spark):
    stats._MEMO.clear()
    a = spark.range(100).selectExpr("id", "id % 7 as g")
    assert memoized_count(a) == 100
    assert len(stats._MEMO) == 1
    # a separately-constructed but semantically identical plan hits
    b = spark.range(100).selectExpr("id", "id % 7 as g")
    assert memoized_count(b) == 100
    assert len(stats._MEMO) == 1
    # a different plan misses
    c = spark.range(50)
    assert memoized_count(c) == 50
    assert len(stats._MEMO) == 2


def test_memoized_first_and_kind_separation(spark):
    stats._MEMO.clear()
    import pyspark.sql.functions as F

    a = spark.range(100).agg(F.max("id"))
    assert memoized_first(a)[0] == 99
    assert len(stats._MEMO) == 1
    # fresh identical plan hits the memo
    b = spark.range(100).agg(F.max("id"))
    assert memoized_first(b)[0] == 99
    assert len(stats._MEMO) == 1
    # a count over the SAME plan is a different memo entry, not a
    # first-row read of it
    assert memoized_count(a) == 1
    assert len(stats._MEMO) == 2
    stats._MEMO.clear()


def test_fallback_without_jvm_handle():
    class Fake:
        def count(self):
            return 7

    assert memoized_count(Fake()) == 7


def test_memo_capped():
    stats._MEMO.clear()
    stats._MEMO.update({(0, i): i for i in range(stats._MEMO_MAX)})

    class Fake:
        def count(self):
            return 1

    # fallback path doesn't touch the memo; the cap logic is exercised
    # via a real insert below the JVM path in the spark-session tests —
    # here just pin the constant is sane
    assert stats._MEMO_MAX >= 256
    stats._MEMO.clear()
