"""Bucketed co-located join: zero Exchange operators in the joined plan."""

from __future__ import annotations

import pytest

from osm_spark.pipeline.bucketing import (
    colocated_join,
    plan_has_exchange,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed(spark, sf_small_dir):
    o = spark.read.parquet(f"{sf_small_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = spark.read.parquet(f"{sf_small_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(o, "b_orders", "o_orderkey", 8)
    write_bucketed(li, "b_lineitem", "o_orderkey", 8)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_colocated_join_has_no_shuffle(spark, bucketed):
    lt, rt = bucketed
    joined = colocated_join(spark, lt, rt, "o_orderkey")
    assert not plan_has_exchange(joined)
    # and it still computes the right thing
    n = joined.count()
    o = spark.table(lt)
    li = spark.table(rt)
    expected = li.join(o, "o_orderkey").count()
    assert n == expected > 0


def test_unbucketed_join_does_shuffle(spark, sf_small_dir):
    """Control: the same join over plain parquet needs an exchange."""
    o = spark.read.parquet(f"{sf_small_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_small_dir}/lineitem.parquet")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    assert plan_has_exchange(j)
