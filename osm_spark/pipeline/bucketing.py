"""Bucketed (co-located) joins — the shuffle-elimination story for big×big
joins at 100 TB.

Broadcast covers small-dim joins; when BOTH sides are large (pages ⋈
page_points, orders ⋈ lineitem at full scale), pre-bucketing both tables
on the join key lets Spark plan a SortMergeJoin with **no Exchange on
either side** — the shuffle is paid once at write time and amortized over
every subsequent join. This is the parquet/HMS-bucketing analog of the
Iceberg ``bucket(N, key)`` partition transform named in BASELINE.json's
input hint.

Verified by test_bucketing.py: the joined plan of two bucketed tables
contains zero Exchange operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, num_buckets: int = 8
) -> None:
    """Persist as a bucketed+sorted managed table (idempotent overwrite)."""
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: Catalyst reuses
    the bucket layout, so the plan has no shuffle on either side.

    The MERGE hint pins a sort-merge join — on big×big inputs the planner
    picks it anyway, but on small test tables it would otherwise prefer a
    broadcast (which bypasses, and therefore can't demonstrate, the
    bucket layout)."""
    return (
        spark.table(left_table)
        .hint("merge")
        .join(spark.table(right_table).hint("merge"), key)
    )


def plan_has_exchange(df: DataFrame) -> bool:
    """True when the physical plan contains any Exchange (shuffle)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan
