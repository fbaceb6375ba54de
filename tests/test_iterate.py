"""Lineage truncation semantics (graph/iterate.py).

Pins both blow-up modes from BENCH.md findings #11/#12: the returned
frame must be a plan LEAF (no join/aggregate subtree survives) and its
Catalyst size statistics must come from real file sizes — bounded
across rounds — not inherited multiplied estimates (the localCheckpoint
failure: sizeInBytes digits doubled per round until BigInteger
overflow).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from osm_spark.graph.iterate import drop_truncated, truncate_lineage


def _optimized(df):
    return df._jdf.queryExecution().optimizedPlan()


def test_truncate_preserves_rows_and_cuts_plan_to_leaf(spark):
    df = (
        spark.range(100)
        .select(F.col("id"), (F.col("id") % 7).alias("k"))
        .groupBy("k")
        .agg(F.sum("id").alias("s"))
    )
    out = truncate_lineage(df)
    plan = _optimized(out).toString()
    assert "Aggregate" not in plan and "Join" not in plan
    assert sorted((r.k, r.s) for r in out.collect()) == sorted(
        (r.k, r.s) for r in df.collect()
    )


def test_truncated_stats_stay_bounded_across_join_rounds(spark):
    """Finding #12 regression: a 3-reference join round repeated 6 times
    must keep the truncated leaf's sizeInBytes at file-size magnitude.
    With localCheckpoint the inherited estimate compounds (observed
    7→18→41→87… digits); the parquet round-trip reads real file sizes."""
    cur = truncate_lineage(spark.range(200).select("id", (F.col("id") % 3).alias("v")))
    for _ in range(6):
        m = cur.select(F.col("id").alias("id2"), F.col("v").alias("v2"))
        nxt = truncate_lineage(
            cur.join(m, cur["id"] == m["id2"])
            .join(m.select(F.col("id2").alias("id3")), cur["id"] == F.col("id3"))
            .select("id", F.least("v", "v2").alias("v"))
        )
        drop_truncated(cur)
        cur = nxt
    size = int(_optimized(cur).stats().sizeInBytes())
    assert 0 < size < 10**9  # real file size, not a compounded estimate
    assert cur.count() == 200


def test_drop_truncated_removes_backing_files(spark):
    out = truncate_lineage(spark.range(10))
    path = out._trunc_path
    assert os.path.isdir(path)
    out.count()
    drop_truncated(out)
    assert not os.path.isdir(path)
    # no-op on a frame that was never truncated
    drop_truncated(spark.range(3))
