"""Plan pins for the final-session operators: the scale claims in their
module docstrings as assertions."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_blocklist_is_zero_exchange_projection(spark):
    """The pattern dim folds into a literal array: one codegen pass over
    the docs, no exchange, no Python eval, no join."""
    from osm_spark.text.blocklist import blocklist_filter

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    pats = spark.createDataFrame([("b", 1)], "pattern string, severity int")
    plan = _plan(blocklist_filter(docs, pats))
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_kde_is_single_combiner_reduced_exchange(spark):
    """Scatter in codegen, then exactly ONE hashpartitioning exchange
    with a partial aggregate before it (map-side combine)."""
    from osm_spark.geo.kde import kde_density

    pts = spark.createDataFrame([(10.0, 20.0)], "lat double, lon double")
    plan = _plan(kde_density(pts, 10))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_sum" in plan or "partial" in plan.lower()
    assert "Python" not in plan and "ArrowEval" not in plan


def test_voronoi_broadcasts_seeds_never_window(spark):
    """Seeds are the broadcast side; the argmin is a struct-min
    aggregate, never a window over the tile×seed product."""
    from osm_spark.geo.voronoi import voronoi_regions

    pts = spark.createDataFrame([(10.0, 20.0)], "lat double, lon double")
    seeds = spark.createDataFrame([(1, 10.0, 20.0)], "id long, lat double, lon double")
    plan = _plan(voronoi_regions(pts, seeds, 10))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_trend_stat_broadcast_is_single_row(spark):
    """The nine-sum/Cramer table re-enters as a 1-row broadcast NL join
    (the moran/hotspot stat pattern) — no shuffle of the tile side after
    the rasterization exchange."""
    from osm_spark.geo.trend import trend_surface

    pts = spark.createDataFrame(
        [(10.0 + i * 0.4, 20.0 + (i % 3) * 0.4) for i in range(9)],
        "lat double, lon double",
    )
    plan = _plan(trend_surface(pts, 10))
    assert "BroadcastNestedLoopJoin" in plan
    # the localCheckpoint pins the rasterization: the residual side reads
    # the checkpointed tiles, so NO hashpartitioning exchange remains in
    # this plan (the stat side's exchange lives behind the checkpoint)
    assert plan.count("Exchange hashpartitioning") == 0
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan


def test_st_dbscan_pair_join_is_cell_bucket_keyed_hash(spark):
    """The spatiotemporal pair join keys on (cell, time bucket) with a
    shuffle-hash join — no sort-merge, no cartesian."""
    from osm_spark.geo.dbscan import st_eps_pairs

    pts = spark.createDataFrame(
        [(1, 51.5, -0.12, 100), (2, 51.5001, -0.1201, 200)],
        "id long, lat double, lon double, ts long",
    )
    plan = _plan(st_eps_pairs(pts, 200.0, 3600))
    assert "ShuffledHashJoin [cell" in plan and "tb" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bloom_probe_broadcasts_bitmap(spark):
    """The corpus side meets the filter via a broadcast of the word
    table; its only exchanges are the per-doc aggregates."""
    from osm_spark.text.bloom import bloom_build, bloom_probe_docs

    bench = spark.createDataFrame([("a b c d e f",)], "text string")
    docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    plan = _plan(bloom_probe_docs(docs, bloom_build(bench)))
    assert "BroadcastHashJoin" in plan  # the bitmap side
    assert "SortMergeJoin" not in plan  # id join is shuffle-hash hinted


def test_hll_registers_single_combined_exchange(spark):
    """Register build = one map-side-combined exchange keyed by
    (key, register)."""
    from osm_spark.functions.hll import hll_registers

    df = spark.createDataFrame([("a", 1)], "grp string, uid long")
    plan = _plan(hll_registers(df, ["grp"], "uid"))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_max" in plan or "partial" in plan.lower()


def test_semantic_dedup_prune_joins_on_cluster_key(spark, sf_small_dir):
    """The ε-prune self-join keys on cluster_id (pair volume Σ occ²) —
    never a cartesian of the corpus."""
    from osm_spark.vector.semdedup import semantic_dedup

    emb = spark.read.parquet(f"{sf_small_dir}/embeddings.parquet")
    plan = _plan(semantic_dedup(emb, k=4, threshold=0.3))
    assert "cluster_id" in plan
    assert "CartesianProduct" not in plan
