"""Physical-plan audits: the scale claims in BENCH.md/README as
assertions, so a regression that silently changes the plan shape
(pushdown lost, broadcast degraded to shuffle, points side exchanged)
fails CI instead of only showing up at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_parquet_scan(spark, sf_med_dir):
    import __spark_entry__ as entry

    df = entry.q_interval_filter(spark, sf_med_dir)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "o_orderdate" in plan.split("PushedFilters:")[1][:400]


def test_column_pruning_reaches_parquet_scan(spark, sf_med_dir):
    import __spark_entry__ as entry

    plan = _plan(entry.q_pricing_summary(spark, sf_med_dir))
    # toString truncates the schema line; assert needed columns lead the
    # pruned struct and wide unused columns are gone
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_returnflag"):
        assert col in read_schema
    assert "l_comment" not in read_schema and "l_orderkey" not in read_schema


def test_pip_broadcast_path_never_shuffles_points(spark, sf_small_dir):
    """The 10^12-row side must reach the refine without an exchange:
    scan → Arrow extract → codegen cell math → two broadcast hash joins
    → codegen refine. Any hashpartitioning exchange in this plan means
    the pages side started shuffling."""
    from osm_spark.pipeline.geometry import build_way_cells, synth_polygons
    from osm_spark.pipeline.pages import synth_pages
    from osm_spark.pipeline.spatial_join import extract_points, pip_join_broadcast

    pages = synth_pages(spark, sf_small_dir)
    polygons = synth_polygons(spark)
    out = pip_join_broadcast(extract_points(pages), polygons, build_way_cells(polygons))
    plan = _plan(out)
    assert plan.count("BroadcastHashJoin") == 2
    assert "Exchange hashpartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_jvm_extract_is_zero_python_and_barriers_hold(spark, sf_small_dir):
    """engine='jvm' must plan with no Python eval node at all, keep the
    Generate barriers (so the regex/parse/hex subtrees evaluate once per
    row instead of being CollapseProject-cloned into every reference),
    and still feed the broadcast PIP path without shuffling pages."""
    from osm_spark.pipeline.geometry import build_way_cells, synth_polygons
    from osm_spark.pipeline.pages import synth_pages
    from osm_spark.pipeline.spatial_join import extract_points, pip_join_broadcast

    pages = synth_pages(spark, sf_small_dir)
    pts = extract_points(pages, engine="jvm")
    plan = _plan(pts)
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert node not in plan
    assert plan.count("Generate explode") == 3
    # exactly one full-text regex eval in the whole plan
    assert plan.count("regexp_extract") == 1

    polygons = synth_polygons(spark)
    out = pip_join_broadcast(pts, polygons, build_way_cells(polygons))
    jplan = _plan(out)
    assert jplan.count("BroadcastHashJoin") == 2
    assert "Exchange hashpartitioning" not in jplan
    # the big (pages) side is Python-free; the single MapInPandas is the
    # polygon-covering generator on the broadcast (dim) side
    for node in ("ArrowEvalPython", "BatchEvalPython"):
        assert node not in jplan
    assert jplan.count("MapInPandas") == 1


def test_pip_salted_path_never_broadcasts_vertex_dim(spark, sf_small_dir):
    """The salted path is chosen because the polygon side outgrew the
    broadcast ceiling — so the polygon VERTEX dim (which grows with the
    same data: continent rings have the largest coverings AND the
    longest vertex arrays) must hash-join onto the candidate list, not
    broadcast. Only the salt plan (hot-cell histogram, bounded rows) may
    broadcast here. Round-3 verdict's named scale-killer, pinned."""
    from osm_spark.pipeline.geometry import build_way_cells, synth_polygons
    from osm_spark.pipeline.pages import synth_pages
    from osm_spark.pipeline.spatial_join import (
        extract_points,
        pip_join_salted,
        salt_plan,
    )

    pages = synth_pages(spark, sf_small_dir)
    polygons = synth_polygons(spark)
    pts = extract_points(pages)
    out = pip_join_salted(
        pts, polygons, build_way_cells(polygons), salt_plan(pts, target=20)
    )
    plan = _plan(out)
    # the vertex attach is a shuffle hash join on (way_id, _vsalt) —
    # the TWO-SIDED salt (BENCH.md finding #15): a plain way_id key
    # would re-concentrate the freshly-salted hot pairs onto the hot
    # cell's containing polygons
    assert "ShuffledHashJoin [way_id" in plan
    import re

    assert re.search(r"ShuffledHashJoin \[way_id#\d+L?, _vsalt", plan), plan
    # every BroadcastExchange in the plan is the salt plan (k column),
    # never the vertex arrays
    for sub in plan.split("BroadcastExchange")[1:]:
        head = sub[:600]
        assert "vlat" not in head, plan


def test_multipolygon_salted_path_never_broadcasts_ring_dim(spark, sf_small_dir):
    """Same pin for the multipolygon form: on strategy='salted' the ring
    vertex dim must not broadcast (relation multipolygons are exactly
    where broadcast breaks first)."""
    from osm_spark.pipeline.pages import synth_pages
    from osm_spark.pipeline.spatial_join import extract_points, pip_join_multipolygon

    outer = ([10.0, 10.0, 10.2, 10.2], [20.0, 20.2, 20.2, 20.0])
    hole = ([10.08, 10.08, 10.12, 10.12], [20.08, 20.12, 20.12, 20.08])
    rings = spark.createDataFrame(
        [(500, "outer", 9001, outer[0], outer[1]),
         (500, "inner", 9002, hole[0], hole[1])],
        "relation_id long, role string, way_id long, "
        "vlat array<double>, vlon array<double>",
    )
    pages = synth_pages(spark, sf_small_dir)
    pts = extract_points(pages)
    out = pip_join_multipolygon(pts, rings, strategy="salted")
    plan = _plan(out)
    assert "ShuffledHashJoin [way_id" in plan
    for sub in plan.split("BroadcastExchange")[1:]:
        head = sub[:600]
        assert "vlat" not in head, plan


def test_exact_dedup_shuffles_hash_not_text(spark, sf_small_dir):
    """The dedup shuffle key is the 16-byte md5, never the document text:
    the partial aggregate below the exchange already projects the hash."""
    from osm_spark.text.dedup import exact_dedup

    docs = spark.read.parquet(f"{sf_small_dir}/documents.parquet")
    plan = _plan(exact_dedup(docs))
    assert "Exchange hashpartitioning" in plan
    below = plan.split("Exchange hashpartitioning")[1]
    # partial aggregation (the map-side combine) and the md5 projection
    # both sit BELOW the exchange, and the exchange key is the grouping
    # expression (the hash), never the raw text column
    assert "partial_min" in below and "md5(" in below
    key = below[:120]
    assert "text#" not in key


def test_whole_stage_codegen_covers_hex_encode(spark, sf_med_dir):
    """The hex cell encode must live inside a WholeStageCodegen span (no
    Python eval node on the pure-arithmetic path)."""
    from osm_spark.geo.hexgrid import hex_cell_expr

    c = spark.read.parquet(f"{sf_med_dir}/customer.parquet")
    df = c.select(
        hex_cell_expr(
            (F.col("c_custkey") % 90).cast("double"),
            (F.col("c_custkey") % 180).cast("double"),
            9,
        ).alias("cell")
    )
    plan = _plan(df)
    # '*(n)' prefixes mark whole-stage-codegen spans in the plan string
    assert "*(" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_pagerank_step_hash_joins_edges_without_sorting(spark):
    """One PageRank iteration must hash-join the edge side (shuffle_hash
    hint) — an unhinted plan picks sort-merge and re-sorts the edge
    table every iteration. The 1-row scalar cross joins (vertex count,
    dangling mass) must broadcast, never CartesianProduct."""
    from osm_spark.graph.pagerank import (
        SCALE,
        _step,
        out_degrees,
        vertex_ids,
    )

    edges = spark.range(0, 1000).select(
        F.col("id").alias("src"), ((F.col("id") * 7 + 1) % 1000).alias("dst")
    )
    verts = vertex_ids(edges)
    deg = out_degrees(edges)
    n_v = verts.agg(F.count("*").alias("n_v"))
    ranks = (
        verts.crossJoin(n_v)
        .join(deg.hint("shuffle_hash"), "id", "left")
        .select("id", F.expr(f"{SCALE}L div n_v").alias("r"), "out_deg")
    )
    plan = _plan(_step(edges, verts, deg, n_v, ranks, "src", "dst", 85, 100, 15 * SCALE))
    assert "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pagerank_bucketed_edges_join_without_exchange(spark, tmp_path):
    """A src-bucketed edge table exposes HashPartitioning(src), so the
    per-iteration contribution join must consume the edge scan with NO
    Exchange above it — iteration shuffle volume drops from O(|E|) to
    O(|V|), the planet-scale iteration pattern (pagerank.py docstring)."""
    from osm_spark.graph.pagerank import SCALE, _step, out_degrees, vertex_ids

    edges = spark.range(0, 1000).select(
        F.col("id").alias("src"), ((F.col("id") * 7 + 1) % 1000).alias("dst")
    )
    import shutil

    spark.sql("DROP TABLE IF EXISTS _t_pr_edges_b")
    # a fresh metastore can't see a stale managed-table dir left by a
    # previous session — remove the location itself
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/_t_pr_edges_b", ignore_errors=True)
    # bucket count MUST equal the iteration shuffle width (8 in the test
    # session) — otherwise the join's required partitioning differs and
    # Catalyst disables the bucketed scan and re-exchanges anyway
    edges.write.bucketBy(8, "src").mode("overwrite").saveAsTable("_t_pr_edges_b")
    try:
        from osm_spark.graph.iterate import truncate_lineage

        def step_plan(e):
            # verts/deg/n_v/ranks are parquet leaves exactly as inside
            # pagerank() (truncated once up front)
            verts = truncate_lineage(vertex_ids(e))
            deg = truncate_lineage(out_degrees(e))
            n_v = truncate_lineage(verts.agg(F.count("*").alias("n_v")))
            ranks = truncate_lineage(
                verts.crossJoin(n_v)
                .join(deg.hint("shuffle_hash"), "id", "left")
                .select("id", F.expr(f"{SCALE}L div n_v").alias("r"), "out_deg")
            )
            return _plan(
                _step(e, verts, deg, n_v, ranks, "src", "dst", 85, 100, 15 * SCALE)
            )

        bucketed = step_plan(spark.table("_t_pr_edges_b"))
        plain = step_plan(truncate_lineage(edges))
        assert "Bucketed: true" in bucketed
        # the contribution join consumes the bucketed scan's
        # HashPartitioning(src) — one exchange (the per-iteration edge
        # reshuffle) disappears relative to an unpartitioned edge leaf
        assert bucketed.count("Exchange") < plain.count("Exchange"), bucketed
    finally:
        spark.sql("DROP TABLE IF EXISTS _t_pr_edges_b")


def test_components_round_hash_joins_without_sorting(spark):
    """One label-propagation round: every equi-join hash-joins (no
    per-round re-sort of vertex/edge tables), no cartesian."""
    from osm_spark.graph.components import _round, _symmetrize

    pairs = spark.range(0, 500).select(
        F.col("id").alias("a"), ((F.col("id") * 3 + 1) % 500).alias("b")
    )
    edges = _symmetrize(pairs, "a", "b")
    labels = edges.select(F.col("u").alias("id")).distinct().select(
        "id", F.col("id").alias("comp")
    )
    plan = _plan(_round(edges, labels))
    assert "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_extract_engine_auto_picks_by_parallelism(spark, sf_small_dir):
    """engine='auto' resolves to the Arrow form below the measured pipe
    saturation point and the zero-Python JVM form at/above it; both are
    bit-exact (parity test in test_pipeline), so only the plan differs."""
    from osm_spark.pipeline.pages import synth_pages
    from osm_spark.pipeline.spatial_join import (
        JVM_ENGINE_MIN_PARALLELISM,
        extract_points,
    )

    pages = synth_pages(spark, sf_small_dir)
    par = spark.sparkContext.defaultParallelism
    plan = _plan(extract_points(pages, engine="auto"))
    if par >= JVM_ENGINE_MIN_PARALLELISM:
        assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    else:
        assert "MapInPandas" in plan
    # explicit engines still obey the request regardless of parallelism
    assert "MapInPandas" in _plan(extract_points(pages, engine="arrow"))
    assert "MapInPandas" not in _plan(extract_points(pages, engine="jvm"))


def test_dbscan_pair_join_is_cell_keyed_hash_join(spark, sf_small_dir):
    """The eps self-join must be a ShuffledHashJoin keyed on the cell id
    — never a cartesian/BNL join (both sides are the 10^12-row table)
    and never a broadcast (there is no small side)."""
    import pandas as pd

    from osm_spark.geo.dbscan import eps_pairs

    pts = spark.createDataFrame(
        pd.DataFrame(
            {"id": range(100), "lat": [51.5 + i * 1e-4 for i in range(100)],
             "lon": [-0.12] * 100}
        )
    )
    plan = _plan(eps_pairs(pts, 500.0))
    assert "ShuffledHashJoin [cell" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan


def test_snap_argmin_is_object_hash_not_sort(spark, sf_small_dir):
    """snap_join's per-point argmin must run in ObjectHashAggregate
    (collect_list + array_min): a struct-typed min buffer silently
    degrades to SortAggregate, which sorts the full candidate table
    per partition."""
    from osm_spark.geo.snap import snap_join
    from osm_spark.pipeline.geometry import synth_polygons

    pts = spark.read.parquet(f"{sf_small_dir}/customer.parquet").select(
        F.col("c_custkey").cast("string").alias("url"),
        (F.col("c_custkey") % 100 / 1000.0 + 51.0).alias("lat"),
        (F.col("c_custkey") % 77 / 1000.0 - 0.2).alias("lon"),
    )
    ways = synth_polygons(spark).select("way_id", "vlat", "vlon")
    plan = _plan(snap_join(pts, ways, 3000.0, closed=True, strategy="shuffle"))
    assert "ObjectHashAggregate" in plan
    assert "SortAggregate" not in plan
    assert "SortMergeJoin" not in plan
    # the shuffle path must not broadcast the candidate dim
    assert "ShuffledHashJoin [cell" in plan


def test_hotspot_global_stats_broadcast_single_row(spark):
    """hotspot_gi's global moments must arrive as a broadcast of ONE
    aggregated row (BroadcastNestedLoopJoin over a 1-row build side),
    and both raster aggregates must be map-side combined."""
    import pandas as pd

    from osm_spark.geo.hotspot import hotspot_gi

    pts = spark.createDataFrame(
        pd.DataFrame({"lat": [51.5, 51.6, 51.7], "lon": [-0.1, -0.2, -0.3]})
    )
    plan = _plan(hotspot_gi(pts, 12))
    assert "BroadcastNestedLoopJoin BuildRight, Cross" in plan
    assert plan.count("partial_count") >= 2  # tile counts + neighbor W
    assert "SortMergeJoin" not in plan


def test_sssp_round_joins_hash_without_sorting(spark):
    """One relaxation round: the edge join and the full-outer merge must
    be hash joins (shuffle_hash hints) — a sort-merge join would re-sort
    the frontier every round."""
    import pandas as pd

    from osm_spark.graph.sssp import shortest_paths

    e = spark.createDataFrame(
        pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 3], "w": [5, 5, 5]})
    )
    s = spark.createDataFrame(pd.DataFrame({"id": [0]}))
    out = shortest_paths(e, s, 2)
    # the returned frame is a truncated scan; audit the round shape by
    # rebuilding one un-truncated round inline instead
    from pyspark.sql import functions as F2

    dist = s.select(F2.col("id").cast("long").alias("id"),
                    F2.lit(0).cast("long").alias("dist"))
    relaxed = (
        e.join(dist.hint("shuffle_hash"), e["src"] == dist["id"])
        .groupBy(F2.col("dst").alias("id"))
        .agg(F2.min(F2.col("dist") + F2.col("w")).alias("cand"))
    )
    merged = dist.join(relaxed.hint("shuffle_hash"), "id", "full")
    plan = _plan(merged)
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" in plan
    assert out.count() == 3  # vertices 0,1,2 within 2 hops


def test_gopher_rules_is_pure_projection(spark, sf_small_dir):
    """Per-document rule flags must plan as scan → project, nothing
    else: no Exchange, no Python eval node — the filter runs where the
    data is at any scale."""
    import __spark_entry__ as entry

    plan = _plan(entry.q_gopher_rules(spark, sf_small_dir))
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_c4_lines_single_page_keyed_exchange(spark, sf_small_dir):
    """C4 page re-assembly is ONE page-keyed exchange (the groupBy);
    the per-line verdicts are projections before it. No sort-based
    aggregate, no second shuffle."""
    import __spark_entry__ as entry

    plan = _plan(entry.q_c4_lines(spark, sf_small_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan
    assert "Python" not in plan


def test_region_top_terms_doc_attach_is_shuffle_hash(spark, sf_small_dir):
    """The geo×text composition must attach the corpus with a
    shuffle-hash join (never a broadcast of the corpus side, never a
    sort-merge) and rank inside per-region window partitions."""
    import __spark_entry__ as entry

    plan = _plan(entry.q_region_top_terms(spark, sf_small_dir))
    assert "ShuffledHashJoin [doc_id" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
