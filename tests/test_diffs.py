"""Incremental geometry maintenance from node diffs."""

from pyspark.sql import functions as F

from osm_spark.pipeline.diffs import (
    affected_ways,
    apply_node_diff,
    refresh_assembly,
    refresh_way_cells,
)
from osm_spark.pipeline.elements import assemble_way_polygons, synth_ways
from osm_spark.pipeline.geometry import build_way_cells, synth_polygons


def _fixture(spark):
    polygons = synth_polygons(spark)
    ways, nodes = synth_ways(spark, polygons)
    nid = F.col("id")
    changes = nodes.filter(nid % 11 == 0).select(
        "id",
        (F.col("lat") + ((nid % 7) - 3) / 1000.0).alias("lat"),
        (F.col("lon") + ((nid % 5) - 2) / 1000.0).alias("lon"),
    )
    return ways, nodes, changes


def test_affected_ways_is_exactly_the_referencing_set(spark):
    ways, nodes, changes = _fixture(spark)
    aff = {r.way_id for r in affected_ways(ways, changes).collect()}
    changed_ids = {r.id for r in changes.collect()}
    expected = {
        r.way_id
        for r in ways.collect()
        if any(n in changed_ids for n in r.node_ids)
    }
    assert aff == expected
    assert 0 < len(aff) < ways.count()  # incremental path is non-trivial


def test_refresh_equals_full_recompute(spark):
    ways, nodes, changes = _fixture(spark)
    prev = assemble_way_polygons(ways, nodes)
    inc = refresh_assembly(ways, nodes, changes, prev)
    full = assemble_way_polygons(ways, apply_node_diff(nodes, changes))
    key = lambda r: (r.way_id, tuple(r.vlat), tuple(r.vlon))  # noqa: E731
    assert sorted(map(key, inc.collect())) == sorted(map(key, full.collect()))


def test_refresh_way_cells_equals_full_recompute(spark):
    ways, nodes, changes = _fixture(spark)
    prev_polys = assemble_way_polygons(ways, nodes)
    prev_cells = build_way_cells(prev_polys)
    inc = refresh_way_cells(ways, nodes, changes, prev_polys, prev_cells)
    full = build_way_cells(
        assemble_way_polygons(ways, apply_node_diff(nodes, changes))
    )
    assert {(r.way_id, r.cell) for r in inc.collect()} == {
        (r.way_id, r.cell) for r in full.collect()
    }


def test_apply_node_diff_upserts(spark):
    nodes = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 1.0, 1.0)], "id long, lat double, lon double"
    )
    changes = spark.createDataFrame(
        [(2, 5.0, 5.0), (3, 9.0, 9.0)], "id long, lat double, lon double"
    )
    got = {r.id: (r.lat, r.lon) for r in apply_node_diff(nodes, changes).collect()}
    assert got == {1: (0.0, 0.0), 2: (5.0, 5.0), 3: (9.0, 9.0)}
