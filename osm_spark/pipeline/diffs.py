"""Incremental geometry maintenance from node diffs — the OSM
replication-diff story (osmosis/pyosmium minutely diffs) as engine
operators: when a batch of nodes moves, ONLY the ways referencing them
re-assemble and re-cover; everything else is carried forward.

Reference analog: the element model whose node-ref lists this walks
(`lib/osm/way.rb` ordered refs; SURVEY.md §1.4 → ``ways.node_ids``).
The reference library fetches elements one at a time over the API; at
10^12-row scale the equivalent is diff-batch maintenance of
materialized geometry tables — a full re-assembly of the planet for a
minutely diff (~10³-10⁵ node edits) would be 10⁶× wasted work.

Plan shape:

- ``affected_ways``: explode way refs once, semi-join the (small,
  broadcast) changed-node-id set, distinct way_id. At planet scale the
  ways table is bucketed by way_id and the explode is column-pruned to
  the refs array; the diff side is kilobytes.
- ``apply_node_diff``: upsert semantics — changed rows replace same-id
  rows (anti-join + union; both sides hash on node id, the join the
  node table already buckets on).
- ``refresh_assembly`` / ``refresh_way_cells``: re-run assembly /
  covering ONLY for affected ways and stitch: carried = old MINUS
  affected (left_anti), refreshed = recompute over the affected subset,
  result = carried ∪ refreshed. Equality with full recompute is exact
  (per-way outputs depend only on that way's nodes) — the gated
  ``diff_assembly`` query states full post-diff recompute in DuckDB and
  must hash-match; covering equality is pytest-gated set equality
  (hex_polyfill is engine-side in both paths).

Node DELETES are out of scope here by design: a way whose ref vanishes
is no longer assemblable and enters the quarantine channel (S3
semantics), not the refreshed table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.pipeline.elements import assemble_way_polygons


def affected_ways(ways: DataFrame, node_changes: DataFrame) -> DataFrame:
    """Distinct way_id whose node_ids array references any changed node.
    The diff side broadcasts (a replication batch is tiny next to the
    way table)."""
    refs = ways.select(
        "way_id", F.explode("node_ids").alias("node_id")
    )
    changed = node_changes.select(F.col("id").alias("node_id")).distinct()
    return refs.join(F.broadcast(changed), "node_id", "left_semi").select(
        "way_id"
    ).distinct()


def apply_node_diff(nodes: DataFrame, node_changes: DataFrame) -> DataFrame:
    """Upsert: changed rows (id, lat, lon) replace same-id rows in
    ``nodes``; new ids append."""
    keep = nodes.join(
        node_changes.select("id"), "id", "left_anti"
    )
    return keep.unionByName(node_changes.select(*keep.columns))


def refresh_assembly(
    ways: DataFrame,
    nodes: DataFrame,
    node_changes: DataFrame,
    prev_polygons: DataFrame,
) -> DataFrame:
    """Post-diff way_polygons: carried-forward rows for untouched ways +
    fresh assembly (over the updated node table) for affected ways."""
    aff = affected_ways(ways, node_changes)
    nodes2 = apply_node_diff(nodes, node_changes)
    redo = assemble_way_polygons(
        ways.join(F.broadcast(aff), "way_id", "left_semi"), nodes2
    )
    carried = prev_polygons.join(F.broadcast(aff), "way_id", "left_anti")
    return carried.select("way_id", "vlat", "vlon", "tags").unionByName(
        redo.select("way_id", "vlat", "vlon", "tags")
    )


def refresh_way_cells(
    ways: DataFrame,
    nodes: DataFrame,
    node_changes: DataFrame,
    prev_polygons: DataFrame,
    prev_cells: DataFrame,
    res: int | None = None,
) -> DataFrame:
    """Post-diff covering index: old cells of affected ways drop, fresh
    coverings (computed only over the affected subset) append."""
    from osm_spark.geo.hexgrid import DEFAULT_RES
    from osm_spark.pipeline.geometry import build_way_cells

    aff = affected_ways(ways, node_changes)
    nodes2 = apply_node_diff(nodes, node_changes)
    redo_polys = assemble_way_polygons(
        ways.join(F.broadcast(aff), "way_id", "left_semi"), nodes2
    )
    new_cells = build_way_cells(
        redo_polys, res if res is not None else DEFAULT_RES
    )
    carried = prev_cells.join(F.broadcast(aff), "way_id", "left_anti")
    return carried.unionByName(new_cells)
