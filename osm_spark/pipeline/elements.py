"""OSM element model: nodes / ways / relations with tag maps, and the
assembly of way geometries from node-id lists.

This is the reference's entity + nested-array shape re-expressed
relationally (SURVEY.md §1.4): ``Osm::Event#columns``-style arrays of
refs (lib/osm/event.rb:63-65) become ``ways.node_ids array<long>``;
``Osm::FlexiRecord``-style dynamic maps (lib/osm/flexi_record.rb:249-255)
become ``tags map<string,string>``. Assembly — resolving each way's
ordered node refs to coordinates — is the engine's analog of the
reference's structure×data join (§2.3 J4).

Scale design: assembly is ``posexplode`` (way → one row per vertex slot),
an equi join to nodes on node_id (shuffle on node id — at planet scale
both sides bucket by node_id so the join is co-located), then a groupBy
that rebuilds the ordered vertex arrays via ``array_sort`` on (pos,
coord) structs — collect_list order is non-deterministic, the sort makes
it exact. Ring closure: a way is a polygon candidate iff first == last
node ref; the closing vertex is dropped (rings stored open, matching
``way_polygons``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def synth_ways(spark: SparkSession, polygons: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Decompose the synthetic polygon table into normalized OSM form:
    ``way_nodes(id, lat, lon)`` + ``ways(way_id, node_ids, tags)`` with a
    repeated first ref closing each ring. Deterministic node ids:
    ``way_id * 1000 + position``."""
    vertices = polygons.select(
        "way_id",
        "tags",
        F.posexplode(F.arrays_zip("vlat", "vlon")).alias("pos", "v"),
    ).select(
        "way_id",
        "tags",
        "pos",
        (F.col("way_id") * 1000 + F.col("pos")).alias("node_id"),
        F.col("v.vlat").alias("lat"),
        F.col("v.vlon").alias("lon"),
    )
    way_nodes = vertices.select(
        F.col("node_id").alias("id"), "lat", "lon"
    )
    ways = vertices.groupBy("way_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "node_id"))),
            lambda s: s["node_id"],
        ).alias("open_ids"),
        F.first("tags").alias("tags"),
    )
    ways = ways.select(
        "way_id",
        # close the ring: repeat the first ref (OSM closed-way convention)
        F.concat(F.col("open_ids"), F.slice(F.col("open_ids"), 1, 1)).alias("node_ids"),
        "tags",
    )
    return ways, way_nodes


def assemble_way_polygons(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """ways(way_id, node_ids, tags) ⋈ nodes(id, lat, lon) →
    way_polygons(way_id, vlat, vlon, tags); closed rings only, closing
    vertex dropped.

    The posexplode → join → ordered-rebuild plan; Catalyst handles the
    join strategy (broadcast under threshold, else shuffle on node id).
    """
    closed = ways.filter(
        F.element_at(F.col("node_ids"), 1)
        == F.element_at(F.col("node_ids"), -1)
    )
    slots = closed.select(
        "way_id",
        "tags",
        F.posexplode(F.slice(F.col("node_ids"), 1, F.size(F.col("node_ids")) - 1)).alias(
            "pos", "node_id"
        ),
    )
    joined = slots.join(
        nodes.select(F.col("id").alias("node_id"), "lat", "lon"), "node_id"
    )
    return joined.groupBy("way_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "lat", "lon"))),
            lambda s: s["lat"],
        ).alias("vlat"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "lat", "lon"))),
            lambda s: s["lon"],
        ).alias("vlon"),
        F.first("tags").alias("tags"),
    )


def synth_relations(spark: SparkSession, ways: DataFrame) -> DataFrame:
    """relations(relation_id, members array<struct<type,ref,role>>, tags):
    one multipolygon relation per city pairing each city's first way as
    ``outer`` and second as ``inner`` (deterministic)."""
    tagged = ways.select(
        "way_id", F.col("tags")["city"].alias("city"), F.col("tags")["name"].alias("name")
    )
    ranked = tagged.withColumn(
        "rk", F.row_number().over(Window.partitionBy("city").orderBy("way_id"))
    ).filter(F.col("rk") <= 2)
    return (
        ranked.groupBy("city")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rk", "way_id"))),
                lambda s: F.struct(
                    F.lit("way").alias("type"),
                    s["way_id"].alias("ref"),
                    F.when(s["rk"] == 1, "outer").otherwise("inner").alias("role"),
                ),
            ).alias("members")
        )
        .select(
            F.abs(F.xxhash64("city")).alias("relation_id"),
            "members",
            F.create_map(
                F.lit("type"), F.lit("multipolygon"), F.lit("name"), F.col("city")
            ).alias("tags"),
        )
    )


def relation_rings(relations: DataFrame, polygons: DataFrame) -> DataFrame:
    """Resolve multipolygon members to rings:
    (relation_id, role, way_id, vlat, vlon) — outer/inner ring table.

    PIP semantics for multipolygons = inside any outer AND not inside any
    inner; downstream joins consume this normalized ring table.
    """
    members = (
        relations.select("relation_id", F.explode("members").alias("m"))
        .filter(F.col("m.type") == "way")
        .select(
            "relation_id",
            F.col("m.ref").alias("way_id"),
            F.col("m.role").alias("role"),
        )
    )
    return members.join(
        polygons.select("way_id", "vlat", "vlon"), "way_id"
    ).select("relation_id", "role", "way_id", "vlat", "vlon")
