"""osm_spark — a PySpark-native spatial-join + tiling engine.

Re-expresses the data model and query semantics of the ``robertgauld/osm``
reference (typed entities + dynamic tag maps, derived-status aggregation,
multi-key ordering, read-through caching) as lakehouse geometry tables
(OSM-style nodes/ways/relations with ``map<string,string>`` tags) joined
against a Common-Crawl-style web-page table, with H3/S2 cell indexing,
point-in-polygon, kNN, raster tiling and contour extraction on top.

Design point: 10^12-row ``pages`` table on a 1000-executor cluster. Every
operator is declared via the DataFrame API so Catalyst handles pushdown,
pruning and join planning; Python appears only as vectorized Arrow UDFs
(never per-row).

Subpackages
-----------
functions   scalar column expressions (parsing, tag-map, text analysis)
operators   relational operators (ordering, windows, dedup, similarity, badges)
geo         spatial core (S2 cells, hex grid, PIP, kNN, tiles, contours)
pipeline    end-to-end jobs (pages synthesis, spatial join, lineage/resume)
streaming   structured-streaming variants of the batch operators
"""

__version__ = "0.1.0"
