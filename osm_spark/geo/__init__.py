"""Spatial core: cell indexes, point-in-polygon, kNN, tiles, contours.

The container ships no geo libraries (``h3``, ``s2sphere``, ``shapely`` all
absent), so the cell indexes and geometry predicates here are pure-numpy
implementations of the published algorithms, vectorized inside pandas/Arrow
UDFs (zero per-row Python, per BASELINE.json:15). Cell ids are therefore
deterministic but NOT bit-compatible with the h3/s2geometry libraries; all
goldens store cell ids explicitly so they never drift (SURVEY.md §7 risks).
"""

from osm_spark.geo.hexgrid import (  # noqa: F401
    HEX_RES9_DEG,
    hex_cell,
    hex_cell_udf,
    hex_disk,
    hex_polyfill,
    hex_to_center,
)
from osm_spark.geo.s2 import s2_cell, s2_cell_udf  # noqa: F401
from osm_spark.geo.tiles import tile_xy  # noqa: F401
from osm_spark.geo.geohash import (  # noqa: F401
    cover_bbox,
    geohash_expr,
    geohash_sql,
    viewport_filter,
)
from osm_spark.geo.measure import way_geometry_stats  # noqa: F401
from osm_spark.geo.ripley import cross_k, ripley_k  # noqa: F401
from osm_spark.geo.simplify import assemble_lines, simplify_lines  # noqa: F401
