"""Deterministic synthesis of OSM-style geometry tables + cell coverings.

Tables mirror the reference's entity + tag-map model (SURVEY.md §1.4):

- ``osm_nodes(id, lat, lon, tags map<string,string>, h3_9, s2_13)``
- ``way_polygons(way_id, vlat array<double>, vlon array<double>,
  tags map<string,string>)`` — closed rings (first vertex NOT repeated)
- ``way_cells(way_id, cell)`` — exploded hex covering (the prejoin index)

Synthesis is seeded numpy on the driver for the small dim tables (polygons
and amenity nodes are the *small* side of every join — thousands of rows,
broadcast at any scale); the covering is computed distributed via
``mapInPandas`` so it scales with polygon count if a real OSM extract is
substituted.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_spark.geo.hexgrid import DEFAULT_RES, hex_polyfill, latlon_to_axial
from osm_spark.pipeline.pages import CITIES

AMENITY_KINDS = ["cafe", "school", "hospital", "library", "park"]


def synth_polygons_pdf(n_per_city: int = 8, seed: int = 42) -> pd.DataFrame:
    """Irregular star-convex polygons around each city center (seeded)."""
    rng = np.random.RandomState(seed)
    rows = []
    way_id = 1000
    for name, clat, clon, _w in CITIES:
        for k in range(n_per_city):
            nv = rng.randint(5, 11)
            # Radii span 300 m .. 4 km so some polygons cover many res-9
            # cells (hot) and some only a few.
            radius = rng.uniform(0.003, 0.04)
            angles = np.sort(rng.uniform(0, 2 * np.pi, nv))
            radii = radius * rng.uniform(0.5, 1.0, nv)
            olat = clat + rng.uniform(-0.03, 0.03)
            olon = clon + rng.uniform(-0.03, 0.03)
            vlat = olat + radii * np.sin(angles)
            vlon = olon + radii * np.cos(angles)
            rows.append(
                {
                    "way_id": way_id,
                    "vlat": vlat.tolist(),
                    "vlon": vlon.tolist(),
                    "tags": {
                        "name": f"{name}-area-{k}",
                        "landuse": ["residential", "commercial", "park"][k % 3],
                        "city": name,
                    },
                }
            )
            way_id += 1
    return pd.DataFrame(rows)


def synth_nodes_pdf(n_per_city: int = 40, seed: int = 43) -> pd.DataFrame:
    """Amenity point nodes with tag maps (the kNN right side)."""
    rng = np.random.RandomState(seed)
    rows = []
    node_id = 1
    for name, clat, clon, _w in CITIES:
        for k in range(n_per_city):
            rows.append(
                {
                    "id": node_id,
                    "lat": clat + rng.uniform(-0.05, 0.05),
                    "lon": clon + rng.uniform(-0.05, 0.05),
                    "tags": {
                        "amenity": AMENITY_KINDS[k % len(AMENITY_KINDS)],
                        "name": f"{name}-poi-{k}",
                    },
                }
            )
            node_id += 1
    return pd.DataFrame(rows)


def synth_polygons(spark: SparkSession, n_per_city: int = 8, seed: int = 42) -> DataFrame:
    pdf = synth_polygons_pdf(n_per_city, seed)
    return spark.createDataFrame(
        pdf,
        "way_id long, vlat array<double>, vlon array<double>, tags map<string,string>",
    )


def synth_nodes(spark: SparkSession, n_per_city: int = 40, seed: int = 43) -> DataFrame:
    pdf = synth_nodes_pdf(n_per_city, seed)
    return spark.createDataFrame(
        pdf, "id long, lat double, lon double, tags map<string,string>"
    )


def build_way_cells(polygons: DataFrame, res: int = DEFAULT_RES) -> DataFrame:
    """Exploded hex covering per polygon: (way_id, cell).

    Distributed ``mapInPandas``: each worker batch computes coverings with
    the vectorized ``hex_polyfill``; output is the cell-prejoin index table.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_way, out_cell = [], []
            for way_id, vlat, vlon in zip(pdf["way_id"], pdf["vlat"], pdf["vlon"]):
                cells = hex_polyfill(np.asarray(vlat), np.asarray(vlon), res)
                out_way.append(np.full(len(cells), way_id, dtype=np.int64))
                out_cell.append(cells)
            if out_way:
                yield pd.DataFrame(
                    {
                        "way_id": np.concatenate(out_way),
                        "cell": np.concatenate(out_cell),
                    }
                )

    return polygons.select("way_id", "vlat", "vlon").mapInPandas(
        gen, "way_id long, cell long"
    )


def build_way_cells_adaptive(
    polygons: DataFrame,
    fine_res: int = DEFAULT_RES,
    budget: int = 4096,
    min_res: int = 2,
) -> DataFrame:
    """Mixed-resolution hex covering: (way_id, cell) with each polygon
    covered at the FINEST resolution whose bbox-grid estimate fits
    ``budget`` cells (floored at ``min_res``).

    Why: a flat fine-res covering explodes on large polygons — a
    continent-scale admin ring at res 9 is ~10^7-10^8 cells, so a few
    big polygons dominate the whole index's row count AND its build
    cost (``hex_polyfill`` rasterizes the bbox grid). Capping per-
    polygon covering size bounds the index at ``O(polygons × budget)``
    regardless of polygon area — the standard mixed-level covering
    trick (H3 ``compact_cells`` / S2 ``RegionCoverer`` min/max levels),
    expressed here by choosing one resolution per polygon since the
    grid is flat-per-res (the cell id packs its res, so mixed-res ids
    share one ``cell long`` column and never collide across levels).

    Correctness is unchanged: ``hex_polyfill``'s superset guarantee
    (every cell containing a polygon point is included) holds at every
    resolution, and the prejoin side recomputes each point's cell at
    every level present (``pip_join_adaptive``), so the candidate set
    still contains every true pair; the exact refine unchanged. Coarser
    cells admit more false candidates per cell — ``budget`` trades
    index size against refine selectivity.

    Each res step is aperture-7 (cell area ×7), so the chooser loop
    runs ≤ ~log7(area/budget) cheap vertex-only estimates per polygon.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_way, out_cell = [], []
            for way_id, vlat, vlon in zip(pdf["way_id"], pdf["vlat"], pdf["vlon"]):
                vla = np.asarray(vlat, np.float64)
                vlo = np.asarray(vlon, np.float64)
                res = fine_res
                while res > min_res:
                    q, r = latlon_to_axial(vla, vlo, res)
                    est = (q.max() - q.min() + 5) * (r.max() - r.min() + 5)
                    if est <= budget:
                        break
                    res -= 1
                cells = hex_polyfill(vla, vlo, res)
                out_way.append(np.full(len(cells), way_id, dtype=np.int64))
                out_cell.append(cells)
            if out_way:
                yield pd.DataFrame(
                    {
                        "way_id": np.concatenate(out_way),
                        "cell": np.concatenate(out_cell),
                    }
                )

    return polygons.select("way_id", "vlat", "vlon").mapInPandas(
        gen, "way_id long, cell long"
    )
