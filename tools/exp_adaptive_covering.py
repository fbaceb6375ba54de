"""Measure what the adaptive mixed-resolution covering buys.

Fixture: 2 M deterministic points around one city bbox; 40 small synth
polygons PLUS a handful of large admin-style rings (0.6° wide). At flat
res 9 the big rings each polyfill to ~10^5-10^6 cells, pushing the whole
index past the broadcast ceiling — the engine must fall back to the
salted shuffle path. The adaptive covering caps each polygon at `budget`
cells, so the same catalog stays in the broadcast regime (points never
shuffle).

Reports: index rows + build wall (flat vs adaptive), and the PIP join
wall (flat-index salted path vs adaptive-index broadcast path), outputs
asserted identical. Run: `python tools/exp_adaptive_covering.py`.
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from osm_spark.geo.hexgrid import hex_cell_expr  # noqa: E402
from osm_spark.pipeline.geometry import (  # noqa: E402
    build_way_cells,
    build_way_cells_adaptive,
    synth_polygons,
)
from osm_spark.pipeline.spatial_join import (  # noqa: E402
    BROADCAST_MAX_CELLS,
    pip_join_adaptive,
    pip_join_salted,
    salt_plan,
)
from osm_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="exp_adaptive", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    n_points = 2_000_000
    base = spark.range(n_points)
    u1 = F.pmod(F.xxhash64("id"), F.lit(100000)) / 100000.0
    u2 = F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100000)) / 100000.0
    pts = base.select(
        F.col("id").cast("string").alias("url"),
        (51.2 + u1 * 0.8).alias("lat"),
        (-0.6 + u2 * 0.8).alias("lon"),
    ).withColumn("h3_9", hex_cell_expr("lat", "lon", 9))
    pts = pts.localCheckpoint()

    # 1.2°-radius rings: ~7x10^5 flat res-9 cells EACH, so four of them
    # push the flat index past BROADCAST_MAX_CELLS and the engine's
    # honest flat-covering path is the salted shuffle
    big = []
    for i in range(4):
        clat, clon = 51.45 + 0.05 * i, -0.25 + 0.05 * i
        nv = 24
        big.append(
            (
                80000 + i,
                [clat + 1.2 * math.cos(2 * math.pi * v / nv) for v in range(nv)],
                [clon + 1.2 * math.sin(2 * math.pi * v / nv) for v in range(nv)],
            )
        )
    polys = (
        synth_polygons(spark)
        .select("way_id", "vlat", "vlon")
        .unionByName(
            spark.createDataFrame(
                big, "way_id long, vlat array<double>, vlon array<double>"
            )
        )
    )

    out: dict[str, object] = {"n_points": n_points, "n_big_rings": len(big)}

    t0 = time.monotonic()
    flat = build_way_cells(polys)
    flat_rows = flat.count()
    out["flat_index_rows"] = flat_rows
    out["flat_build_sec"] = round(time.monotonic() - t0, 2)
    out["flat_fits_broadcast"] = flat_rows <= BROADCAST_MAX_CELLS

    t0 = time.monotonic()
    adaptive = build_way_cells_adaptive(polys, budget=4096)
    ad_rows = adaptive.count()
    out["adaptive_index_rows"] = ad_rows
    out["adaptive_build_sec"] = round(time.monotonic() - t0, 2)

    # flat index past the ceiling -> the engine's honest path is salted
    flat = flat.localCheckpoint()
    adaptive = adaptive.localCheckpoint()
    jobs = {
        "flat_salted": lambda: pip_join_salted(pts, polys, flat, salt_plan(pts)),
        "adaptive_broadcast": lambda: pip_join_adaptive(
            pts, polys, adaptive, "broadcast"
        ),
    }
    counts = {k: fn().count() for k, fn in jobs.items()}  # warm + verify
    assert len(set(counts.values())) == 1, counts
    out["pairs_out"] = counts["flat_salted"]
    walls: dict[str, list[float]] = {k: [] for k in jobs}
    for _ in range(3):
        for k, fn in jobs.items():
            t0 = time.monotonic()
            fn().count()
            walls[k].append(round(time.monotonic() - t0, 2))
    out["join_walls"] = walls
    out["join_min"] = {k: min(v) for k, v in walls.items()}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
