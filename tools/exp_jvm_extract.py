"""Experiment: pure-JVM coordinate extraction via a Generate barrier.

Hypothesis: the flagship pipeline's only Arrow pass (extract_points'
mapInPandas) was kept because an all-Column form suffered CollapseProject
expression cloning (~10 regex evals/row). An ``explode(array(struct))``
Generate node is a project-collapse barrier at ~zero runtime cost: the
regex evaluates once inside GenerateExec, downstream references read plain
attributes. If true, the flagship path becomes zero-Python and the 8->32
extract-stage scaling collapse (shared single-VM Arrow pipe) disappears.

Usage: python tools/exp_jvm_extract.py <cpus> <mult> [passes] [variants]
Prints one JSON line with walls for arrow/jvm extract + pip variants.
``variants`` is an optional comma-separated subset of the variant names.

Outcome (BENCH.md finding #10): hypothesis half-confirmed — the barrier
works (bit-exact rows, full-pipeline parity with zero Python) and the
engine ships as ``extract_points(engine='jvm')``, but full-pipeline
8->32 efficiency stays 0.61-0.65 even with zero Python, pinning the
scaling shortfall on single-VM saturation, not the Arrow pipe.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from osm_spark.geo.extract import extract_coords_expr  # noqa: E402
from osm_spark.geo.hexgrid import DEFAULT_RES, hex_cell_expr  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def extract_points_jvm2(pages: DataFrame, res: int = DEFAULT_RES) -> DataFrame:
    # Tighter barrier: explode ONLY the raw regex match (group 0).
    # Exactly one regex eval per row by construction; the lat/lon parsing
    # runs above the Generate on a <=64-char attribute, where expression
    # cloning costs nothing.
    from osm_spark.geo.extract import COORD_REGEX

    e = pages.select(
        "url",
        F.explode(
            F.array(F.regexp_extract(F.col("text"), COORD_REGEX, 0))
        ).alias("m"),
    ).where(F.col("m") != "")
    body = F.substring(F.col("m"), 5, 64)
    lat = F.substring_index(body, ",", 1).cast("double")
    lon = F.substring_index(body, ",", -1).cast("double")
    pts = (
        e.select("url", lat.alias("lat"), lon.alias("lon"))
        .where((F.abs(F.col("lat")) <= 90.0) & (F.abs(F.col("lon")) <= 180.0))
    )
    return pts.withColumn("h3_9", hex_cell_expr("lat", "lon", res))


def extract_points_jvm3(pages: DataFrame, res: int = DEFAULT_RES) -> DataFrame:
    # Double Generate barrier: barrier 1 materializes the raw regex match
    # (regex evaluated exactly once per row); barrier 2 materializes the
    # parsed lat/lon and the hex cell id (parse + hex chain evaluated
    # exactly once per match). Downstream consumers — the PIP refine
    # references lat/lon dozens of times inside higher-order lambdas —
    # read plain attributes, same as the Arrow form, with zero Python.
    from osm_spark.geo.extract import COORD_REGEX

    e = pages.select(
        "url",
        F.explode(
            F.array(F.regexp_extract(F.col("text"), COORD_REGEX, 0))
        ).alias("m"),
    ).where(F.col("m") != "")
    body = F.substring(F.col("m"), 5, 64)
    lat = F.substring_index(body, ",", 1).cast("double")
    lon = F.substring_index(body, ",", -1).cast("double")
    p = e.select(
        "url",
        F.explode(
            F.array(
                F.struct(
                    lat.alias("lat"),
                    lon.alias("lon"),
                )
            )
        ).alias("c"),
    ).where(
        (F.abs(F.col("c.lat")) <= 90.0) & (F.abs(F.col("c.lon")) <= 180.0)
    )
    # third barrier for the hex id so the join hash doesn't inline the
    # ~40-op encode chain into every reference either
    return (
        p.select(
            "url",
            F.col("c.lat").alias("lat"),
            F.col("c.lon").alias("lon"),
            F.explode(
                F.array(hex_cell_expr("c.lat", "c.lon", res))
            ).alias("h3_9"),
        )
    )


def extract_points_jvm(pages: DataFrame, res: int = DEFAULT_RES) -> DataFrame:
    # Generate barrier: explode a 1-element array so the regex struct is
    # materialized once per row by GenerateExec; CollapseProject cannot
    # inline it into downstream references.
    e = pages.select(
        "url", F.explode(F.array(extract_coords_expr("text"))).alias("c")
    )
    return (
        e.where(F.col("c.lat").isNotNull() & F.col("c.lon").isNotNull())
        .select(
            "url",
            F.col("c.lat").alias("lat"),
            F.col("c.lon").alias("lon"),
        )
        .withColumn("h3_9", hex_cell_expr("lat", "lon", res))
    )


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    cpus = int(sys.argv[1])
    mult = int(sys.argv[2])
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from bench import warm_python_workers  # noqa: E402
    from osm_spark.pipeline.geometry import build_way_cells, synth_polygons
    from osm_spark.pipeline.pages import synth_pages
    from osm_spark.pipeline.spatial_join import extract_points, pip_join
    from osm_spark.session import get_spark

    spark = get_spark(
        app_name=f"exp_jvm_extract_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = synth_pages(spark, SF_DIR, mult)
    n = pages.count()
    polygons = synth_polygons(spark)
    way_cells = spark.createDataFrame(
        build_way_cells(polygons).collect(), "way_id long, cell long"
    )
    warm_python_workers(spark, cpus)

    # jvm3 == the shipped extract_points(engine="jvm") path
    variants = {
        "extract_arrow": lambda: extract_points(pages),
        "extract_jvm2": lambda: extract_points_jvm2(pages),
        "extract_jvm3": lambda: extract_points(pages, engine="jvm"),
        "pip_jvm3": lambda: pip_join(
            extract_points(pages, engine="jvm"),
            polygons,
            way_cells,
            strategy="broadcast",
        ),
        "pip_arrow": lambda: pip_join(
            extract_points(pages), polygons, way_cells, strategy="broadcast"
        ),
    }
    if len(sys.argv) > 4:
        keep = set(sys.argv[4].split(","))
        variants = {k: v for k, v in variants.items() if k in keep}
    walls: dict[str, list[float]] = {k: [] for k in variants}
    # correctness: same row count both paths (cheap sanity; bit-exact
    # equality is golden-tested at the function level)
    counts = {
        "rows_arrow": extract_points(pages).count(),
        "rows_jvm3": extract_points(pages, engine="jvm").count(),
    }
    for p in range(passes):
        for name, fn in variants.items():  # interleaved A/B
            t0 = time.monotonic()
            force(fn())
            walls[name].append(round(time.monotonic() - t0, 3))
    out = {"cpus": cpus, "pages": n, **counts, "walls": walls}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
