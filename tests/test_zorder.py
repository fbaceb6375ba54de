"""Z-order layout keys: python-oracle goldens + the measurable pruning
claim (tight per-file min/max on every participating column)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_spark.pipeline.zorder import (
    cluster_by_zorder,
    interleave_bits,
    normalize_to_bits,
    zorder_key,
    zorder_key_py,
)


def test_zorder_key_matches_python_oracle(spark):
    rows = [(i, float(i % 97), float((i * 37) % 211)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, a double, b double")
    specs = [(F.col("a"), 0.0, 100.0), (F.col("b"), 0.0, 250.0)]
    got = {r.id: r.z for r in df.select("id", zorder_key(specs, 16).alias("z")).collect()}
    for i, a, b in rows:
        assert got[i] == zorder_key_py([(a, 0.0, 100.0), (b, 0.0, 250.0)], 16), i


def test_zorder_clamps_out_of_domain(spark):
    df = spark.createDataFrame([(-5.0,), (150.0,)], "a double")
    vals = [
        r.n
        for r in df.select(
            normalize_to_bits(F.col("a"), 0.0, 100.0, 8).alias("n")
        ).collect()
    ]
    assert vals == [0, 255]


def test_zorder_validation():
    with pytest.raises(ValueError, match="exceeds a signed long"):
        interleave_bits([F.lit(1), F.lit(2)], 32)
    with pytest.raises(ValueError, match="hi > lo"):
        normalize_to_bits(F.lit(1.0), 5.0, 5.0, 8)
    with pytest.raises(ValueError, match="at least one"):
        interleave_bits([], 8)


def test_zorder_layout_prunes_box_queries(spark, tmp_path):
    """The point of the operator: after cluster_by_zorder, a small box
    filter on (x, y) must overlap far fewer parquet files than the same
    data laid out by insertion order — measured from the files' actual
    footer min/max stats, the exact mechanism scan pruning uses."""
    import pyarrow.parquet as pq
    import os

    n, files = 200_000, 16
    pts = spark.range(n).select(
        (F.pmod(F.xxhash64("id"), F.lit(10000)) / 100.0).alias("x"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(10000)) / 100.0).alias("y"),
    )
    specs = [(F.col("x"), 0.0, 100.0), (F.col("y"), 0.0, 100.0)]

    def file_boxes(path):
        boxes = []
        for root, _d, fns in os.walk(path):
            for fn in sorted(fns):
                if not fn.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(root, fn)).metadata
                xs, ys = [], []
                for rg in range(md.num_row_groups):
                    for ci in range(md.num_columns):
                        col = md.row_group(rg).column(ci)
                        tgt = xs if col.path_in_schema == "x" else ys
                        tgt.append((col.statistics.min, col.statistics.max))
                boxes.append(
                    (min(a for a, _ in xs), max(b for _, b in xs),
                     min(a for a, _ in ys), max(b for _, b in ys))
                )
        return boxes

    plain_path, z_path = str(tmp_path / "plain"), str(tmp_path / "zord")
    pts.repartition(files).write.mode("overwrite").parquet(plain_path)
    cluster_by_zorder(pts, specs, files).write.mode("overwrite").parquet(z_path)

    def overlapping(boxes, lo, hi):
        return sum(
            1 for x0, x1, y0, y1 in boxes
            if x1 >= lo and x0 <= hi and y1 >= lo and y0 <= hi
        )

    plain_boxes, z_boxes = file_boxes(plain_path), file_boxes(z_path)
    assert len(z_boxes) >= files // 2  # the range partitioner kept width
    p = overlapping(plain_boxes, 10.0, 20.0)
    z = overlapping(z_boxes, 10.0, 20.0)
    # hash-ordered files all span the full domain; z-ordered files are
    # small rectangles — a 10x10 box in a 100x100 domain (1% of area)
    # must touch at most half the z-files and every plain file
    assert p == len(plain_boxes)
    assert z <= len(z_boxes) // 2, (z, len(z_boxes))

    # layout is a re-arrangement, never a mutation (exact-integer sums —
    # double sums are order-dependent across layouts)
    exact = [
        F.count("*"),
        F.sum((F.col("x") * 100).cast("long")),
        F.sum((F.col("y") * 100).cast("long")),
    ]
    a = spark.read.parquet(plain_path).agg(*exact).collect()[0]
    b = spark.read.parquet(z_path).agg(*exact).collect()[0]
    assert tuple(a) == tuple(b)
