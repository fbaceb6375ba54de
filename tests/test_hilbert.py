"""Hilbert layout key (osm_spark/pipeline/hilbert.py): exhaustive small
grids vs the python loop, the unit-step adjacency property, and the
locality win over Z-order."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from osm_spark.pipeline.hilbert import attach_hilbert_key, hilbert_d_py
from osm_spark.pipeline.zorder import zorder_key_py


def _grid_df(spark, bits):
    n = 1 << bits
    rows = [
        {"x": float(x), "y": float(y)} for x in range(n) for y in range(n)
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_matches_python_exhaustive(spark):
    for bits in (1, 2, 3, 4):
        n = 1 << bits
        df = attach_hilbert_key(
            _grid_df(spark, bits),
            ("x", 0.0, float(n - 1) if n > 1 else 1.0),
            ("y", 0.0, float(n - 1) if n > 1 else 1.0),
            bits=bits,
        )
        got = {(int(r.x), int(r.y)): r.hkey for r in df.collect()}
        for (x, y), k in got.items():
            assert k == hilbert_d_py(x, y, bits), (bits, x, y)
        # a space-filling curve is a bijection on the grid
        assert sorted(got.values()) == list(range(n * n))


def test_unit_steps_are_adjacent(spark):
    bits = 4
    n = 1 << bits
    df = attach_hilbert_key(
        _grid_df(spark, bits), ("x", 0.0, float(n - 1)), ("y", 0.0, float(n - 1)),
        bits=bits,
    )
    by_d = {r.hkey: (int(r.x), int(r.y)) for r in df.collect()}
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1  # the Hilbert property


def test_bbox_clustering_beats_zorder():
    """The metric that matters for file skipping (Moon et al., "Analysis
    of the clustering properties of the Hilbert space-filling curve",
    TKDE 2001): a bbox scan touches one file per CONTIGUOUS KEY RUN, and
    Hilbert needs fewer runs than Z-order on average."""
    bits = 6
    n = 1 << bits
    span = float(n - 1)

    def runs(keys):
        ks = sorted(keys)
        return 1 + sum(1 for a, b in zip(ks, ks[1:]) if b != a + 1)

    h_runs = z_runs = 0
    box = 8
    for x0 in range(0, n - box, 5):
        for y0 in range(0, n - box, 5):
            cells = [
                (x, y)
                for x in range(x0, x0 + box)
                for y in range(y0, y0 + box)
            ]
            h_runs += runs(hilbert_d_py(x, y, bits) for x, y in cells)
            z_runs += runs(
                zorder_key_py([(x, 0.0, span), (y, 0.0, span)], bits)
                for x, y in cells
            )
    assert h_runs < z_runs


def test_plan_stays_linear_no_udf(spark):
    df = attach_hilbert_key(
        _grid_df(spark, 2), ("x", 0.0, 3.0), ("y", 0.0, 3.0), bits=16
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert len(plan) < 2_000_000  # linear unroll, no 3^bits blow-up

def test_hilbert_layout_prunes_at_least_as_well_as_zorder(spark, tmp_path):
    """End-to-end file-skipping A/B (the test_zorder footer-stats
    method): a small box query over a Hilbert-clustered layout touches
    no MORE files than the Z-order layout of the same data."""
    import os

    import pyarrow.parquet as pq

    from osm_spark.pipeline.hilbert import cluster_by_hilbert
    from osm_spark.pipeline.zorder import cluster_by_zorder

    n, files = 200_000, 16
    pts = spark.range(n).select(
        (F.pmod(F.xxhash64("id"), F.lit(10000)) / 100.0).alias("x"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(10000)) / 100.0).alias("y"),
    )
    xs_spec, ys_spec = (F.col("x"), 0.0, 100.0), (F.col("y"), 0.0, 100.0)

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

    h_path, z_path = str(tmp_path / "hil"), str(tmp_path / "zord")
    cluster_by_hilbert(pts, xs_spec, ys_spec, files).write.mode(
        "overwrite"
    ).parquet(h_path)
    cluster_by_zorder(pts, [xs_spec, ys_spec], files).write.mode(
        "overwrite"
    ).parquet(z_path)

    def overlapping(boxes, lo, hi):
        return sum(
            1 for x0, x1, y0, y1 in boxes
            if x1 >= lo and x0 <= hi and y1 >= lo and y0 <= hi
        )

    h_boxes, z_boxes = file_boxes(h_path), file_boxes(z_path)
    assert len(h_boxes) >= files // 2
    totals = [0, 0]
    for lo in (5.0, 25.0, 45.0, 65.0, 85.0):
        totals[0] += overlapping(h_boxes, lo, lo + 10.0)
        totals[1] += overlapping(z_boxes, lo, lo + 10.0)
    assert totals[0] <= totals[1], totals
    # and both layouts genuinely prune vs all-files on a 1%-area box
    assert overlapping(h_boxes, 10.0, 20.0) <= len(h_boxes) // 2
