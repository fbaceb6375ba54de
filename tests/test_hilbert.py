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