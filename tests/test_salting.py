"""Hot-cell salting beyond the PIP family (pipeline/salting.py):
kNN phase-2, radius, and DBSCAN pair joins — result equality vs the
unsalted paths, data-driven plan shape, and (cell, _salt) plan pins.
r4 verdict ask #2."""

from __future__ import annotations

import re

import pytest

import numpy as np
from pyspark.sql import functions as F

from osm_spark.geo.dbscan import eps_pairs
from osm_spark.geo.hexgrid import hex_cell_expr
from osm_spark.geo.knn import knn_join
from osm_spark.geo.radius import plan_res, radius_join
from osm_spark.pipeline.salting import key_salt_plan, salted_equi_join


def _cloud(spark, seed=7, n=300, hot_frac=0.5):
    """Point cloud where ~hot_frac of rows land in ONE tight cluster
    (a single res-8 cell — the Zipf urban shape), rest spread wide."""
    rng = np.random.RandomState(seed)
    rows = []
    n_hot = int(n * hot_frac)
    for i in range(n_hot):
        rows.append((f"h{i}",
                     float(51.5 + rng.uniform(-0.0005, 0.0005)),
                     float(-0.13 + rng.uniform(-0.0005, 0.0005))))
    for i in range(n - n_hot):
        rows.append((f"c{i}",
                     float(51.5 + rng.uniform(-0.4, 0.4)),
                     float(-0.13 + rng.uniform(-0.4, 0.4))))
    return spark.createDataFrame(rows, "url string, lat double, lon double")


def _nodes(spark, seed=9, n=40):
    rng = np.random.RandomState(seed)
    rows = [(i,
             float(51.5 + rng.uniform(-0.3, 0.3)),
             float(-0.13 + rng.uniform(-0.3, 0.3))) for i in range(n)]
    return spark.createDataFrame(rows, "id long, lat double, lon double")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_key_salt_plan_is_data_driven(spark):
    df = spark.createDataFrame(
        [(k, i) for k in ("hot", "cold") for i in range(30 if k == "hot" else 3)],
        "cell string, i int",
    )
    got = {r.cell: r._k for r in key_salt_plan(df, "cell", target=10).collect()}
    assert got == {"hot": 3}  # ceil(30/10); cold never appears


def test_salted_equi_join_equals_plain_join(spark):
    big = spark.createDataFrame(
        [(f"u{i}", "hot" if i % 2 else "cold") for i in range(60)],
        "url string, cell string",
    )
    small = spark.createDataFrame(
        [("hot", 1), ("hot", 2), ("cold", 3)], "cell string, v int"
    )
    salts = key_salt_plan(big, "cell", target=10)
    plain = {(r.url, r.v) for r in big.join(small, "cell").collect()}
    salted = {
        (r.url, r.v)
        for r in salted_equi_join(big, small, "cell", salts, "url").collect()
    }
    assert salted == plain and len(plain) == 90


def test_knn_salted_phase2_identical_and_pinned(spark):
    pts = _cloud(spark)
    nodes = _nodes(spark)
    ref = {
        (r.url, r.node_id, r.rank)
        for r in knn_join(pts, nodes, k=3, phase2="broadcast").collect()
    }
    cells = pts.select(hex_cell_expr("lat", "lon", 8).alias("pcell"))
    salts = key_salt_plan(cells, "pcell", target=20)
    assert salts.agg(F.max("_k")).first()[0] >= 2  # the hot cell split
    out = knn_join(pts, nodes, k=3, phase2="salted", salts=salts)
    got = {(r.url, r.node_id, r.rank) for r in out.collect()}
    assert got == ref
    plan = _plan(out)
    assert re.search(r"ShuffledHashJoin \[pcell#\d+L?, _salt", plan), plan


def test_knn_salted_auto_salts_from_histogram(spark):
    """salts=None computes the plan from the points' own histogram —
    at the default target nothing is hot here, and the join must still
    be exact through the k=1 scatter."""
    pts = _cloud(spark, seed=13, n=120)
    nodes = _nodes(spark, seed=15)
    ref = {
        (r.url, r.node_id, r.rank)
        for r in knn_join(pts, nodes, k=2, phase2="broadcast").collect()
    }
    got = {
        (r.url, r.node_id, r.rank)
        for r in knn_join(pts, nodes, k=2, phase2="salted").collect()
    }
    assert got == ref


def test_radius_salted_identical_and_pinned(spark):
    pts = _cloud(spark, seed=21)
    nodes = _nodes(spark, seed=23)
    radius_m, lat_bound = 3000.0, 52.0
    res = plan_res(radius_m, lat_bound)
    ref = {
        (r.url, r.node_id)
        for r in radius_join(
            pts, nodes, radius_m, strategy="broadcast", max_abs_lat=lat_bound
        ).collect()
    }
    cells = pts.select(hex_cell_expr("lat", "lon", res).alias("pcell"))
    salts = key_salt_plan(cells, "pcell", target=20)
    assert salts.agg(F.max("_k")).first()[0] >= 2
    out = radius_join(
        pts, nodes, radius_m, strategy="salted", salts=salts,
        max_abs_lat=lat_bound,
    )
    got = {(r.url, r.node_id) for r in out.collect()}
    assert got == ref and len(ref) > 0
    plan = _plan(out)
    assert re.search(r"ShuffledHashJoin \[pcell#\d+L?, _salt", plan), plan


def test_eps_pairs_salted_identical(spark):
    pts = _cloud(spark, seed=31, n=200).select(
        F.monotonically_increasing_id().alias("_"),
        F.xxhash64("url").alias("id"), "lat", "lon",
    ).drop("_")
    eps_m, lat_bound = 500.0, 52.0
    res = plan_res(eps_m, lat_bound)
    ref = {
        (r.a_id, r.b_id)
        for r in eps_pairs(pts, eps_m, max_abs_lat=lat_bound).collect()
    }
    cells = pts.select(hex_cell_expr("lat", "lon", res).alias("cell"))
    salts = key_salt_plan(cells, "cell", target=20)
    assert salts.agg(F.max("_k")).first()[0] >= 2
    out = eps_pairs(pts, eps_m, max_abs_lat=lat_bound, salts=salts)
    got = {(r.a_id, r.b_id) for r in out.collect()}
    assert got == ref and len(ref) > 0
    plan = _plan(out)
    assert re.search(r"ShuffledHashJoin \[cell#\d+L?, _salt", plan), plan


def test_salted_join_never_broadcasts_candidate_sets(spark):
    """On the salted phase 2 the per-cell candidate ARRAYS (the side
    that grows with the occupied-cell count — multi-GB at planet
    scale) must reach the join through the salted shuffle, never a
    BroadcastExchange. Phase 1's small node-dim broadcast is separate
    and allowed while the dim fits (phase1_strategy)."""
    pts = _cloud(spark)
    nodes = _nodes(spark)
    cells = pts.select(hex_cell_expr("lat", "lon", 8).alias("pcell"))
    salts = key_salt_plan(cells, "pcell", target=20)
    plan = _plan(knn_join(pts, nodes, k=3, phase2="salted", salts=salts))
    for sub in plan.split("BroadcastExchange")[1:]:
        head = sub[:400]
        assert "cands" not in head, plan


def test_snap_salted_identical_and_pinned(spark):
    """The fourth cell-keyed join of the family: snap's point×candidate
    join under strategy='salted' returns exactly the shuffle path's
    rows, with the (cell, _salt) re-key pinned in the plan."""
    import numpy as np
    import pandas as pd

    from osm_spark.geo.snap import plan_snap, snap_join

    rng = np.random.default_rng(31)
    n = 200
    # 60% of points collapse into one ~50 m hotspot -> one hot cell
    hot = rng.random(n) < 0.6
    ppdf = pd.DataFrame(
        {
            "url": [f"p{i}" for i in range(n)],
            "lat": np.where(
                hot, 51.5 + rng.normal(0, 0.0004, n),
                51.5 + rng.normal(0, 0.01, n)
            ),
            "lon": np.where(
                hot, -0.12 + rng.normal(0, 0.0004, n),
                -0.12 + rng.normal(0, 0.016, n)
            ),
        }
    )
    pts = spark.createDataFrame(ppdf)
    ways = spark.createDataFrame(
        [(1, [51.49, 51.51], [-0.14, -0.10]),
         (2, [51.505, 51.515], [-0.13, -0.11])],
        "way_id long, vlat array<double>, vlon array<double>",
    )
    radius_m = 2000.0
    ref = {
        (r.url, r.way_id, r.seg_idx)
        for r in snap_join(
            pts, ways, radius_m, strategy="broadcast"
        ).collect()
    }
    res, _ring = plan_snap(radius_m, 51.6)
    cells = pts.select(hex_cell_expr("lat", "lon", res).alias("cell"))
    salts = key_salt_plan(cells, "cell", target=20)
    assert salts.agg(F.max("_k")).first()[0] >= 2
    out = snap_join(pts, ways, radius_m, strategy="salted", salts=salts)
    got = {(r.url, r.way_id, r.seg_idx) for r in out.collect()}
    assert got == ref and len(ref) > 0
    plan = _plan(out)
    assert re.search(r"ShuffledHashJoin \[cell#\d+L?, _salt", plan), plan


def test_snap_salted_rejects_keep_unmatched(spark):
    from osm_spark.geo.snap import snap_candidates

    pts = spark.createDataFrame(
        [(1, 1, 51.5, -0.12)], "trip_id long, seq int, lat double, lon double"
    )
    ways = spark.createDataFrame(
        [(1, [51.49, 51.51], [-0.14, -0.10])],
        "way_id long, vlat array<double>, vlon array<double>",
    )
    with pytest.raises(ValueError, match="keep_unmatched"):
        snap_candidates(
            pts, ways, 2000.0, strategy="salted", keep_unmatched=True,
            point_cols=("trip_id", "seq"),
        )
