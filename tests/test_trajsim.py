"""Trajectory Hausdorff join (geo/trajsim.py): brute-force parity on a
seeded trip cloud, identical-trip zero distance, threshold edges,
res-independence, salted ≡ unsalted, and the plan pins."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pytest

from osm_spark.geo.trajsim import hausdorff_join
from osm_spark.pipeline.salting import key_salt_plan


def _hav(a, b):
    return 2.0 * 6371000.0 * math.asin(math.sqrt(
        math.sin(math.radians(b[0] - a[0]) / 2.0) ** 2
        + math.cos(math.radians(a[0])) * math.cos(math.radians(b[0]))
        * math.sin(math.radians(b[1] - a[1]) / 2.0) ** 2))


def _H(A, B):
    d1 = max(min(_hav(a, b) for b in B) for a in A)
    d2 = max(min(_hav(b, a) for a in A) for b in B)
    return max(d1, d2)


def _brute(trips, d):
    out = []
    for a, b in itertools.combinations(sorted(trips), 2):
        h = _H(trips[a], trips[b])
        if h <= d:
            out.append((a, b, round(h * 1000)))
    return sorted(out)


def _cloud(seed=11, n_trips=24, n_pts=12):
    """Trips jittered around 3 nearby anchors — plenty of close pairs."""
    rng = np.random.RandomState(seed)
    trips = {}
    for t in range(n_trips):
        alat = 51.5 + (t % 3) * 0.01
        alon = -0.13 + (t % 3) * 0.01
        trips[t] = [
            (float(alat + rng.uniform(-0.004, 0.004)),
             float(alon + rng.uniform(-0.004, 0.004)))
            for _ in range(n_pts)
        ]
    return trips


def _df(spark, trips):
    rows = [(t, la, lo) for t, pts in trips.items() for la, lo in pts]
    return spark.createDataFrame(rows, "trip_id long, lat double, lon double")


def test_brute_force_parity(spark):
    trips = _cloud()
    d = 900.0
    exp = _brute(trips, d)
    got = sorted(tuple(r) for r in hausdorff_join(_df(spark, trips), d).collect())
    assert got == exp
    assert 0 < len(exp) < len(trips) * (len(trips) - 1) // 2  # nontrivial split


def test_identical_trips_zero_distance(spark):
    pts = [(51.5, -0.13), (51.501, -0.129), (51.502, -0.131)]
    trips = {1: pts, 2: list(reversed(pts))}  # same SET, different order
    got = hausdorff_join(_df(spark, trips), 10.0).collect()
    assert [(r.trip_a, r.trip_b, r.h_mm) for r in got] == [(1, 2, 0)]


def test_subset_trip_directed_asymmetry(spark):
    # B ⊂ A: h(B→A)=0 but h(A→B) is the far point's distance — the
    # SYMMETRIC form must use the larger direction
    A = [(51.5, -0.13), (51.6, -0.13)]   # ~11 km apart
    B = [(51.5, -0.13)]
    df = _df(spark, {1: A, 2: B})
    assert hausdorff_join(df, 5000.0).collect() == []
    got = hausdorff_join(df, 20000.0).collect()
    assert len(got) == 1
    assert got[0].h_mm == round(_hav(A[1], B[0]) * 1000)


def test_res_independence(spark):
    trips = _cloud(seed=5)
    df = _df(spark, trips)
    d = 900.0
    base = sorted(tuple(r) for r in hausdorff_join(df, d).collect())
    coarse = sorted(tuple(r) for r in hausdorff_join(df, d, res=6).collect())
    assert base == coarse == _brute(trips, d)


def test_salted_equals_unsalted(spark):
    from pyspark.sql import functions as F
    from osm_spark.geo.hexgrid import hex_cell_expr
    from osm_spark.geo.radius import plan_res

    trips = _cloud(seed=7)
    df = _df(spark, trips)
    d = 900.0
    res = plan_res(d, 51.6)
    cells = df.select(
        F.col("trip_id").alias("trip_a"),
        hex_cell_expr("lat", "lon", res).alias("cell"),
    ).distinct()
    salts = key_salt_plan(cells, "cell", target=2)
    assert salts.count() > 0
    plain = sorted(tuple(r) for r in hausdorff_join(df, d).collect())
    salted = sorted(tuple(r) for r in hausdorff_join(df, d, salts=salts).collect())
    assert salted == plain


def test_empty_input_raises(spark):
    df = spark.createDataFrame([], "trip_id long, lat double, lon double")
    with pytest.raises(ValueError, match="empty"):
        hausdorff_join(df, 100.0)


def test_bad_threshold_raises(spark):
    df = _df(spark, {1: [(51.5, -0.13)]})
    with pytest.raises(ValueError, match="d_max_m"):
        hausdorff_join(df, 0.0)


def test_plan_no_cartesian_shuffle_hash(spark):
    df = _df(spark, _cloud())
    out = hausdorff_join(df, 900.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ShuffledHashJoin" in plan


# --- discrete Fréchet (frechet_join) ----------------------------------

def _frechet(A, B):
    prev = None
    for i, a in enumerate(A):
        row = [0.0] * len(B)
        for j, bp in enumerate(B):
            d = _hav(a, bp)
            if i == 0 and j == 0:
                row[j] = d
            elif i == 0:
                row[j] = max(d, row[j - 1])
            elif j == 0:
                row[j] = max(d, prev[0])
            else:
                row[j] = max(d, min(prev[j], prev[j - 1], row[j - 1]))
        prev = row
    return prev[-1]


def _fdf(spark, trips):
    rows = [(t, i, la, lo)
            for t, pts in trips.items() for i, (la, lo) in enumerate(pts)]
    return spark.createDataFrame(
        rows, "trip_id long, ord int, lat double, lon double")


def _fbrute(trips, d):
    out = []
    for a, b in itertools.combinations(sorted(trips), 2):
        f = _frechet(trips[a], trips[b])
        if f <= d:
            out.append((a, b, round(f * 1000)))
    return sorted(out)


def test_frechet_brute_force_parity(spark):
    from osm_spark.geo.trajsim import frechet_join

    trips = _cloud(seed=13)
    d = 1100.0
    exp = _fbrute(trips, d)
    got = sorted(tuple(r) for r in frechet_join(_fdf(spark, trips), d).collect())
    assert got == exp
    assert 0 < len(exp) < len(trips) * (len(trips) - 1) // 2


def test_frechet_detects_direction(spark):
    from osm_spark.geo.trajsim import frechet_join

    # same ground, opposite directions: Hausdorff 0, Fréchet ≈ track length
    pts = [(51.5, -0.13), (51.51, -0.13), (51.52, -0.13)]
    trips = {1: pts, 2: list(reversed(pts))}
    df = _fdf(spark, trips)
    assert sorted(tuple(r) for r in hausdorff_join(
        df.drop("ord"), 10.0).collect()) == [(1, 2, 0)]
    assert frechet_join(df, 1000.0).collect() == []     # not Fréchet-close
    got = frechet_join(df, 5000.0).collect()
    assert len(got) == 1
    assert got[0].f_mm == round(_frechet(trips[1], trips[2]) * 1000)


def test_frechet_at_least_hausdorff(spark):
    from osm_spark.geo.trajsim import frechet_join

    trips = _cloud(seed=17)
    df = _fdf(spark, trips)
    d = 1500.0
    h = {(r.trip_a, r.trip_b): r.h_mm
         for r in hausdorff_join(df.drop("ord"), d).collect()}
    f = {(r.trip_a, r.trip_b): r.f_mm
         for r in frechet_join(df, d).collect()}
    assert set(f) <= set(h)          # Fréchet-close ⇒ Hausdorff-close
    for k, fv in f.items():
        assert fv >= h[k]            # H ≤ F pointwise


def test_frechet_salted_equals_unsalted(spark):
    from pyspark.sql import functions as F
    from osm_spark.geo.hexgrid import hex_cell_expr
    from osm_spark.geo.radius import plan_res
    from osm_spark.geo.trajsim import frechet_join

    trips = _cloud(seed=19)
    df = _fdf(spark, trips)
    d = 1100.0
    res = plan_res(d, 51.6)
    cells = df.select(
        F.col("trip_id").alias("trip_a"),
        hex_cell_expr("lat", "lon", res).alias("cell"),
    ).distinct()
    salts = key_salt_plan(cells, "cell", target=2)
    assert salts.count() > 0
    plain = sorted(tuple(r) for r in frechet_join(df, d).collect())
    salted = sorted(tuple(r) for r in frechet_join(df, d, salts=salts).collect())
    assert salted == plain


def test_frechet_bad_threshold_raises(spark):
    from osm_spark.geo.trajsim import frechet_join

    with pytest.raises(ValueError, match="d_max_m"):
        frechet_join(_fdf(spark, {1: [(51.5, -0.13)]}), -1.0)
