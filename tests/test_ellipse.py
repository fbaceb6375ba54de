"""Standard deviational ellipse (osm_spark/geo/ellipse.py)."""

from __future__ import annotations

import math

import pandas as pd

from osm_spark.geo.ellipse import std_ellipse


def _pts(spark, coords, extra=None):
    rows = [
        {"lat": la, "lon": lo, **({} if extra is None else {"g": extra[i]})}
        for i, (la, lo) in enumerate(coords)
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def _replay(coords):
    xs = [round(lo * 1e7) for _, lo in coords]
    ys = [round(la * 1e7) for la, _ in coords]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    cxx = n * sum(x * x for x in xs) - sx * sx
    cyy = n * sum(y * y for y in ys) - sy * sy
    cxy = n * sum(x * y for x, y in zip(xs, ys)) - sx * sy
    num, den = 2 * cxy, cxx - cyy
    hyp = math.sqrt(float(num) ** 2 + float(den) ** 2)
    disc = math.sqrt(float(cxx - cyy) ** 2 + 4.0 * float(cxy) ** 2)
    lam1 = (float(cxx + cyy) + disc) / 2.0
    lam2 = (float(cxx + cyy) - disc) / 2.0
    ax = lambda lam: math.floor(math.sqrt(max(lam, 0.0) / n**3) / 10.0)
    return {
        "n": n,
        "mean_lat_e7": sy // n if sy >= 0 else -((-sy) // n),
        "mean_lon_e7": sx // n if sx >= 0 else -((-sx) // n),
        "sin2t_micro": math.floor(1e6 * (num / hyp)) if hyp > 0 else None,
        "cos2t_micro": math.floor(1e6 * (den / hyp)) if hyp > 0 else None,
        "major_micro": ax(lam1),
        "minor_micro": ax(lam2),
    }


def test_elongated_cloud_matches_replay(spark):
    # a NE-SW elongated cloud around (10, 20)
    coords = [
        (10.0 + 0.001 * i + 0.0003 * ((i * 7) % 5), 20.0 + 0.002 * i)
        for i in range(25)
    ]
    got = std_ellipse(_pts(spark, coords)).collect()[0].asDict()
    want = _replay(coords)
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v)
    assert got["major_micro"] > got["minor_micro"]
    # NE-SW orientation: positive covariance -> sin 2θ > 0
    assert got["sin2t_micro"] > 0


def test_isotropic_square_orientation_defined_axes_equalish(spark):
    coords = [
        (50.0 + 0.01 * i, -70.0 + 0.01 * j) for i in range(5) for j in range(5)
    ]
    got = std_ellipse(_pts(spark, coords)).collect()[0]
    # perfect grid: cxy = 0 and cxx == cyy only if degree spacing maps
    # equally -> here both are equal in e7 units, hyp == 0 -> NULL
    assert got.sin2t_micro is None and got.cos2t_micro is None
    assert got.major_micro == got.minor_micro


def test_small_groups_null_axes(spark):
    coords = [(1.0, 2.0), (1.1, 2.1)]
    got = std_ellipse(_pts(spark, coords)).collect()[0]
    assert got.n == 2 and got.major_micro is None


def test_grouped(spark):
    coords = [(10.0 + 0.001 * i, 20.0) for i in range(6)] + [
        (0.0, 30.0 + 0.001 * i) for i in range(6)
    ]
    g = ["a"] * 6 + ["b"] * 6
    rows = std_ellipse(_pts(spark, coords, g), group_cols=["g"]).collect()
    got = {r.g: r for r in rows}
    # group a varies in lat only -> cos2t negative (cxx < cyy);
    # group b varies in lon only -> cos2t positive
    assert got["a"].cos2t_micro < 0 < got["b"].cos2t_micro
    assert got["a"].n == got["b"].n == 6