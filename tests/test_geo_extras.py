"""Tests for the round-3 geo additions: Douglas-Peucker simplification,
geohash encoding, and geometry measurement."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from osm_spark.geo.geohash import ALPHABET, _bit_layout, geohash_expr, geohash_sql
from osm_spark.geo.measure import way_geometry_stats
from osm_spark.geo.simplify import _dp_keep, assemble_lines, simplify_lines


# ---------------------------------------------------------------- simplify


def _dp_reference(pts: list[tuple[float, float]], eps: float) -> list[int]:
    """Plain recursive Douglas-Peucker oracle (independent of _dp_keep)."""

    def d2(p, a, b):
        ax, ay = a
        bx, by = b
        px, py = p
        len2 = (bx - ax) ** 2 + (by - ay) ** 2
        if len2 == 0:
            return (px - ax) ** 2 + (py - ay) ** 2
        cross = (px - ax) * (by - ay) - (py - ay) * (bx - ax)
        return cross * cross / len2

    keep = set()

    def rec(lo, hi):
        keep.add(lo)
        keep.add(hi)
        if hi - lo < 2:
            return
        best_j, best_d = None, -1.0
        for j in range(lo + 1, hi):
            d = d2(pts[j], pts[lo], pts[hi])
            if d > best_d:
                best_j, best_d = j, d
        if best_d > eps * eps:
            rec(lo, best_j)
            rec(best_j, hi)

    rec(0, len(pts) - 1)
    return sorted(keep)


def test_dp_keep_matches_reference_on_random_lines():
    rng = np.random.RandomState(7)
    for trial in range(25):
        n = rng.randint(2, 60)
        xs = np.cumsum(rng.uniform(0, 1, n))
        ys = rng.uniform(-1, 1, n)
        eps = float(rng.uniform(0.01, 1.0))
        got = _dp_keep(xs, ys, eps * eps).tolist()
        want = _dp_reference(list(zip(xs.tolist(), ys.tolist())), eps)
        assert got == want, f"trial {trial}"


def test_dp_keep_edge_cases():
    # collinear: only endpoints survive any positive epsilon
    xs = np.arange(10.0)
    ys = np.zeros(10)
    assert _dp_keep(xs, ys, 1e-12).tolist() == [0, 9]
    # two points: both kept
    assert _dp_keep(np.array([0.0, 1.0]), np.array([0.0, 0.0]), 0.0).tolist() == [0, 1]
    # duplicate endpoints (zero-length chord): falls back to point distance
    xs = np.array([0.0, 3.0, 0.0])
    ys = np.array([0.0, 0.0, 0.0])
    assert _dp_keep(xs, ys, 1.0).tolist() == [0, 1, 2]


def test_simplify_lines_spark_matches_local(spark):
    rng = np.random.RandomState(11)
    rows = []
    for lid in range(6):
        n = rng.randint(2, 40)
        xs = np.cumsum(rng.uniform(0, 1, n)).tolist()
        ys = rng.uniform(-1, 1, n).tolist()
        rows.append((lid, xs, ys))
    df = spark.createDataFrame(
        rows, "line_id long, xs array<double>, ys array<double>"
    )
    out = simplify_lines(df, epsilon=0.3).toPandas()
    for lid, xs, ys in rows:
        want = _dp_keep(np.array(xs), np.array(ys), 0.09).tolist()
        got = sorted(out[out.line_id == lid].pos.tolist())
        assert got == want
        # coordinates pass through untouched
        sub = out[out.line_id == lid].sort_values("pos")
        assert sub.x.tolist() == [xs[i] for i in got]


def test_assemble_lines_orders_vertices(spark):
    verts = spark.createDataFrame(
        [(1, 2, 20.0, 0.2), (1, 0, 0.0, 0.0), (1, 1, 10.0, 0.1)],
        "line_id long, pos int, x double, y double",
    )
    row = assemble_lines(verts).collect()[0]
    assert row.xs == [0.0, 10.0, 20.0]
    assert row.ys == [0.0, 0.1, 0.2]


def test_simplify_rejects_negative_epsilon(spark):
    df = spark.createDataFrame([(1, [0.0], [0.0])], "line_id long, xs array<double>, ys array<double>")
    with pytest.raises(ValueError):
        simplify_lines(df, epsilon=-1.0)


# ---------------------------------------------------------------- geohash


def _py_geohash(lat: float, lon: float, p: int) -> str:
    lonbits, latbits, chars = _bit_layout(p)
    ilon = min(int(math.floor((lon + 180.0) / 360.0 * float(1 << lonbits))), (1 << lonbits) - 1)
    ilat = min(int(math.floor((lat + 90.0) / 180.0 * float(1 << latbits))), (1 << latbits) - 1)
    out = []
    for spec in chars:
        idx = 0
        for k, (axis, shift) in enumerate(spec):
            src = ilon if axis == "lon" else ilat
            idx += ((src >> shift) & 1) << (4 - k)
        out.append(ALPHABET[idx])
    return "".join(out)


PUBLIC_VECTORS = [
    # (lat, lon, precision, geohash) — geohash.org / Wikipedia examples
    (57.64911, 10.40744, 11, "u4pruydqqvj"),
    (42.605, -5.603, 5, "ezs42"),
    (51.5074, -0.1278, 7, _py_geohash(51.5074, -0.1278, 7)),
]


def test_geohash_expr_public_vectors(spark):
    df = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo, _p, _g) in enumerate(PUBLIC_VECTORS)],
        "i long, lat double, lon double",
    )
    for i, (la, lo, p, want) in enumerate(PUBLIC_VECTORS):
        got = (
            df.filter(F.col("i") == i)
            .select(geohash_expr("lat", "lon", p).alias("g"))
            .collect()[0]
            .g
        )
        assert got == want, (la, lo, p)


def test_geohash_prefix_property(spark):
    df = spark.createDataFrame([(51.5, -0.1), (-33.9, 151.2)], "lat double, lon double")
    out = df.select(
        geohash_expr("lat", "lon", 8).alias("g8"),
        geohash_expr("lat", "lon", 5).alias("g5"),
    ).collect()
    for r in out:
        assert r.g8.startswith(r.g5)


def test_geohash_sql_twin_matches_expr(spark):
    import duckdb

    rng = np.random.RandomState(3)
    pts = [(float(la), float(lo)) for la, lo in zip(
        rng.uniform(-89, 89, 40), rng.uniform(-179, 179, 40))]
    df = spark.createDataFrame(pts, "lat double, lon double")
    spark_gh = sorted(
        r.g for r in df.select(geohash_expr("lat", "lon", 7).alias("g")).collect()
    )
    sql = f"SELECT {geohash_sql('lat', 'lon', 7)} AS g FROM pts ORDER BY g"
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(lat DOUBLE, lon DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    duck_gh = [r[0] for r in con.execute(sql).fetchall()]
    assert spark_gh == duck_gh


def test_geohash_precision_bounds():
    with pytest.raises(ValueError):
        geohash_expr("lat", "lon", 0)
    with pytest.raises(ValueError):
        geohash_expr("lat", "lon", 13)


# ---------------------------------------------------------------- measure


def test_way_geometry_stats_square(spark):
    # 0.01° square at the equator: ~1113.2 m × 1105.74 m
    vlat = [0.0, 0.0, 0.01, 0.01]
    vlon = [0.0, 0.01, 0.01, 0.0]
    df = spark.createDataFrame(
        [(1, vlat, vlon)], "way_id long, vlat array<double>, vlon array<double>"
    )
    r = way_geometry_stats(df).collect()[0]
    assert r.n_vertices == 4
    assert abs(r.mean_lat - 0.005) < 1e-12
    # perimeter: two lat edges ~1105.74*0.01... actually edges are 0.01° each
    expect_x = 111320.0 * 0.01 * math.cos(math.radians(0.005))
    expect_y = 110574.0 * 0.01
    assert abs(r.area_m2 - expect_x * expect_y) / (expect_x * expect_y) < 1e-3
    # haversine perimeter ≈ 2*(0.01° lat arc) + 2*(0.01° lon arc)
    lat_arc = 2 * math.pi * 6371000.0 * 0.01 / 360.0
    assert abs(r.perimeter_m - 2 * lat_arc - 2 * lat_arc * math.cos(math.radians(0.005))) < 5.0


def test_way_geometry_winding_independent(spark):
    vlat = [0.0, 0.0, 0.01, 0.01]
    vlon = [0.0, 0.01, 0.01, 0.0]
    df = spark.createDataFrame(
        [(1, vlat, vlon), (2, vlat[::-1], vlon[::-1])],
        "way_id long, vlat array<double>, vlon array<double>",
    )
    rows = {r.way_id: r for r in way_geometry_stats(df).collect()}
    assert abs(rows[1].area_m2 - rows[2].area_m2) < 1e-6
    assert abs(rows[1].perimeter_m - rows[2].perimeter_m) < 1e-6


def test_tile_refresh_equals_recompute(spark):
    # IVM correctness: base ⊕ delta == recompute over the changed point
    # set, zero-count tiles dropped, brand-new tiles appear.
    import pyspark.sql.functions as F

    from osm_spark.geo.tiles import tile_delta, tile_refresh, tile_xy

    pts = spark.range(1, 400).select(
        ((F.col("id") * 37 % 1200) / 10.0 - 60.0).alias("lat"),
        ((F.col("id") * 91 % 3600) / 10.0 - 180.0).alias("lon"),
        F.col("id"),
    )
    t = tile_xy("lat", "lon", 6)
    grp = lambda d: (  # noqa: E731
        d.select(t.alias("t")).groupBy("t.z", "t.x", "t.y").agg(F.count("*").alias("n"))
    )
    base = grp(pts)
    dels = pts.filter(F.col("id") % 3 == 0).select("lat", "lon", F.lit(-1).alias("op"))
    ins = spark.range(2000, 2100).select(
        ((F.col("id") * 53 % 1200) / 10.0 - 60.0).alias("lat"),
        ((F.col("id") * 17 % 3600) / 10.0 - 180.0).alias("lon"),
        F.lit(1).alias("op"),
    )
    got = tile_refresh(base, tile_delta(dels.unionByName(ins), 6))
    expect = grp(
        pts.filter(F.col("id") % 3 != 0)
        .select("lat", "lon")
        .unionByName(ins.select("lat", "lon"))
    )
    g = {(r.z, r.x, r.y): r.n for r in got.collect()}
    e = {(r.z, r.x, r.y): r.n for r in expect.collect()}
    assert g == e
    assert all(n > 0 for n in g.values())


def test_spherical_area_matches_python_replay_and_planar(spark):
    import math

    from osm_spark.geo.measure import spherical_area_m2

    R = 6371000.0

    def cd(vlat, vlon):
        n = len(vlat)
        tot = 0.0
        for i in range(n):
            j = (i + 1) % n
            tot += (math.radians(vlon[j]) - math.radians(vlon[i])) * (
                2 + math.sin(math.radians(vlat[i])) + math.sin(math.radians(vlat[j]))
            )
        return abs(tot) * R * R / 2

    sq_eq = ([0.0, 0.0, 0.01, 0.01], [0.0, 0.01, 0.01, 0.0])
    sq_60 = ([60.0, 60.0, 60.01, 60.01], [0.0, 0.01, 0.01, 0.0])
    rev = (list(reversed(sq_60[0])), list(reversed(sq_60[1])))
    df = spark.createDataFrame(
        [(1, *sq_eq), (2, *sq_60), (3, *rev)],
        "way_id long, vlat array<double>, vlon array<double>",
    )
    from pyspark.sql import functions as F

    got = {
        r["way_id"]: r["a"]
        for r in df.select(
            "way_id", spherical_area_m2("vlat", "vlon").alias("a")
        ).collect()
    }
    assert abs(got[1] - cd(*sq_eq)) < 1e-3
    # planar small-square expectation at the equator
    side = math.radians(0.01) * R
    assert abs(got[1] / (side * side) - 1) < 1e-6
    # latitude term integrates per edge: half the equator area at lat 60
    assert abs(got[2] / (side * side * math.cos(math.radians(60.005))) - 1) < 1e-6
    # orientation invariance
    assert got[3] == got[2]


def test_spherical_area_degenerate_ring_is_zero(spark):
    from pyspark.sql import functions as F

    from osm_spark.geo.measure import spherical_area_m2

    df = spark.createDataFrame(
        [(1, [0.0, 1.0], [0.0, 1.0])],
        "way_id long, vlat array<double>, vlon array<double>",
    )
    got = df.select(spherical_area_m2("vlat", "vlon").alias("a")).collect()[0]
    assert got["a"] == 0.0


def test_destination_point_roundtrip_against_haversine(spark):
    import math

    from pyspark.sql import functions as F

    from osm_spark.geo.measure import destination_point

    df = spark.createDataFrame(
        [(1, 48.85, 2.35, 45.0, 1000.0), (2, -33.86, 151.21, 200.0, 5000.0),
         (3, 60.0, 5.0, 0.0, 2000.0), (4, 0.0, 0.0, 90.0, 10000.0)],
        "id long, lat double, lon double, bearing double, dist double",
    )
    d = destination_point(F.col("lat"), F.col("lon"), F.col("bearing"), F.col("dist"))
    rows = df.select("id", "lat", "lon", "dist", d["lat"].alias("lat2"), d["lon"].alias("lon2")).collect()
    R = 6371000.0
    for r in rows:
        # haversine back must equal the requested distance (same sphere)
        dphi = math.radians(r.lat2 - r.lat)
        dlam = math.radians(r.lon2 - r.lon)
        a = math.sin(dphi / 2) ** 2 + math.cos(math.radians(r.lat)) * math.cos(
            math.radians(r.lat2)
        ) * math.sin(dlam / 2) ** 2
        back = 2 * R * math.asin(math.sqrt(a))
        assert abs(back - r.dist) < 1e-6 * r.dist + 1e-6
    # due north from lat 60 by 2 km: lon unchanged
    r3 = [r for r in rows if r.id == 3][0]
    assert abs(r3.lon2 - 5.0) < 1e-12
