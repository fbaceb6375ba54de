"""dissolve_raster / burn_tiles vs a pure-python replay."""

from __future__ import annotations

import math

import pytest

from osm_spark.geo.dissolve import burn_tiles, dissolve_raster

Z = 10
MAXLAT = 85.05112878
N = float(1 << Z)


def _fx(lon: float) -> float:
    return (lon + 180.0) / 360.0 * N


def _fy(lat: float) -> float:
    lat = max(min(lat, MAXLAT), -MAXLAT)
    return (1.0 - math.asinh(math.tan(math.radians(lat))) / math.pi) / 2.0 * N


def _burn(vlat: list[float], vlon: list[float]) -> set[tuple[int, int]]:
    fx = [_fx(v) for v in vlon]
    fy = [_fy(v) for v in vlat]
    nv = len(fx)
    clamp = lambda t: min(max(t, 0), (1 << Z) - 1)
    x0, x1 = clamp(int(math.floor(min(fx)))), clamp(int(math.floor(max(fx))))
    y0, y1 = clamp(int(math.floor(min(fy)))), clamp(int(math.floor(max(fy))))
    out = set()
    for x in range(x0, x1 + 1):
        for y in range(y0, y1 + 1):
            cx, cy = x + 0.5, y + 0.5
            c = 0
            for i in range(nv):
                ax, ay = fx[i], fy[i]
                bx, by = fx[(i + 1) % nv], fy[(i + 1) % nv]
                aby = by - ay
                if (ay > cy) != (by > cy) and cx < (bx - ax) * (cy - ay) / (
                    aby if aby != 0 else 1.0
                ) + ax:
                    c += 1
            if c % 2 == 1:
                out.add((x, y))
    return out


def _dissolve(polys: list[tuple[str, list[float], list[float]]]):
    surf: dict[str, set[tuple[int, int]]] = {}
    for cls, vlat, vlon in polys:
        surf.setdefault(cls, set()).update(_burn(vlat, vlon))
    out = {}
    for cls, cells in surf.items():
        for x, y in cells:
            n_in = sum(
                (x + dx, y + dy) in cells
                for dx, dy in ((-1, 0), (1, 0), (0, -1), (0, 1))
            )
            out[(cls, x, y)] = n_in < 4
    return out


def _rect(lat0, lat1, lon0, lon1):
    return [lat0, lat0, lat1, lat1], [lon0, lon1, lon1, lon0]


@pytest.fixture(scope="module")
def polys():
    # two overlapping parks (union has an interior), one distant park,
    # one commercial strip 1 tile wide (all boundary)
    a = _rect(10.0, 11.4, 20.0, 21.4)
    b = _rect(10.7, 12.1, 20.7, 22.1)
    c = _rect(-5.0, -4.3, 50.0, 50.7)
    d = _rect(10.0, 10.1, 30.0, 32.0)
    e = _rect(10.3, 11.0, 20.3, 21.0)  # industrial inside park a: overlap
    return [
        ("park", *a), ("park", *b), ("park", *c),
        ("commercial", *d), ("industrial", *e),
    ]


@pytest.fixture(scope="module")
def pdf(spark, polys):
    return spark.createDataFrame(
        [(i, vlat, vlon, {"landuse": cls}) for i, (cls, vlat, vlon) in enumerate(polys)],
        "way_id long, vlat array<double>, vlon array<double>, tags map<string,string>",
    )


def test_burn_matches_replay(spark, pdf, polys):
    import pyspark.sql.functions as F

    got = {
        (r.way_id, r.x, r.y)
        for r in burn_tiles(pdf, Z, ["way_id"]).collect()
    }
    want = {
        (i, x, y)
        for i, (_, vlat, vlon) in enumerate(polys)
        for x, y in _burn(vlat, vlon)
    }
    assert got == want
    assert got  # non-degenerate


def test_dissolve_matches_replay(spark, pdf, polys):
    import pyspark.sql.functions as F

    out = dissolve_raster(pdf, Z, F.col("tags")["landuse"])
    got = {(r.cls, r.x, r.y): r.boundary for r in out.collect()}
    want = _dissolve(polys)
    assert got == want
    # union must have interior cells (non-boundary) and boundary cells
    assert any(v for v in got.values()) and any(not v for v in got.values())


def test_dissolve_merges_overlap_once(spark, pdf, polys):
    out = dissolve_raster(pdf, Z, "way_id")  # per-way: no merging
    per_way = out.count()
    merged = dissolve_raster(
        pdf, Z, __import__("pyspark.sql.functions", fromlist=["col"]).col("tags")["landuse"]
    ).count()
    assert merged < per_way  # the park overlap collapsed


def test_buffer_matches_replay(spark, pdf, polys):
    from osm_spark.geo.dissolve import buffer_raster

    import pyspark.sql.functions as F

    R = 2
    got = {
        (r.cls, r.x, r.y): r.in_core
        for r in buffer_raster(pdf, Z, R, F.col("tags")["landuse"]).collect()
    }
    # replay: dilate the replay surface with the integer disk
    surf = {}
    for cls, vlat, vlon in polys:
        surf.setdefault(cls, set()).update(_burn(vlat, vlon))
    want = {}
    nmax = (1 << Z) - 1
    for cls, cells in surf.items():
        dil = set()
        for x, y in cells:
            for dx in range(-R, R + 1):
                for dy in range(-R, R + 1):
                    if dx * dx + dy * dy <= R * R and 0 <= x + dx <= nmax and 0 <= y + dy <= nmax:
                        dil.add((x + dx, y + dy))
        for x, y in dil:
            want[(cls, x, y)] = (x, y) in cells
    assert got == want
    assert any(v for v in got.values()) and any(not v for v in got.values())


def test_buffer_validation(spark, pdf):
    from osm_spark.geo.dissolve import buffer_raster

    import pytest as _pytest

    with _pytest.raises(ValueError):
        buffer_raster(pdf, Z, 0)


def test_class_overlap_matches_replay(spark, pdf, polys):
    import pyspark.sql.functions as F

    from osm_spark.geo.dissolve import class_overlap

    got = {
        (r.cls_a, r.cls_b): (r.n_a, r.n_b, r.n_shared, r.jaccard_micro)
        for r in class_overlap(pdf, Z, F.col("tags")["landuse"]).collect()
    }
    surf = {}
    for cls, vlat, vlon in polys:
        surf.setdefault(cls, set()).update(_burn(vlat, vlon))
    want = {}
    names = sorted(surf)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            sh = len(surf[a] & surf[b])
            if sh:
                j = sh / (len(surf[a]) + len(surf[b]) - sh) * 1e6
                want[(a, b)] = (len(surf[a]), len(surf[b]),
                                sh, int(math.floor(j + 0.5)))
    assert got == want
    assert ("industrial", "park") in got  # a real overlap exists
