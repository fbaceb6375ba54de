"""join_counts vs a python replay on the dissolve fixture."""

from __future__ import annotations

import math

import pytest

from osm_spark.geo.joincount import join_counts
from tests.test_dissolve import _burn, Z  # shared replay + zoom


@pytest.fixture(scope="module")
def polys():
    from tests.test_dissolve import polys as _p  # reuse geometry builder

    a = [10.0, 10.0, 11.4, 11.4], [20.0, 21.4, 21.4, 20.0]
    b = [10.3, 10.3, 11.0, 11.0], [20.3, 21.0, 21.0, 20.3]
    c = [10.0, 10.0, 10.8, 10.8], [30.0, 32.0, 32.0, 30.0]
    return [("park", a[0], a[1]), ("industrial", b[0], b[1]), ("commercial", c[0], c[1])]


def _replay(polys):
    surf: dict[str, set] = {}
    for cls, vlat, vlon in polys:
        surf.setdefault(cls, set()).update(_burn(vlat, vlon))
    univ = set().union(*surf.values())
    pairs = [
        ((x, y), n)
        for (x, y) in univ
        for n in [(x + 1, y), (x, y + 1)]
        if n in univ
    ]
    deg: dict[tuple, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    jj = len(pairs)
    kk = sum(d * (d - 1) // 2 for d in deg.values())
    n = len(univ)
    out = {}
    for cls, cells in surf.items():
        if not cells:
            continue  # burn-free classes emit no row (engine semantics)
        bb = sum(1 for a, b in pairs if a in cells and b in cells)
        bw = sum(1 for a, b in pairs if (a in cells) != (b in cells))
        ww = jj - bb - bw
        p = len(cells) / n
        var = jj * p * p + 2 * kk * p**3 - (jj + 2 * kk) * p**4
        if var > 0:
            zv = (bb - jj * p * p) / math.sqrt(var) * 1000.0
            zq = int(math.floor(zv + 0.5)) if zv >= 0 else -int(math.floor(-zv + 0.5))
        else:
            zq = None
        out[cls] = (len(cells), n, bb, bw, ww, zq)
    return out


def test_join_counts_matches_replay(spark, polys):
    import pyspark.sql.functions as F

    pdf = spark.createDataFrame(
        [(i, vlat, vlon, {"landuse": cls}) for i, (cls, vlat, vlon) in enumerate(polys)],
        "way_id long, vlat array<double>, vlon array<double>, tags map<string,string>",
    )
    got = {r.cls: (r.n_b, r.n_total, r.bb, r.bw, r.ww, r.z_bb_milli)
           for r in join_counts(pdf, Z, F.col("tags")["landuse"]).collect()}
    want = _replay(polys)
    assert got == want
    # contiguous blocks cluster: every class's BB z is strongly positive
    assert all(v[5] is not None and v[5] > 0 for v in got.values())
    # counts partition the pair set
    for v in got.values():
        assert v[2] + v[3] + v[4] == list(got.values())[0][2] + list(got.values())[0][3] + list(got.values())[0][4]
