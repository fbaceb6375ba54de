"""Nearest-segment snap (osm_spark/geo/snap.py): brute-force parity,
path equivalence, and edge cases."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_spark.geo.knn import DEG_M
from osm_spark.geo.snap import plan_snap, snap_join, way_segments


def _brute_snap(ppdf: pd.DataFrame, wpdf: pd.DataFrame, radius_m: float,
                closed: bool) -> pd.DataFrame:
    segs = []
    for r in wpdf.itertuples():
        v = len(r.vlat)
        last = v if closed else v - 1
        for i in range(last):
            j = (i + 1) % v
            segs.append(
                (r.way_id, i, float(r.vlat[i]), float(r.vlon[i]),
                 float(r.vlat[j]), float(r.vlon[j]))
            )
    rows = []
    for p in ppdf.itertuples():
        best = None
        ck = np.cos(np.radians(p.lat))
        for way_id, seg_idx, ay, ax, by, bx in segs:
            abx, aby = (bx - ax) * ck, by - ay
            apx, apy = (p.lon - ax) * ck, p.lat - ay
            d = abx * abx + aby * aby
            t0 = (apx * abx + apy * aby) / d if d > 0 else 0.0
            t = min(max(t0, 0.0), 1.0)
            dx, dy = apx - t * abx, apy - t * aby
            dist = float(np.sqrt(dx * dx + dy * dy) * DEG_M)
            if dist <= radius_m:
                key = (dist, way_id, seg_idx)
                if best is None or key < best:
                    best = key
        if best is not None:
            rows.append((p.url, best[1], best[2], best[0]))
    return pd.DataFrame(rows, columns=["url", "way_id", "seg_idx", "dist_m"])


@pytest.fixture(scope="module")
def fixture(spark):
    rng = np.random.default_rng(11)
    n = 120
    ppdf = pd.DataFrame(
        {
            "url": [f"p{i}" for i in range(n)],
            "lat": 51.5 + rng.normal(0, 0.01, n),
            "lon": -0.12 + rng.normal(0, 0.016, n),
        }
    )
    ways = []
    for w in range(6):
        nv = int(rng.integers(3, 7))
        ways.append(
            (
                100 + w,
                list(51.5 + rng.normal(0, 0.008, nv)),
                list(-0.12 + rng.normal(0, 0.013, nv)),
            )
        )
    # a way with a zero-length segment (repeated vertex)
    ways.append((200, [51.505, 51.505, 51.507], [-0.118, -0.118, -0.115]))
    wpdf = pd.DataFrame(ways, columns=["way_id", "vlat", "vlon"])
    pts = spark.createDataFrame(ppdf)
    wys = spark.createDataFrame(wpdf, "way_id long, vlat array<double>, vlon array<double>")
    return ppdf, wpdf, pts, wys


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df.sort_values("url").reset_index(drop=True)
    out["dist_mm"] = (out["dist_m"] * 1000.0).round().astype("int64")
    return out.drop(columns=["dist_m"])


def test_snap_matches_brute_force_open(spark, fixture):
    ppdf, wpdf, pts, wys = fixture
    got = _canon(snap_join(pts, wys, 800.0, closed=False).toPandas())
    exp = _canon(_brute_snap(ppdf, wpdf, 800.0, closed=False))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_snap_matches_brute_force_closed(spark, fixture):
    ppdf, wpdf, pts, wys = fixture
    got = _canon(snap_join(pts, wys, 800.0, closed=True).toPandas())
    exp = _canon(_brute_snap(ppdf, wpdf, 800.0, closed=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_snap_paths_identical(spark, fixture):
    _, _, pts, wys = fixture
    a = _canon(snap_join(pts, wys, 800.0, closed=True, strategy="broadcast").toPandas())
    b = _canon(snap_join(pts, wys, 800.0, closed=True, strategy="shuffle").toPandas())
    pd.testing.assert_frame_equal(a, b)


def test_way_segments_closed_wraps(spark, fixture):
    _, _, _, wys = fixture
    open_n = way_segments(wys, closed=False).count()
    closed_n = way_segments(wys, closed=True).count()
    n_ways = wys.count()
    assert closed_n == open_n + n_ways


def test_plan_snap_ring_bounded(spark):
    for radius in (50.0, 500.0, 5000.0, 50000.0):
        res, ring = plan_snap(radius, 60.0)
        assert 1 <= res <= 12
        assert ring >= 2


def test_snap_long_way_budget(spark):
    """A motorway-length segment spans many cell edges: the chunked
    covering (small budget ⇒ many chunk rows per segment) must produce
    exactly the flat covering's answer, and the budget knob must reject
    degenerate values."""
    rng = np.random.default_rng(23)
    n = 60
    # points scattered along ~100 km of a long straight way
    ppdf = pd.DataFrame(
        {
            "url": [f"p{i}" for i in range(n)],
            "lat": 52.0 + rng.uniform(0, 0.9, n),
            "lon": 9.0 + rng.uniform(-0.02, 0.02, n),
        }
    )
    # one 2-vertex way ~100 km long + one short way nearby
    wpdf = pd.DataFrame(
        [
            (300, [52.0, 52.9], [9.0, 9.01]),
            (301, [52.4, 52.41, 52.42], [9.015, 9.016, 9.015]),
        ],
        columns=["way_id", "vlat", "vlon"],
    )
    pts = spark.createDataFrame(ppdf)
    wys = spark.createDataFrame(
        wpdf, "way_id long, vlat array<double>, vlon array<double>"
    )
    flat = _canon(
        snap_join(pts, wys, 900.0, sample_budget=1_000_000).toPandas()
    )
    chunked = _canon(snap_join(pts, wys, 900.0, sample_budget=8).toPandas())
    pd.testing.assert_frame_equal(chunked, flat)
    exp = _canon(_brute_snap(ppdf, wpdf, 900.0, closed=False))
    pd.testing.assert_frame_equal(chunked, exp, check_dtype=False)
    with pytest.raises(ValueError):
        snap_join(pts, wys, 900.0, sample_budget=1)


def test_snap_validation(spark, fixture):
    _, _, pts, wys = fixture
    with pytest.raises(ValueError):
        snap_join(pts, wys, 0.0)
    with pytest.raises(ValueError):
        snap_join(pts, wys.where(F.lit(False)), 100.0)
    with pytest.raises(ValueError):
        snap_join(pts, wys, 100.0, strategy="bogus", max_abs_lat=52.0)
