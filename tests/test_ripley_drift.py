"""Ripley's K (geo/ripley.py) and corpus KL drift (text/drift.py)."""

from __future__ import annotations

import hashlib
import math

import pytest

from osm_spark.geo.knn import haversine_m_py
from osm_spark.geo.ripley import ripley_k
from osm_spark.text.drift import corpus_drift

# ~40 points: two tight clusters + scatter around Berlin
_PTS = []
for i in range(40):
    if i < 12:
        lat, lon = 52.5200 + i * 1e-4, 13.4050 + i * 1e-4  # ~13 m steps
    elif i < 24:
        lat, lon = 52.5400 + (i - 12) * 2e-4, 13.3800
    else:
        lat, lon = 52.48 + (i % 7) * 0.01, 13.35 + (i % 5) * 0.012
    _PTS.append((str(i), lat, lon))

RADII = [100.0, 500.0, 3000.0]
AREA = 5.0e8


def _expected_k():
    counts = [0] * len(RADII)
    n = len(_PTS)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d = haversine_m_py(_PTS[i][1], _PTS[i][2], _PTS[j][1], _PTS[j][2])
            for k, r in enumerate(RADII):
                if d <= r:
                    counts[k] += 1
    out = []
    for k, r in enumerate(RADII):
        kh = AREA * counts[k] / (n * (n - 1))
        out.append((r, counts[k], round(kh, 6), round(math.sqrt(kh / math.pi), 6)))
    return out


@pytest.fixture(scope="module")
def pts(spark):
    return spark.createDataFrame(_PTS, "pid string, lat double, lon double")


def test_ripley_matches_brute_force(spark, pts):
    got = sorted(
        (r.r_m, r.n_pairs, r.k_hat, r.l_hat)
        for r in ripley_k(pts, RADII, AREA, id_col="pid").collect()
    )
    assert got == sorted(_expected_k())


def test_ripley_strategy_equivalence(spark, pts):
    a = sorted(map(tuple, ripley_k(pts, RADII, AREA, id_col="pid", strategy="broadcast").collect()))
    b = sorted(map(tuple, ripley_k(pts, RADII, AREA, id_col="pid", strategy="shuffle").collect()))
    assert a == b


def test_ripley_clustering_signal(spark, pts):
    """The clustered fixture must sit far above the Poisson curve at
    the cluster scale: K̂(100 m) >> π·100²."""
    rows = {r.r_m: r.k_hat for r in ripley_k(pts, RADII, AREA, id_col="pid").collect()}
    assert rows[100.0] > math.pi * 100.0**2 * 10


_BPTS = [(100 + i, 52.50 + i * 0.005, 13.40) for i in range(10)]


def test_cross_k_matches_brute_force(spark, pts):
    from osm_spark.geo.ripley import cross_k

    b = spark.createDataFrame(_BPTS, "id long, lat double, lon double")
    got = sorted(
        (r.r_m, r.n_pairs, r.k_hat, r.l_hat)
        for r in cross_k(pts, b, RADII, AREA, a_id_col="pid").collect()
    )
    counts = [0] * len(RADII)
    for _, alat, alon in _PTS:
        for _, blat, blon in _BPTS:
            d = haversine_m_py(alat, alon, blat, blon)
            for k, r in enumerate(RADII):
                if d <= r:
                    counts[k] += 1
    norm = len(_PTS) * len(_BPTS)
    exp = sorted(
        (
            r,
            counts[k],
            round(AREA * counts[k] / norm, 6),
            round(math.sqrt(AREA * counts[k] / norm / math.pi), 6),
        )
        for k, r in enumerate(RADII)
    )
    assert got == exp


def test_ripley_validation(spark, pts):
    with pytest.raises(ValueError):
        ripley_k(pts, [], AREA, id_col="pid")
    with pytest.raises(ValueError):
        ripley_k(pts, [-5.0], AREA, id_col="pid")
    with pytest.raises(ValueError):
        ripley_k(pts, RADII, 0.0, id_col="pid")


B = 64


def _bucket(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:13], 16) % B


def _grams(text: str) -> list[str]:
    t = [x for x in text.lower().split(" ") if x]
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


REF = [(1, "the cat sat on the mat"), (2, "the dog ran home")]
CUR = [(11, "stock market prices fell"), (12, "the cat sat on the mat")]


def _expected_drift():
    rc: dict[int, int] = {}
    cc: dict[int, int] = {}
    for _, t in REF:
        for g in _grams(t):
            rc[_bucket(g)] = rc.get(_bucket(g), 0) + 1
    for _, t in CUR:
        for g in _grams(t):
            cc[_bucket(g)] = cc.get(_bucket(g), 0) + 1
    r_tot, c_tot = sum(rc.values()), sum(cc.values())
    kl_cur = kl_ref = 0
    for bkt in range(B):
        r, c = rc.get(bkt, 0), cc.get(bkt, 0)
        lpr = round(math.log((r + 1) / (r_tot + B)) * 1e6)
        lpc = round(math.log((c + 1) / (c_tot + B)) * 1e6)
        kl_cur += (c + 1) * (lpc - lpr)
        kl_ref += (r + 1) * (lpr - lpc)
    return {
        "cur_vs_ref": (c_tot, kl_cur, round(kl_cur / (c_tot + B) / 1e6, 6)),
        "ref_vs_cur": (r_tot, kl_ref, round(kl_ref / (r_tot + B) / 1e6, 6)),
    }


def test_drift_exact_vs_python_replay(spark):
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    cur = spark.createDataFrame(CUR, "doc_id long, text string")
    got = {
        r.direction: (r.n_grams, r.kl_sum_micro, r.kl_nats)
        for r in corpus_drift(ref, cur, num_buckets=B).collect()
    }
    assert got == _expected_drift()
    assert got["cur_vs_ref"][1] > 0  # genuinely drifted slices


def test_drift_identical_slices_is_zero(spark):
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    got = {
        r.direction: r.kl_sum_micro
        for r in corpus_drift(ref, ref, num_buckets=B).collect()
    }
    assert got == {"cur_vs_ref": 0, "ref_vs_cur": 0}


def test_drift_validates_buckets(spark):
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    with pytest.raises(ValueError):
        corpus_drift(ref, ref, num_buckets=0)
