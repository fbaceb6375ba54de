"""HMM map matching (geo/mapmatch.py): trajectory context beats
per-point snap, equality with an independent brute-force Viterbi,
degenerate cases, and partitioning invariance."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from osm_spark.geo.knn import DEG_M
from osm_spark.geo.mapmatch import hmm_map_match, match_candidates

# two parallel horizontal roads ~133 m apart (open 2-vertex ways)
ROADS = [
    (1, [10.000, 10.000], [20.0, 20.1]),
    (2, [10.0012, 10.0012], [20.0, 20.1]),
]
# trip 1 starts BETWEEN the roads, slightly nearer road 2, then runs
# clearly along road 1; trip 2 runs along road 2
PINGS = [
    (1, 0, 10.00062, 20.01),
    (1, 1, 10.00005, 20.02),
    (1, 2, 10.00003, 20.03),
    (2, 0, 10.00121, 20.05),
    (2, 1, 10.00118, 20.06),
]
KW = dict(radius_m=500.0, sigma_mm=50_000, beta_mm=20_000, k=3)


def _roads(spark, rows=ROADS):
    return spark.createDataFrame(
        rows, "way_id long, vlat array<double>, vlon array<double>"
    )


def _pings(spark, rows=PINGS):
    return spark.createDataFrame(
        rows, "trip_id long, seq int, lat double, lon double"
    )


def _matches(spark, pings=PINGS, **kw):
    args = dict(KW)
    args.update(kw)
    return {
        (r.trip_id, r.seq): (r.way_id, r.seg_idx, r.dist_mm)
        for r in hmm_map_match(
            _pings(spark, pings), _roads(spark), **args
        ).collect()
    }


def _brute_viterbi(pings, roads, radius_m, sigma_mm, beta_mm, k):
    """Independent replay: brute-force candidates + tuple-min DP."""

    def seg_cands(lat, lon):
        out = []
        for way_id, vlat, vlon in roads:
            for i in range(len(vlat) - 1):
                ay, ax, by, bx = vlat[i], vlon[i], vlat[i + 1], vlon[i + 1]
                ck = math.cos(math.radians(lat))
                abx, aby = (bx - ax) * ck, by - ay
                apx, apy = (lon - ax) * ck, lat - ay
                d = abx * abx + aby * aby
                t0 = (apx * abx + apy * aby) / d if d > 0 else 0.0
                t = min(max(t0, 0.0), 1.0)
                dx, dy = apx - t * abx, apy - t * aby
                dist = math.sqrt(dx * dx + dy * dy) * DEG_M
                if dist <= radius_m:
                    out.append(
                        (
                            int(round(dist * 1000.0)),
                            way_id,
                            i,
                            ay + t * (by - ay),
                            ax + t * (bx - ax),
                        )
                    )
        return sorted(out)[:k]

    def dmm(alat, alon, blat, blon, anchor):
        ck = math.cos(math.radians(anchor))
        dx = (blon - alon) * ck
        dy = blat - alat
        return int(
            math.floor(math.sqrt(dx * dx + dy * dy) * DEG_M * 1000.0 + 0.5)
        )

    sig2 = 2.0 * (sigma_mm / 1000.0) ** 2
    by_trip: dict = {}
    for trip, seq, lat, lon in pings:
        cs = seg_cands(lat, lon)
        if cs:
            by_trip.setdefault(trip, []).append((seq, lat, lon, cs))
    result = {}
    for trip, steps in by_trip.items():
        steps.sort()
        ec = lambda d: int(math.floor((d / 1000.0) * (d / 1000.0) / sig2 * 1e6 + 0.5))
        scores = [ec(c[0]) for c in steps[0][3]]
        back = [[-1] * len(steps[0][3])]
        for s in range(1, len(steps)):
            _, plat, plon, pc = steps[s - 1]
            _, clat, clon, cc = steps[s]
            pmm = dmm(plat, plon, clat, clon, plat)
            ns, nb = [], []
            for d, w, g, sy, sx in cc:
                best, bp = None, -1
                for pi, (pd, pw, pg, py, px) in enumerate(pc):
                    smm = dmm(py, px, sy, sx, plat)
                    t = int(math.floor(abs(smm - pmm) / float(beta_mm) * 1e6 + 0.5))
                    cand = (scores[pi] + t, pw, pg)
                    if best is None or cand < best:
                        best, bp = cand, pi
                ns.append(best[0] + ec(d))
                nb.append(bp)
            scores, back = ns, back + [nb]
        last = steps[-1][3]
        fi = min(
            range(len(last)), key=lambda i: (scores[i], last[i][1], last[i][2])
        )
        idx = fi
        for s in range(len(steps) - 1, -1, -1):
            seq, _, _, cc = steps[s]
            d, w, g, _, _ = cc[idx]
            result[(trip, seq)] = (w, g, d)
            idx = back[s][idx]
    return result


def test_context_overrides_nearest(spark):
    """Ping (1,0) is isolated-nearest to road 2 but the trajectory pulls
    it onto road 1 — the defining map-matching behavior."""
    iso = {
        (r.trip_id, r.seq): r.way_id
        for r in match_candidates(
            _pings(spark), _roads(spark), KW["radius_m"], k=1
        ).collect()
    }
    assert iso[(1, 0)] == 2  # nearest segment alone says road 2
    got = _matches(spark)
    assert got[(1, 0)][0] == 1  # the HMM says road 1
    assert all(got[(1, s)][0] == 1 for s in (0, 1, 2))
    assert all(got[(2, s)][0] == 2 for s in (0, 1))


def test_matches_brute_force_viterbi(spark):
    got = _matches(spark)
    want = _brute_viterbi(
        PINGS, ROADS, KW["radius_m"], KW["sigma_mm"], KW["beta_mm"], KW["k"]
    )
    assert got == want


def test_single_ping_trip_is_snap_argmin(spark):
    one = [(7, 0, 10.00062, 20.01)]
    got = _matches(spark, pings=one)
    assert got[(7, 0)][0] == 2  # no context -> nearest wins


def test_out_of_radius_pings_are_skipped(spark):
    """A mid-trip ping with no candidate drops out; the DP bridges the
    gap and the remaining pings still match."""
    pings = [
        (3, 0, 10.00005, 20.02),
        (3, 1, 45.0, 120.0),  # nowhere near the roads
        (3, 2, 10.00003, 20.03),
    ]
    got = _matches(spark, pings=pings)
    assert set(got) == {(3, 0), (3, 2)}
    assert got[(3, 0)][0] == 1 and got[(3, 2)][0] == 1


def test_partitioning_invariance(spark):
    base = _matches(spark)
    pts = _pings(spark).repartition(7, "seq")
    got = {
        (r.trip_id, r.seq): (r.way_id, r.seg_idx, r.dist_mm)
        for r in hmm_map_match(pts, _roads(spark), **KW).collect()
    }
    assert got == base


def test_parameter_validation(spark):
    with pytest.raises(ValueError, match="sigma_mm/beta_mm"):
        hmm_map_match(
            _pings(spark), _roads(spark), 500.0, sigma_mm=0
        )
