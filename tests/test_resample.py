"""Polyline resampling (geo/resample.py): Python-replay parity on the
way fixture, hand geometry cases, degenerate edges, the guards, and the
zero-Exchange plan pin."""

from __future__ import annotations

import decimal
import math

import pytest

from osm_spark.geo.resample import resample_ways


def _hav(a, b):
    return 2.0 * 6371000.0 * math.asin(math.sqrt(
        math.sin(math.radians(b[0] - a[0]) / 2.0) ** 2
        + math.cos(math.radians(a[0])) * math.cos(math.radians(b[0]))
        * math.sin(math.radians(b[1] - a[1]) / 2.0) ** 2))


def _rnd(x):
    return int(decimal.Decimal(repr(x)).quantize(
        0, rounding=decimal.ROUND_HALF_UP))


def _replay(rows, step_m, closed):
    """rows: [(way_id, [(lat, lon), ...])] — the engine's arithmetic."""
    step_mm = int(round(step_m * 1000.0))
    out = []
    for wid, pts in rows:
        n = len(pts)
        if n < 2:
            continue
        cum = 0
        last = n if closed else n - 1
        for i in range(1, last + 1):
            a, b = pts[i - 1], pts[i % n]
            smm = _rnd(_hav(a, b) * 1000.0)
            klo = math.floor((cum + step_mm - 1) / step_mm)
            khi = math.floor((cum + smm + step_mm - 1) / step_mm) - 1
            for k in range(klo, khi + 1):
                f = (k * step_mm - cum) / smm
                out.append((wid, k,
                            _rnd((a[0] + f * (b[0] - a[0])) * 1e6),
                            _rnd((a[1] + f * (b[1] - a[1])) * 1e6)))
            cum += smm
    return sorted(out)


def _df(spark, rows):
    data = [(w, [p[0] for p in pts], [p[1] for p in pts]) for w, pts in rows]
    return spark.createDataFrame(
        data, "way_id long, vlat array<double>, vlon array<double>")


def _run(spark, rows, step, closed=False):
    out = resample_ways(_df(spark, rows), step, closed=closed).collect()
    return sorted((r.way_id, r.k, r.qlat, r.qlon) for r in out)


def test_fixture_replay_parity(spark):
    from osm_spark.pipeline.geometry import synth_polygons, synth_polygons_pdf

    got = resample_ways(synth_polygons(spark), 250.0, closed=True).collect()
    got = sorted((r.way_id, r.k, r.qlat, r.qlon) for r in got)
    pdf = synth_polygons_pdf()
    rows = [(r.way_id, list(zip(r.vlat, r.vlon))) for r in pdf.itertuples()]
    assert got == _replay(rows, 250.0, closed=True)
    assert len(got) > 1000


def test_straight_line_points(spark):
    # ~1000.8 m due north: step 250 m → k = 0..4, evenly spaced in lat
    rows = [(1, [(0.0, 0.0), (0.009, 0.0)])]
    got = _run(spark, rows, 250.0)
    assert got == _replay(rows, 250.0, closed=False)
    assert [g[1] for g in got] == [0, 1, 2, 3, 4]
    assert got[0][2:] == (0, 0)           # k=0 is the start vertex
    lats = [g[2] for g in got]
    steps = {lats[i + 1] - lats[i] for i in range(len(lats) - 1)}
    assert max(steps) - min(steps) <= 1    # uniform up to micro-deg rounding


def test_step_longer_than_way_emits_start_only(spark):
    rows = [(1, [(0.0, 0.0), (0.001, 0.0)])]  # ~111 m
    got = _run(spark, rows, 500.0)
    assert got == [(1, 0, 0, 0)]


def test_closed_ring_covers_wrap_segment(spark):
    ring = [(0.0, 0.0), (0.002, 0.0), (0.002, 0.002), (0.0, 0.002)]
    open_ks = {g[1] for g in _run(spark, [(1, ring)], 100.0)}
    closed_ks = {g[1] for g in _run(spark, [(1, ring)], 100.0, closed=True)}
    assert max(closed_ks) > max(open_ks)
    assert _run(spark, [(1, ring)], 100.0, closed=True) == _replay(
        [(1, ring)], 100.0, closed=True)


def test_degenerate_ways_emit_nothing(spark):
    rows = [(1, [(0.0, 0.0)]),                 # single vertex
            (2, [(0.0, 0.0), (0.0, 0.0)])]     # zero length
    assert _run(spark, rows, 100.0) == []


def test_bad_step_raises(spark):
    with pytest.raises(ValueError, match="step_m"):
        resample_ways(_df(spark, [(1, [(0.0, 0.0), (0.001, 0.0)])]), 0.0)


def test_max_points_guard(spark):
    rows = [(1, [(0.0, 0.0), (1.0, 0.0)])]  # ~111 km
    with pytest.raises(Exception, match="max_points|points"):
        resample_ways(_df(spark, rows), 1.0, max_points=1000).collect()


def test_plan_is_shuffle_free(spark):
    from osm_spark.pipeline.geometry import synth_polygons

    out = resample_ways(synth_polygons(spark), 250.0, closed=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
