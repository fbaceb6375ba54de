"""Per-tile temporal anomalies (osm_spark/geo/anomaly.py) vs a numpy
replay on tiles with designed day series."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from osm_spark.geo.anomaly import tile_anomalies, tile_day_counts

Z = 12


def _pts(spark, series: dict[tuple[float, float], list[int]]):
    """series: (lat, lon) -> events per day index (0-based days)."""
    rows = []
    for (la, lo), days in series.items():
        for d, cnt in enumerate(days):
            for k in range(cnt):
                rows.append(
                    {
                        "lat": la,
                        "lon": lo,
                        "ts": pd.Timestamp("2024-03-01")
                        + pd.Timedelta(days=d, minutes=k),
                    }
                )
    return spark.createDataFrame(pd.DataFrame(rows))


def _replay_z(xs: list[int], i: int) -> float | None:
    n = len(xs)
    s, q = sum(xs), sum(x * x for x in xs)
    var_num = n * (n * q - s * s) / (n - 1)
    if n <= 1 or var_num <= 0:
        return None
    return (n * xs[i] - s) / math.sqrt(var_num)


def test_anomaly_spike_detected_quiet_days_zero_filled(spark):
    # tile A: quiet (1/day for 9 days) then a 50-event spike on day 9;
    # tile B far away: constant 3/day -> sigma 0, never anomalous;
    # tile C: active ONLY on day 0 (5 events) — the zero-fill makes its
    # other 9 days real zeros, so day 0 is a spike vs its own history
    series = {
        (51.50, -0.12): [1] * 9 + [50],
        (40.71, -74.0): [3] * 10,
        (35.67, 139.65): [5] + [0] * 9,
    }
    df = _pts(spark, series)
    got = tile_anomalies(df, z=Z, threshold_sigma=2.0).toPandas()

    # expected from the replay (universe = 10 global days, zero-filled)
    a = [1] * 9 + [50]
    c = [5] + [0] * 9
    za = _replay_z(a, 9)
    zc = _replay_z(c, 0)
    assert za > 2.0 and zc > 2.0
    spikes = {(r.cnt, r.z_micro) for r in got.itertuples()}
    assert (50, round(za * 1e6)) in spikes
    assert (5, round(zc * 1e6)) in spikes
    # the constant tile contributes nothing
    assert len(got[got.cnt == 3]) == 0
    # and no sub-threshold rows leak through
    assert (got.z_micro.abs() >= 2_000_000).all()


def test_tile_day_counts_occupied_only(spark):
    series = {(51.50, -0.12): [2, 0, 1]}
    got = tile_day_counts(_pts(spark, series), z=Z).toPandas()
    # day 1 has no events: no row before zero-fill
    assert sorted(got.cnt) == [1, 2]


def test_anomaly_single_day_universe_yields_nothing(spark):
    # one global day: n = 1 for every tile -> statistic undefined
    series = {(51.50, -0.12): [7], (40.71, -74.0): [2]}
    got = tile_anomalies(_pts(spark, series), z=Z).toPandas()
    assert len(got) == 0
