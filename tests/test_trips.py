"""Trajectory stats (osm_spark/geo/trips.py) vs a pandas replay."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from osm_spark.geo.knn import haversine_m_py
from osm_spark.geo.trips import trip_stats, trip_steps


@pytest.fixture(scope="module")
def pings(spark):
    rng = np.random.default_rng(9)
    rows = []
    eid = 0
    for uid in range(12):
        n = int(rng.integers(1, 9))  # users with a single ping included
        base_lat, base_lon = 51.5 + uid * 0.01, -0.12
        t0 = pd.Timestamp("2024-01-01")
        for k in range(n):
            # alternate dwell jitter (~5 m) and real moves (~1 km)
            if k % 2 == 0:
                base_lat += 0.00005
            else:
                base_lon += 0.015
            rows.append(
                {
                    "user_id": uid,
                    "event_id": eid,
                    "ts": t0 + pd.Timedelta(minutes=k),
                    "lat": base_lat,
                    "lon": base_lon,
                }
            )
            eid += 1
    pdf = pd.DataFrame(rows)
    return pdf, spark.createDataFrame(pdf)


def _replay(pdf: pd.DataFrame, stay_m: float) -> pd.DataFrame:
    out = []
    for uid, g in pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        la, lo = g["lat"].values, g["lon"].values
        steps = [
            int(round(haversine_m_py(la[i - 1], lo[i - 1], la[i], lo[i]) * 1000.0))
            for i in range(1, len(g))
        ]
        out.append(
            {
                "user_id": uid,
                "n_pings": len(g),
                "n_moves": sum(1 for s in steps if s >= stay_m * 1000),
                "total_mm": sum(steps),
                "max_step_mm": max(steps) if steps else None,
            }
        )
    return pd.DataFrame(out)


def test_trip_stats_matches_replay(spark, pings):
    pdf, df = pings
    got = (
        trip_stats(df, stay_m=50.0)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    exp = _replay(pdf, 50.0).sort_values("user_id").reset_index(drop=True)
    # the fixture must exercise dwells, moves, and single-ping users
    assert (exp["n_moves"] < exp["n_pings"] - 1).any()
    assert (exp["n_pings"] == 1).any()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_trip_steps_first_ping_null(spark, pings):
    _, df = pings
    steps = trip_steps(df).toPandas()
    per_user_nulls = steps[steps["step_mm"].isna()].groupby("user_id").size()
    assert (per_user_nulls == 1).all()
    assert len(per_user_nulls) == df.select("user_id").distinct().count()


def test_trip_stats_ts_tie_broken_by_id(spark):
    t = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        [
            {"user_id": 1, "event_id": 2, "ts": t, "lat": 51.5, "lon": -0.12},
            {"user_id": 1, "event_id": 1, "ts": t, "lat": 51.6, "lon": -0.12},
            {"user_id": 1, "event_id": 3, "ts": t, "lat": 51.7, "lon": -0.12},
        ]
    )
    df = spark.createDataFrame(pdf)
    steps = trip_steps(df).toPandas().set_index("event_id")["step_mm"]
    # order is 1 → 2 → 3 regardless of row order: both steps ~11.1 km
    assert pd.isna(steps[1])
    assert steps[2] > 0 and steps[3] > 0


# ---------------------------------------------------------------- stay_points


def _replay_stays(pdf: pd.DataFrame, stay_m: float, min_dur_s: float) -> pd.DataFrame:
    """Sequential gaps-and-islands replay of stay_points."""
    stay_mm = int(round(stay_m * 1000.0))
    out = []
    for uid, g in pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        la, lo = g["lat"].values, g["lon"].values
        ts_us = g["ts"].astype("int64").values  # ns -> handled below
        ts_us = ts_us // 1000
        lat_e7 = [int(round(v * 1e7)) for v in la]
        lon_e7 = [int(round(v * 1e7)) for v in lo]
        sid = 0
        eps: dict[int, list[int]] = {}
        for i in range(len(g)):
            if i == 0:
                sid += 1
            else:
                step = int(
                    round(haversine_m_py(la[i - 1], lo[i - 1], la[i], lo[i]) * 1000.0)
                )
                if step >= stay_mm:
                    sid += 1
            eps.setdefault(sid, []).append(i)
        for s, idxs in eps.items():
            t0, t1 = int(ts_us[idxs[0]]), int(ts_us[idxs[-1]])
            if t1 - t0 >= min_dur_s * 1e6:
                out.append(
                    {
                        "user": uid,
                        "stay_id": s,
                        "t_start_us": t0,
                        "t_end_us": t1,
                        "dur_us": t1 - t0,
                        "n_pings": len(idxs),
                        "sum_lat_e7": sum(lat_e7[i] for i in idxs),
                        "sum_lon_e7": sum(lon_e7[i] for i in idxs),
                    }
                )
    return pd.DataFrame(out)


def test_stay_points_matches_replay(spark, pings):
    from osm_spark.geo.trips import stay_points

    pdf, df = pings
    got = (
        stay_points(df, stay_m=50.0, min_dur_s=0.0)
        .toPandas()
        .sort_values(["user", "stay_id"])
        .reset_index(drop=True)
    )
    exp = (
        _replay_stays(pdf, 50.0, 0.0)
        .sort_values(["user", "stay_id"])
        .reset_index(drop=True)
    )
    # fixture must produce both multi-ping episodes and singleton episodes
    assert (exp["n_pings"] > 1).any() and (exp["n_pings"] == 1).any()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_stay_points_duration_filter(spark, pings):
    from osm_spark.geo.trips import stay_points

    pdf, df = pings
    # 30 s bar: singleton episodes (dur 0) drop, 2-ping 60 s dwells survive
    got = stay_points(df, stay_m=50.0, min_dur_s=30.0).toPandas()
    exp = _replay_stays(pdf, 50.0, 30.0)
    assert len(got) == len(exp) > 0
    assert (got["dur_us"] >= 30.0 * 1e6).all()
    assert (got["n_pings"] >= 2).all()


def test_stay_points_single_exchange(spark, pings):
    """The shared window spec + user-prefixed groupBy key must plan ONE
    hash exchange: hashpartitioning(user) satisfies the (user, stay_id)
    clustering of the aggregate."""
    from osm_spark.geo.trips import stay_points

    _, df = pings
    plan = stay_points(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
