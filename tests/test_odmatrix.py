"""OD flow matrix (osm_spark/geo/odmatrix.py): hand-built trajectories
with known tile transitions, dwell handling, and distinct-user counts."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from osm_spark.geo.odmatrix import od_flows, od_matrix

Z = 12


def _tile(lat: float, lon: float, z: int = Z) -> tuple[int, int]:
    n = 1 << z
    m = 85.05112878
    lat = max(min(lat, m), -m)
    x = int(math.floor((lon + 180.0) / 360.0 * n))
    y = int(math.floor((1.0 - math.asinh(math.tan(math.radians(lat))) / math.pi) / 2.0 * n))
    return max(min(x, n - 1), 0), max(min(y, n - 1), 0)


@pytest.fixture(scope="module")
def traj(spark):
    # user 1 and 2 both make the SAME A→B hop (n_users test); user 1
    # then dwells inside B (two pings, same tile) and hops B→C.
    a, b, c = (51.50, -0.12), (51.50, 0.30), (51.80, 0.30)
    t = pd.Timestamp("2024-01-01")
    rows = []
    for uid, pts in [
        (1, [a, b, (b[0] + 1e-5, b[1]), c]),
        (2, [a, b]),
    ]:
        for k, (la, lo) in enumerate(pts):
            rows.append(
                {
                    "user_id": uid,
                    "event_id": uid * 100 + k,
                    "ts": t + pd.Timedelta(minutes=k),
                    "lat": la,
                    "lon": lo,
                }
            )
    pdf = pd.DataFrame(rows)
    return (a, b, c), pdf, spark.createDataFrame(pdf)


def test_od_matrix_known_flows(spark, traj):
    (a, b, c), _, df = traj
    got = od_matrix(df, z=Z).toPandas()
    ta, tb, tc = _tile(*a), _tile(*b), _tile(*c)
    assert ta != tb != tc  # fixture must actually cross tiles
    flows = {
        (r.o_x, r.o_y, r.d_x, r.d_y): (r.n_trips, r.n_users)
        for r in got.itertuples()
    }
    assert flows == {
        (*ta, *tb): (2, 2),  # both users hop A→B
        (*tb, *tc): (1, 1),  # user 1 hops B→C
    }


def test_od_matrix_keep_dwell(spark, traj):
    (a, b, c), _, df = traj
    got = od_matrix(df, z=Z, drop_dwell=False).toPandas()
    tb = _tile(*b)
    dwell = got[
        (got.o_x == tb[0]) & (got.o_y == tb[1])
        & (got.d_x == tb[0]) & (got.d_y == tb[1])
    ]
    assert len(dwell) == 1 and dwell.iloc[0].n_trips == 1
    # total transitions = pings - users (one lost first ping per user)
    assert got.n_trips.sum() == len(traj[1]) - 2


def test_od_flows_order_tie_break(spark):
    # same-ts pings order by event_id: 1 → 2 gives exactly one flow
    t = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        [
            {"user_id": 9, "event_id": 2, "ts": t, "lat": 51.5, "lon": 0.30},
            {"user_id": 9, "event_id": 1, "ts": t, "lat": 51.5, "lon": -0.12},
        ]
    )
    out = od_flows(spark.createDataFrame(pdf), z=Z).toPandas()
    assert len(out) == 1
    assert (out.o_x < out.d_x).all()  # -0.12° lon is the origin


def test_od_matrix_no_cartesian_one_window_exchange(spark, traj):
    _, _, df = traj
    plan = od_matrix(df, z=Z)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # LAG window shuffles on the bare user key exactly once
    assert plan.count("Exchange hashpartitioning(user") == 1, plan
