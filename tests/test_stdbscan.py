"""ST-DBSCAN (osm_spark/geo/dbscan.py st_dbscan) vs a pure-python
brute-force spatiotemporal oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_spark.geo.dbscan import dbscan, st_dbscan, st_eps_pairs
from osm_spark.geo.knn import haversine_m_py

EPS_M, EPS_T, MIN_PTS = 150.0, 3600, 4


def _fixture(rng_seed: int = 11) -> pd.DataFrame:
    """One spatial blob visited by two temporal bursts 3h apart (same
    place, different times -> distinct ST clusters), plus a second blob
    and noise."""
    rng = np.random.default_rng(rng_seed)
    parts = []
    for clat, clon, t0, n in [
        (51.50, -0.12, 0, 30),        # burst A
        (51.50, -0.12, 3 * 3600 + 1800, 30),  # burst B, same place, +3.5h
        (51.52, -0.10, 5000, 25),     # second blob
    ]:
        parts.append(
            pd.DataFrame(
                {
                    "lat": clat + rng.normal(0, 0.0004, n),
                    "lon": clon + rng.normal(0, 0.0004, n),
                    "ts": t0 + rng.integers(0, 1200, n),
                }
            )
        )
    parts.append(
        pd.DataFrame(
            {
                "lat": 51.4 + rng.random(20) * 0.2,
                "lon": -0.3 + rng.random(20) * 0.4,
                "ts": rng.integers(-7200, 20000, 20),
            }
        )
    )
    pdf = pd.concat(parts, ignore_index=True)
    pdf["id"] = np.arange(len(pdf), dtype=np.int64)
    pdf["ts"] = pdf["ts"].astype(np.int64)
    return pdf


def _brute(pdf: pd.DataFrame, eps_m: float, eps_t: int, min_pts: int) -> dict:
    la, lo, ts = pdf["lat"].values, pdf["lon"].values, pdf["ts"].values
    n = len(pdf)
    dist = haversine_m_py(la[:, None], lo[:, None], la[None, :], lo[None, :])
    nbr = (dist <= eps_m) & (np.abs(ts[:, None] - ts[None, :]) <= eps_t)
    core = nbr.sum(axis=1) >= min_pts

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        for j in range(i + 1, n):
            if core[i] and core[j] and nbr[i, j]:
                parent[find(i)] = find(j)
    comp = {}
    for i in range(n):
        if core[i]:
            comp.setdefault(find(i), []).append(i)
    label = {}
    for members in comp.values():
        m = min(int(pdf["id"].iloc[i]) for i in members)
        for i in members:
            label[int(pdf["id"].iloc[i])] = (m, "core")
    for i in range(n):
        iid = int(pdf["id"].iloc[i])
        if iid in label:
            continue
        cls = [
            label[int(pdf["id"].iloc[j])][0]
            for j in range(n)
            if j != i and core[j] and nbr[i, j]
        ]
        label[iid] = (min(cls), "border") if cls else (None, "noise")
    return label


@pytest.fixture(scope="module")
def pdf():
    return _fixture()


def test_st_dbscan_matches_brute_force(spark, pdf):
    df = spark.createDataFrame(pdf[["id", "lat", "lon", "ts"]])
    got = {r.id: (r.cluster, r.role) for r in st_dbscan(df, EPS_M, EPS_T, MIN_PTS).collect()}
    want = _brute(pdf, EPS_M, EPS_T, MIN_PTS)
    assert got == want
    # the two same-place bursts must be SEPARATE clusters
    clusters = {v[0] for v in got.values() if v[0] is not None}
    assert len(clusters) >= 3


def test_time_axis_actually_splits(spark, pdf):
    """Plain dbscan merges the two bursts; st_dbscan separates them."""
    df = spark.createDataFrame(pdf[["id", "lat", "lon", "ts"]])
    plain = dbscan(df.select("id", "lat", "lon"), EPS_M, MIN_PTS)
    st = st_dbscan(df, EPS_M, EPS_T, MIN_PTS)
    n_plain = plain.where(F.col("cluster").isNotNull()).select("cluster").distinct().count()
    n_st = st.where(F.col("cluster").isNotNull()).select("cluster").distinct().count()
    assert n_st > n_plain


def test_st_eps_pairs_unique_ordered_and_exact(spark, pdf):
    df = spark.createDataFrame(pdf[["id", "lat", "lon", "ts"]])
    rows = st_eps_pairs(df, EPS_M, EPS_T).collect()
    got = {(r.a_id, r.b_id) for r in rows}
    assert len(rows) == len(got)
    assert all(a < b for a, b in got)
    la, lo, ts = pdf["lat"].values, pdf["lon"].values, pdf["ts"].values
    dist = haversine_m_py(la[:, None], lo[:, None], la[None, :], lo[None, :])
    ok = (dist <= EPS_M) & (np.abs(ts[:, None] - ts[None, :]) <= EPS_T)
    want = {
        (int(pdf["id"].iloc[i]), int(pdf["id"].iloc[j]))
        for i in range(len(pdf))
        for j in range(i + 1, len(pdf))
        if ok[i, j]
    }
    assert got == want


def test_st_dbscan_validation(spark, pdf):
    df = spark.createDataFrame(pdf[["id", "lat", "lon", "ts"]])
    with pytest.raises(ValueError):
        st_dbscan(df, EPS_M, 0, MIN_PTS)
    with pytest.raises(ValueError):
        st_dbscan(df, -1.0, EPS_T, MIN_PTS)
    with pytest.raises(ValueError):
        st_dbscan(df, EPS_M, EPS_T, 0)
