"""Grid DBSCAN (osm_spark/geo/dbscan.py) vs a pure-python brute-force
oracle, plus planning/uniqueness invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_spark.geo.dbscan import dbscan, eps_pairs
from osm_spark.geo.knn import haversine_m_py


def _fixture(rng_seed: int = 7) -> pd.DataFrame:
    """3 dense blobs + a thin bridge + uniform noise around London —
    built to produce all three roles and a border tie worth breaking."""
    rng = np.random.default_rng(rng_seed)
    parts = [
        pd.DataFrame(
            {
                "lat": clat + rng.normal(0, 0.0005, 40),
                "lon": clon + rng.normal(0, 0.0005, 40),
            }
        )
        for clat, clon in [(51.50, -0.12), (51.52, -0.10), (51.48, -0.14)]
    ]
    # sparse shell just outside blob 1's dense middle: border candidates
    ang = np.linspace(0.0, 2 * np.pi, 12, endpoint=False)
    parts.append(
        pd.DataFrame(
            {
                "lat": 51.50 + 0.0030 * np.sin(ang),
                "lon": -0.12 + 0.0048 * np.cos(ang),
            }
        )
    )
    parts.append(
        pd.DataFrame(
            {
                "lat": 51.4 + rng.random(30) * 0.2,
                "lon": -0.3 + rng.random(30) * 0.4,
            }
        )
    )
    pdf = pd.concat(parts, ignore_index=True)
    pdf["id"] = np.arange(len(pdf), dtype=np.int64)
    return pdf


def _brute_dbscan(pdf: pd.DataFrame, eps_m: float, min_pts: int) -> pd.DataFrame:
    la, lo = pdf["lat"].values, pdf["lon"].values
    n = len(pdf)
    dist = haversine_m_py(la[:, None], lo[:, None], la[None, :], lo[None, :])
    nbr = dist <= eps_m
    core = nbr.sum(axis=1) >= min_pts  # row i counts itself

    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        if not core[i]:
            continue
        for j in range(i + 1, n):
            if core[j] and nbr[i, j]:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    root_members: dict[int, list[int]] = {}
    for i in range(n):
        if core[i]:
            root_members.setdefault(find(i), []).append(i)
    label = {}
    for members in root_members.values():
        m = min(members)
        for i in members:
            label[i] = m
    rows = []
    for i in range(n):
        if core[i]:
            rows.append((int(pdf["id"][i]), label[i], "core"))
        else:
            cn = [label[j] for j in range(n) if core[j] and nbr[i, j]]
            if cn:
                rows.append((int(pdf["id"][i]), min(cn), "border"))
            else:
                rows.append((int(pdf["id"][i]), None, "noise"))
    return pd.DataFrame(rows, columns=["id", "cluster", "role"])


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out["cluster"] = pd.array(
        [None if pd.isna(x) else int(x) for x in out["cluster"]], dtype="Int64"
    )
    return out.sort_values("id").reset_index(drop=True)


@pytest.fixture(scope="module")
def fixture_pdf():
    return _fixture()


def test_dbscan_matches_brute_force_all_roles(spark, fixture_pdf):
    pts = spark.createDataFrame(fixture_pdf[["id", "lat", "lon"]])
    got = _canon(dbscan(pts, 250.0, 8).toPandas())
    exp = _canon(_brute_dbscan(fixture_pdf, 250.0, 8))
    # the fixture must actually exercise every role, or the test is weak
    assert set(exp["role"]) == {"core", "border", "noise"}
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_dbscan_min_pts_one_makes_everything_core(spark, fixture_pdf):
    pts = spark.createDataFrame(fixture_pdf[["id", "lat", "lon"]])
    got = dbscan(pts, 250.0, 1).toPandas()
    assert set(got["role"]) == {"core"}
    assert got["cluster"].notna().all()
    # isolated points are singleton clusters labeled by their own id
    iso = got[got["cluster"] == got["id"]]
    assert len(iso) >= 1


def test_eps_pairs_unique_and_ordered(spark, fixture_pdf):
    pts = spark.createDataFrame(fixture_pdf[["id", "lat", "lon"]])
    pairs = eps_pairs(pts, 250.0).toPandas()
    assert (pairs["a_id"] < pairs["b_id"]).all()
    assert not pairs.duplicated(["a_id", "b_id"]).any()


def test_dbscan_resolution_invariant(spark, fixture_pdf):
    """A coarser explicit grid must not change the label set — the
    covering guarantee makes the pair set resolution-independent."""
    pts = spark.createDataFrame(fixture_pdf[["id", "lat", "lon"]])
    a = _canon(dbscan(pts, 250.0, 8).toPandas())
    b = _canon(dbscan(pts, 250.0, 8, res=6).toPandas())
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_dbscan_validation(spark, fixture_pdf):
    pts = spark.createDataFrame(fixture_pdf[["id", "lat", "lon"]])
    with pytest.raises(ValueError):
        dbscan(pts, 0.0, 5)
    with pytest.raises(ValueError):
        dbscan(pts, 100.0, 0)
    with pytest.raises(ValueError):
        eps_pairs(pts.where(F.lit(False)), 100.0)
