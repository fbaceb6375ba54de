"""Weighted sampling (sampling.py weighted_sample): determinism,
weight proportionality across salts, null/zero-weight policy, group
quotas, without-replacement."""

from __future__ import annotations

import pytest

from osm_spark.text.sampling import weighted_sample

ROWS = [
    (i, "g" if i < 6 else "h", w)
    for i, w in enumerate([10.0, 1.0, 1.0, 1.0, 0.0, None, 5.0, 1.0, 1.0, 2.0])
]


def _df(spark):
    return spark.createDataFrame(ROWS, "id int, grp string, w double")


def test_deterministic_and_partitioning_invariant(spark):
    df = _df(spark)
    a = sorted(r.id for r in weighted_sample(df, "w", 3, "id").collect())
    b = sorted(
        r.id
        for r in weighted_sample(df.repartition(7), "w", 3, "id").collect()
    )
    assert a == b and len(a) == 3


def test_zero_and_null_weights_never_selected(spark):
    got = {r.id for r in weighted_sample(_df(spark), "w", 10, "id").collect()}
    assert 4 not in got and 5 not in got
    assert len(got) == 8  # everything else qualifies at n=10


def test_group_quota(spark):
    out = weighted_sample(_df(spark), "w", 2, "id", group_col="grp")
    counts = {}
    for r in out.collect():
        counts[r.grp] = counts.get(r.grp, 0) + 1
        assert r.rk <= 2
    assert counts == {"g": 2, "h": 2}


def test_weight_proportionality_over_salts(spark):
    df = _df(spark).where("id in (0, 1)")  # weights 10 vs 1
    heavy = light = 0
    for s in range(30):
        pick = weighted_sample(df, "w", 1, "id", salt=f"s{s}").collect()[0].id
        heavy += pick == 0
        light += pick == 1
    # E[heavy] ≈ 30·10/11 ≈ 27; a 50/50 split would be ~15
    assert heavy > light and heavy >= 20


def test_validation(spark):
    with pytest.raises(ValueError):
        weighted_sample(_df(spark), "w", 0, "id")
