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


def test_tiny_weights_saturate_not_overflow(spark):
    """Weights < ~4e-9 used to push key*1e9 past Long.MAX, where the
    double→long cast saturates silently (ADVICE r4). The clamp makes
    the saturation explicit + deterministic: tiny-weight rows still
    rank (by the id tie-break among clamped keys), normal-weight rows
    always beat them, and the sample stays partitioning-invariant."""
    rows = [(0, 1e-12), (1, 2e-12), (2, 5.0), (3, 10.0)]
    df = spark.createDataFrame(rows, "id int, w double")
    out = weighted_sample(df, "w", 2, "id").collect()
    assert sorted(r.id for r in out) == [2, 3]  # normal weights win
    # a pure-tiny-weight table still produces a full deterministic sample
    tiny = spark.createDataFrame(rows[:2], "id int, w double")
    a = sorted(r.id for r in weighted_sample(tiny, "w", 2, "id").collect())
    b = sorted(
        r.id
        for r in weighted_sample(
            tiny.repartition(5), "w", 2, "id"
        ).collect()
    )
    assert a == b == [0, 1]
