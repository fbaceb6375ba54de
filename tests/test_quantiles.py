"""Exact histogram quantiles (text/quantiles.py): manual rank-math
cases, tie-heavy distributions, edge quantiles, null handling, guards,
and the histogram-before-window plan shape."""

from __future__ import annotations

import math

import pytest

from osm_spark.text.quantiles import histogram_quantiles


def _df(spark, rows):
    return spark.createDataFrame(rows, "grp string, v long")


def _disc(values, q):
    s = sorted(values)
    return s[math.floor(q * (len(s) - 1))]


def test_manual_rank_math(spark):
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    df = _df(spark, [("a", v) for v in vals])
    qs = [0.0, 0.25, 0.5, 0.75, 0.99, 1.0]
    got = {r.q: r.v for r in histogram_quantiles(df, "grp", "v", qs).collect()}
    assert got == {q: _disc(vals, q) for q in qs}


def test_tie_heavy_distribution(spark):
    # 90% of mass on one value — cumulative logic must cross it once
    vals = [7] * 90 + list(range(10))
    df = _df(spark, [("a", v) for v in vals])
    qs = [0.05, 0.5, 0.95, 0.99]
    got = {r.q: r.v for r in histogram_quantiles(df, "grp", "v", qs).collect()}
    assert got == {q: _disc(vals, q) for q in qs}


def test_multiple_groups_independent(spark):
    rows = [("a", v) for v in range(100)] + [("b", v) for v in [5, 5, 5]]
    got = histogram_quantiles(_df(spark, rows), "grp", "v", [0.5]).collect()
    by_grp = {r.grp: r.v for r in got}
    assert by_grp == {"a": _disc(list(range(100)), 0.5), "b": 5}


def test_single_row_group(spark):
    got = histogram_quantiles(
        _df(spark, [("a", 42)]), "grp", "v", [0.0, 0.5, 1.0]
    ).collect()
    assert sorted((r.q, r.v) for r in got) == [(0.0, 42), (0.5, 42), (1.0, 42)]


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 3)], "grp string, v long"
    )
    got = {r.q: r.v for r in histogram_quantiles(df, "grp", "v", [1.0]).collect()}
    assert got == {1.0: 3}


def test_guards(spark):
    df = _df(spark, [("a", 1)])
    with pytest.raises(ValueError, match="non-empty"):
        histogram_quantiles(df, "grp", "v", [])
    with pytest.raises(ValueError, match="0, 1"):
        histogram_quantiles(df, "grp", "v", [0.5, 1.5])


def test_plan_windows_over_histogram(spark):
    # the aggregate must collapse the data BEFORE the window: exactly
    # one partial/final aggregate pair feeding the window, and the
    # window's sort sees histogram rows, not input rows
    df = _df(spark, [("a", v % 7) for v in range(1000)])
    out = histogram_quantiles(df, "grp", "v", [0.5, 0.9])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert plan.index("HashAggregate") > plan.index("Window")  # agg below window
    assert "CartesianProduct" not in plan
