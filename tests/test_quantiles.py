"""Exact integer quantiles (osm_spark/functions/quantiles.py) vs numpy
nearest-rank, plus the no-global-sort plan guarantee."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from osm_spark.functions.quantiles import integer_quantiles, robust_cut


def _nearest_rank(xs: list[int], p: float) -> int:
    s = sorted(xs)
    return s[math.ceil(p * len(s)) - 1]


@pytest.fixture(scope="module")
def vals(spark):
    rng = np.random.default_rng(11)
    xs = [int(x) for x in rng.integers(0, 500, 3000)] + [10_000, -7]
    return xs, spark.createDataFrame(pd.DataFrame({"n": xs}))


def test_quantiles_match_nearest_rank(spark, vals):
    xs, df = vals
    probs = [0.01, 0.5, 0.99, 1.0]
    got = {
        r.prob_pmille: r.value
        for r in integer_quantiles(df, "n", probs).collect()
    }
    assert got == {
        round(p * 1000): _nearest_rank(xs, p) for p in probs
    }
    # p = 1.0 must hit the true max (the outlier), p small the negative
    assert got[1000] == 10_000


def test_quantiles_validation(spark, vals):
    _, df = vals
    with pytest.raises(ValueError):
        integer_quantiles(df, "n", [])
    with pytest.raises(ValueError):
        integer_quantiles(df, "n", [0.0])
    with pytest.raises(ValueError):
        integer_quantiles(df, "n", [1.5])


def test_robust_cut_trims_outliers(spark, vals):
    xs, df = vals
    lo, hi = _nearest_rank(xs, 0.01), _nearest_rank(xs, 0.99)
    got = robust_cut(df, "n", 0.01, 0.99).toPandas()
    assert len(got) == sum(1 for x in xs if lo <= x <= hi)
    assert got.n.min() >= lo and got.n.max() <= hi
    assert 10_000 not in set(got.n) and -7 not in set(got.n)


def test_quantiles_never_sort_the_data(spark, vals):
    """The only window sort must be over the HISTOGRAM aggregate, never
    the raw data: assert every Sort in the plan sits above an agg."""
    _, df = vals
    plan = (
        integer_quantiles(df, "n", [0.5])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # a global data sort would plan as a rangepartitioning Exchange;
    # the only allowed sort feeds the histogram-sized window, which
    # arrives via the partial-aggregated hash exchange on the value
    assert "rangepartitioning" not in plan.lower()
    assert "Exchange hashpartitioning(" in plan
