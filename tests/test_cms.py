"""Count-min sketch (text/cms.py): the overestimate guarantee vs exact
counts, exactness at generous width, zero-estimates for absent tokens,
cell-count bound, and broadcast probe plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_spark.text.cms import cms_build, cms_estimate

ROWS = [
    (1, "a b a c a"),
    (2, "b c d d"),
    (3, "a e"),
    (4, None),
]
TRUE = {"a": 4, "b": 2, "c": 2, "d": 2, "e": 1}


def _df(spark):
    return spark.createDataFrame(ROWS, "doc_id int, text string")


def _estimates(spark, depth, width, extra_queries=()):
    cms = cms_build(_df(spark), depth=depth, width=width)
    qs = spark.createDataFrame(
        [(t,) for t in list(TRUE) + list(extra_queries)], "tok string"
    )
    est = cms_estimate(cms, qs, depth=depth, width=width)
    return {r.tok: r.est for r in est.collect()}


def test_never_underestimates(spark):
    got = _estimates(spark, depth=2, width=4)  # tiny width forces collisions
    for t, true in TRUE.items():
        assert got[t] >= true


def test_exact_at_generous_width(spark):
    got = _estimates(spark, depth=3, width=4096, extra_queries=["zz"])
    assert {t: got[t] for t in TRUE} == TRUE
    assert got["zz"] == 0  # absent token, empty cell -> 0


def test_cell_count_bounded(spark):
    cms = cms_build(_df(spark), depth=3, width=8)
    assert cms.count() <= 3 * 8
    total = cms.groupBy("j").agg(F.sum("cnt").alias("s")).collect()
    # every row of the sketch sees every token occurrence exactly once
    n_occurrences = sum(len(t.split(" ")) for _, t in ROWS if t)
    assert {r.s for r in total} == {n_occurrences}


def test_probe_is_broadcast(spark):
    cms = cms_build(_df(spark), depth=2, width=8)
    qs = spark.createDataFrame([("a",)], "tok string")
    plan = (
        cms_estimate(cms, qs, depth=2, width=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_validation(spark):
    with pytest.raises(ValueError):
        cms_build(_df(spark), depth=0)
