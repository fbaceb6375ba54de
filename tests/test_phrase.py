"""Phrase search (text/phrase.py): occurrence counting incl. overlaps,
case folding, single-term degradation, absent phrases, and the
no-cartesian plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_spark.text.phrase import phrase_search, positional_index

ROWS = [
    (1, "the quick brown fox the quick dog"),
    (2, "a a a a"),
    (3, "Quick Brown shoes"),
    (4, "brown quick"),
    (5, None),
]


def _df(spark):
    return spark.createDataFrame(ROWS, "doc_id int, text string")


def _search(spark, phrase):
    return {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(_df(spark), phrase).collect()
    }


def test_basic_and_case_folding(spark):
    got = _search(spark, "quick brown")
    assert got == {1: (1, 1), 3: (1, 0)}


def test_overlapping_occurrences(spark):
    assert _search(spark, "a a") == {2: (3, 0)}
    assert _search(spark, "a a a") == {2: (2, 0)}


def test_single_term(spark):
    got = _search(spark, "the")
    assert got == {1: (2, 0)}


def test_absent_and_order_sensitivity(spark):
    assert _search(spark, "brown fox jumps") == {}
    # adjacency requires order: doc 4 has the words but reversed
    got = _search(spark, "quick brown")
    assert 4 not in got


def test_positional_index_shape(spark):
    idx = positional_index(_df(spark))
    got = sorted(
        (r.doc_id, r.pos, r.tok)
        for r in idx.where(F.col("doc_id") == 3).collect()
    )
    assert got == [(3, 0, "quick"), (3, 1, "brown"), (3, 2, "shoes")]


def test_validation_and_plan(spark):
    with pytest.raises(ValueError):
        phrase_search(_df(spark), "")
    plan = (
        phrase_search(_df(spark), "quick brown fox")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
