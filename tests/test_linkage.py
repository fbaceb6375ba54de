"""Blocked fuzzy join (text/linkage.py) vs brute force.

The PassJoin blocking must be COMPLETE: on any input the blocked join's
pair set equals the brute-force cross-join-with-levenshtein-filter pair
set. We check that on a seed-pinned random corpus (low-entropy alphabet
so near pairs are dense), on crafted edge cases (empty/short strings,
length-change edits), and in two-table mode; plus a plan assertion that
no cartesian product sneaks in."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from osm_spark.text.linkage import fuzzy_join, fuzzy_self_pairs


def _brute_pairs(spark, rows, k):
    df = spark.createDataFrame(rows, "id int, s string")
    a = df.alias("a")
    b = df.alias("b")
    return sorted(
        (r.id_a, r.id_b, r.dist)
        for r in a.crossJoin(b)
        .where(F.col("a.id") < F.col("b.id"))
        .where(F.levenshtein("a.s", "b.s") <= k)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.levenshtein("a.s", "b.s").cast("int").alias("dist"),
        )
        .collect()
    )


def _blocked_pairs(spark, rows, k):
    df = spark.createDataFrame(rows, "id int, s string")
    return sorted(
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_self_pairs(df, max_dist=k).collect()
    )


def _random_rows(n, seed, alphabet="abcd", lo=0, hi=10):
    rng = random.Random(seed)
    return [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(lo, hi))))
        for i in range(n)
    ]


@pytest.mark.parametrize("k", [1, 2])
def test_matches_brute_force_random(spark, k):
    rows = _random_rows(120, seed=42 + k)
    got = _blocked_pairs(spark, rows, k)
    want = _brute_pairs(spark, rows, k)
    assert got == want
    assert len(want) > 10  # the corpus actually exercises the refine


def test_short_and_length_change_edges(spark):
    rows = [
        (0, ""),
        (1, "a"),
        (2, "ab"),
        (3, "abc"),
        (4, "abcd"),
        (5, "xbcd"),   # substitution of first char (segment 0 differs)
        (6, "abcde"),  # insertion at end
        (7, "bcd"),    # deletion of first char (all segments shift)
        (8, "zzzz"),
    ]
    for k in (1, 2):
        assert _blocked_pairs(spark, rows, k) == _brute_pairs(spark, rows, k)


def test_two_table_mode_and_null_policy(spark):
    a = spark.createDataFrame(
        [(1, "warsaw"), (2, "berlin"), (3, None), (None, "paris")],
        "id int, s string",
    )
    b = spark.createDataFrame(
        [(10, "warsw"), (11, "berlin"), (12, "madrid"), (13, None)],
        "id int, s string",
    )
    got = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_join(a, b, max_dist=1).collect()
    )
    assert got == [(1, 10, 1), (2, 11, 0)]


def test_keep_self_flag(spark):
    df = spark.createDataFrame([(1, "same"), (2, "same")], "id int, s string")
    with_self = fuzzy_join(df, df, max_dist=1)
    assert with_self.where("id_a = id_b").count() == 2
    no_self = fuzzy_join(df, df, max_dist=1, keep_self=False)
    assert no_self.where("id_a = id_b").count() == 0


def test_no_cartesian_in_plan(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "abd")], "id int, s string")
    plan = fuzzy_self_pairs(df, max_dist=2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_max_dist_validation(spark):
    df = spark.createDataFrame([(1, "x")], "id int, s string")
    with pytest.raises(ValueError):
        fuzzy_join(df, df, max_dist=0)
