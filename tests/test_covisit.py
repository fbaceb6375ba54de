"""Co-visitation (osm_spark/graph/covisit.py) vs an itertools replay."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

import pandas as pd
import pytest

from osm_spark.graph.covisit import covisitation


def _df(spark, touches: list[tuple[int, str]]):
    return spark.createDataFrame(
        pd.DataFrame(touches, columns=["user_id", "item"])
    )


def _replay(touches, cap):
    per_user: dict[int, set] = {}
    for u, it in touches:
        per_user.setdefault(u, set()).add(it)
    c: Counter = Counter()
    for items in per_user.values():
        c.update(combinations(sorted(items)[:cap], 2))
    return dict(c)


def test_covisit_matches_replay(spark):
    touches = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "b"), (2, "c"),
        (3, "a"), (3, "c"),
        (3, "a"),  # duplicate touch: counted once
    ]
    got = {
        (r.a, r.b): r.n_users
        for r in covisitation(_df(spark, touches), cap=16).collect()
    }
    assert got == _replay(touches, 16)
    assert got[("b", "c")] == 2  # users 1 and 2


def test_covisit_cap_is_deterministic_prefix(spark):
    # user touches d,c,b,a; cap=2 keeps sorted prefix [a, b] regardless
    # of touch order
    touches = [(1, "d"), (1, "c"), (1, "b"), (1, "a")]
    got = {
        (r.a, r.b): r.n_users
        for r in covisitation(_df(spark, touches), cap=2).collect()
    }
    assert got == {("a", "b"): 1}
    with pytest.raises(ValueError):
        covisitation(_df(spark, touches), cap=1)


def test_covisit_no_self_join(spark):
    touches = [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
    plan = (
        covisitation(_df(spark, touches))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # pair expansion is row-local: no join operator of any kind
    for op in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
               "CartesianProduct", "BroadcastNestedLoop"):
        assert op not in plan, op
