"""Markov transitions (osm_spark/pipeline/markov.py) vs a Python replay."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from osm_spark.pipeline.markov import markov_transitions

T0 = pd.Timestamp("2024-01-01")


def _df(spark, seqs: dict[int, list[str]]):
    rows, eid = [], 0
    for uid, types in seqs.items():
        for k, t in enumerate(types):
            rows.append(
                {
                    "user_id": uid,
                    "event_id": eid,
                    "ts": T0 + pd.Timedelta(minutes=k),
                    "event_type": t,
                }
            )
            eid += 1
    return spark.createDataFrame(pd.DataFrame(rows))


def _replay(seqs: dict[int, list[str]]):
    c: Counter = Counter()
    for types in seqs.values():
        c.update(zip(types, types[1:]))
    row = Counter()
    for (p, _), n in c.items():
        row[p] += n
    return {
        (p, q): (n, row[p], round(n / row[p] * 1e6))
        for (p, q), n in c.items()
    }


def test_markov_matches_replay(spark):
    seqs = {
        1: ["view", "click", "view", "buy"],
        2: ["view", "view", "click"],
        3: ["buy"],  # single event: no transitions
    }
    got = {
        (r.prev, r.cur): (r.n, r.n_from_prev, r.p_micro)
        for r in markov_transitions(_df(spark, seqs)).collect()
    }
    assert got == _replay(seqs)


def test_markov_probabilities_sum_to_one_per_row(spark):
    seqs = {1: ["a", "b", "a", "c", "a", "b"], 2: ["b", "a", "b"]}
    got = markov_transitions(_df(spark, seqs)).toPandas()
    sums = got.groupby("prev").apply(
        lambda g: g.n.sum() / g.n_from_prev.iloc[0], include_groups=False
    )
    assert (sums == 1.0).all()


def test_markov_transitions_never_cross_users(spark):
    # user 1 ends with "a", user 2 starts with "b": no (a, b) transition
    seqs = {1: ["x", "a"], 2: ["b", "y"]}
    got = markov_transitions(_df(spark, seqs)).toPandas()
    assert ("a", "b") not in set(zip(got.prev, got.cur))
    assert len(got) == 2
