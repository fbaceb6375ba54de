"""PMI collocations (osm_spark/text/collocations.py) vs a Python replay."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from osm_spark.text.collocations import collocations

DOCS = [
    "new york is big",
    "new york wins",
    "a big apple",
    "a big apple",  # duplicated: (a,big)/(big,apple) land at count 2
    "new day in new york",
    "x",  # 1-token doc: produces unigrams but no pairs
]


def _replay(docs: list[str], min_count: int) -> dict[tuple[str, str], int]:
    uni: Counter = Counter()
    pairs: Counter = Counter()
    for d in docs:
        toks = d.lower().split(" ")
        uni.update(toks)
        pairs.update(zip(toks, toks[1:]))
    t, b = sum(uni.values()), sum(pairs.values())
    out = {}
    for (w1, w2), cab in pairs.items():
        if cab >= min_count:
            pmi = math.log((cab * t * t) / (b * uni[w1] * uni[w2]))
            out[(w1, w2)] = round(pmi * 1e6)
    return out


def test_collocations_match_replay(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": DOCS}))
    got = collocations(df, min_count=2).toPandas()
    exp = _replay(DOCS, 2)
    assert {("new", "york")} <= set(exp)  # fixture exercises a real pair
    assert {
        (r.w1, r.w2): r.pmi_micro for r in got.itertuples()
    } == exp


def test_collocations_marginals_precede_cut(spark):
    # totals must come from ALL pairs, not the min_count survivors:
    # with min_count=3 only (new, york) survives, but its PMI uses the
    # full B — identical value to the min_count=2 run.
    df = spark.createDataFrame(pd.DataFrame({"text": DOCS}))
    lo = collocations(df, min_count=2).toPandas()
    hi = collocations(df, min_count=3).toPandas()
    v_lo = lo[(lo.w1 == "new") & (lo.w2 == "york")].pmi_micro.iloc[0]
    v_hi = hi[(hi.w1 == "new") & (hi.w2 == "york")].pmi_micro.iloc[0]
    assert v_lo == v_hi
    assert len(hi) < len(lo)


def test_collocations_positive_for_associated_pair(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": DOCS}))
    got = collocations(df, min_count=2).toPandas()
    ny = got[(got.w1 == "new") & (got.w2 == "york")]
    assert ny.pmi_micro.iloc[0] > 0  # "york" only ever follows "new"
    assert ny.n_pair.iloc[0] == 3 and ny.n_w2.iloc[0] == 3


def test_collocations_no_corpus_sized_join(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": DOCS}))
    plan = (
        collocations(df, min_count=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    # marginal attaches honor the shuffle-hash hint (no sort-merge)
    assert "SortMergeJoin" not in plan
