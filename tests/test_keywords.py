"""TF-IDF keywords (osm_spark/text/keywords.py) vs a Python replay."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
import pytest

from osm_spark.text.keywords import tfidf_keywords

DOCS = {
    0: "spark runs on the jvm the jvm is fast",
    1: "ducks swim on the pond",
    2: "the jvm compiles bytecode the bytecode runs",
    3: "the pond ducks eat bread",
}


def _replay(docs: dict[int, str], k: int) -> list[tuple]:
    n = len(docs)
    tf = {i: Counter(t.lower().split(" ")) for i, t in docs.items()}
    df: Counter = Counter()
    for c in tf.values():
        df.update(set(c))
    out = []
    for i, c in tf.items():
        scored = sorted(
            (
                (-round(cnt * math.log(n / df[w]) * 1e6), w, cnt)
                for w, cnt in c.items()
            )
        )
        for rank, (neg, w, cnt) in enumerate(scored[:k], 1):
            out.append((i, w, cnt, df[w], -neg, rank))
    return sorted(out)


def test_tfidf_matches_replay(spark):
    df = spark.createDataFrame(
        pd.DataFrame([{"doc_id": i, "text": t} for i, t in DOCS.items()])
    )
    got = sorted(
        (r.doc_id, r.term, r.tf, r.df, r.score_micro, r.rank)
        for r in tfidf_keywords(df, k=3).collect()
    )
    assert got == _replay(DOCS, 3)


def test_tfidf_stopword_scores_zero(spark):
    # "the" appears in every doc: idf = ln(1) = 0 exactly
    df = spark.createDataFrame(
        pd.DataFrame([{"doc_id": i, "text": t} for i, t in DOCS.items()])
    )
    full = tfidf_keywords(df, k=100).toPandas()
    the = full[full.term == "the"]
    assert len(the) == 4  # every doc contains it
    assert (the.score_micro == 0).all()
    # and distinctive terms outrank it everywhere
    assert (the["rank"] > 1).all()


def test_tfidf_k_bounds_rows_per_doc(spark):
    df = spark.createDataFrame(
        pd.DataFrame([{"doc_id": i, "text": t} for i, t in DOCS.items()])
    )
    got = tfidf_keywords(df, k=2).toPandas()
    assert (got.groupby("doc_id").size() == 2).all()
    with pytest.raises(ValueError):
        tfidf_keywords(df, k=0)


def test_tfidf_rank_ties_break_on_term(spark):
    # two terms with identical tf and df in one doc: rank by term asc
    df = spark.createDataFrame(
        pd.DataFrame(
            [
                {"doc_id": 0, "text": "zebra apple"},
                {"doc_id": 1, "text": "filler filler"},
            ]
        )
    )
    got = (
        tfidf_keywords(df, k=2)
        .where("doc_id = 0")
        .orderBy("rank")
        .toPandas()
    )
    assert list(got.term) == ["apple", "zebra"]
