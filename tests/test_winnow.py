"""Tests for winnowing fingerprints (osm_spark/text/winnow.py)."""

from __future__ import annotations

import hashlib

import pytest

from osm_spark.text.winnow import winnow_fingerprints


def _ref_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Plain-python reference with the same hash and rightmost-min rule."""
    toks = text.lower().split(" ")
    if len(toks) < k:
        return set()
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    h = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
    weff = min(w, len(h))
    out = set()
    for j in range(len(h) - weff + 1):
        window = h[j : j + weff]
        mv = min(window)
        # rightmost occurrence of the minimum
        pos = max(i for i in range(j, j + weff) if h[i] == mv)
        out.add((pos + 1, mv))  # 1-based
    return out


def test_winnow_matches_reference(spark):
    docs = {
        1: "a b c d e f g h i j",
        2: "one two three",          # fewer grams than w → single window
        3: "x y",                    # fewer tokens than k → no rows
        4: "p q p q p q p q",        # repeated grams → hash ties exercised
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    out = winnow_fingerprints(df, k=3, w=4)
    got: dict[int, set] = {}
    for r in out.collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for d, text in docs.items():
        assert got.get(d, set()) == _ref_winnow(text, 3, 4), d


def test_winnow_shared_run_guarantee(spark):
    """Any shared token run of length >= k + w - 1 yields >= 1 shared fp."""
    k, w = 3, 4
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = k + w - 1
    docs = [
        (1, f"left filler words {shared} trailing junk"),
        (2, f"{shared} completely different ending here now"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = winnow_fingerprints(df, k=k, w=w).collect()
    fps1 = {r.fp for r in rows if r.doc_id == 1}
    fps2 = {r.fp for r in rows if r.doc_id == 2}
    assert fps1 & fps2


def test_winnow_density(spark):
    """Expected density is ~2/(w+1) fingerprints per k-gram."""
    words = " ".join(f"w{i * 7919 % 1000}x{i}" for i in range(500))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    n_fp = winnow_fingerprints(df, k=3, w=4).count()
    n_grams = 500 - 2
    density = n_fp / n_grams
    assert 0.25 < density < 0.55  # 2/(w+1) = 0.4 ± slack


def test_winnow_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(df, w=0)


def test_winnow_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    out = winnow_fingerprints(df, k=3, w=4)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    assert plan.count("Generate") >= 2  # barrier + final explode
