"""Set-containment join (text/containment.py): directional semantics
on hand fixtures, the df-cut and min-set floor, mutual containment for
exact duplicates, guards, and the plan pins."""

from __future__ import annotations

import pytest

from osm_spark.text.containment import containment_join, token_sets


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df):
    return sorted(
        (r.contained, r.container, r.n_shared, r.n_contained, r.c_ppm)
        for r in df.collect()
    )


def test_directional_subset(spark):
    # A ⊂ B: C(A→B) = 1, C(B→A) = 3/6 — the size-skew case Jaccard misses
    docs = _docs(spark, [
        (1, "alpha beta gamma"),
        (2, "alpha beta gamma delta epsilon zeta"),
        (3, "unrelated words entirely different here now"),
    ])
    got = _pairs(containment_join(docs, 0.9, max_df_ratio=1.0, min_set=1))
    assert got == [(1, 2, 3, 3, 1000000)]
    # at τ = 0.5 the reverse direction appears too
    got_lo = _pairs(containment_join(docs, 0.5, max_df_ratio=1.0, min_set=1))
    assert (2, 1, 3, 6, 500000) in got_lo
    assert (1, 2, 3, 3, 1000000) in got_lo


def test_mutual_containment_for_exact_dup(spark):
    docs = _docs(spark, [
        (1, "same words here"),
        (2, "same words here"),
        (3, "other stuff only there"),
    ])
    got = _pairs(containment_join(docs, 1.0, max_df_ratio=1.0, min_set=1))
    assert got == [(1, 2, 3, 3, 1000000), (2, 1, 3, 3, 1000000)]


def test_df_cut_changes_denominator(spark):
    # 'the' is in every doc (df = 3/3) → cut at ratio 0.75; alpha/beta
    # (df = 2/3 ≈ 0.67) survive and the denominators shrink accordingly
    docs = _docs(spark, [
        (1, "the alpha beta"),
        (2, "the alpha beta gamma"),
        (3, "the zeta eta theta iota"),
    ])
    sets = token_sets(docs, max_df_ratio=0.75)
    terms = {(r.doc_id, r.term) for r in sets.collect()}
    assert not any(t == "the" for _, t in terms)
    assert (1, "alpha") in terms
    got = _pairs(containment_join(docs, 1.0, max_df_ratio=0.75, min_set=1))
    # doc 1's post-cut set {alpha, beta} ⊂ doc 2's — still full containment
    assert (1, 2, 2, 2, 1000000) in got


def test_min_set_floor_drops_both_sides(spark):
    docs = _docs(spark, [
        (1, "alpha"),                       # set size 1 — dropped
        (2, "alpha beta gamma delta"),
        (3, "alpha beta gamma delta"),
    ])
    got = _pairs(containment_join(docs, 0.9, max_df_ratio=1.0, min_set=2))
    assert {g[0] for g in got} == {2, 3}    # doc 1 appears on NO side
    assert {g[1] for g in got} == {2, 3}


def test_duplicate_tokens_collapse(spark):
    # containment is over SETS: repeated words count once
    docs = _docs(spark, [
        (1, "alpha alpha alpha beta"),
        (2, "alpha beta gamma"),
    ])
    got = _pairs(containment_join(docs, 1.0, max_df_ratio=1.0, min_set=1))
    assert (1, 2, 2, 2, 1000000) in got


def test_guards(spark):
    docs = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="threshold"):
        containment_join(docs, 0.0)
    with pytest.raises(ValueError, match="min_set"):
        containment_join(docs, 0.5, min_set=0)


def test_plan_no_cartesian(spark):
    docs = _docs(spark, [(i, f"w{i} w{i+1} w{i+2}") for i in range(20)])
    out = containment_join(docs, 0.5, max_df_ratio=1.0, min_set=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only nested-loop joins allowed are the engine's 1-row stat
    # broadcasts (the n_docs crossJoin in token_sets) — every one must
    # be a BuildRight broadcast, never an unbroadcast cross product
    import re
    for m in re.finditer(r"BroadcastNestedLoopJoin (\w+)", plan):
        assert m.group(1) == "BuildRight"
    assert "ShuffledHashJoin" in plan


def test_prefix_filter_matches_naive(spark):
    # randomized corpus with heavy overlap: the prefix-filtered plan
    # must return EXACTLY the naive all-shared-terms answer
    import numpy as np

    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for d in range(25):
        k = rng.randint(3, 12)
        toks = sorted(set(rng.choice(vocab, k)))
        rows.append((d, " ".join(toks)))
    docs = _docs(spark, rows)
    tau, ms = 0.6, 2

    # naive python replay (post-df-cut sets, same floor)
    sets = {}
    for d, t in rows:
        sets[d] = set(t.split())
    n_docs = len(rows)
    df_ct = {}
    for s in sets.values():
        for t in s:
            df_ct[t] = df_ct.get(t, 0) + 1
    cut = {t for t, c in df_ct.items() if c <= 1.0 * n_docs}  # ratio 1.0
    sets = {d: s & cut for d, s in sets.items()}
    sets = {d: s for d, s in sets.items() if len(s) >= ms}
    exp = []
    for a, A in sets.items():
        for b, B in sets.items():
            if a == b:
                continue
            sh = len(A & B)
            ppm = round(sh / len(A) * 1e6)
            if ppm >= round(tau * 1e6):
                exp.append((a, b, sh, len(A), ppm))
    got = _pairs(containment_join(docs, tau, max_df_ratio=1.0, min_set=ms))
    assert got == sorted(exp)
    assert len(got) > 5  # the fixture genuinely exercises the filter
