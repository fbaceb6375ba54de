"""BPE training (text/bpe.py) vs a reference pure-Python trainer with
identical tie-break and merge semantics."""

from __future__ import annotations

import pytest

from osm_spark.text.bpe import bpe_train


def _python_bpe(texts, n_merges):
    freq = {}
    for t in texts:
        if t is None:
            continue
        for w in t.lower().split(" "):
            if w:
                freq[w] = freq.get(w, 0) + 1
    words = {w: list(w) for w in freq}
    merges = []
    for step in range(1, n_merges + 1):
        counts = {}
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq[w]
        if not counts:
            break
        (l, r), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, l, r, c))
        for w, syms in words.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            words[w] = out
    return merges


def _spark_bpe(spark, texts, n_merges):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    return [
        (r.step, r.left, r.right, r.pair_count)
        for r in bpe_train(df, n_merges=n_merges).orderBy("step").collect()
    ]


def test_matches_python_trainer(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest",
        None,
        "low newer",
    ]
    for n in (1, 4):
        assert _spark_bpe(spark, texts, n) == _python_bpe(texts, n)


def test_overlap_rule_and_ties(spark):
    # 'aaaa' stresses the non-overlap rule; 'ab ba' stresses the
    # lexicographic tie-break at equal counts
    texts = ["aaaa aaaa", "ab ba ab ba"]
    got = _spark_bpe(spark, texts, 3)
    assert got == _python_bpe(texts, 3)
    # round 1 merges (a,a) with count 6 (3 adjacent positions × 2 words)
    assert got[0][1:] == ("a", "a", 6)


def test_runs_out_of_pairs(spark):
    texts = ["a b c"]  # single-char words: no pairs at all
    assert _spark_bpe(spark, texts, 2) == []


def test_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    with pytest.raises(ValueError):
        bpe_train(df, n_merges=0)


def _python_encode(texts, merges):
    freq = {}
    for t in texts:
        if t is None:
            continue
        for w in t.lower().split(" "):
            if w:
                freq[w] = freq.get(w, 0) + 1
    out = {}
    for w, f in freq.items():
        syms = list(w)
        for l, r in merges:
            nxt = []
            for s in syms:
                if nxt and nxt[-1] == l and s == r:
                    nxt[-1] = l + r
                else:
                    nxt.append(s)
            syms = nxt
        for s in syms:
            out[s] = out.get(s, 0) + f
    return out


def test_encode_matches_python(spark):
    from osm_spark.text.bpe import bpe_encode

    texts = ["low lower lowest low low", "new newer newest new", "aaaa ab"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    merges = [(l, r) for _, l, r, _ in _python_bpe(texts, 3)]
    got = {
        r.sym: r.n_occurrences
        for r in bpe_encode(df, merges).collect()
    }
    assert got == _python_encode(texts, merges)
    # encode over the trained merges actually compresses: fewer symbol
    # occurrences than raw characters
    raw_chars = sum(len(w) for t in texts for w in t.split(" "))
    assert sum(got.values()) < raw_chars
