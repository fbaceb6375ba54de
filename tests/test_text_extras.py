"""Tests for the round-3 text additions: corpus n-gram stats and the
deterministic shard shuffle."""

from __future__ import annotations

import hashlib

import pytest

from osm_spark.text.ngrams import ngram_counts
from osm_spark.text.sharding import shard_assign


# ------------------------------------------------------------------ ngrams


def test_bigram_counts_hand_checked(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the cat"),
            (2, "the cat ran"),
            (3, "dog"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.ngram: (r["count"], r.doc_freq)
        for r in ngram_counts(docs, n=2, min_count=1).collect()
    }
    assert out["the cat"] == (3, 2)  # twice in doc 1, once in doc 2
    assert out["cat sat"] == (1, 1)
    assert "dog" not in out  # single-token doc yields no bigram
    assert sum(c for c, _ in out.values()) == 5 + 2  # total windows


def test_ngram_min_count_threshold(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
    )
    out = {r.ngram for r in ngram_counts(docs, n=2, min_count=3).collect()}
    assert out == {"a b"}  # count 3; "b a" has count 1


def test_unigram_mode_and_validation(spark):
    docs = spark.createDataFrame([(1, "x y x")], "doc_id long, text string")
    out = {r.ngram: r["count"] for r in ngram_counts(docs, n=1, min_count=1).collect()}
    assert out == {"x": 2, "y": 1}
    with pytest.raises(ValueError):
        ngram_counts(docs, n=0)


def test_short_doc_guard(spark):
    # fewer tokens than n must yield zero grams, not an index error
    docs = spark.createDataFrame([(1, "solo"), (2, "")], "doc_id long, text string")
    assert ngram_counts(docs, n=3, min_count=1).count() == 0


# ---------------------------------------------------------------- sharding


def test_shard_assign_is_deterministic_across_partitionings(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(200)], "doc_id long, text string"
    )
    a = shard_assign(docs, "doc_id", 8).orderBy("doc_id").collect()
    b = (
        shard_assign(docs.repartition(7), "doc_id", 8)
        .orderBy("doc_id")
        .collect()
    )
    assert [(r.doc_id, r.shard, r.shard_pos) for r in a] == [
        (r.doc_id, r.shard, r.shard_pos) for r in b
    ]


def test_shard_assign_matches_hashlib(spark):
    docs = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    out = shard_assign(docs, "doc_id", 4, salt="sx").collect()
    for r in out:
        digest = hashlib.md5(f"sx:{r.doc_id}".encode()).hexdigest()
        assert r.shard == int(digest[:8], 16) % 4


def test_shard_positions_are_contiguous_ranks(spark):
    docs = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    out = shard_assign(docs, "doc_id", 4).collect()
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    assert sum(len(v) for v in by_shard.values()) == 100
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_shard_validation(spark):
    docs = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        shard_assign(docs, "doc_id", 0)


# -------------------------------------------------------- source entropy


def test_source_entropy_matches_replay(spark):
    import math
    from collections import Counter

    import pandas as pd

    from osm_spark.text.entropy import source_entropy

    docs = [
        ("tmpl", "buy now buy now buy now"),
        ("tmpl", "buy now"),
        ("rich", "the quick brown fox jumps over lazy dogs"),
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["source", "text"]))
    got = {
        r.source: (r.n_tokens, r.n_terms, r.entropy_micro)
        for r in source_entropy(df).collect()
    }
    want = {}
    for src in ("tmpl", "rich"):
        c = Counter(
            w for s, t in docs if s == src for w in t.lower().split(" ")
        )
        t = sum(c.values())
        s_micro = sum(round(x * math.log(x) * 1e6) for x in c.values())
        want[src] = (t, len(c), round(math.log(t) * 1e6 - s_micro / t))
    assert got == want
    # template source must score LOWER entropy than diverse prose
    assert got["tmpl"][2] < got["rich"][2]


def test_source_entropy_single_term_is_zero(spark):
    import pandas as pd

    from osm_spark.text.entropy import source_entropy

    df = spark.createDataFrame(
        pd.DataFrame([("mono", "spam spam spam")], columns=["source", "text"])
    )
    got = source_entropy(df).collect()[0]
    assert got.n_terms == 1 and got.entropy_micro == 0
