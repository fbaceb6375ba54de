"""Bloom filter build/probe vs a python replay + recall guarantee."""

from __future__ import annotations

import hashlib

import pytest

from osm_spark.text.bloom import bloom_build, bloom_probe_docs

M, K, N = 1 << 12, 3, 3


def _grams(text: str, n: int = N) -> set[str]:
    w = text.lower().split(" ")
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)} if len(w) >= n else set()


def _positions(gram: str) -> list[int]:
    h = hashlib.md5(gram.encode()).hexdigest()
    return [int(h[8 * i : 8 * i + 8], 16) % M for i in range(K)]


def _build(bench_texts: list[str]) -> set[int]:
    bits = set()
    for t in bench_texts:
        for g in _grams(t):
            bits.update(_positions(g))
    return bits


def _probe(texts: dict[int, str], bits: set[int]):
    out = {}
    for did, t in texts.items():
        grams = _grams(t)
        cand = sum(all(p in bits for p in _positions(g)) for g in grams)
        out[did] = (len(grams), cand, cand > 0)
    return out


@pytest.fixture(scope="module")
def fixture(spark):
    bench_texts = ["the quick brown fox jumps", "pack my box with five dozen jugs"]
    corpus = {
        1: "a clean document with fresh words only here",
        2: "we saw the quick brown fox jumps over it",  # contaminated
        3: "tiny",                                       # too short for grams
        4: "pack my box with five dozen jugs of ale",    # contaminated
        5: "completely unrelated text about spark plans",
    }
    bench = spark.createDataFrame([(t,) for t in bench_texts], "text string")
    docs = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    return bench, docs, bench_texts, corpus


def test_bloom_matches_replay(spark, fixture):
    bench, docs, bench_texts, corpus = fixture
    bloom = bloom_build(bench, M, K, n=N)
    got = {r.doc_id: (r.n_grams, r.n_candidates, r.flagged)
           for r in bloom_probe_docs(docs, bloom, M, K, n=N).collect()}
    want = _probe(corpus, _build(bench_texts))
    assert got == want
    assert got[2][2] and got[4][2]           # recall: true contamination flagged
    assert got[3] == (0, 0, False)           # gram-free doc survives


def test_bloom_bitmap_matches_replay(spark, fixture):
    bench, _, bench_texts, _ = fixture
    rows = {r.word_idx: r.bits for r in bloom_build(bench, M, K, n=N).collect()}
    want: dict[int, int] = {}
    for p in _build(bench_texts):
        want[p // 32] = want.get(p // 32, 0) | (1 << (p % 32))
    assert rows == want


def test_bloom_merge_is_union(spark, fixture):
    from pyspark.sql import functions as F

    bench, _, bench_texts, _ = fixture
    parts = [bench.limit(1), bench.subtract(bench.limit(1))]
    merged = (
        bloom_build(parts[0], M, K, n=N)
        .unionByName(bloom_build(parts[1], M, K, n=N))
        .groupBy("word_idx")
        .agg(F.bit_or("bits").cast("long").alias("bits"))
    )
    full = bloom_build(bench, M, K, n=N)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in full.collect()}


def test_bloom_validation(spark, fixture):
    bench, docs, _, _ = fixture
    with pytest.raises(ValueError):
        bloom_build(bench, 33, K)
    with pytest.raises(ValueError):
        bloom_build(bench, M, 5)
