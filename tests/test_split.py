"""Deterministic train/val/test splits (text/sampling.py split_assign)."""

from __future__ import annotations

import hashlib

import pytest

from osm_spark.text.sampling import sample_threshold, split_assign

FR = {"train": 0.6, "val": 0.3, "test": 0.1}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(400)], "doc_id long, source string"
    )


def _expected(doc_id: int, fractions) -> str | None:
    d = hashlib.md5(f"split:{doc_id}".encode()).hexdigest()
    cum = 0.0
    for name, frac in fractions.items():
        cum += frac
        if d < sample_threshold(min(cum, 1.0)):
            return name
    return None


def test_matches_python_replay_and_covers_everything(spark, docs):
    got = {r.doc_id: r.split for r in split_assign(docs, "doc_id", FR).collect()}
    assert got == {i: _expected(i, FR) for i in range(400)}
    # fractions sum to 1.0 -> no NULL labels
    assert None not in got.values()
    # rough proportions (md5 is uniform; 400 keys)
    n_train = sum(1 for v in got.values() if v == "train")
    assert 0.45 < n_train / 400 < 0.75


def test_partial_fractions_leave_null_tail(spark, docs):
    fr = {"train": 0.5, "val": 0.2}
    got = {r.doc_id: r.split for r in split_assign(docs, "doc_id", fr).collect()}
    assert got == {i: _expected(i, fr) for i in range(400)}
    assert None in got.values()


def test_nested_growth_never_reassigns_earlier_splits(spark, docs):
    small = {r.doc_id: r.split for r in split_assign(docs, "doc_id", {"train": 0.5, "val": 0.2}).collect()}
    grown = {r.doc_id: r.split for r in split_assign(docs, "doc_id", {"train": 0.5, "val": 0.4}).collect()}
    for i, v in small.items():
        if v == "train":
            assert grown[i] == "train"
        elif v == "val":
            assert grown[i] == "val"


def test_partition_invariance(spark, docs):
    a = {r.doc_id: r.split for r in split_assign(docs, "doc_id", FR).collect()}
    b = {r.doc_id: r.split for r in split_assign(docs.repartition(13), "doc_id", FR).collect()}
    assert a == b


def test_validation(spark, docs):
    with pytest.raises(ValueError):
        split_assign(docs, "doc_id", {})
    with pytest.raises(ValueError):
        split_assign(docs, "doc_id", {"a": 0.0})
    with pytest.raises(ValueError):
        split_assign(docs, "doc_id", {"a": 0.8, "b": 0.3})
