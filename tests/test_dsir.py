"""DSIR importance weighting + Gumbel top-k resampling (text/dsir.py)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from osm_spark.text.dsir import dsir_sample, dsir_weights, hashed_gram_counts

B = 64  # small bucket space so collisions are exercised


def _bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:13], 16) % B


def _grams(text: str) -> list[str]:
    toks = [t for t in text.lower().split(" ") if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "xylophone quartz vibrato zephyr"),
    (4, "the cat sat"),
    (5, "one"),
]
TARGET = [(101, "the cat sat on the mat"), (102, "the cat ran")]


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(DOCS, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    return raw, tgt


def _expected_weights():
    """Pure-python replay of the documented formula."""
    raw_counts: dict[int, int] = {}
    doc_counts: dict[int, dict[int, int]] = {}
    for doc_id, text in DOCS:
        d = doc_counts.setdefault(doc_id, {})
        for g in _grams(text):
            b = _bucket(g)
            d[b] = d.get(b, 0) + 1
            raw_counts[b] = raw_counts.get(b, 0) + 1
    tgt_counts: dict[int, int] = {}
    for _, text in TARGET:
        for g in _grams(text):
            b = _bucket(g)
            tgt_counts[b] = tgt_counts.get(b, 0) + 1
    r_total = sum(raw_counts.values())
    t_total = sum(tgt_counts.values())
    lr = {
        b: round(math.log((tgt_counts.get(b, 0) + 1) / (t_total + B)) * 1e6)
        - round(math.log((rc + 1) / (r_total + B)) * 1e6)
        for b, rc in raw_counts.items()
    }
    out = {}
    for doc_id, cnts in doc_counts.items():
        n = sum(cnts.values())
        lw = sum(c * lr[b] for b, c in cnts.items())
        out[doc_id] = (n, lw)
    return out


def test_hashed_gram_counts_shape(spark, frames):
    raw, _ = frames
    got = {
        (r.doc_id, r.bucket): r.cnt
        for r in hashed_gram_counts(raw, B).collect()
    }
    # per-doc gram mass = 2*len - 1 (unigrams + adjacent bigrams)
    per_doc: dict[int, int] = {}
    for (doc_id, _), c in got.items():
        per_doc[doc_id] = per_doc.get(doc_id, 0) + c
    for doc_id, text in DOCS:
        toks = [t for t in text.split(" ") if t]
        assert per_doc[doc_id] == 2 * len(toks) - 1
    # the single-token doc has no bigrams
    assert per_doc[5] == 1


def test_hashed_gram_counts_drops_empty_tokens(spark):
    d = spark.createDataFrame(
        [(1, "a  b"), (2, "")], "doc_id long, text string"
    )
    rows = hashed_gram_counts(d, B).collect()
    ids = {r.doc_id for r in rows}
    assert 2 not in ids  # zero-token doc contributes nothing
    assert sum(r.cnt for r in rows if r.doc_id == 1) == 3  # a, b, "a b"


def test_dsir_weights_exact_vs_python_replay(spark, frames):
    raw, tgt = frames
    got = {
        r.doc_id: (r.n_grams, r.logw_micro, r.log_ratio)
        for r in dsir_weights(raw, tgt, num_buckets=B).collect()
    }
    exp = _expected_weights()
    assert set(got) == set(exp)
    for doc_id, (n, lw) in exp.items():
        gn, glw, gratio = got[doc_id]
        assert (gn, glw) == (n, lw), doc_id
        assert gratio == round(lw / 1e6, 6)


def test_dsir_weights_direction(spark, frames):
    """A doc identical to a target doc must out-weight alien vocab."""
    raw, tgt = frames
    w = {r.doc_id: r.log_ratio for r in dsir_weights(raw, tgt, num_buckets=B).collect()}
    assert w[1] > w[3]  # exact target text vs never-seen vocabulary
    # per-gram normalization isn't applied; compare same-length docs only


def test_dsir_sample_deterministic_and_partition_stable(spark, frames):
    raw, tgt = frames
    w = dsir_weights(raw, tgt, num_buckets=B)
    a = {r.doc_id: r.rk for r in dsir_sample(w, 3).collect()}
    b = {
        r.doc_id: r.rk
        for r in dsir_sample(w.repartition(7), 3).collect()
    }
    assert a == b
    assert len(a) == 3
    assert sorted(a.values()) == [1, 2, 3]


def test_dsir_sample_grouped_quota(spark, frames):
    raw, tgt = frames
    w = dsir_weights(raw, tgt, num_buckets=B).withColumn(
        "grp", (F.col("doc_id") % 2).cast("string")
    )
    rows = dsir_sample(w, 1, group_col="grp").collect()
    assert len(rows) == 2  # one per parity group
    assert {r.grp for r in rows} == {"0", "1"}


def test_dsir_sample_validates_n(spark, frames):
    raw, tgt = frames
    w = dsir_weights(raw, tgt, num_buckets=B)
    with pytest.raises(ValueError):
        dsir_sample(w, 0)


def test_dsir_weights_ratio_join_is_broadcast(spark, frames):
    """The bucket-ratio dim is <= num_buckets rows by construction —
    the plan must broadcast it (no shuffle of the per-doc side on
    bucket)."""
    raw, tgt = frames
    plan = dsir_weights(raw, tgt, num_buckets=B)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
