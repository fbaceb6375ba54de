"""Product quantization (vector/pq.py): lossless-config exactness vs a
numpy brute force, lossy-config recall property, code shape, guards."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from osm_spark.vector.pq import pq_encode, pq_search, pq_train


def _load(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _brute_topk(emb, qids, k=10):
    ids = sorted(emb)
    out = {}
    for q in qids:
        d = sorted(
            (float(np.sum((np.asarray(emb[q], dtype=np.float64)
                           - np.asarray(emb[v], dtype=np.float64)) ** 2)), v)
            for v in ids
        )
        out[q] = [v for _, v in d[:k]]
    return out


def test_lossless_pq_equals_exact(spark, sf_small_dir):
    e = _load(spark, sf_small_dir)
    n = e.count()
    cb = pq_train(e, dim=64, m=4, k_sub=n, iters=0)
    codes = pq_encode(e, cb, dim=64, m=4)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {}
    for r in pq_search(q, codes, cb, dim=64, m=4, topk=10).collect():
        got.setdefault(r.query_id, {})[r.rank] = r.vec_id
    emb = {r.vec_id: list(r.embedding) for r in e.collect()}
    exp = _brute_topk(emb, sorted(got))
    for qid in exp:
        assert [got[qid][i] for i in range(1, 11)] == exp[qid]


def test_lossy_pq_recall(spark, sf_small_dir):
    # production-shaped config: m=4 subspaces, 16 codewords each —
    # recall@10 vs exact must clear a sane floor on the fixture
    e = _load(spark, sf_small_dir)
    cb = pq_train(e, dim=64, m=4, k_sub=16, iters=3)
    codes = pq_encode(e, cb, dim=64, m=4)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {}
    for r in pq_search(q, codes, cb, dim=64, m=4, topk=10).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    emb = {r.vec_id: list(r.embedding) for r in e.collect()}
    exp = _brute_topk(emb, sorted(got))
    recalls = [len(got[qid] & set(exp[qid])) / 10 for qid in exp]
    assert sum(recalls) / len(recalls) >= 0.3  # quantized, not broken
    # the query itself (distance 0 exact; small quantized distance)
    # should stay in its own top-10 at this compression
    assert all(qid in got[qid] for qid in got)


def test_code_shape_and_range(spark, sf_small_dir):
    e = _load(spark, sf_small_dir)
    cb = pq_train(e, dim=64, m=8, k_sub=16, iters=1)
    codes = pq_encode(e, cb, dim=64, m=8)
    rows = codes.collect()
    assert all(len(r.codes) == 8 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r.codes)
    assert len(rows) == e.count()


def test_dim_not_divisible_raises(spark, sf_small_dir):
    e = _load(spark, sf_small_dir)
    with pytest.raises(ValueError, match="divisible"):
        pq_train(e, dim=64, m=5)
