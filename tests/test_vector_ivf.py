"""IVF ANN: determinism, assignment correctness, recall vs brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_spark.vector.ivf import ivf_index, ivf_search, kmeans_fit
from osm_spark.vector.similarity import cosine_topk


@pytest.fixture(scope="module")
def emb(spark, sf_small_dir):
    return spark.read.parquet(f"{sf_small_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def fitted(emb):
    centroids = kmeans_fit(emb, k=8, iters=3)
    index = ivf_index(emb, centroids).cache()
    return centroids, index


def test_kmeans_deterministic(emb):
    a = sorted(map(tuple, kmeans_fit(emb, k=4, iters=2).collect()))
    b = sorted(map(tuple, kmeans_fit(emb, k=4, iters=2).collect()))
    assert a == b


def test_index_assigns_nearest_centroid(emb, fitted):
    centroids, index = fitted
    cents = {r.cluster: np.array(r.centroid) for r in centroids.collect()}
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    assigned = {r.vec_id: r.cluster for r in index.collect()}
    assert set(assigned) == set(vecs)
    for vid in list(vecs)[:50]:
        v = vecs[vid]
        best = min(cents, key=lambda c: (float(((v - cents[c]) ** 2).sum()), c))
        assert assigned[vid] == best, vid


def test_ivf_full_probe_equals_bruteforce(emb, fitted):
    """nprobe == k clusters → IVF search is exact."""
    centroids, index = fitted
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sorted(map(tuple, cosine_topk(q, emb, k=5).collect()))
    full = sorted(map(tuple, ivf_search(q, index, centroids, k=5, nprobe=8).collect()))
    assert full == exact


def test_ivf_partial_probe_recall(emb, fitted):
    """nprobe=3/8 keeps ≥60% of the true top-5 on this corpus."""
    centroids, index = fitted
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r.query_id, r.vec_id) for r in cosine_topk(q, emb, k=5).collect()}
    approx = {
        (r.query_id, r.vec_id)
        for r in ivf_search(q, index, centroids, k=5, nprobe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall
