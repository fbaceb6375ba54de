"""semantic_dedup vs a full numpy replay of the SemDeDup recipe."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_spark.vector.semdedup import seed_pick, semantic_dedup


@pytest.fixture(scope="module")
def emb(spark, sf_small_dir):
    return spark.read.parquet(f"{sf_small_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def vecs(emb):
    return {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}


def _cos(a: np.ndarray, b: np.ndarray) -> float:
    return round(float(a @ b) / (np.sqrt(a @ a) * np.sqrt(b @ b)), 6)


def _replay(vecs: dict[int, np.ndarray], k: int, threshold: float):
    seed_ids = sorted(vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:k]
    assigned = {}
    for vid, v in vecs.items():
        best = max(seed_ids, key=lambda s: (_cos(v, vecs[s]), -s))
        assigned[vid] = (best, _cos(v, vecs[best]))
    keep = {}
    for vid, (cl, cs) in assigned.items():
        dup = any(
            ocl == cl
            and o != vid
            and (ocs, o) < (cs, vid)
            and _cos(vecs[vid], vecs[o]) >= threshold
            for o, (ocl, ocs) in assigned.items()
        )
        keep[vid] = not dup
    return seed_ids, assigned, keep


def test_seed_pick_deterministic(emb, vecs):
    got = sorted(r.seed_id for r in seed_pick(emb, 8).collect())
    want, _, _ = _replay(vecs, 8, 0.3)
    assert got == sorted(want)


def test_semantic_dedup_matches_replay(emb, vecs):
    rows = semantic_dedup(emb, k=8, threshold=0.3).collect()
    _, assigned, keep = _replay(vecs, 8, 0.3)
    assert len(rows) == len(vecs)
    for r in rows:
        cl, cs = assigned[r.vec_id]
        assert r.cluster_id == cl, r
        assert r.cent_sim == pytest.approx(cs, abs=1e-9), r
        assert r.keep == keep[r.vec_id], r
    # the threshold must actually bite on the fixture
    assert any(not r.keep for r in rows)
    assert any(r.keep for r in rows)


def test_semantic_dedup_impossible_threshold_keeps_all(emb):
    rows = semantic_dedup(emb, k=4, threshold=1.01).collect()
    assert all(r.keep for r in rows)


def test_semantic_dedup_external_seeds(emb, spark):
    """kmeans-style external centroids slot in via the seeds override."""
    seeds = spark.createDataFrame(
        [(100 + i, [float(j == i) for j in range(64)]) for i in range(4)],
        "seed_id long, seed_vec array<float>",
    )
    rows = semantic_dedup(emb, threshold=1.01, seeds=seeds).collect()
    assert {r.cluster_id for r in rows} <= {100, 101, 102, 103}
    assert all(r.keep for r in rows)
