"""MIPS (osm_spark/vector/mips.py): augmentation invariants, exact-path
brute-force equality, LSH-path recall, and dot-vs-cosine divergence."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from osm_spark.vector.mips import augment_corpus, augment_queries, mips_topk
from osm_spark.vector.similarity import cosine_topk


@pytest.fixture(scope="module")
def emb(spark, sf_small_dir):
    """Embeddings with VARYING norms: the parquet table is unit-norm
    (MIPS would degenerate to cosine), so scale each vector by a
    deterministic per-row factor — same transform the gated query and
    its DuckDB oracle replay."""
    e = spark.read.parquet(f"{sf_small_dir}/embeddings.parquet")
    scale = (F.lit(1) + F.col("vec_id") % 4).cast("double")
    return e.withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double") * scale)
    )


def _queries(emb, n=4):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_augment_makes_norms_equal(emb):
    aug = augment_corpus(emb.limit(50))
    norms = [
        math.sqrt(sum(v * v for v in r.aug))
        for r in aug.select("aug").collect()
    ]
    assert max(norms) - min(norms) < 1e-6
    q = augment_queries(_queries(emb, 2)).collect()
    for r in q:
        assert r.aug[-1] == 0.0 and len(r.aug) == len(r.embedding) + 1


def test_exact_path_matches_brute_force(emb):
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}
    got = mips_topk(_queries(emb, 3), emb, k=5).collect()
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append((r.vec_id, r.dot))
    for qid, ranked in by_q.items():
        qv = vecs[qid]
        exp = sorted(
            (
                (round(sum(a * b for a, b in zip(qv, v)), 6), -vid)
                for vid, v in vecs.items()
            ),
            reverse=True,
        )[:5]
        assert [(-e[1], e[0]) for e in exp] == ranked


def test_lsh_path_recall(emb):
    """Comparative recall properties (the test_vector.py convention —
    isotropic synthetic vectors cap ABSOLUTE recall, so assert the
    relations the design claims): more probes never hurt, and norm
    banding beats global augmentation under this 4:1 norm spread."""
    qs = _queries(emb, 8)
    exact = {
        (r.query_id, r.vec_id) for r in mips_topk(qs, emb, k=10).collect()
    }

    def recall(**kw):
        got = {
            (r.query_id, r.vec_id)
            for r in mips_topk(qs, emb, k=10, **kw).collect()
        }
        return len(got & exact) / len(exact)

    r1 = recall(num_planes=5, nprobe=1, n_bands=8)
    r4 = recall(num_planes=5, nprobe=4, n_bands=8)
    r4_global = recall(num_planes=5, nprobe=4, n_bands=1)
    assert r4 >= r1  # multi-probe monotone
    assert r4 >= r4_global  # Range-LSH banding >= symmetric global ALSH
    assert r4 >= 0.4, r4


def test_mips_differs_from_cosine(emb):
    # varying norms must reorder rankings below the self-match
    qs = _queries(emb, 8)
    mips = {
        (r.query_id, r.rank): r.vec_id
        for r in mips_topk(qs, emb, k=5).collect()
    }
    cos = {
        (r.query_id, r.rank): r.vec_id
        for r in cosine_topk(qs, emb, k=5).collect()
    }
    assert mips != cos


def _half_up(v):
    return int(math.copysign(math.floor(abs(v) + 0.5), v))


def test_int8_path_matches_python_replay(emb):
    from osm_spark.vector.mips import mips_topk_int8

    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}

    def quant(v):
        s = max(abs(x) for x in v) / 127.0
        if s == 0:
            return s, [0] * len(v)
        return s, [max(-127, min(127, _half_up(x / s))) for x in v]

    got = mips_topk_int8(_queries(emb, 3), emb, k=5).collect()
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append((r.vec_id, r.idot, r.dot_q))
    for qid, ranked in by_q.items():
        sq, qv = quant(vecs[qid])
        scored = []
        for vid, v in vecs.items():
            sc, cv = quant(v)
            idot = sum(a * b for a, b in zip(qv, cv))
            scored.append((round(sq * sc * idot, 6), -vid, idot))
        top = sorted(scored, reverse=True)[:5]
        assert [(-t[1], t[2], t[0]) for t in top] == ranked


def test_int8_ranking_close_to_exact(emb):
    from osm_spark.vector.mips import mips_topk_int8

    qs = _queries(emb, 8)
    exact = mips_topk(qs, emb, k=10).select("query_id", "vec_id")
    q8 = mips_topk_int8(qs, emb, k=10).select("query_id", "vec_id")
    overlap = exact.intersect(q8).count() / exact.count()
    assert overlap >= 0.8, overlap


def test_lsh_scores_are_exact_dots(emb):
    # approximation touches WHICH rows come back, never the score
    qs = _queries(emb, 3)
    exact = {
        (r.query_id, r.vec_id): r.dot
        for r in mips_topk(qs, emb, k=20).collect()
    }
    for r in mips_topk(qs, emb, k=20, num_planes=6, nprobe=4).collect():
        if (r.query_id, r.vec_id) in exact:
            assert exact[(r.query_id, r.vec_id)] == r.dot
