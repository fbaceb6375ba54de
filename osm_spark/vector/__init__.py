"""Embedding similarity layer: brute-force cosine top-k, hyperplane-LSH
bucketing, LSH-accelerated ANN, and embedding-cosine near-dup."""

from osm_spark.vector.similarity import (
    cosine,
    cosine_topk,
    hyperplane_buckets,
    ann_lsh_topk,
    embedding_near_dups,
)
from osm_spark.vector.semdedup import semantic_dedup, seed_pick

__all__ = [
    "cosine",
    "cosine_topk",
    "hyperplane_buckets",
    "ann_lsh_topk",
    "embedding_near_dups",
    "semantic_dedup",
    "seed_pick",
]
