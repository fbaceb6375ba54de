"""Text-processing layer: dedup (exact / MinHash-LSH / SimHash / n-gram
Jaccard), language-ID, quality scoring, token counting, fingerprinting,
sequence packing, deterministic sampling, PII redaction and benchmark
decontamination.

All hot-path logic is pure Column expressions (JVM-side, whole-stage
codegen); the only pandas UDF is the 64-bit SimHash fast path.
"""

from osm_spark.text.dedup import (
    exact_dedup,
    minhash_signatures,
    lsh_bands,
    lsh_candidate_pairs,
    jaccard_pairs,
    simhash16,
    simhash64,
    word_ngrams,
)
from osm_spark.text.analysis import (
    language_id,
    quality_features,
    repetition_stats,
    token_count_subword,
    fingerprint,
)
from osm_spark.text.decontam import benchmark_gram_keys, decontaminate
from osm_spark.text.drift import corpus_drift
from osm_spark.text.dsir import dsir_sample, dsir_weights, hashed_gram_counts
from osm_spark.text.packing import global_cumsum, pack_sequences
from osm_spark.text.redact import redact_pii
from osm_spark.text.sampling import (
    hash_sample,
    mixture_sample,
    quota_sample,
    split_assign,
)
from osm_spark.text.ngrams import ngram_counts
from osm_spark.text.ranking import bm25_scores
from osm_spark.text.sharding import shard_assign
from osm_spark.text.winnow import winnow_fingerprints

__all__ = [
    "ngram_counts",
    "bm25_scores",
    "shard_assign",
    "winnow_fingerprints",
    "exact_dedup",
    "minhash_signatures",
    "lsh_bands",
    "lsh_candidate_pairs",
    "jaccard_pairs",
    "simhash16",
    "simhash64",
    "word_ngrams",
    "language_id",
    "quality_features",
    "repetition_stats",
    "token_count_subword",
    "fingerprint",
    "benchmark_gram_keys",
    "decontaminate",
    "dsir_weights",
    "dsir_sample",
    "hashed_gram_counts",
    "corpus_drift",
    "global_cumsum",
    "pack_sequences",
    "redact_pii",
    "hash_sample",
    "mixture_sample",
    "split_assign",
    "quota_sample",
]
