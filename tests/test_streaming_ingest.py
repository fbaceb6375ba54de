"""Streaming corpus admission (streaming/ingest.py): stream ≡ batch on
one epoch, sequential-admission semantics across epochs (growth
visible to later batches), and replay idempotence of the epoch-keyed
sinks."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from osm_spark.pipeline.corpus import corpus_ingest
from osm_spark.streaming.ingest import (
    corpus_ingest_stream,
    read_corpus_with_growth,
    stream_docs,
)

RULES = [("a.com", "/", True), ("a.com", "/private", False)]

CORPUS = [
    (1, "http://a.com/x", "the quick brown fox jumps over the lazy dog"),
    (2, "http://a.com/y", "a stitch in time saves nine they say of the old work"),
]

# epoch-1 drop: the corpus_ingest unit-test set (one acceptance: 104)
BATCH1 = [
    (101, "s1", "fresh words entirely novel content here", "http://a.com/x"),
    (102, "s1", "a stitch in time saves nine they say of the old work", "http://a.com/n1"),
    (103, "s1", "the quick brown fox jumps over the lazy dog", "http://a.com/n2"),
    (104, "s1", "completely original sentence with unique vocabulary tokens", "http://a.com/n3"),
    (105, "s1", "more original material that would otherwise pass", "http://a.com/private/z"),
]

# epoch-2 drop: each doc probes that epoch-1's ACCEPTED doc (104) has
# joined the standing corpus — rejections only happen if growth is
# visible to the second micro-batch
BATCH2 = [
    # near-dup of doc 104 (accepted in epoch 1) -> incremental rejection
    (201, "s2", "completely original sentence with unique vocabulary tokens", "http://a.com/m1"),
    # URL collides with doc 104's canonical URL -> URL-index rejection
    (202, "s2", "different enough wording to pass every other stage", "http://a.com/n3?utm_source=t"),
    # genuinely new -> accepted
    (203, "s2", "another brand new document with its own words", "http://a.com/m2"),
]

BATCH_SCHEMA = "doc_id long, source string, text string, url string"
KW = dict(quality_min=0.0, lm_min=-99.0, jaccard_threshold=0.9,
          reline_words=None, n_rules=len(RULES))


def _write_drop(spark, rows, drops_dir, name, mtime):
    """One crawl drop = one parquet FILE in the drops dir (the file
    source batches per file at maxFilesPerTrigger=1; mtimes order the
    epochs)."""
    tmp = os.path.join(drops_dir, f"_stage_{name}")
    spark.createDataFrame(rows, BATCH_SCHEMA).coalesce(1).write.parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dst = os.path.join(drops_dir, f"{name}.parquet")
    shutil.move(part, dst)
    shutil.rmtree(tmp)
    os.utime(dst, (mtime, mtime))
    return dst


def _setup(spark, tmp_path, drops):
    base = str(tmp_path)
    drops_dir = os.path.join(base, "drops")
    os.makedirs(drops_dir)
    for k, rows in enumerate(drops):
        _write_drop(spark, rows, drops_dir, f"d{k}", 1_000_000 + 100 * k)
    corpus_path = os.path.join(base, "corpus")
    spark.createDataFrame(
        CORPUS, "doc_id long, canon_url string, text string"
    ).write.parquet(corpus_path)
    rules = spark.createDataFrame(
        RULES, "host string, prefix string, allow boolean"
    )
    return drops_dir, corpus_path, rules, base


def _run_stream(spark, drops_dir, corpus_path, rules, base,
                max_files=1, ckpt="ckpt"):
    q = corpus_ingest_stream(
        stream_docs(spark, drops_dir, schema=BATCH_SCHEMA,
                    max_files_per_trigger=max_files),
        corpus_path,
        rules,
        os.path.join(base, "accepted"),
        os.path.join(base, ckpt),
        growth_path=os.path.join(base, "growth"),
        **KW,
    )
    q.awaitTermination()
    return spark.read.parquet(os.path.join(base, "accepted"))


def test_single_epoch_equals_batch(spark, tmp_path):
    drops_dir, corpus_path, rules, base = _setup(spark, tmp_path, [BATCH1])
    got = _run_stream(
        spark, drops_dir, corpus_path, rules, base, max_files=8
    ).drop("epoch")
    want = corpus_ingest(
        spark.read.parquet(corpus_path),
        spark.createDataFrame(BATCH1, BATCH_SCHEMA),
        rules,
        **KW,
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_growth_visible_to_later_epochs(spark, tmp_path):
    drops_dir, corpus_path, rules, base = _setup(
        spark, tmp_path, [BATCH1, BATCH2]
    )
    got = _run_stream(spark, drops_dir, corpus_path, rules, base)
    by_epoch = {
        int(r.epoch): set()
        for r in got.select("epoch").distinct().collect()
    }
    for r in got.collect():
        by_epoch[int(r.epoch)].add(r.doc_id)
    assert by_epoch == {0: {104}, 1: {203}}
    # the standing corpus a THIRD batch would see: base ∪ both epochs
    grown = read_corpus_with_growth(
        spark, corpus_path, os.path.join(base, "growth")
    )
    assert {r.doc_id for r in grown.collect()} == {1, 2, 104, 203}
    # growth rows carry the admitted clean text verbatim
    # (reline_words=None: line-exact extension)
    txt = {r.doc_id: r.text for r in grown.collect()}
    assert txt[104] == "completely original sentence with unique vocabulary tokens"


def test_replay_is_idempotent(spark, tmp_path):
    """A fresh checkpoint re-processes every drop with the same epoch
    numbering; the epoch-keyed overwrite leaves the sinks byte-stable
    instead of duplicating rows (the foreachBatch at-least-once
    contract)."""
    drops_dir, corpus_path, rules, base = _setup(
        spark, tmp_path, [BATCH1, BATCH2]
    )
    first = sorted(
        map(tuple,
            _run_stream(spark, drops_dir, corpus_path, rules, base)
            .collect())
    )
    second = sorted(
        map(tuple,
            _run_stream(spark, drops_dir, corpus_path, rules, base,
                        ckpt="ckpt2")
            .collect())
    )
    assert first == second
