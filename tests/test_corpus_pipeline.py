"""Composed end-to-end corpus pipeline (pipeline/corpus.py): stage
coupling, schema contract, determinism, and stage-semantics spot
checks on a hand-built corpus (r4 verdict ask #1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_spark.pipeline.corpus import corpus_pipeline

# A corpus where every stage has something to do:
#  - docs 1/2 share a canonical URL (tracking param) — keep-best picks 2
#    (longer text)
#  - doc 3 is robots-denied (host a.com path /private)
#  - doc 4 fails the quality cut (all digits)
#  - docs 5/6 are exact near-dups (cluster -> keeper 5)
#  - doc 7 duplicates doc 5's lines exactly -> line-dedup empties it
DOCS = [
    (1, "s1", "the quick brown fox jumps over the lazy dog", "http://a.com/x?utm_source=t"),
    (2, "s1", "the quick brown fox jumps over the lazy dog again and again today", "http://a.com/x"),
    (3, "s1", "the quick brown fox runs to the old mill road", "http://a.com/private/p"),
    (4, "s2", "1 2 3 4 5 6 7 8 9 10 11 12", "http://b.com/n"),
    (5, "s2", "a stitch in time saves nine they say of the old work", "http://b.com/y"),
    (6, "s2", "a stitch in time saves nine they say of the old work", "http://b.com/z"),
    (7, "s2", "a stitch in time saves nine they say", "http://b.com/w"),
]
RULES = [("a.com", "/", True), ("a.com", "/private", False)]


def _run(spark, docs=DOCS, **kw):
    d = spark.createDataFrame(
        docs, "doc_id long, source string, text string, url string"
    )
    r = spark.createDataFrame(RULES, "host string, prefix string, allow boolean")
    args = dict(
        quality_min=0.0,
        lm_min=-99.0,
        jaccard_threshold=0.9,
        quota_n=10,
        pack_budget=8,
        n_rules=len(RULES),
    )
    args.update(kw)
    return corpus_pipeline(d, r, **args)


def test_stage_semantics_compose(spark):
    rows = {r.doc_id: r for r in _run(spark).collect()}
    # doc 1 lost the URL dedup to doc 2 (longer), doc 3 robots-denied,
    # doc 6 lost the near-dup election to 5, doc 7 line-deduped empty
    assert set(rows) == {2, 4, 5}
    assert rows[2].canon_url == "http://a.com/x"
    # packing is an exact global prefix sum in doc_id order
    assert rows[2].pack_id == 0 and rows[2].pack_offset == 0
    total = 0
    for did in sorted(rows):
        assert rows[did].cum_tokens == total + rows[did].n_tok
        total += rows[did].n_tok
    # line structure survives byte-exactly (8-word windows, \n-joined)
    assert rows[5].clean_text == "a stitch in time saves nine they say\nof the old work"


def test_quality_cut_composes(spark):
    ids = {r.doc_id for r in _run(spark, quality_min=0.5).collect()}
    assert 4 not in ids  # the all-digit doc dies at the quality stage
    assert 2 in ids and 5 in ids


def test_schema_contract(spark):
    out = _run(spark)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "source", "canon_url", "clean_text", "rk",
        "n_tok", "cum_tokens", "pack_id", "pack_offset",
    ]
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert types["rk"] == "int" and types["pack_id"] == "bigint"


def test_corpus_ingest_semantics(spark):
    """Ingest admission: URL-index rejection, corpus-priority line
    dedup, near-dup rejection against the standing corpus, and
    OOV-floor LM scoring — each branch exercised by one batch doc."""
    from osm_spark.pipeline.corpus import corpus_ingest

    corpus = spark.createDataFrame(
        [
            (1, "http://a.com/x", "the quick brown fox jumps over the lazy dog"),
            (2, "http://a.com/y", "a stitch in time saves nine they say of the old work"),
        ],
        "doc_id long, canon_url string, text string",
    )
    batch = spark.createDataFrame(
        [
            # URL collides with corpus -> rejected at the URL index
            (101, "s1", "fresh words entirely novel content here", "http://a.com/x"),
            # near-dup of corpus doc 2 -> rejected by the incremental pass
            (102, "s1", "a stitch in time saves nine they say of the old work", "http://a.com/n1"),
            # every line already in corpus doc 1 -> line-dedup empties it
            (103, "s1", "the quick brown fox jumps over the lazy dog", "http://a.com/n2"),
            # genuinely new -> accepted
            (104, "s1", "completely original sentence with unique vocabulary tokens", "http://a.com/n3"),
            # robots-denied path
            (105, "s1", "more original material that would otherwise pass", "http://a.com/private/z"),
        ],
        "doc_id long, source string, text string, url string",
    )
    rules = spark.createDataFrame(RULES, "host string, prefix string, allow boolean")
    out = corpus_ingest(
        corpus, batch, rules,
        quality_min=0.0, lm_min=-99.0, jaccard_threshold=0.9,
        n_rules=len(RULES),
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {104}
    assert rows[104].clean_text.startswith("completely original")
    assert rows[104].n_tok == 7


def test_lm_score_against_oov_floor(spark):
    """OOV words take the Laplace floor (left join + coalesce) instead
    of vanishing: a doc of unseen words scores exactly
    ln(1/(total+V)) per token."""
    import math

    from osm_spark.text.lm import lm_score_against

    model = spark.createDataFrame(
        [(1, "a a b")], "doc_id long, text string"
    )  # total=3, V=2
    docs = spark.createDataFrame(
        [(10, "zz zz"), (11, "a b")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in lm_score_against(model, docs).collect()}
    floor = round(math.log(1.0 / 5.0) * 1e6)
    assert got[10].sum_logp_micro == 2 * floor
    a_lw = round(math.log(3.0 / 5.0) * 1e6)  # c=2 -> (2+1)/5
    b_lw = round(math.log(2.0 / 5.0) * 1e6)  # c=1 -> (1+1)/5
    assert got[11].sum_logp_micro == a_lw + b_lw


def test_keep_best_is_combiner_aggregate_not_window(spark):
    """Stage 1's keep-best election must be a max_by AGGREGATE (map-side
    combined — a hot canonical URL shuffles ≤ #mappers pre-winners), not
    a row_number window that would funnel every duplicate's text payload
    into one task; and the aggregate must preserve the window form's
    semantics: longest text wins, ties to min doc_id."""
    from osm_spark.pipeline.corpus import _canonical_keep_best

    d = spark.createDataFrame(
        [
            (1, "s", "aaaa", "http://a.com/x?utm_source=t"),
            (2, "s", "bbbb", "http://a.com/x"),  # same length: tie -> 1
            (3, "s", "ccccc", "http://b.com/y"),
            (4, "s", "dd", "http://b.com/y"),  # shorter: 3 wins
        ],
        "doc_id long, source string, text string, url string",
    )
    out = _canonical_keep_best(d, "url")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_max_by" in plan  # map-side combine present
    got = {r.canon_url: r.doc_id for r in out.collect()}
    assert got == {"http://a.com/x": 1, "http://b.com/y": 3}


def test_plan_no_cartesian_no_sortmerge(spark):
    """The composed plan must stay inside the engine's join discipline:
    no CartesianProduct anywhere, and no SortMergeJoin (every stage
    join is broadcast or shuffle_hash-hinted — a statless-aggregate SMJ
    would sort the corpus side)."""
    out = _run(spark)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_partitioning_invariant(spark):
    d = spark.createDataFrame(
        DOCS, "doc_id long, source string, text string, url string"
    )
    r = spark.createDataFrame(RULES, "host string, prefix string, allow boolean")
    kw = dict(quality_min=0.0, lm_min=-99.0, jaccard_threshold=0.9,
              quota_n=10, pack_budget=8, n_rules=len(RULES))
    a = sorted(map(tuple, corpus_pipeline(d, r, **kw).collect()))
    b = sorted(map(tuple, corpus_pipeline(d.repartition(5), r, **kw).collect()))
    assert a == b
