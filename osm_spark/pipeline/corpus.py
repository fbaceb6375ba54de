"""End-to-end LLM training-corpus pipeline — the composed form of the
engine's individually-gated corpus stages (r4 verdict ask #1: "the
100 TB job IS this composition").

Stage chain (each stage is an existing gated operator; this module
attests that their schemas, dtypes and semantics COMPOSE):

1. URL canonicalization (functions/urls.py ``canonical_url``) +
   keep-best-per-URL crawl dedup (longest text, tie min doc_id).
2. Robots-rule filtering (pipeline/robots.py ``apply_url_rules``) on
   the canonical URL — longest-prefix, allow-wins ties, default allow.
3. Quality filter (text/analysis.py ``quality_features``): composite
   score ≥ ``quality_min`` (compared on the rounded output column, so
   the cut replays exactly in SQL).
4. LM fluency filter (text/lm.py ``lm_score``): the unigram model is
   trained on THIS stage's survivors — filter composition changes the
   model, which is exactly the coupling the end-to-end gate pins.
5. Corpus-global line dedup (text/lines.py ``line_dedup``), CCNet
   keep-first; documents whose every line was seen earlier drop.
   The synthetic corpus is single-line, so ``reline_words`` re-chunks
   text into fixed-word lines first (None to skip for real multi-line
   text).
6. MinHash→LSH→exact-Jaccard near-dup clustering (text/dedup.py) over
   the line-deduped text + keeper election (graph/components.py
   ``dedup_clusters``, min-doc_id keeper); non-keepers drop.
7. Per-source quota sampling (text/sampling.py ``quota_sample``) —
   deterministic salted-digest rank.
8. Sequence packing (text/packing.py ``pack_sequences``) — exact
   global token prefix sum over the final survivors.

Scale shape: stages 1–5 are row-local or single-key-shuffle ops over
the full corpus and run BEFORE the near-dup machinery, so the heavy
banding/refine work sees only the filtered survivor set; the near-dup
stage is the gated LSH plan (no O(n²) axis); packing's prefix sum is
the bucketed two-phase form (no single-partition window). Nothing
here collects unbounded data to the driver.

Output: one row per packed document — (doc_id, source, canon_url,
clean_text, rk, n_tok, cum_tokens, pack_id, pack_offset). clean_text
is the byte-exact line-deduped text (newline-separated), the
value-hash column that makes the end-to-end gate byte-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.functions.urls import canonical_url
from osm_spark.graph.components import dedup_clusters
from osm_spark.pipeline.robots import apply_url_rules
from osm_spark.text.analysis import quality_features
from osm_spark.text.dedup import (
    jaccard_pairs,
    lsh_bands_from_array,
    lsh_candidate_pairs,
    lsh_tune,
    minhash_array,
)
from osm_spark.text.lines import line_dedup
from osm_spark.text.lm import lm_score
from osm_spark.text.packing import pack_sequences
from osm_spark.text.sampling import quota_sample

__all__ = [
    "RELINE_WORDS_DEFAULT",
    "corpus_ingest",
    "corpus_pipeline",
    "release_stage_caches",
    "reline",
]

# The single source of truth for the synthetic-corpus re-lining width.
# corpus_pipeline, corpus_ingest AND the streaming admission's
# growth-sink flatten decision (streaming/ingest.py) all read this —
# a second literal in any of them could silently desync the line
# representation the admission chain dedups in from the one the
# standing corpus grows in.
RELINE_WORDS_DEFAULT: int | None = 8

# Stage-boundary persists registered per corpus_pipeline/corpus_ingest
# build. A one-shot batch job never needs to care (the caches die with
# the session), but LOOPING callers — the streaming admission's
# per-epoch corpus_ingest, bench sweeps — would accumulate 2-3 cached
# tables per iteration with no handle to release them; they call
# release_stage_caches() after materializing each iteration's output.
_STAGE_CACHES: list[DataFrame] = []


def _stage_persist(df: DataFrame) -> DataFrame:
    cached = df.persist()
    _STAGE_CACHES.append(cached)
    return cached


def release_stage_caches() -> int:
    """Unpersist every stage cache registered since the last release;
    returns how many were dropped. Safe to call while a returned
    pipeline frame is still live — Spark just recomputes through the
    boundary on the next action."""
    n = len(_STAGE_CACHES)
    for df in _STAGE_CACHES:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    _STAGE_CACHES.clear()
    return n


def reline(text, words: int):
    """Re-chunk a single-line text Column into ``words``-word lines
    (newline-joined) — the same windowing the line_dedup gate uses for
    the synthetic single-line corpus."""
    ws = F.split(text, " ")
    n_lines = F.greatest(
        F.lit(1), F.ceil(F.size(ws) / F.lit(words))
    ).cast("int")
    return F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.array_join(F.slice(ws, i * words + 1, words), " "),
        ),
        "\n",
    )


def _canonical_keep_best(docs: DataFrame, url_col: str) -> DataFrame:
    """Stage 1 (shared by the batch pipeline and ingest admission):
    canonicalize the URL and keep the best version per canonical slot —
    longest text, ties to min doc_id. One implementation so a tie-break
    change can never make the two paths diverge.

    The election is a ``max_by`` aggregate, NOT a row_number window: a
    hot canonical URL (a crawl re-fetches popular pages millions of
    times) would funnel every duplicate — multi-KB text payload
    included — into ONE window task, while the aggregate's map-side
    combine pre-reduces each map partition to a single surviving row
    per key, so the exchange carries ≤ #mappers rows for the hottest
    key. The ordering struct (n_chars, -doc_id) is total (ids unique),
    so the winner is deterministic and identical to the window form."""
    d = docs.select(
        "doc_id", "source", "text", F.col(url_col).alias("_url")
    )
    d = d.withColumn("canon_url", canonical_url("_url")).drop("_url")
    return d.groupBy("canon_url").agg(
        F.max_by(
            F.struct("doc_id", "source", "text"),
            F.struct(
                F.length("text").cast("long").alias("n_chars"),
                (-F.col("doc_id")).alias("neg_id"),
            ),
        ).alias("_w")
    ).select(
        F.col("_w.doc_id").alias("doc_id"),
        F.col("_w.source").alias("source"),
        F.col("_w.text").alias("text"),
        "canon_url",
    )


def _robots_cut(
    d: DataFrame, rules: DataFrame, n_rules: int | None
) -> DataFrame:
    """Robots stage (shared): the policy is decided over the skinny
    (doc_id, canon_url) projection and semi-joined back — the
    longest-match aggregate groups by its input columns, and the
    multi-KB text payload must never ride a grouping key through the
    rule-match exchange."""
    allowed = (
        apply_url_rules(
            d.select("doc_id", "canon_url"),
            rules,
            url_col="canon_url",
            n_rules=n_rules,
        )
        .where(F.col("allowed"))
        .select("doc_id")
    )
    return d.join(allowed.hint("shuffle_hash"), "doc_id", "left_semi")


def _quality_cut(d: DataFrame, quality_min: float) -> DataFrame:
    """Quality stage (shared): composite score ≥ ``quality_min`` on the
    rounded output column (SQL-exact), semi-joined on doc_id."""
    qf = quality_features(d.select("doc_id", "text"))
    return d.join(
        qf.where(F.col("quality_score") >= F.lit(float(quality_min)))
        .select("doc_id")
        .hint("shuffle_hash"),
        "doc_id",
        "left_semi",
    )


def corpus_pipeline(
    docs: DataFrame,
    rules: DataFrame,
    *,
    url_col: str = "url",
    quality_min: float = 0.5,
    lm_min: float = -3.405,
    reline_words: int | None = RELINE_WORDS_DEFAULT,
    jaccard_threshold: float = 0.8,
    num_hashes: int = 32,
    quota_n: int = 20,
    pack_budget: int = 256,
    salt: str = "cp",
    n_rules: int | None = None,
) -> DataFrame:
    """Run the full corpus pipeline. ``docs``: (doc_id, source, text,
    ``url_col``); ``rules``: (host, prefix, allow). See module
    docstring for the stage chain and output schema."""
    # 1. canonicalize + keep best version per canonical URL
    d = _canonical_keep_best(docs, url_col)

    # 2. robots policy on the canonical URL (shared skinny-projection
    # form — see _robots_cut)
    d = _robots_cut(d, rules, n_rules)
    # Stage boundary: the survivor set feeds THREE downstream consumers
    # (quality join, LM vocab aggregate + score join) — without a
    # materialization barrier the whole upstream chain recomputes per
    # consumer (measured 60-90 s vs ~7 s single-pass at sf0.01). In
    # production this boundary is an Iceberg stage table (lineage.py);
    # in-session, persist is its exact analog (registered — looping
    # callers release via release_stage_caches()).
    d = _stage_persist(d)

    # 3. quality cut (shared — see _quality_cut)
    d = _quality_cut(d, quality_min)

    # 4. LM fluency cut — model trained on stage-3 survivors.
    # vocab_join pinned to shuffle: a web-corpus unigram vocabulary is
    # far past any broadcast ceiling (the scale-correct path), and the
    # explicit choice keeps the auto-probe's count job out of the
    # pipeline's build (it would materialize the chain driver-side
    # before the single end-to-end action).
    lm = lm_score(d.select("doc_id", "text"), vocab_join="shuffle")
    d = d.join(
        lm.where(F.col("mean_logp") >= F.lit(float(lm_min)))
        .select("doc_id")
        .hint("shuffle_hash"),
        "doc_id",
        "left_semi",
    )

    # 5. corpus-global keep-first line dedup
    lined = (
        d.withColumn("text", reline(F.col("text"), reline_words))
        if reline_words
        else d
    )
    ld = line_dedup(lined.select("doc_id", "text"))
    d = d.drop("text").join(
        ld.where(F.col("n_kept") > 0)
        .select("doc_id", "clean_text")
        .hint("shuffle_hash"),
        "doc_id",
    )
    # newline → space for token-level downstream stages; clean_text
    # keeps the line structure for the byte-exact output column
    d = d.withColumn("flat_text", F.translate("clean_text", "\n", " "))
    # Stage boundary again: this table feeds minhash banding, the
    # Jaccard token-array attach (twice), the keeper join, the quota
    # window and the packing prefix sum — the widest fan-out in the
    # pipeline.
    d = _stage_persist(d)

    # 6. near-dup clusters over the deduped text; keep min-id keepers
    dd = d.select("doc_id", F.col("flat_text").alias("text"))
    # the wide signature row is the natural persist unit (see
    # minhash_array docstring): banding AND the refine's agreement
    # prune both read it
    sigs = _stage_persist(minhash_array(dd, num_hashes))
    pairs = lsh_candidate_pairs(
        lsh_bands_from_array(
            sigs, lsh_tune(num_hashes, jaccard_threshold), num_hashes
        )
    )
    jp = jaccard_pairs(
        dd, pairs, threshold=jaccard_threshold, signatures=sigs
    )
    clusters = dedup_clusters(dd, jp, a="doc_a", b="doc_b")
    d = d.join(
        clusters.where(F.col("is_keeper")).select("doc_id").hint("shuffle_hash"),
        "doc_id",
        "left_semi",
    )

    # 7. per-source quota
    d = quota_sample(d, "source", quota_n, "doc_id", salt=salt)

    # 8. pack the final survivors' token stream
    packed = pack_sequences(
        d.select("doc_id", F.col("flat_text").alias("text")), pack_budget
    )
    return d.join(packed.hint("shuffle_hash"), "doc_id").select(
        "doc_id",
        "source",
        "canon_url",
        "clean_text",
        "rk",
        "n_tok",
        "cum_tokens",
        "pack_id",
        "pack_offset",
    )


def corpus_ingest(
    corpus: DataFrame,
    batch: DataFrame,
    rules: DataFrame,
    *,
    url_col: str = "url",
    quality_min: float = 0.5,
    lm_min: float = -3.405,
    reline_words: int | None = RELINE_WORDS_DEFAULT,
    jaccard_threshold: float = 0.8,
    num_hashes: int = 32,
    n_rules: int | None = None,
) -> DataFrame:
    """Continuous-ingestion form of ``corpus_pipeline``: admit an
    incoming crawl ``batch`` against a STANDING ``corpus`` without ever
    re-pairing corpus × corpus (the daily-drop production shape).

    ``corpus``: already-accepted docs (doc_id, canon_url, text);
    ``batch``: candidate docs (doc_id, source, text, ``url_col``).
    Batch doc_ids must all be distinct from corpus ids; the corpus-
    priority line dedup additionally assumes ingest reality — the
    standing corpus's (doc_id, line_no) keys order BEFORE the batch's
    (new ids are allocated after old ones), so the global keep-first
    election automatically prefers corpus lines.

    Stages (each the batch-vs-index form of the batch pipeline's
    stage):

    1. canonicalize + keep-best WITHIN the batch;
    2. drop batch docs whose canonical URL already exists in the corpus
       (anti join against the corpus URL index);
    3. robots filter (same rule table as the batch pipeline);
    4. quality cut (row-local, batch only);
    5. LM cut — scored against the STANDING corpus's model
       (``lm_score_against``: OOV words take the Laplace floor), never
       retrained per batch;
    6. corpus-priority line dedup: one ``line_dedup`` over corpus ∪
       batch (production: the stored line-digest index), batch rows
       kept — a batch line survives only if unseen in the corpus AND
       not earlier in the batch;
    7. incremental near-dup rejection: ``incremental_near_dups`` pairs
       the batch against the corpus index + itself (corpus × corpus is
       never paired; candidate volume scales with the batch); any batch
       doc with a qualifying pair is REJECTED (the standing/earlier doc
       is the keeper by construction).

    Output: the ACCEPTED batch docs — (doc_id, source, canon_url,
    clean_text, n_tok). Packing is deliberately absent: appending to
    the corpus's running token stream is the writer's job (merge.py),
    not the admission filter's.
    """
    from osm_spark.text.dedup import incremental_near_dups
    from osm_spark.text.lm import lm_score_against

    # 1. canonicalize + keep best within the batch (shared stage)
    b = _canonical_keep_best(batch, url_col)

    # 2. URL-level incremental dedup: the corpus URL index wins
    b = b.join(
        corpus.select("canon_url").hint("shuffle_hash"),
        "canon_url",
        "left_anti",
    )

    # 3. robots (shared skinny-projection form — see _robots_cut)
    b = _robots_cut(b, rules, n_rules)
    b = _stage_persist(b)  # stage boundary (same rationale as corpus_pipeline)

    # 4. quality cut (shared — see _quality_cut)
    b = _quality_cut(b, quality_min)

    # 5. LM cut against the standing corpus's model
    lm = lm_score_against(
        corpus.select("doc_id", "text"), b.select("doc_id", "text")
    )
    b = b.join(
        lm.where(F.col("mean_logp") >= F.lit(float(lm_min)))
        .select("doc_id")
        .hint("shuffle_hash"),
        "doc_id",
        "left_semi",
    )

    # 6. corpus-priority line dedup over corpus ∪ batch
    def _lined(df):
        return (
            df.withColumn("text", reline(F.col("text"), reline_words))
            if reline_words
            else df
        )

    union = _lined(corpus.select("doc_id", "text")).unionByName(
        _lined(b.select("doc_id", "text"))
    )
    # Stage boundary: this corpus-wide aggregate — the heaviest stage of
    # an ingest epoch, and the one that GROWS with the standing corpus —
    # feeds TWO consumers (the batch clean_text join and corpus_clean
    # for the near-dup index); without the barrier it computes twice per
    # epoch.
    ld = _stage_persist(line_dedup(union))
    b = b.drop("text").join(
        ld.where(F.col("n_kept") > 0)
        .select("doc_id", "clean_text")
        .hint("shuffle_hash"),
        "doc_id",
    )
    b = _stage_persist(
        b.withColumn("flat_text", F.translate("clean_text", "\n", " "))
    )

    # corpus clean text for the near-dup index comes from the SAME
    # line-dedup pass (production: the stored clean corpus)
    corpus_clean = (
        ld.join(
            corpus.select("doc_id").hint("shuffle_hash"),
            "doc_id",
            "left_semi",
        )
        .where(F.col("n_kept") > 0)
        .select(
            "doc_id",
            F.translate("clean_text", "\n", " ").alias("text"),
        )
    )

    # 7. incremental near-dup rejection
    nd = incremental_near_dups(
        corpus_clean,
        b.select("doc_id", F.col("flat_text").alias("text")),
        num_hashes=num_hashes,
        threshold=jaccard_threshold,
    )
    b = b.join(
        nd.select(F.col("doc_b").alias("doc_id")).hint("shuffle_hash"),
        "doc_id",
        "left_anti",
    )

    return b.select(
        "doc_id",
        "source",
        "canon_url",
        "clean_text",
        F.size(F.split("flat_text", " ")).cast("long").alias("n_tok"),
    )
