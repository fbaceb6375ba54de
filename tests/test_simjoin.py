"""TF-IDF cosine similarity join (text/simjoin.py) vs a NumPy-free
pure-Python replay with the same micro-quantization, plus df-cut and
plan shape checks."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from osm_spark.text.simjoin import cosine_sim_join, tfidf_weights

ROWS = [
    (1, "spark shuffle join spark"),
    (2, "spark shuffle join"),
    (3, "parquet scan filter pushdown"),
    (4, "parquet scan filter pushdown"),
    (5, "the the the"),  # after a tight df-cut this doc keeps its vocab
    (6, None),
]


def _python_sims(rows, max_df_ratio):
    docs = {i: t.lower().split(" ") for i, t in rows if t is not None}
    n = len(docs)
    df = {}
    for toks in docs.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    keep = {t for t, d in df.items() if d <= max_df_ratio * n}
    w = {
        i: {
            t: round(toks.count(t) * math.log(n / df[t]) * 1e6)
            for t in set(toks)
            if t in keep
        }
        for i, toks in docs.items()
    }
    sims = {}
    ids = sorted(w)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = w[ids[x]], w[ids[y]]
            dot = sum(v * b[t] for t, v in a.items() if t in b)
            na = sum(v * v for v in a.values())
            nb = sum(v * v for v in b.values())
            if dot and na and nb:
                sims[(ids[x], ids[y])] = round(
                    dot / (math.sqrt(na) * math.sqrt(nb)), 6
                )
    return sims


def _spark_sims(spark, threshold, max_df_ratio):
    df = spark.createDataFrame(ROWS, "doc_id int, text string")
    out = cosine_sim_join(
        df, threshold=threshold, max_df_ratio=max_df_ratio
    )
    return {(r.id_a, r.id_b): r.sim for r in out.collect()}


def test_matches_python_replay(spark):
    got = _spark_sims(spark, threshold=0.0, max_df_ratio=1.0)
    want = {k: v for k, v in _python_sims(ROWS, 1.0).items() if v >= 0.0}
    assert got == want
    assert got[(3, 4)] == 1.0  # identical docs
    assert got[(1, 2)] > 0.9  # near-identical up to one repeat


def test_threshold_filters(spark):
    all_pairs = _spark_sims(spark, threshold=0.0, max_df_ratio=1.0)
    high = _spark_sims(spark, threshold=0.95, max_df_ratio=1.0)
    assert high == {k: v for k, v in all_pairs.items() if v >= 0.95}
    assert len(high) < len(all_pairs)


def test_df_cut_drops_ubiquitous_terms(spark):
    rows = [
        (1, "common alpha"),
        (2, "common beta"),
        (3, "common gamma"),
        (4, "common delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    # 'common' is in 4/4 docs; with the cut it (and hence every pair) drops
    cut = cosine_sim_join(df, threshold=0.0, max_df_ratio=0.9)
    assert cut.count() == 0
    # without the cut, 'common' has idf ln(1) = 0, so dots are all 0 and
    # pairs drop anyway at threshold > 0 — but at threshold 0 the pure
    # zero-dot pairs survive as sim 0.0 only if dot rows exist; weights
    # are zero so norms are 0 and the norm>0 guard removes the docs.
    uncut = cosine_sim_join(df, threshold=0.0, max_df_ratio=1.0)
    assert uncut.where(F.col("sim") > 0).count() == 0


def test_plan_keyed_joins_only(spark):
    df = spark.createDataFrame(ROWS, "doc_id int, text string")
    plan = (
        cosine_sim_join(df, threshold=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # with the weights pinned, the only join subtree left above the
    # checkpoint leaf is the term self-join + two norm attaches — all
    # hash joins; the 1-row n_docs nested-loop attach lives BELOW the
    # checkpoint and must not reappear here
    assert "BroadcastNestedLoopJoin" not in plan


def test_weights_table_shape(spark):
    df = spark.createDataFrame(ROWS, "doc_id int, text string")
    w = tfidf_weights(df, max_df_ratio=1.0)
    assert w.columns == ["doc_id", "term", "wq"]
    assert w.where(F.col("doc_id") == 6).count() == 0  # null text dropped
