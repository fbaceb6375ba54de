"""Tests for the viewport (bbox + geohash-prefix prune) query and BM25
relevance scoring."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from osm_spark.geo.geohash import cover_bbox, geohash_expr, viewport_filter
from osm_spark.text.ranking import bm25_scores


# ---------------------------------------------------------------- viewport


def test_cover_bbox_superset(spark):
    rng = np.random.RandomState(5)
    bbox = (51.48, 51.53, -0.15, -0.10)
    cells = set(cover_bbox(*bbox, precision=5))
    lats = rng.uniform(bbox[0], bbox[1], 300)
    lons = rng.uniform(bbox[2], bbox[3], 300)
    df = spark.createDataFrame(
        [(float(la), float(lo)) for la, lo in zip(lats, lons)],
        "lat double, lon double",
    )
    got = {r.g for r in df.select(geohash_expr("lat", "lon", 5).alias("g")).collect()}
    assert got <= cells  # every point's cell is in the covering


def test_cover_bbox_validation():
    with pytest.raises(ValueError):
        cover_bbox(10, 5, 0, 1, 4)  # corners out of order
    with pytest.raises(ValueError):
        cover_bbox(-80, 80, -170, 170, 7, max_cells=100)  # continent at res 7


def test_viewport_filter_prune_equals_plain(spark):
    rng = np.random.RandomState(9)
    pts = [(i, float(la), float(lo)) for i, (la, lo) in enumerate(
        zip(rng.uniform(51.3, 51.7, 500), rng.uniform(-0.4, 0.2, 500)))]
    df = spark.createDataFrame(pts, "pid long, lat double, lon double")
    df = df.withColumn("gh4", geohash_expr("lat", "lon", 4))
    bbox = dict(min_lat=51.45, max_lat=51.55, min_lon=-0.2, max_lon=-0.05)
    plain = {r.pid for r in viewport_filter(df, **bbox).collect()}
    pruned = {r.pid for r in viewport_filter(
        df, **bbox, gh_col="gh4", gh_precision=4).collect()}
    assert plain == pruned and len(plain) > 0
    # finer column via substring path
    df6 = df.withColumn("gh6", geohash_expr("lat", "lon", 6))
    sub = {r.pid for r in viewport_filter(
        df6, **bbox, gh_col="gh6", precision=4, gh_precision=6).collect()}
    assert sub == plain
    with pytest.raises(ValueError):
        viewport_filter(df, **bbox, gh_col="gh4", precision=6, gh_precision=4)
    with pytest.raises(ValueError):  # gh_precision required with gh_col
        viewport_filter(df, **bbox, gh_col="gh4")


def test_viewport_partition_pruning_plan(spark, tmp_path):
    """Laid out by gh4, the viewport prune must reach PartitionFilters —
    the plan-level proof the 10^12-row scan touches only covering dirs."""
    from osm_spark.pipeline.sinks import write_partitioned

    rng = np.random.RandomState(3)
    pts = [(i, float(la), float(lo)) for i, (la, lo) in enumerate(
        zip(rng.uniform(51.3, 51.7, 400), rng.uniform(-0.4, 0.2, 400)))]
    df = spark.createDataFrame(pts, "pid long, lat double, lon double")
    df = df.withColumn("gh4", geohash_expr("lat", "lon", 4))
    path = str(tmp_path / "by_gh4")
    write_partitioned(df, path, ["gh4"])
    table = spark.read.parquet(path)
    out = viewport_filter(
        table, 51.45, 51.55, -0.2, -0.05, gh_col="gh4", precision=4,
        gh_precision=4,
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "gh4" in pf and "IN" in pf.upper()
    # and semantics unchanged vs the unpartitioned plain filter
    want = {r.pid for r in viewport_filter(df, 51.45, 51.55, -0.2, -0.05).collect()}
    assert {r.pid for r in out.collect()} == want


# ------------------------------------------------------------------- bm25


def _bm25_ref(docs: dict[int, str], terms: list[str], k1=1.2, b=0.75):
    toks = {d: t.lower().split(" ") for d, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    tset = {t.lower() for t in terms}
    df = {t: sum(1 for tk in toks.values() if t in tk) for t in tset}
    out = {}
    for d, tk in toks.items():
        micro = 0
        hits = 0
        for t in tset:
            tf = tk.count(t)
            if tf == 0:
                continue
            hits += 1
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s = idf * (tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(tk) / avgdl)))
            micro += int(round(s * 1e6))
        if hits:
            out[d] = (hits, micro)
    return out


def test_bm25_matches_reference(spark):
    docs = {
        1: "the quick brown fox",
        2: "quick quick fox",
        3: "lazy dog sleeps",
        4: "fox fox fox fox quick",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_hit_terms, r.score_micro)
        for r in bm25_scores(df, ["quick", "fox"]).collect()
    }
    want = _bm25_ref(docs, ["quick", "fox"])
    assert got == want
    assert 3 not in got  # no hits → no row


def test_bm25_rare_term_outranks_common(spark):
    rows = [(i, "common filler words here") for i in range(20)]
    rows.append((100, "common rareword here"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.score for r in bm25_scores(df, ["rareword", "common"]).collect()}
    assert out[100] == max(out.values())  # rare term dominates


def test_bm25_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_scores(df, [])
