"""Zipf fit (osm_spark/text/zipf.py): rank construction without a
global window, quantized-OLS replay, and a synthetic power law."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from osm_spark.text.zipf import LOG_SCALE, OUT_SCALE, zipf_fit, zipf_ranks


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_zipf_ranks_ordering_and_cutoff(spark):
    # freqs: the=6, a=4, b=4, c=1  (c cut by min_freq=2)
    texts = ["the a b the A B", "THE the a b the the a b"]
    got = {
        r.word: (r.freq, r.rank)
        for r in zipf_ranks(_docs(spark, texts + ["c"]), min_freq=2).collect()
    }
    assert got == {"the": (6, 1), "a": (4, 2), "b": (4, 3)}


def test_zipf_fit_matches_python_replay(spark):
    # deterministic corpus: word w_i appears ~ N/i times (true Zipf s=1)
    words = []
    n = 400
    for i in range(1, 40):
        words += [f"w{i:02d}"] * (n // i)
    texts = [" ".join(words[j::7]) for j in range(7)]
    row = zipf_fit(_docs(spark, texts), min_freq=5).collect()[0]

    # python replay with the same quantization
    freq: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                freq[w] = freq.get(w, 0) + 1
    vocab = sorted(
        ((f, w) for w, f in freq.items() if f >= 5),
        key=lambda p: (-p[0], p[1]),
    )
    xs = [
        math.floor(math.log(r + 1) * LOG_SCALE + 0.5)
        for r in range(len(vocab))
    ]
    ys = [math.floor(math.log(f) * LOG_SCALE + 0.5) for f, _ in vocab]
    nn = float(len(xs))
    sx, sy = float(sum(xs)), float(sum(ys))
    sxy = float(sum(x * y for x, y in zip(xs, ys)))
    sxx = float(sum(x * x for x in xs))
    slope = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    intercept = (sy - slope * sx) / nn / LOG_SCALE
    assert row.n_types == len(vocab)
    assert row.slope_nano == math.floor(OUT_SCALE * slope)
    assert row.intercept_nano == math.floor(OUT_SCALE * intercept)
    # a true 1/i corpus fits near s = -1
    assert -1.35e9 < row.slope_nano < -0.65e9


def test_zipf_no_global_single_partition(spark):
    texts = ["alpha beta gamma delta alpha beta alpha"] * 8
    df = zipf_ranks(_docs(spark, texts), min_freq=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the vocab-sized window partitions by freq; only the tiny histogram
    # window may single-partition
    assert plan.count("SinglePartition") <= 1