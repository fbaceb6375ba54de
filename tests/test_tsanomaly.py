"""Trailing z-score anomalies (osm_spark/pipeline/tsanomaly.py)."""

from __future__ import annotations

import math

from osm_spark.pipeline.tsanomaly import Z_SCALE, rollup_anomalies


def _rolled(spark, rows):
    return spark.createDataFrame(
        rows, "key string, bucket long, sum_micro long"
    )


def test_spike_flagged_warmup_not(spark):
    rows = [("a", b, 1_000_000 + (b % 3) * 10_000) for b in range(30)]
    rows.append(("a", 30, 9_000_000))  # spike
    rows.append(("a", 31, 1_010_000))  # back to normal
    out = {
        r.bucket: (r.n_hist, r.z_milli, r.is_anomaly)
        for r in rollup_anomalies(
            _rolled(spark, rows), window=24, min_history=8
        ).collect()
    }
    # warm-up rows (fewer than 8 trailing observations) emit NULL z
    for b in range(8):
        assert out[b][1] is None and not out[b][2]
    assert out[30][2] is True and out[30][1] > 3 * Z_SCALE
    assert out[31][2] is False
    # python replay of bucket 30's z over its trailing 24
    hist = [1_000_000 + (b % 3) * 10_000 for b in range(6, 30)]
    n = len(hist)
    mean = sum(hist) / n
    var = (sum(h * h for h in hist) - sum(hist) ** 2 / n) / (n - 1)
    z = (9_000_000 - mean) / math.sqrt(var)
    assert out[30][1] == math.floor(Z_SCALE * z)


def test_constant_series_never_anomalous(spark):
    rows = [("c", b, 500) for b in range(20)]
    out = rollup_anomalies(_rolled(spark, rows), min_history=4).collect()
    assert all(r.z_milli is None and not r.is_anomaly for r in out)


def test_keys_are_independent(spark):
    rows = [("a", b, 100) for b in range(12)] + [
        ("b", b, 100_000 * (b + 1)) for b in range(12)
    ]
    out = rollup_anomalies(
        _rolled(spark, rows), window=6, min_history=3
    ).collect()
    byk = {}
    for r in out:
        byk.setdefault(r.key, []).append(r)
    assert {r.key for r in out} == {"a", "b"}
    assert all(not r.is_anomaly for r in byk["a"])