"""Hypertable rollup (osm_spark/pipeline/rollup.py): bucket arithmetic,
OHLC selection semantics, quantized-sum exactness, gap-fill LOCF."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from osm_spark.pipeline.rollup import gap_fill, rollup_ohlc, time_bucket


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def _ts(h, m=0, s=0, us=0):
    return dt.datetime(2024, 1, 1, h, m, s, us)


def test_time_bucket_is_epoch_floor(spark):
    df = _events(
        spark,
        [
            (1, _ts(0, 0, 0), "a", 0.0),
            (2, _ts(0, 59, 59, 999999), "a", 0.0),
            (3, _ts(1, 0, 0), "a", 0.0),
        ],
    ).select("event_id", time_bucket("ts", 3600).alias("b"))
    got = {r.event_id: r.b for r in df.collect()}
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()) // 3600
    assert got == {1: base, 2: base, 3: base + 1}


def test_rollup_ohlc_semantics(spark):
    rows = [
        # bucket h0: out-of-order arrival, tie on ts broken by event_id
        (5, _ts(0, 30), "a", 7.0),
        (2, _ts(0, 10), "a", 3.0),
        (1, _ts(0, 10), "a", 4.0),  # same ts as id 2 -> open is id 1
        (9, _ts(0, 50), "a", -2.5),
        # bucket h2 (h1 is a gap)
        (11, _ts(2, 5), "a", 10.0),
        # second key
        (3, _ts(0, 20), "b", 1.25),
    ]
    out = {
        (r.key, r.bucket): r
        for r in rollup_ohlc(_events(spark, rows), width_s=3600).collect()
    }
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()) // 3600
    a0 = out[("a", base)]
    assert (a0.open, a0.close) == (4.0, -2.5)
    assert (a0.high, a0.low) == (7.0, -2.5)
    assert a0.sum_micro == round(4.0e6) + round(3.0e6) + round(7.0e6) - round(2.5e6)
    assert a0.n == 4
    assert out[("a", base + 2)].open == 10.0
    assert out[("b", base)].n == 1
    assert ("a", base + 1) not in out


def test_gap_fill_locf(spark):
    rows = [
        (1, _ts(0, 10), "a", 1.0),
        (2, _ts(3, 10), "a", 4.0),  # buckets h1, h2 are gaps
        (3, _ts(1, 10), "b", 9.0),
    ]
    rolled = rollup_ohlc(_events(spark, rows), width_s=3600)
    filled = gap_fill(rolled)
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()) // 3600
    got = {(r.key, r.bucket): (r.filled, r.is_gap) for r in filled.collect()}
    assert got[("a", base)] == (1.0, False)
    assert got[("a", base + 1)] == (1.0, True)
    assert got[("a", base + 2)] == (1.0, True)
    assert got[("a", base + 3)] == (4.0, False)
    # key b spans a single bucket: no synthesized rows
    assert got[("b", base + 1)] == (9.0, False)
    assert len(got) == 5


def test_gap_fill_interpolate(spark):
    rows = [
        (1, _ts(0, 10), "a", 1.0),
        (2, _ts(3, 10), "a", 4.0),  # gaps at h1, h2: expect 2.0, 3.0
        (3, _ts(5, 10), "a", 5.0),  # gap at h4: expect 4.5
    ]
    rolled = rollup_ohlc(_events(spark, rows), width_s=3600)
    filled = gap_fill(rolled, method="interpolate")
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()) // 3600
    got = {(r.key, r.bucket): (r.filled, r.is_gap) for r in filled.collect()}
    assert got[("a", base)] == (1.0, False)
    assert got[("a", base + 1)] == (2.0, True)
    assert got[("a", base + 2)] == (3.0, True)
    assert got[("a", base + 3)] == (4.0, False)
    assert got[("a", base + 4)] == (4.5, True)
    assert got[("a", base + 5)] == (5.0, False)


def test_incremental_merge_equals_full_recompute(spark):
    """merge(state(A), state(B), state(C)) finalizes identically to
    rollup over A∪B∪C — the continuous-aggregate refresh contract."""
    from osm_spark.pipeline.rollup import (
        finalize_rollup,
        merge_rollup_states,
        rollup_state,
    )

    rows = [
        (i, _ts((i * 7) % 24, i % 60, 0, i * 11), "k" + str(i % 3), float(i) - 4.5)
        for i in range(60)
    ]
    ev = _events(spark, rows)
    parts = [ev.where(F.col("event_id") % 3 == r) for r in range(3)]
    merged = finalize_rollup(
        merge_rollup_states(*[rollup_state(p, width_s=3600) for p in parts])
    )
    full = rollup_ohlc(ev, width_s=3600)
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, full.collect()))
    assert a == b and len(a) > 10


def test_stream_ohlc_equals_batch(spark, sf_small_dir):
    """availableNow streaming OHLC over the real events parquet equals
    the batch rollup row for row."""
    import os

    from osm_spark.streaming.rollup import run_stream_ohlc_batchlike

    path = os.path.join(sf_small_dir, "events.parquet")
    streamed = run_stream_ohlc_batchlike(spark, path, width_s=3600)
    batch = rollup_ohlc(spark.read.parquet(path), width_s=3600)
    a = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b and len(a) > 0


def test_rollup_plan_single_exchange(spark):
    rows = [(i, _ts(i % 4), "a", float(i)) for i in range(20)]
    plan = (
        rollup_ohlc(_events(spark, rows), width_s=3600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # one shuffle on (key, bucket)
    assert "partial" in plan.lower()  # map-side combine happened
