"""Streaming HMM map matching (streaming/mapmatch.py): stream ≡ batch
across a mid-trip micro-batch split, marker-close semantics, and the
candidate-less final marker."""

from __future__ import annotations

import glob
import os
import shutil
import uuid

from osm_spark.geo.mapmatch import hmm_map_match
from osm_spark.streaming.mapmatch import hmm_map_match_stream
from tests.test_mapmatch import KW, PINGS, ROADS, _pings, _roads

SCHEMA = (
    "trip_id long, seq int, lat double, lon double, is_final boolean"
)


def _write_drop(spark, rows, drops_dir, name, mtime):
    tmp = os.path.join(drops_dir, f"_stage_{name}")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dst = os.path.join(drops_dir, f"{name}.parquet")
    shutil.move(part, dst)
    shutil.rmtree(tmp)
    os.utime(dst, (mtime, mtime))


def _run_stream(spark, tmp_path, drops, **kw):
    base = str(tmp_path)
    drops_dir = os.path.join(base, f"drops_{uuid.uuid4().hex[:6]}")
    os.makedirs(drops_dir)
    for i, rows in enumerate(drops):
        _write_drop(spark, rows, drops_dir, f"d{i}", 1_000_000 + 100 * i)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(drops_dir)
    )
    args = dict(KW)
    args.update(kw)
    out = hmm_map_match_stream(stream, _roads(spark), **args)
    sink = f"mm_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option(
            "checkpointLocation",
            os.path.join(base, f"ckpt_{uuid.uuid4().hex[:6]}"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        (r.trip_id, r.seq): (r.way_id, r.seg_idx, r.dist_mm)
        for r in spark.table(sink).collect()
    }


def _batch(spark, pings):
    return {
        (r.trip_id, r.seq): (r.way_id, r.seg_idx, r.dist_mm)
        for r in hmm_map_match(
            _pings(spark, pings), _roads(spark), **KW
        ).collect()
    }


def _flag(pings, finals):
    return [(t, s, la, lo, (t, s) in finals) for t, s, la, lo in pings]


def test_stream_equals_batch_across_midtrip_split(spark, tmp_path):
    """Trips split MID-TRAJECTORY across micro-batches: the Viterbi
    frontier must carry through state, and the final result must equal
    the batch DP over the whole trips."""
    finals = {(1, 2), (2, 1)}
    early = [p for p in PINGS if (p[0], p[1]) not in finals]
    late = [p for p in PINGS if (p[0], p[1]) in finals]
    got = _run_stream(
        spark, tmp_path, [_flag(early, finals), _flag(late, finals)]
    )
    assert got == _batch(spark, PINGS)
    # the context win survives the split: ping (1,0) matched to road 1
    assert got[(1, 0)][0] == 1


def test_unclosed_trip_emits_only_certain_rows(spark, tmp_path):
    """An unclosed trip emits only its CONVERGED prefix (rows every
    frontier candidate agrees on — certain regardless of future pings,
    the online path compression that bounds state), never the still-
    ambiguous tail: the last ping has >1 live candidate here, so its
    row must wait for the close."""
    pings = [p for p in PINGS if p[0] == 1]
    got = _run_stream(spark, tmp_path, [_flag(pings, set())])
    batch = _batch(spark, pings)
    assert set(got) <= set(batch)
    assert all(got[k] == batch[k] for k in got)
    assert (1, 2) not in got  # ambiguous tail: emitted only on close


def test_early_emission_completes_to_batch_on_close(spark, tmp_path):
    """Two runs on one checkpoint: run 1 delivers a trip WITHOUT its
    final (the frontier collapses to ONE candidate mid-trip at this
    radius, so the converged prefix emits early), run 2 delivers the
    final. The union must equal the batch DP with no duplicate
    (trip, seq) — early rows are final, the close emits only the
    pending suffix.

    (The default fixture's PARALLEL roads are the non-converging worst
    case — each road's chain backtracks through itself — which is why
    this test narrows the radius until the wrong road falls out.)"""
    kw = dict(KW)
    kw["radius_m"] = 100.0  # seq 0 sees both roads; seq 1+ only road 1
    pings = [p for p in PINGS if p[0] == 1]
    early = [p for p in pings if p[1] < 2]
    late = [p for p in pings if p[1] == 2]
    finals = {(1, 2)}
    base = str(tmp_path)
    drops_dir = os.path.join(base, "drops_early")
    os.makedirs(drops_dir)
    ckpt = os.path.join(base, "ckpt_early")
    sink_dir = os.path.join(base, "out_early")

    def start():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(drops_dir)
        )
        out = hmm_map_match_stream(stream, _roads(spark), **kw)
        return (
            out.writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    batch = {
        (r.trip_id, r.seq): (r.way_id, r.seg_idx, r.dist_mm)
        for r in hmm_map_match(
            _pings(spark, pings), _roads(spark), **kw
        ).collect()
    }
    _write_drop(spark, _flag(early, finals), drops_dir, "d0", 1_000_000)
    start().awaitTermination()
    first = spark.read.parquet(sink_dir).collect()
    got1 = {(r.trip_id, r.seq): (r.way_id, r.seg_idx, r.dist_mm) for r in first}
    assert len(first) == len(got1)  # no duplicate (trip, seq)
    assert got1 and set(got1) <= set(batch)  # something emitted EARLY
    assert all(got1[k] == batch[k] for k in got1)
    _write_drop(spark, _flag(late, finals), drops_dir, "d1", 1_000_100)
    start().awaitTermination()
    rows = spark.read.parquet(sink_dir).collect()
    got = {(r.trip_id, r.seq): (r.way_id, r.seg_idx, r.dist_mm) for r in rows}
    assert len(rows) == len(got)  # suffix-only close: no re-emission
    assert got == batch


def test_stream_equals_batch_across_arrow_chunks(spark, tmp_path):
    """Force the state op to hand each trip's rows as MULTIPLE Arrow
    chunks (maxRecordsPerBatch=2 < rows per trip): chunk boundaries
    carry no seq ordering and can split one ping's candidate rows, so
    the matcher must concatenate before its seq loop — per-chunk DP
    advancement would reorder steps and double-k-cut straddled pings."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    spark.conf.set(key, "2")
    try:
        finals = {(1, 2), (2, 1)}
        got = _run_stream(spark, tmp_path, [_flag(PINGS, finals)])
        assert got == _batch(spark, PINGS)
    finally:
        spark.conf.set(key, prev)


def test_candidateless_final_marker_still_closes(spark, tmp_path):
    """The trip-end marker snaps to nothing (outside the radius) but
    must still close the trip; the matched rows are the surviving
    pings — exactly the batch answer for the same pings."""
    pings = [
        (5, 0, 10.00005, 20.02),
        (5, 1, 10.00003, 20.03),
        (5, 2, 45.0, 120.0),  # nowhere near the roads
    ]
    got = _run_stream(spark, tmp_path, [_flag(pings, {(5, 2)})])
    assert got == _batch(spark, pings)
    assert set(got) == {(5, 0), (5, 1)}


def test_state_recovers_across_query_restart(spark, tmp_path):
    """Stop the query after the first drop, deliver the trip tail, and
    restart on the SAME checkpoint: the Viterbi frontier must come back
    from the state store and the closed trip must equal the batch DP —
    the kill-mid-job guarantee for the stateful matcher."""
    finals = {(1, 2), (2, 1)}
    early = [p for p in PINGS if (p[0], p[1]) not in finals]
    late = [p for p in PINGS if (p[0], p[1]) in finals]
    base = str(tmp_path)
    drops_dir = os.path.join(base, "drops_restart")
    os.makedirs(drops_dir)
    ckpt = os.path.join(base, "ckpt_restart")
    sink_dir = os.path.join(base, "out_restart")

    def start():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(drops_dir)
        )
        out = hmm_map_match_stream(stream, _roads(spark), **KW)
        return (
            out.writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    _write_drop(spark, _flag(early, finals), drops_dir, "d0", 1_000_000)
    q = start()
    q.awaitTermination()  # first run: no trip closed, state persisted
    _write_drop(spark, _flag(late, finals), drops_dir, "d1", 1_000_100)
    q = start()  # fresh query object, same checkpoint -> state recovery
    q.awaitTermination()
    got = {
        (r.trip_id, r.seq): (r.way_id, r.seg_idx, r.dist_mm)
        for r in spark.read.parquet(sink_dir).collect()
    }
    assert got == _batch(spark, PINGS)
