"""Segment-crossing join (geo/crossings.py): hand-built intersection
case table, brute-force parity on the synthetic way fixture, the
two-layer form, salted ≡ unsalted, the max_cells guard, and the plan
pins (no cartesian; shuffle_hash cell equi-join)."""

from __future__ import annotations

import pytest

from osm_spark.geo.crossings import DEFAULT_SCALE, segment_crossings
from osm_spark.pipeline.salting import key_salt_plan


def _ways(spark, rows):
    """rows: [(way_id, [(lat, lon), ...]), ...] — open polylines."""
    data = [
        (wid, [p[0] for p in pts], [p[1] for p in pts]) for wid, pts in rows
    ]
    return spark.createDataFrame(
        data, "way_id long, vlat array<double>, vlon array<double>"
    )


def _pairs(df):
    return sorted(
        (r.way_a, r.seg_a, r.way_b, r.seg_b) for r in df.collect()
    )


# --- hand case table (open polylines, closed=False) -------------------

def test_proper_crossing(spark):
    ways = _ways(spark, [(1, [(0.0, 0.0), (0.001, 0.001)]),
                         (2, [(0.001, 0.0), (0.0, 0.001)])])
    assert _pairs(segment_crossings(ways, closed=False)) == [(1, 1, 2, 1)]


def test_endpoint_touch_counts(spark):
    # way 2 starts exactly on way 1's interior
    ways = _ways(spark, [(1, [(0.0, 0.0), (0.0, 0.002)]),
                         (2, [(0.0, 0.001), (0.001, 0.001)])])
    assert _pairs(segment_crossings(ways, closed=False)) == [(1, 1, 2, 1)]


def test_collinear_overlap_counts(spark):
    ways = _ways(spark, [(1, [(0.0, 0.0), (0.0, 0.002)]),
                         (2, [(0.0, 0.001), (0.0, 0.003)])])
    assert _pairs(segment_crossings(ways, closed=False)) == [(1, 1, 2, 1)]


def test_disjoint_and_collinear_gap(spark):
    ways = _ways(spark, [(1, [(0.0, 0.0), (0.0, 0.001)]),
                         (2, [(0.0, 0.002), (0.0, 0.003)]),   # collinear, gap
                         (3, [(0.001, 0.0), (0.001, 0.001)])])  # parallel
    assert _pairs(segment_crossings(ways, closed=False)) == []


def test_same_way_never_pairs(spark):
    # a self-crossing bowtie: segments 1 and 3 of the SAME way cross,
    # but the self-join form only reports cross-way pairs
    ways = _ways(spark, [(1, [(0.0, 0.0), (0.001, 0.001), (0.001, 0.0),
                              (0.0, 0.001)])])
    assert _pairs(segment_crossings(ways, closed=False)) == []


def test_quantization_snap(spark):
    # endpoints 0.4 quantized units apart snap together at the default
    # scale (1e-5 deg ≈ 1.1 m): a sub-tolerance near-miss counts as a touch
    ways = _ways(spark, [(1, [(0.0, 0.0), (0.0, 0.001)]),
                         (2, [(0.000004, 0.0005), (0.001, 0.0005)])])
    assert _pairs(segment_crossings(ways, closed=False)) == [(1, 1, 2, 1)]


# --- brute-force parity on the synthetic fixture ----------------------

def _brute(pdf, closed=True):
    segs = []
    for r in pdf.itertuples():
        n = len(r.vlat)
        last = n if closed else n - 1
        for i in range(1, last + 1):
            j = i % n + 1
            segs.append(
                (r.way_id, i,
                 round(r.vlon[i - 1] * DEFAULT_SCALE),
                 round(r.vlat[i - 1] * DEFAULT_SCALE),
                 round(r.vlon[j - 1] * DEFAULT_SCALE),
                 round(r.vlat[j - 1] * DEFAULT_SCALE))
            )

    def orient(px, py, qx, qy, rx, ry):
        c = (qx - px) * (ry - py) - (qy - py) * (rx - px)
        return (c > 0) - (c < 0)

    def on_bbox(px, py, qx, qy, rx, ry):
        return (min(px, qx) <= rx <= max(px, qx)
                and min(py, qy) <= ry <= max(py, qy))

    def inter(a, b):
        _, _, ax0, ay0, ax1, ay1 = a
        _, _, bx0, by0, bx1, by1 = b
        d1 = orient(ax0, ay0, ax1, ay1, bx0, by0)
        d2 = orient(ax0, ay0, ax1, ay1, bx1, by1)
        d3 = orient(bx0, by0, bx1, by1, ax0, ay0)
        d4 = orient(bx0, by0, bx1, by1, ax1, ay1)
        if d1 * d2 < 0 and d3 * d4 < 0:
            return True
        return (
            (d1 == 0 and on_bbox(ax0, ay0, ax1, ay1, bx0, by0))
            or (d2 == 0 and on_bbox(ax0, ay0, ax1, ay1, bx1, by1))
            or (d3 == 0 and on_bbox(bx0, by0, bx1, by1, ax0, ay0))
            or (d4 == 0 and on_bbox(bx0, by0, bx1, by1, ax1, ay1))
        )

    out = set()
    for i, a in enumerate(segs):
        for b in segs[i + 1:]:
            if a[0] < b[0] and inter(a, b):
                out.add((a[0], a[1], b[0], b[1]))
    return sorted(out)


def test_fixture_brute_force_parity(spark):
    from osm_spark.pipeline.geometry import synth_polygons, synth_polygons_pdf

    got = _pairs(segment_crossings(synth_polygons(spark)))
    assert got == _brute(synth_polygons_pdf())
    assert len(got) > 100  # the fixture genuinely exercises the operator


def test_salted_equals_unsalted(spark):
    from osm_spark.geo.crossings import way_segments, _cover
    from osm_spark.pipeline.geometry import synth_polygons

    ways = synth_polygons(spark)
    plain = segment_crossings(ways)
    covered = _cover(way_segments(ways), 1_024, 4096)
    salts = key_salt_plan(covered, "cellk", target=3)
    assert salts.count() > 0  # the fixture has hot cells at this target
    salted = segment_crossings(ways, salts=salts)
    assert _pairs(salted) == _pairs(plain)


def test_two_layer_form(spark):
    # A×B keeps every ordered (a from A, b from B) pair, no a<b filter
    a = _ways(spark, [(9, [(0.0, 0.0), (0.001, 0.001)])])
    b = _ways(spark, [(1, [(0.001, 0.0), (0.0, 0.001)])])
    assert _pairs(segment_crossings(a, b, closed=False)) == [(9, 1, 1, 1)]


def test_ring_wraparound_segment(spark):
    # closed=True adds the nv→1 wrap segment; way 2 crosses ONLY it
    ways = _ways(spark, [(1, [(0.0, 0.0), (0.0, 0.002), (0.002, 0.001)]),
                         (2, [(0.002, 0.0), (-0.001, 0.0005)])])
    open_pairs = _pairs(segment_crossings(ways.where("way_id = 1"),
                                          ways.where("way_id = 2"),
                                          closed=False))
    closed_pairs = _pairs(segment_crossings(ways.where("way_id = 1"),
                                            ways.where("way_id = 2")))
    assert (1, 3, 2, 1) not in open_pairs
    assert (1, 3, 2, 1) in closed_pairs


def test_max_cells_guard(spark):
    ways = _ways(spark, [(1, [(0.0, 0.0), (40.0, 40.0)]),  # continent span
                         (2, [(0.0, 0.001), (0.001, 0.0)])])
    with pytest.raises(Exception, match="grid cells|max_cells"):
        segment_crossings(ways, closed=False).collect()


def test_plan_no_cartesian_and_shuffle_hash(spark):
    from osm_spark.pipeline.geometry import synth_polygons

    out = segment_crossings(synth_polygons(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_stream_crossings_equals_batch(spark):
    """availableNow streaming conflation ≡ the batch two-layer join on
    the same rows (the engine's stream ≡ batch contract)."""
    import glob
    import os
    import shutil
    import tempfile
    import uuid

    from osm_spark.pipeline.geometry import synth_polygons
    from osm_spark.streaming.conflation import stream_crossings

    ways = synth_polygons(spark).select("way_id", "vlat", "vlon")
    sways = ways.where("way_id % 2 = 1")
    stat = ways.where("way_id % 2 = 0")

    batch = sorted(
        (r.way_a, r.seg_a, r.way_b, r.seg_b)
        for r in segment_crossings(sways, stat).collect()
    )
    assert len(batch) > 50

    base = tempfile.mkdtemp(prefix="xing_test_")
    drops = os.path.join(base, "drops")
    os.makedirs(drops)
    for i, part in enumerate(
        (sways.where("way_id % 4 = 1"), sways.where("way_id % 4 = 3"))
    ):
        stage = os.path.join(base, f"s{i}")
        part.coalesce(1).write.parquet(stage)
        f = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(drops, f"d{i}.parquet")
        shutil.move(f, dst)
        os.utime(dst, (1_000_000 + 100 * i,) * 2)
    stream = (
        spark.readStream.schema(
            "way_id long, vlat array<double>, vlon array<double>"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(drops)
    )
    sink = f"xt_{uuid.uuid4().hex[:8]}"
    q = (
        stream_crossings(stream, stat)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.way_a, r.seg_a, r.way_b, r.seg_b)
        for r in spark.table(sink).collect()
    )
    assert got == batch


def test_ring_validity_square_vs_bowtie(spark):
    from osm_spark.geo.crossings import ring_validity

    square = ([0.0, 0.0, 1.0, 1.0], [0.0, 1.0, 1.0, 0.0])  # (vlat, vlon)
    # bowtie: same vertices ordered so edges 1-2 and 3-4 cross
    bowtie = ([0.0, 1.0, 0.0, 1.0], [0.0, 1.0, 1.0, 0.0])
    df = spark.createDataFrame(
        [(1, *square), (2, *bowtie)],
        "way_id long, vlat array<double>, vlon array<double>",
    )
    got = {r["way_id"]: r for r in ring_validity(df).collect()}
    assert got[1]["is_valid"] is True and got[1]["n_bad_pairs"] == 0
    assert got[2]["is_valid"] is False and got[2]["n_bad_pairs"] == 1


def test_ring_validity_pinch_point_is_invalid(spark):
    from osm_spark.geo.crossings import ring_validity

    # two triangles sharing vertex (0,0): non-adjacent segments TOUCH
    vlat = [0.0, 1.0, 1.0, 0.0, -1.0, -1.0]
    vlon = [0.0, 0.5, -0.5, 0.0, 0.5, -0.5]
    df = spark.createDataFrame(
        [(1, vlat, vlon)], "way_id long, vlat array<double>, vlon array<double>"
    )
    got = ring_validity(df).collect()[0]
    assert got["is_valid"] is False and got["n_bad_pairs"] >= 1


def test_ring_validity_degenerate_and_plan(spark):
    from osm_spark.geo.crossings import ring_validity

    df = spark.createDataFrame(
        [(1, [0.0, 1.0], [0.0, 1.0]), (2, [0.0], [0.0])],
        "way_id long, vlat array<double>, vlon array<double>",
    )
    got = {r["way_id"]: r for r in ring_validity(df).collect()}
    assert got[1]["is_valid"] is False  # < 3 vertices
    assert got[2]["is_valid"] is False
    plan = ring_validity(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
