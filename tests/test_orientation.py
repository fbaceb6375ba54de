"""Street-orientation histograms (geo/orientation.py): the bin ladder
vs an atan2 reference on random + boundary-adversarial deltas, fold
semantics, length weighting, and the zero-shuffle-before-agg plan."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from osm_spark.geo.orientation import orientation_bin_expr, orientation_histogram


def _atan2_bin(dx, dy):
    if dx == 0 and dy == 0:
        return None
    th = math.degrees(math.atan2(dx, dy))
    if th < 0:
        th += 180
    if th >= 180:
        th -= 180
    return min(17, int(th // 10))


def test_bins_match_atan2_reference(spark):
    import numpy as np

    rng = np.random.RandomState(6)
    pairs = [(int(a), int(b)) for a, b in rng.randint(-10**6, 10**6, (3000, 2))]
    pairs += [(0, 0), (0, 7), (7, 0), (-7, 0), (0, -7),
              (7, 7), (-7, 7), (7, -7), (-7, -7), (1, 10**6), (10**6, 1)]
    df = spark.createDataFrame(pairs, "dx long, dy long")
    got = {
        (r.dx, r.dy): r.b
        for r in df.select(
            "dx", "dy",
            orientation_bin_expr(F.col("dx"), F.col("dy")).alias("b"),
        ).collect()
    }
    for p in pairs:
        assert got[p] == _atan2_bin(*p), p


def test_fold_is_direction_invariant(spark):
    # a segment and its reverse share an orientation bin
    import numpy as np

    rng = np.random.RandomState(8)
    pairs = [(int(a), int(b)) for a, b in rng.randint(-10**5, 10**5, (500, 2))
             if (a, b) != (0, 0)]
    df = spark.createDataFrame(pairs, "dx long, dy long")
    out = df.select(
        orientation_bin_expr(F.col("dx"), F.col("dy")).alias("fwd"),
        orientation_bin_expr(-F.col("dx"), -F.col("dy")).alias("rev"),
    ).collect()
    assert all(r.fwd == r.rev for r in out)


def test_histogram_counts_and_weights(spark):
    # one square ring: 2 N-S segments (bin 0) + 2 E-W segments (bin 9)
    ways = spark.createDataFrame(
        [(1, [0.0, 0.001, 0.001, 0.0], [0.0, 0.0, 0.001, 0.001])],
        "way_id long, vlat array<double>, vlon array<double>",
    )
    got = {
        (r.bin): (r.n_segments, r.len_mm)
        for r in orientation_histogram(ways, F.lit(0).alias("region")).collect()
    }
    assert set(got) == {0, 9}
    assert got[0][0] == 2 and got[9][0] == 2
    # two ~111 m legs per bin → ~222,000 mm
    assert 200_000 < got[0][1] < 250_000
    assert 200_000 < got[9][1] < 250_000


def test_zero_length_segments_dropped(spark):
    ways = spark.createDataFrame(
        [(1, [0.0, 0.0], [0.0, 0.0])],
        "way_id long, vlat array<double>, vlon array<double>",
    )
    assert orientation_histogram(
        ways, F.lit(0).alias("region"), closed=False
    ).collect() == []


def test_plan_single_aggregation_no_udf(spark):
    from osm_spark.pipeline.geometry import synth_polygons

    out = orientation_histogram(
        synth_polygons(spark).select("way_id", "vlat", "vlon"),
        ((F.col("way_id") - 1000) / 8).cast("long").alias("region"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # only the groupBy


def test_entropy_grid_vs_organic(spark):
    import numpy as np
    from osm_spark.geo.orientation import orientation_entropy

    # region 0: a perfect grid (all mass in bins 0 and 9)
    grid = []
    for i in range(6):
        grid.append((i, [0.0, 0.01], [i * 0.001, i * 0.001]))          # N-S
        grid.append((10 + i, [i * 0.001, i * 0.001], [0.0, 0.01]))     # E-W
    # region 1: organic — random orientations
    rng = np.random.RandomState(4)
    organic = []
    for i in range(12):
        th = rng.uniform(0, math.pi)
        organic.append((100 + i,
                        [0.0, 0.01 * math.cos(th)],
                        [0.0, 0.01 * math.sin(th)]))
    ways = spark.createDataFrame(
        grid + organic, "way_id long, vlat array<double>, vlon array<double>")
    region = (F.col("way_id") >= 100).cast("int").alias("region")
    got = {r.region: r for r in orientation_entropy(
        ways, region, closed=False).collect()}
    assert got[0].n_bins == 2
    assert got[1].n_bins > 4
    assert got[0].entropy_micro < got[1].entropy_micro
    # two equal-mass bins → H = ln 2 nats ≈ 693,147 micro-nats
    assert abs(got[0].entropy_micro - 693_147) < 500


def test_entropy_single_bin_is_zero(spark):
    from osm_spark.geo.orientation import orientation_entropy

    ways = spark.createDataFrame(
        [(1, [0.0, 0.01], [0.0, 0.0])],
        "way_id long, vlat array<double>, vlon array<double>")
    got = orientation_entropy(ways, F.lit(0).alias("region"),
                              closed=False).collect()
    assert len(got) == 1 and got[0].entropy_micro == 0
