"""Reverse geocode: smallest containing polygon wins."""

from osm_spark.geo.geocode import reverse_geocode
from osm_spark.pipeline.geometry import build_way_cells


def test_smallest_containing_polygon_wins(spark):
    # Nested squares around the origin: big (way 1) ⊃ small (way 2);
    # way 3 is far away. Point at origin must geocode to way 2.
    polys = spark.createDataFrame(
        [
            (1, [-1.0, -1.0, 1.0, 1.0], [-1.0, 1.0, 1.0, -1.0]),
            (2, [-0.1, -0.1, 0.1, 0.1], [-0.1, 0.1, 0.1, -0.1]),
            (3, [40.0, 40.0, 41.0, 41.0], [40.0, 41.0, 41.0, 40.0]),
        ],
        "way_id long, vlat array<double>, vlon array<double>",
    )
    from osm_spark.geo.hexgrid import hex_cell_expr

    pts = spark.createDataFrame(
        [("p0", 0.0, 0.0), ("p1", 0.5, 0.5), ("p2", 40.5, 40.5), ("p3", 10.0, 10.0)],
        "url string, lat double, lon double",
    ).withColumn("h3_9", hex_cell_expr("lat", "lon", 9))
    out = {
        r.url: r.way_id
        for r in reverse_geocode(
            pts, polys, build_way_cells(polys), strategy="broadcast"
        ).collect()
    }
    # p0 in both 1 and 2 -> smaller (2); p1 only in 1; p2 in 3; p3 nowhere.
    assert out == {"p0": 2, "p1": 1, "p2": 3}
