"""Polyline resampling (densification): emit a point every ``step_m``
meters along each way — the standard preprocessing for map matching
(geo/mapmatch.py wants evenly-spaced pings), route density estimation,
and for giving long straight segments vertices in tile space. The
inverse of geo/simplify.py.

Reference analog: operates on the same assembled ``vlat/vlon`` vertex
arrays as the way model (`lib/osm/way.rb` node refs; SURVEY.md §1.4);
the operator itself is Spark-first geometry machinery (SURVEY.md §2.10
family).

Semantics: walk the polyline's cumulative arc length (per-segment
haversine); emit the interpolated position at every multiple of
``step_m`` from the way's start (k = 0 emits the first vertex; the
final vertex appears only if the total length is an exact multiple).
Interpolation is linear in degree space within a segment — the same
straight-in-coordinate-space convention as the tile clipper.

Exactness contract (the trip_stats idiom — quantize EARLY, then stay
integer): each segment length is rounded to integer millimeters first,
the cumulative scale and the k-range arithmetic are then pure int64,
and only the within-segment fraction ``f = (k·step − cum_prev) /
seg_mm`` is floating — an identical single division + multiply-add in
both engines over integer-derived doubles, so the micro-degree-rounded
outputs replay bit-exactly. The k-range floor divisions run as double
floors; exact while cumulative lengths stay far below 2^53 mm (10^9 km
per way — any real way is orders of magnitude shorter).

Plan shape: ZERO shuffle, zero UDF — one projection builds the
per-segment mm lengths and their exclusive prefix sums as arrays (an
``aggregate`` accumulator, no window, so no exchange on way_id), then
two Generates (segment explode, k-range explode) and a final
projection. Per-row work is O(vertices + points emitted); scaling is
linear with input splits, exactly like the tile clipper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.geo.knn import haversine_m

__all__ = ["resample_ways"]


def resample_ways(
    ways: DataFrame,
    step_m: float,
    *,
    id_col: str = "way_id",
    closed: bool = False,
    max_points: int = 100_000,
) -> DataFrame:
    """(way_id, k, qlat, qlon) — the point at arc-length ``k·step_m``
    along each way, positions quantized to integer micro-degrees
    (round-half-away). ``ways``: id + ``vlat``/``vlon`` vertex arrays;
    ``closed`` walks the ring wrap-around segment too. A way that would
    emit more than ``max_points`` rows fails loudly (ANSI
    ``raise_error``) instead of flooding the executor."""
    if step_m <= 0:
        raise ValueError(f"step_m must be > 0, got {step_m}")
    step_mm = int(round(float(step_m) * 1000.0))

    nv = F.size("vlat")
    last = nv if closed else nv - 1
    seg_mm = lambda i: F.round(  # noqa: E731
        haversine_m(
            F.element_at("vlat", i.cast("int")),
            F.element_at("vlon", i.cast("int")),
            F.element_at("vlat", (i % nv + 1).cast("int")),
            F.element_at("vlon", (i % nv + 1).cast("int")),
        )
        * 1000.0
    ).cast("long")
    lens = F.when(nv >= 2, F.transform(F.sequence(F.lit(1), last), seg_mm)).otherwise(
        F.array().cast("array<bigint>")
    )
    # exclusive prefix sums: cums[i] = length before segment i (1-based)
    cums = F.aggregate(
        F.col("_lens"),
        F.array(F.lit(0).cast("long")),
        lambda acc, x: F.concat(acc, F.array(F.element_at(acc, -1) + x)),
    )

    base = (
        ways.select(F.col(id_col).alias("way_id"), "vlat", "vlon")
        .withColumn("_lens", lens)
        .withColumn("_cums", cums)
    )
    segs = base.select(
        "way_id",
        "vlat",
        "vlon",
        F.explode(
            F.when(
                nv >= 2, F.sequence(F.lit(1), last)
            ).otherwise(F.array().cast("array<int>"))
        ).alias("_i"),
        "_lens",
        "_cums",
    ).select(
        "way_id",
        F.element_at("vlat", F.col("_i")).alias("alat"),
        F.element_at("vlon", F.col("_i")).alias("alon"),
        F.element_at("vlat", (F.col("_i") % F.size("vlat") + 1)).alias("blat"),
        F.element_at("vlon", (F.col("_i") % F.size("vlat") + 1)).alias("blon"),
        F.element_at("_lens", F.col("_i")).alias("seg_mm"),
        F.element_at("_cums", F.col("_i")).alias("cum_prev"),
    )
    st = F.lit(step_mm)
    # k*step ∈ [cum_prev, cum_prev + seg_mm): double floors, exact far
    # below 2^53 mm (see module docstring)
    k_lo = F.floor((F.col("cum_prev") + st - 1).cast("double") / st).cast("long")
    k_hi = (
        F.floor((F.col("cum_prev") + F.col("seg_mm") + st - 1).cast("double") / st)
        .cast("long")
        - 1
    )
    guard = F.when(
        k_hi - k_lo + 1 <= F.lit(int(max_points)), F.lit(True)
    ).otherwise(
        F.raise_error(
            F.format_string(
                "resample_ways: way %s segment would emit %s points "
                "(max_points=%s)",
                F.col("way_id"),
                k_hi - k_lo + 1,
                F.lit(int(max_points)),
            )
        )
    )
    pts = (
        segs.withColumn("_klo", k_lo)
        .withColumn("_khi", k_hi)
        .where(guard)
        .where(F.col("_khi") >= F.col("_klo"))
        .select(
            "way_id",
            "alat",
            "alon",
            "blat",
            "blon",
            "seg_mm",
            "cum_prev",
            F.explode(F.sequence(F.col("_klo"), F.col("_khi"))).alias("k"),
        )
    )
    f = (F.col("k") * st - F.col("cum_prev")).cast("double") / F.col(
        "seg_mm"
    ).cast("double")
    return pts.select(
        "way_id",
        "k",
        F.round((F.col("alat") + f * (F.col("blat") - F.col("alat"))) * 1e6)
        .cast("long")
        .alias("qlat"),
        F.round((F.col("alon") + f * (F.col("blon") - F.col("alon"))) * 1e6)
        .cast("long")
        .alias("qlon"),
    )
