"""Vector-tile segment clipping: cut way geometries into per-tile pieces
— the geometry half of the tiling engine (the raster half is
``geo/tiles.py`` density tiles + ``geo/contours.py``). Every slippy tile
(z/x/y) receives exactly the sub-segments of every way that cross it,
with coordinates quantized to integer in-tile extent units (the Mapbox
Vector Tile convention, extent 4096) — the precursor of an MVT encode.

Reference analog: the way model whose vertex arrays this clips
(`lib/osm/way.rb` node refs; SURVEY.md §1.4 assembles them into
``vlat/vlon`` arrays); the tiling itself is graft-mandated
(SURVEY.md §2.10, raster-tile + vector north star — Spark-first design).

Plan shape (zero shuffle, zero UDF — the whole operator is one codegen
pipeline of Generate + Project + Filter):

1. ways → segments: explode consecutive vertex pairs.
2. project endpoints to continuous tile coordinates at zoom z
   (Web-Mercator; the asinh is spelled as ``ln(t + sqrt(t²+1))`` so the
   DuckDB oracle replays the identical transcendental chain), behind a
   Generate barrier so the tan/ln chain evaluates once per endpoint.
3. explode the segment's tile bbox cover (x range × y range — two
   nested ``sequence`` explodes, with a ``max_tiles`` guard so a
   degenerate continent-spanning segment errors the row out loudly
   instead of OOMing the executor, the range_join lesson).
4. slab-method Liang–Barsky clip against each candidate tile's unit
   square: ``t_enter = max(0, tx_enter, ty_enter)``,
   ``t_exit = min(1, tx_exit, ty_exit)``, keep ``t_enter < t_exit`` —
   pure finite arithmetic (the axis-parallel case is CASE'd so no
   0/0 NaN can enter a greatest/least whose NaN semantics differ
   between engines).

Geometry is straight *in projected tile space* (the vector-tile
convention — a definition, not an approximation).

Scale: per-row work is O(vertices + tiles crossed); no shuffle means
linear scaling with input splits. A downstream per-tile assembly is one
``groupBy(z, x, y)`` whose key space is bounded by 4^z.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_MERCATOR_LAT = 85.05112878
DEFAULT_EXTENT = 4096


def _merc_x(lon: Column, z: int) -> Column:
    return (lon + 180.0) / 360.0 * F.lit(float(1 << z))


def _merc_y(lat: Column, z: int) -> Column:
    la = F.greatest(
        F.least(lat, F.lit(MAX_MERCATOR_LAT)), F.lit(-MAX_MERCATOR_LAT)
    )
    t = F.tan(F.radians(la))
    # asinh spelled out so both engines run the same ln/sqrt chain
    return (
        (1.0 - F.log(t + F.sqrt(t * t + 1.0)) / math.pi)
        / 2.0
        * F.lit(float(1 << z))
    )


def _slab(a: Column, d: Column, lo: Column, hi: Column) -> tuple[Column, Column]:
    """(t_enter, t_exit) of a·+t·d against [lo, hi]; NaN-free: the d == 0
    case never divides (0/0 NaN compares differently across engines)."""
    inf = F.lit(float("inf"))
    t1 = (lo - a) / d
    t2 = (hi - a) / d
    inside = (a >= lo) & (a <= hi)
    enter = F.when(d != 0.0, F.least(t1, t2)).otherwise(
        F.when(inside, -inf).otherwise(inf)
    )
    exit_ = F.when(d != 0.0, F.greatest(t1, t2)).otherwise(
        F.when(inside, inf).otherwise(-inf)
    )
    return enter, exit_


def clip_segments_to_tiles(
    ways: DataFrame,
    z: int,
    extent: int = DEFAULT_EXTENT,
    max_tiles: int = 4096,
    id_col: str = "way_id",
    closed: bool = False,
) -> DataFrame:
    """(way_id, seg_idx, z, tx, ty, x0, y0, x1, y1) — one row per
    (segment, tile) crossing; x0..y1 in integer extent units relative to
    the tile's top-left corner.

    ``ways``: id + ``vlat``/``vlon`` vertex arrays. ``closed`` adds the
    wrap-around segment (rings). Segments whose tile-bbox cover exceeds
    ``max_tiles`` raise at run time (ANSI ``raise_error``) rather than
    silently exploding: a single bad geometry should fail the row, not
    OOM the stage.
    """
    nv = F.size("vlat")
    last = nv if closed else nv - 1
    seg_struct = lambda i: F.struct(  # noqa: E731
        i.cast("int").alias("seg_idx"),
        F.element_at("vlat", i.cast("int")).alias("alat"),
        F.element_at("vlon", i.cast("int")).alias("alon"),
        F.element_at("vlat", (i % nv + 1).cast("int")).alias("blat"),
        F.element_at("vlon", (i % nv + 1).cast("int")).alias("blon"),
    )
    segs = ways.select(
        F.col(id_col),
        F.explode(
            F.when(nv >= 2, F.transform(F.sequence(F.lit(1), last), seg_struct))
            .otherwise(F.array().cast(
                "array<struct<seg_idx:int,alat:double,alon:double,"
                "blat:double,blon:double>>"
            ))
        ).alias("s"),
    )

    # Generate barrier: project each endpoint ONCE — CollapseProject
    # would clone the tan/ln chain into every downstream reference
    proj = segs.select(
        id_col,
        F.col("s.seg_idx").alias("seg_idx"),
        F.explode(
            F.array(
                F.struct(
                    _merc_x(F.col("s.alon"), z).alias("ax"),
                    _merc_y(F.col("s.alat"), z).alias("ay"),
                    _merc_x(F.col("s.blon"), z).alias("bx"),
                    _merc_y(F.col("s.blat"), z).alias("by"),
                )
            )
        ).alias("p"),
    ).select(id_col, "seg_idx", "p.ax", "p.ay", "p.bx", "p.by")

    nmax = F.lit((1 << z) - 1)
    x_lo = F.greatest(F.floor(F.least("ax", "bx")).cast("long"), F.lit(0))
    x_hi = F.least(F.floor(F.greatest("ax", "bx")).cast("long"), nmax)
    y_lo = F.greatest(F.floor(F.least("ay", "by")).cast("long"), F.lit(0))
    y_hi = F.least(F.floor(F.greatest("ay", "by")).cast("long"), nmax)
    n_tiles = (x_hi - x_lo + 1) * (y_hi - y_lo + 1)
    # the guard lives INSIDE the sequence bound (an unused side column
    # would be pruned away before it could ever fire); an out-of-domain
    # segment can leave hi < lo, where Spark's sequence DESCENDS while
    # DuckDB's generate_series is empty — the when() keeps both empty
    x_hi_g = F.when(n_tiles <= max_tiles, x_hi).otherwise(
        F.raise_error(F.lit(
            f"clip_segments_to_tiles: segment covers more than "
            f"{max_tiles} tiles at z={z} — simplify or split it first"
        )).cast("long")
    )
    empty = F.array().cast("array<long>")
    tiles = proj.select(
        id_col, "seg_idx", "ax", "ay", "bx", "by",
        F.explode(
            F.when(x_hi >= x_lo, F.sequence(x_lo, x_hi_g)).otherwise(empty)
        ).alias("tx"),
    ).select(
        id_col, "seg_idx", "ax", "ay", "bx", "by", "tx",
        F.explode(
            F.when(y_hi >= y_lo, F.sequence(y_lo, y_hi)).otherwise(empty)
        ).alias("ty"),
    )

    dx = F.col("bx") - F.col("ax")
    dy = F.col("by") - F.col("ay")
    ex_, xx = _slab(F.col("ax"), dx, F.col("tx").cast("double"),
                    (F.col("tx") + 1).cast("double"))
    ey_, xy = _slab(F.col("ay"), dy, F.col("ty").cast("double"),
                    (F.col("ty") + 1).cast("double"))
    t0 = F.greatest(F.lit(0.0), ex_, ey_)
    t1 = F.least(F.lit(1.0), xx, xy)

    e = F.lit(float(extent))
    q = lambda v: F.round(v * e).cast("int")  # noqa: E731
    return (
        tiles.withColumn("t0", t0)
        .withColumn("t1", t1)
        .filter(F.col("t0") < F.col("t1"))
        .select(
            id_col,
            "seg_idx",
            F.lit(z).alias("z"),
            "tx",
            "ty",
            q(F.col("ax") + F.col("t0") * dx - F.col("tx")).alias("x0"),
            q(F.col("ay") + F.col("t0") * dy - F.col("ty")).alias("y0"),
            q(F.col("ax") + F.col("t1") * dx - F.col("tx")).alias("x1"),
            q(F.col("ay") + F.col("t1") * dy - F.col("ty")).alias("y1"),
        )
    )


def clip_tiles_sql(
    ways_table: str,
    z: int,
    extent: int = DEFAULT_EXTENT,
    closed: bool = False,
) -> str:
    """DuckDB replay: identical segment enumeration, projection chain,
    slab clip and quantization (same IEEE op order term for term)."""
    n = float(1 << z)
    nmax = (1 << z) - 1
    wrap = "len(vlat)" if closed else "len(vlat) - 1"
    mercy = (
        "(1.0 - ln(tan(radians(least(greatest({lat}, -85.05112878), 85.05112878)))"
        " + sqrt(tan(radians(least(greatest({lat}, -85.05112878), 85.05112878)))"
        " * tan(radians(least(greatest({lat}, -85.05112878), 85.05112878))) + 1.0))"
        f" / pi()) / 2.0 * {n!r}"
    )
    slab = """
            CASE WHEN {d} <> 0.0
                 THEN least(({lo} - {a}) / {d}, ({hi} - {a}) / {d})
                 ELSE CASE WHEN {a} >= {lo} AND {a} <= {hi}
                           THEN CAST('-infinity' AS DOUBLE)
                           ELSE CAST('infinity' AS DOUBLE) END END"""
    slab_x = """
            CASE WHEN {d} <> 0.0
                 THEN greatest(({lo} - {a}) / {d}, ({hi} - {a}) / {d})
                 ELSE CASE WHEN {a} >= {lo} AND {a} <= {hi}
                           THEN CAST('infinity' AS DOUBLE)
                           ELSE CAST('-infinity' AS DOUBLE) END END"""
    return f"""
        WITH segs AS (
            SELECT way_id, CAST(i AS INT) AS seg_idx,
                   vlat[CAST(i AS INT)] AS alat, vlon[CAST(i AS INT)] AS alon,
                   vlat[CAST(i % len(vlat) + 1 AS INT)] AS blat,
                   vlon[CAST(i % len(vlat) + 1 AS INT)] AS blon
            FROM (SELECT *, unnest(generate_series(1, {wrap})) AS i
                  FROM {ways_table} WHERE len(vlat) >= 2)
        ), proj AS (
            SELECT way_id, seg_idx,
                   (alon + 180.0) / 360.0 * {n!r} AS ax,
                   {mercy.format(lat="alat")} AS ay,
                   (blon + 180.0) / 360.0 * {n!r} AS bx,
                   {mercy.format(lat="blat")} AS by
            FROM segs
        ), cover AS (
            SELECT way_id, seg_idx, ax, ay, bx, by,
                   unnest(generate_series(
                       greatest(CAST(floor(least(ax, bx)) AS BIGINT), 0),
                       least(CAST(floor(greatest(ax, bx)) AS BIGINT), {nmax}))) AS tx
            FROM proj
        ), cover2 AS (
            SELECT way_id, seg_idx, ax, ay, bx, by, tx,
                   unnest(generate_series(
                       greatest(CAST(floor(least(ay, by)) AS BIGINT), 0),
                       least(CAST(floor(greatest(ay, by)) AS BIGINT), {nmax}))) AS ty
            FROM cover
        ), clip AS (
            SELECT *, bx - ax AS dx, by - ay AS dy,
                   greatest(0.0,
                       {slab.format(d="(bx - ax)", a="ax", lo="CAST(tx AS DOUBLE)", hi="CAST(tx + 1 AS DOUBLE)")},
                       {slab.format(d="(by - ay)", a="ay", lo="CAST(ty AS DOUBLE)", hi="CAST(ty + 1 AS DOUBLE)")}) AS t0,
                   least(1.0,
                       {slab_x.format(d="(bx - ax)", a="ax", lo="CAST(tx AS DOUBLE)", hi="CAST(tx + 1 AS DOUBLE)")},
                       {slab_x.format(d="(by - ay)", a="ay", lo="CAST(ty AS DOUBLE)", hi="CAST(ty + 1 AS DOUBLE)")}) AS t1
            FROM cover2
        )
        SELECT way_id, seg_idx, {z} AS z, tx, ty,
               CAST(round((ax + t0 * dx - tx) * {float(extent)!r}) AS INT) AS x0,
               CAST(round((ay + t0 * dy - ty) * {float(extent)!r}) AS INT) AS y0,
               CAST(round((ax + t1 * dx - tx) * {float(extent)!r}) AS INT) AS x1,
               CAST(round((ay + t1 * dy - ty) * {float(extent)!r}) AS INT) AS y1
        FROM clip WHERE t0 < t1
    """


def route_density(
    ways: DataFrame,
    z: int,
    extent: int = DEFAULT_EXTENT,
    id_col: str = "way_id",
    closed: bool = False,
) -> DataFrame:
    """(z, tx, ty, n_segments, length_eu) — per-tile way-network density:
    how much LINE length crosses each tile, the vector analog of the
    point-count raster (geo/tiles.py) used for road-network heatmaps and
    tile-generalization budgets.

    Pure composition over clip_segments_to_tiles (zero-shuffle clip
    inherited), plus ONE map-side-combined groupBy(z, tx, ty). Per-piece
    length is computed in integer extent units and ROUNDED BEFORE the
    sum (≤ 0.5 eu/piece quantization — the trip_stats millimeter
    recipe), so the aggregate is an exact long sum: order-independent
    and value-hash gateable, where a raw float-length sum would depend
    on partial-aggregation order.
    """
    clipped = clip_segments_to_tiles(
        ways, z, extent=extent, id_col=id_col, closed=closed
    )
    dx = (F.col("x1") - F.col("x0")).cast("double")
    dy = (F.col("y1") - F.col("y0")).cast("double")
    len_eu = F.round(F.sqrt(dx * dx + dy * dy), 0).cast("long")
    return (
        clipped.select("z", "tx", "ty", len_eu.alias("len_eu"))
        .groupBy("z", "tx", "ty")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("len_eu").alias("length_eu"),
        )
    )
