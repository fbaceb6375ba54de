"""Geometry measurement — perimeter and area per way polygon, pure Column.

The reference exposes way geometries only as ordered node lists
(`lib/osm/way.rb`; SURVEY.md §1.4) and leaves measurement to callers;
an analytics engine needs it as a first-class operator (filter ways by
area, rank by perimeter, density = pages / m²). Both metrics are
closed-form folds over the vertex arrays that ``assemble_way_polygons``
produces:

- ``perimeter_m``: sum of haversine edge lengths around the ring
  (closing edge included) — same haversine as ``geo.knn`` / the
  driver-gated ``haversine_distance`` query.
- ``area_m2``: planar shoelace on an equirectangular projection scaled
  at the ring's mean latitude (|Σ x_i·y_{i+1} − x_{i+1}·y_i| / 2 with
  x = lon·M_LON·cos(mean lat), y = lat·M_LAT). Exact for the small
  (≤ few km) rings OSM ways describe; absolute value makes it winding-
  order independent.

Scale design: zero shuffle, zero UDF — both folds are ``F.aggregate``
over the arrays already on the row, whole-stage codegen, pipelined over
the scan. The fold order is explicitly sequential (left→right) and the
SQL oracle replays it with ``list_reduce`` in the same order, so sums
are IEEE bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_R_M = 6371000.0
M_PER_DEG_LAT = 110574.0  # meters per degree latitude (spherical mean)
M_PER_DEG_LON_EQ = 111320.0  # meters per degree longitude at the equator


def _hav_edge(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Haversine meters between two points — op order mirrored in SQL."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_R_M) * F.asin(F.sqrt(a))


def way_geometry_stats(
    polygons: DataFrame,
    id_col: str = "way_id",
    lat_col: str = "vlat",
    lon_col: str = "vlon",
) -> DataFrame:
    """(way_id, n_vertices, mean_lat, perimeter_m, area_m2) per ring.

    Input rings are OPEN (closing vertex not repeated — the
    ``way_polygons`` convention); the closing edge is added here via
    index wraparound.
    """
    vlat, vlon = F.col(lat_col), F.col(lon_col)
    n = F.size(vlat)
    idx = F.sequence(F.lit(1), n)  # 1-based vertex positions
    # wraparound successor: i -> i % n + 1
    nxt = lambda i: (i % n) + 1  # noqa: E731

    mean_lat = F.aggregate(
        vlat, F.lit(0.0), lambda acc, v: acc + v
    ) / n.cast("double")

    perimeter = F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, i: acc
        + _hav_edge(
            F.element_at(vlat, i.cast("int")),
            F.element_at(vlon, i.cast("int")),
            F.element_at(vlat, nxt(i).cast("int")),
            F.element_at(vlon, nxt(i).cast("int")),
        ),
    )

    kx = F.lit(M_PER_DEG_LON_EQ) * F.cos(F.radians(mean_lat))
    ky = F.lit(M_PER_DEG_LAT)
    # Shoelace in degree space, scaled once at the end (cross terms
    # factor as kx*ky * (x_i*y_j - x_j*y_i)). Coordinates are CENTERED
    # on vertex 1 first: shoelace is translation-invariant, but on raw
    # lon/lat the ±|lon·lat| ~ 5000 cross terms cancel to ~1e-3, which
    # amplifies any last-ulp engine difference (e.g. compiler FMA
    # contraction in the oracle) by ~10^6×. Centered terms are ~1e-3
    # with no cancellation, so both engines agree to ~1e-8 m².
    x0 = F.element_at(vlon, 1)
    y0 = F.element_at(vlat, 1)
    cx = lambda i: F.element_at(vlon, i) - x0  # noqa: E731
    cy = lambda i: F.element_at(vlat, i) - y0  # noqa: E731
    shoelace = F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, i: acc
        + (
            cx(i.cast("int")) * cy(nxt(i).cast("int"))
            - cx(nxt(i).cast("int")) * cy(i.cast("int"))
        ),
    )
    area = F.abs(shoelace) / F.lit(2.0) * kx * ky

    # Degenerate-ring guard: an empty vertex array would hit sum/0 (an
    # ANSI-mode DIVIDE_BY_ZERO job abort) and the F.sequence(1, 0)
    # DESCENDS trap (see text/ngrams.py) in the folds. NULL out all
    # derived stats instead — matching the oracle, which NULLs the same
    # row rather than erroring.
    ok = n >= 1
    return polygons.select(
        F.col(id_col),
        n.alias("n_vertices"),
        F.when(ok, mean_lat).alias("mean_lat"),
        F.when(ok, perimeter).alias("perimeter_m"),
        F.when(ok, area).alias("area_m2"),
    )


def way_centroid(
    polygons: DataFrame,
    id_col: str = "way_id",
    lat_col: str = "vlat",
    lon_col: str = "vlon",
) -> DataFrame:
    """(way_id, c_lat, c_lon): the polygon's area centroid via the
    shoelace centroid formula, computed (like the area) in coordinates
    CENTERED on vertex 1 — the centroid formula is translation-
    equivariant, and centering removes the catastrophic cancellation
    raw lon/lat would suffer (see the area comment above).

    ``Cx = x0 + Σ(cx_i+cx_{i+1})·cross_i / (3·Σcross_i)`` with the same
    wraparound successor as the area fold.  Degenerate rings (signed
    double-area exactly 0: fewer than 3 vertices or collinear) fall
    back to the plain vertex mean — deterministic, and the SQL replay
    takes the same branch.  Zero shuffle, zero UDF: three sequential
    ``F.aggregate`` folds the oracle mirrors term by term."""
    vlat, vlon = F.col(lat_col), F.col(lon_col)
    n = F.size(vlat)
    idx = F.sequence(F.lit(1), n)
    nxt = lambda i: (i % n) + 1  # noqa: E731
    x0 = F.element_at(vlon, 1)
    y0 = F.element_at(vlat, 1)
    cx = lambda i: F.element_at(vlon, i) - x0  # noqa: E731
    cy = lambda i: F.element_at(vlat, i) - y0  # noqa: E731

    def cross(i):
        return cx(i.cast("int")) * cy(nxt(i).cast("int")) - cx(
            nxt(i).cast("int")
        ) * cy(i.cast("int"))

    a2 = F.aggregate(idx, F.lit(0.0), lambda acc, i: acc + cross(i))
    sx = F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, i: acc
        + (cx(i.cast("int")) + cx(nxt(i).cast("int"))) * cross(i),
    )
    sy = F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, i: acc
        + (cy(i.cast("int")) + cy(nxt(i).cast("int"))) * cross(i),
    )
    mean_lon = F.aggregate(vlon, F.lit(0.0), lambda a, v: a + v) / n.cast(
        "double"
    )
    mean_lat = F.aggregate(vlat, F.lit(0.0), lambda a, v: a + v) / n.cast(
        "double"
    )
    ok = n >= 1
    degen = a2 == 0.0
    return polygons.select(
        F.col(id_col),
        F.when(ok, F.when(degen, mean_lat).otherwise(y0 + sy / (3.0 * a2)))
        .alias("c_lat"),
        F.when(ok, F.when(degen, mean_lon).otherwise(x0 + sx / (3.0 * a2)))
        .alias("c_lon"),
    )


def way_centroid_sql(verts_table: str = "polys") -> str:
    """DuckDB replay of :func:`way_centroid` — same centered folds,
    same fold order, same degenerate-ring vertex-mean branch."""
    cxi = "(vlon[i] - vlon[1])"
    cyi = "(vlat[i] - vlat[1])"
    cxn = "(vlon[((i % nn) + 1)] - vlon[1])"
    cyn = "(vlat[((i % nn) + 1)] - vlat[1])"
    cross = f"({cxi} * {cyn} - {cxn} * {cyi})"
    fold = (
        "list_reduce(list_prepend(0.0, list_transform(generate_series(1, nn),"
        " i -> {term})), (acc, v) -> acc + v)"
    )
    a2 = fold.format(term=cross)
    sx = fold.format(term=f"({cxi} + {cxn}) * {cross}")
    sy = fold.format(term=f"({cyi} + {cyn}) * {cross}")
    mean = (
        "list_reduce(list_prepend(0.0, {arr}), (acc, v) -> acc + v)"
        " / CAST(nn AS DOUBLE)"
    )
    return f"""
        SELECT way_id,
               CASE WHEN nn >= 1 THEN
                   CASE WHEN a2 = 0.0 THEN {mean.format(arr="vlat")}
                        ELSE vlat[1] + sy / (3.0 * a2) END END AS c_lat,
               CASE WHEN nn >= 1 THEN
                   CASE WHEN a2 = 0.0 THEN {mean.format(arr="vlon")}
                        ELSE vlon[1] + sx / (3.0 * a2) END END AS c_lon
        FROM (
            SELECT way_id, vlat, vlon, nn,
                   {a2} AS a2, {sx} AS sx, {sy} AS sy
            FROM (SELECT way_id, vlat, vlon, len(vlat) AS nn
                  FROM {verts_table})
        )
    """


def way_geometry_stats_sql(verts_table: str = "polys") -> str:
    """DuckDB replay over ``{verts_table}(way_id, vlat list, vlon list)``.

    ``list_reduce`` folds left→right exactly like ``F.aggregate``; the
    per-edge expressions use the same IEEE op order as ``_hav_edge`` /
    the shoelace fold above, so results are bit-identical.
    """
    hav = (
        "2.0 * 6371000.0 * asin(sqrt("
        "sin(radians(vlat[((i % nn) + 1)] - vlat[i]) / 2)"
        " * sin(radians(vlat[((i % nn) + 1)] - vlat[i]) / 2)"
        " + cos(radians(vlat[i])) * cos(radians(vlat[((i % nn) + 1)]))"
        " * sin(radians(vlon[((i % nn) + 1)] - vlon[i]) / 2)"
        " * sin(radians(vlon[((i % nn) + 1)] - vlon[i]) / 2)))"
    )
    cross = (
        "((vlon[i] - vlon[1]) * (vlat[((i % nn) + 1)] - vlat[1])"
        " - (vlon[((i % nn) + 1)] - vlon[1]) * (vlat[i] - vlat[1]))"
    )
    return f"""
        SELECT way_id,
               nn AS n_vertices,
               mean_lat,
               CASE WHEN nn >= 1 THEN
                   list_reduce(list_prepend(0.0, list_transform(generate_series(1, nn),
                       i -> {hav})), (acc, v) -> acc + v) END AS perimeter_m,
               CASE WHEN nn >= 1 THEN
                   abs(list_reduce(list_prepend(0.0, list_transform(generate_series(1, nn),
                       i -> {cross})), (acc, v) -> acc + v)) / 2.0
                     * (111320.0 * cos(radians(mean_lat))) * 110574.0 END AS area_m2
        FROM (
            SELECT way_id, vlat, vlon, len(vlat) AS nn,
                   CASE WHEN len(vlat) >= 1 THEN
                       list_reduce(list_prepend(0.0, vlat), (acc, v) -> acc + v)
                         / CAST(len(vlat) AS DOUBLE) END AS mean_lat
            FROM {verts_table}
        )
    """


_EARTH_R_M = 6371000.0


def spherical_area_m2(vlat: Column | str, vlon: Column | str) -> Column:
    """Geodesic ring area via the Chamberlain & Duquette (2007) closed
    form ("Some algorithms for polygons on a sphere", JPL publication —
    the formula behind turf.js/geojson-area):

        A = |Σ_i (λ_{i+1} − λ_i)(2 + sin φ_i + sin φ_{i+1})| · R² / 2

    (λ, φ in radians, indices mod n). Exact on the sphere for
    great-circle-edged rings small relative to the globe and free of
    the planar form's high-latitude distortion: ``way_geometry_stats``'s
    equirectangular shoelace fixes ONE cos(mean lat) scale per ring,
    which skews multi-degree-tall polygons; this form integrates the
    latitude term per edge (validated in tests: agrees with planar to
    <1e-6 relative on small rings at any latitude, and stays finite
    and orientation-invariant where planar drifts).

    One fold over the vertex array — pure Column expression, zero
    shuffle. Float op order is pinned (radians → sin → product → left
    fold → abs → one multiply) so a SQL replay reproduces it.
    """
    la = F.col(vlat) if isinstance(vlat, str) else vlat
    lo = F.col(vlon) if isinstance(vlon, str) else vlon
    n = F.size(la)
    term = lambda i: (  # noqa: E731
        F.radians(F.element_at(lo, (i % n + 1).cast("int")))
        - F.radians(F.element_at(lo, i.cast("int")))
    ) * (
        F.lit(2.0)
        + F.sin(F.radians(F.element_at(la, i.cast("int"))))
        + F.sin(F.radians(F.element_at(la, (i % n + 1).cast("int"))))
    )
    total = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0.0),
        lambda acc, i: acc + term(i),
    )
    return F.when(
        n >= 3,
        F.abs(total) * F.lit(_EARTH_R_M * _EARTH_R_M / 2.0),
    ).otherwise(F.lit(0.0))


def destination_point(
    lat: Column, lon: Column, bearing_deg: Column, dist_m: Column
) -> Column:
    """Spherical direct problem: the point ``dist_m`` metres from
    (lat, lon) along initial ``bearing_deg`` (great-circle; standard
    navigation closed form, e.g. Movable Type's "Destination point
    given distance and bearing"):

        φ2 = asin(sin φ1 · cos δ + cos φ1 · sin δ · cos θ)
        λ2 = λ1 + atan2(sin θ · sin δ · cos φ1,
                        cos δ − sin φ1 · sin φ2)

    with δ = d/R. Returns a struct(lat, lon) in degrees — one pure
    Column expression per row (zero shuffle), float op order pinned so
    a SQL replay reproduces it; consumers quantize (micro-degrees) at
    their output boundary like every float surface in the engine. The
    inverse companion of the haversine distance, completing the
    forward/inverse geodesic pair (trip simulation, synthetic GPS
    noise, isochrone ray casting)."""
    phi1 = F.radians(lat)
    theta = F.radians(bearing_deg)
    delta = dist_m / F.lit(_EARTH_R_M)
    sin_phi2 = F.sin(phi1) * F.cos(delta) + F.cos(phi1) * F.sin(delta) * F.cos(
        theta
    )
    phi2 = F.asin(sin_phi2)
    lam2 = F.radians(lon) + F.atan2(
        F.sin(theta) * F.sin(delta) * F.cos(phi1),
        F.cos(delta) - F.sin(phi1) * sin_phi2,
    )
    return F.struct(
        F.degrees(phi2).alias("lat"), F.degrees(lam2).alias("lon")
    )
