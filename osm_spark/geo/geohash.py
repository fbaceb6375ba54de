"""Geohash encoding — the third cell index next to hex (H3-style) and
S2-style (SURVEY.md §2.10): public base-32 geohash as pure Column codegen.

Why a third index: geohash cell ids are *lexicographically prefix-ordered*
— truncating a geohash gives the parent cell, and a prefix range scan
equals a spatial bbox-ish scan. That makes it the natural choice for
partition/sort keys on an Iceberg pages table (north_rule: explicit
partitioning): sorting a 10^12-row table by ``geohash(lat, lon, 7)``
gives both partition pruning for regional queries AND cluster locality
for the PIP/kNN cell joins, with zero engine-specific id space.

Implementation is the standard interleave (even bits longitude, odd bits
latitude, 5 bits per character) as a closed-form integer-arithmetic
Column chain — whole-stage-codegen JVM expressions, no UDF, no shuffle —
and ``geohash_sql`` emits the same chain as ANSI SQL so the DuckDB
oracle replays it bit-exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _bit_layout(precision: int) -> tuple[int, int, list[list[tuple[str, int]]]]:
    """(lonbits, latbits, per-char list of (axis, shift) in MSB→LSB order)."""
    total = 5 * precision
    lonbits = (total + 1) // 2
    latbits = total // 2
    chars: list[list[tuple[str, int]]] = []
    for c in range(precision):
        spec = []
        for b in range(5):
            t = 5 * c + b
            if t % 2 == 0:
                spec.append(("lon", lonbits - 1 - t // 2))
            else:
                spec.append(("lat", latbits - 1 - (t - 1) // 2))
        chars.append(spec)
    return lonbits, latbits, chars


def geohash_expr(lat_col: str | Column, lon_col: str | Column, precision: int) -> Column:
    """Base-32 geohash of (lat, lon) at ``precision`` chars — pure Column.

    floor() (not cast) quantizes, matching SQL floor semantics; the top
    cell edge (lat=90 / lon=180) clamps into the last cell.
    """
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be in [1, 12], got {precision}")
    lat = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    lon = F.col(lon_col) if isinstance(lon_col, str) else lon_col
    lonbits, latbits, chars = _bit_layout(precision)
    # clamp BOTH edges: below-range inputs would quantize negative and
    # shiftright would sign-extend every extracted bit to 1, emitting a
    # wrong-but-plausible cell id (cover_bbox's _q clamps both ends too)
    ilon = F.greatest(
        F.least(
            F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lonbits))).cast("long"),
            F.lit((1 << lonbits) - 1),
        ),
        F.lit(0),
    )
    ilat = F.greatest(
        F.least(
            F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << latbits))).cast("long"),
            F.lit((1 << latbits) - 1),
        ),
        F.lit(0),
    )
    letters = F.array(*[F.lit(ch) for ch in ALPHABET])
    out = []
    for spec in chars:
        idx = F.lit(0)
        for k, (axis, shift) in enumerate(spec):
            src = ilon if axis == "lon" else ilat
            bit = F.shiftright(src, shift).bitwiseAND(F.lit(1))
            idx = idx + F.shiftleft(bit, 4 - k)
        out.append(F.element_at(letters, (idx + F.lit(1)).cast("int")))
    return F.concat(*out)


def geohash_sql(lat_expr: str, lon_expr: str, precision: int) -> str:
    """The identical chain as ANSI SQL (DuckDB) for oracle replay.

    ``lat_expr``/``lon_expr`` are column expressions (e.g. ``'lat'``);
    the quantizers are inlined at every bit reference so the emitted
    string is a plain scalar expression usable in any SELECT position
    (no correlated subquery). Verbose but dependency-free; integer bit
    ops are bit-exact across engines.
    """
    lonbits, latbits, chars = _bit_layout(precision)
    ilon = (
        f"greatest(least(CAST(floor((({lon_expr}) + 180.0) / 360.0 * {float(1 << lonbits)!r}) "
        f"AS BIGINT), {(1 << lonbits) - 1}), 0)"
    )
    ilat = (
        f"greatest(least(CAST(floor((({lat_expr}) + 90.0) / 180.0 * {float(1 << latbits)!r}) "
        f"AS BIGINT), {(1 << latbits) - 1}), 0)"
    )
    parts = []
    for spec in chars:
        bits = []
        for k, (axis, shift) in enumerate(spec):
            src = ilon if axis == "lon" else ilat
            bits.append(f"((({src}) >> {shift}) & 1) * {1 << (4 - k)}")
        idx = " + ".join(bits)
        parts.append(f"substr('{ALPHABET}', CAST({idx} AS INT) + 1, 1)")
    return "(" + " || ".join(parts) + ")"


def _encode_ints(ilat: int, ilon: int, precision: int) -> str:
    """Geohash string from pre-quantized integer cell coordinates."""
    _, _, chars = _bit_layout(precision)
    out = []
    for spec in chars:
        idx = 0
        for k, (axis, shift) in enumerate(spec):
            src = ilon if axis == "lon" else ilat
            idx += ((src >> shift) & 1) << (4 - k)
        out.append(ALPHABET[idx])
    return "".join(out)


def cover_bbox(
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    precision: int,
    max_cells: int = 4096,
) -> list[str]:
    """Every geohash cell at ``precision`` intersecting the bbox — the
    prefix set a viewport query prunes its scan with.

    Superset guarantee: quantization floors both corners, so the cell
    ranges [ilat_min..ilat_max] × [ilon_min..ilon_max] cover every point
    in the closed bbox. Driver-side pure Python over integers (the cell
    count is the enumeration bound, independent of data size); raises if
    the viewport needs more than ``max_cells`` cells — pick a coarser
    precision instead of enumerating a continent at res 7.
    """
    if min_lat > max_lat or min_lon > max_lon:
        raise ValueError("bbox corners out of order")
    lonbits, latbits, _ = _bit_layout(precision)

    def _q(v: float, lo: float, span: float, bits: int) -> int:
        i = int(math.floor((v - lo) / span * float(1 << bits)))
        return min(max(i, 0), (1 << bits) - 1)

    la0 = _q(min_lat, -90.0, 180.0, latbits)
    la1 = _q(max_lat, -90.0, 180.0, latbits)
    lo0 = _q(min_lon, -180.0, 360.0, lonbits)
    lo1 = _q(max_lon, -180.0, 360.0, lonbits)
    n = (la1 - la0 + 1) * (lo1 - lo0 + 1)
    if n > max_cells:
        raise ValueError(
            f"bbox covers {n} cells at precision {precision} "
            f"(> max_cells={max_cells}); use a coarser precision"
        )
    return sorted(
        _encode_ints(la, lo, precision)
        for la in range(la0, la1 + 1)
        for lo in range(lo0, lo1 + 1)
    )


def viewport_filter(
    df,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    gh_col: str | None = None,
    precision: int = 4,
    gh_precision: int | None = None,
):
    """Exact bbox filter with a geohash-prefix prune in front.

    When ``gh_col`` names a geohash column the table is partitioned or
    sorted by, the covering-cell IN-list prunes partitions/row groups
    BEFORE the exact lat/lon comparison runs — on a 10^12-row table laid
    out by ``write_partitioned(..., ['gh4'])`` a city viewport touches a
    handful of directories instead of the full scan. The exact predicate
    keeps semantics independent of the prune (covering is a superset),
    which is what the oracle checks.

    ``gh_precision`` is the precision the COLUMN stores (defaults to
    ``precision``). When the two are equal the prune is a direct
    ``isin`` on the column — the form Catalyst turns into partition
    pruning / parquet dictionary pushdown. When the column is finer, a
    ``substring`` prefix compare is used instead: still a row filter,
    but NOT partition-prunable (expression on the partition column) —
    lay the table out at the precision you query, or pass the coarser
    column.
    """
    exact = (
        (F.col(lat_col) >= F.lit(min_lat))
        & (F.col(lat_col) <= F.lit(max_lat))
        & (F.col(lon_col) >= F.lit(min_lon))
        & (F.col(lon_col) <= F.lit(max_lon))
    )
    if gh_col is not None:
        # gh_precision is REQUIRED with gh_col: defaulting it would make
        # a finer-than-`precision` column fail isin for EVERY row — a
        # silent 0-row result instead of a loud error. (A row-level
        # assert cannot catch this either: partition pruning would
        # remove the offending rows before the assert runs.)
        if gh_precision is None:
            raise ValueError(
                "viewport_filter: pass gh_precision (the precision the "
                f"column {gh_col!r} stores) alongside gh_col"
            )
        if gh_precision < precision:
            raise ValueError(
                f"gh_col stores precision {gh_precision} but the prune "
                f"needs {precision}; enumerate at <= {gh_precision}"
            )
        cells = cover_bbox(min_lat, max_lat, min_lon, max_lon, precision)
        if gh_precision > precision:
            prune = F.substring(F.col(gh_col), 1, precision).isin(cells)
        else:
            prune = F.col(gh_col).isin(cells)
        return df.filter(prune).filter(exact)
    return df.filter(exact)
