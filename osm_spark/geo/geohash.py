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
    ilon = F.least(
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lonbits))).cast("long"),
        F.lit((1 << lonbits) - 1),
    )
    ilat = F.least(
        F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << latbits))).cast("long"),
        F.lit((1 << latbits) - 1),
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
        f"least(CAST(floor((({lon_expr}) + 180.0) / 360.0 * {float(1 << lonbits)!r}) "
        f"AS BIGINT), {(1 << lonbits) - 1})"
    )
    ilat = (
        f"least(CAST(floor((({lat_expr}) + 90.0) / 180.0 * {float(1 << latbits)!r}) "
        f"AS BIGINT), {(1 << latbits) - 1})"
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
