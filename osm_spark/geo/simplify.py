"""Polyline simplification — Douglas-Peucker over assembled vertex arrays.

The reference models ways as ordered node-ref lists (`lib/osm/way.rb` —
``Osm::Way`` carries ordered node ids; SURVEY.md §1.4); rendering those
ways at low zooms needs geometry *generalization*, the classic raster→
vector companion to the engine's tile/contour layer (SURVEY.md §2.10).
This module is that operator: exact Douglas-Peucker with a deterministic
farthest-point tie-break (lowest index wins), so the kept vertex set is
a pure function of the input and bit-reproducible against the DuckDB
recursive-CTE oracle that replays the same splits.

Scale design (100 TB): the input is ONE ROW PER LINE with vertex arrays
(the shape ``assemble_way_polygons`` already produces), so simplification
is a single ``mapInPandas`` Arrow pass — no shuffle, no groupBy, no state.
Per-task memory is bounded by the largest single line (OSM's longest ways
are ~2k vertices; relations assemble per-ring). A planet-scale run
simplifies 10^9 ways with zero exchanges: the stage pipelines directly
over the scan. Inside the pass each line runs an iterative (explicit
stack) DP with numpy-vectorized distance sweeps per segment — vectorized
Arrow UDF, no per-row Python (BASELINE.json invariant).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = "line_id long, pos int, x double, y double"


def _dp_keep(xs: np.ndarray, ys: np.ndarray, eps2: float) -> np.ndarray:
    """Indices kept by Douglas-Peucker with squared tolerance ``eps2``.

    Iterative stack form (recursion-free); the farthest-point sweep per
    interval is vectorized. Distance is squared perpendicular distance
    in the line's own coordinate plane, computed in exactly the IEEE op
    order the SQL oracle uses: cross = (px-ax)*(by-ay) - (py-ay)*(bx-ax);
    d2 = cross*cross / len2 (or squared point distance when len2 == 0).
    Ties keep the LOWEST index — numpy argmax and the oracle's
    ``ORDER BY d2 DESC, i ASC LIMIT 1`` agree by construction.
    """
    n = xs.shape[0]
    if n <= 2:
        return np.arange(n)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        ax, ay, bx, by = xs[lo], ys[lo], xs[hi], ys[hi]
        px = xs[lo + 1 : hi]
        py = ys[lo + 1 : hi]
        len2 = (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
        if len2 == 0.0:
            d2 = (px - ax) * (px - ax) + (py - ay) * (py - ay)
        else:
            cross = (px - ax) * (by - ay) - (py - ay) * (bx - ax)
            d2 = cross * cross / len2
        j_rel = int(np.argmax(d2))  # first max → lowest index on ties
        if d2[j_rel] > eps2:
            j = lo + 1 + j_rel
            keep[j] = True
            stack.append((lo, j))
            stack.append((j, hi))
    return np.flatnonzero(keep)


def simplify_lines(
    lines: DataFrame,
    epsilon: float,
    id_col: str = "line_id",
    x_col: str = "xs",
    y_col: str = "ys",
) -> DataFrame:
    """Douglas-Peucker simplify ``lines(id, xs array<double>, ys
    array<double>)`` → kept vertices ``(line_id, pos, x, y)``.

    ``pos`` is the vertex's index in the ORIGINAL line, so downstream
    consumers can re-assemble ordered simplified geometry (or diff kept
    vs dropped). One Arrow pass, no shuffle — see module docstring.
    """
    if epsilon < 0:
        raise ValueError(f"epsilon must be >= 0, got {epsilon}")
    eps2 = float(epsilon) * float(epsilon)
    src = lines.select(
        F.col(id_col).cast("long").alias("line_id"),
        F.col(x_col).alias("xs"),
        F.col(y_col).alias("ys"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_pos, out_x, out_y = [], [], [], []
            for lid, xs, ys in zip(pdf["line_id"], pdf["xs"], pdf["ys"]):
                xa = np.asarray(xs, dtype=np.float64)
                ya = np.asarray(ys, dtype=np.float64)
                if xa.shape[0] != ya.shape[0]:
                    raise ValueError(
                        f"line {lid}: xs/ys length mismatch "
                        f"{xa.shape[0]} != {ya.shape[0]}"
                    )
                kept = _dp_keep(xa, ya, eps2)
                out_id.extend([lid] * kept.shape[0])
                out_pos.extend(kept.tolist())
                out_x.extend(xa[kept].tolist())
                out_y.extend(ya[kept].tolist())
            yield pd.DataFrame(
                {
                    "line_id": pd.Series(out_id, dtype="int64"),
                    "pos": pd.Series(out_pos, dtype="int32"),
                    "x": pd.Series(out_x, dtype="float64"),
                    "y": pd.Series(out_y, dtype="float64"),
                }
            )

    return src.mapInPandas(run, OUT_SCHEMA)


def assemble_lines(
    vertices: DataFrame,
    id_col: str = "line_id",
    pos_col: str = "pos",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Vertex rows → one row per line with ordered coordinate arrays.

    The ``collect_list`` + ``array_sort`` ordered-rebuild pattern from
    ``assemble_way_polygons`` (collect order is non-deterministic; the
    sort on (pos, x, y) structs makes it exact). One shuffle on line id;
    at planet scale the vertex table buckets by line id so the exchange
    co-locates away.
    """
    s = F.array_sort(
        F.collect_list(F.struct(F.col(pos_col), F.col(x_col), F.col(y_col)))
    )
    return (
        vertices.groupBy(F.col(id_col).alias("line_id"))
        .agg(
            F.transform(s, lambda v: v[x_col]).alias("xs"),
            F.transform(s, lambda v: v[y_col]).alias("ys"),
        )
    )


def simplify_sql_oracle(
    verts_cte: str, eps2: float, out_cols: str = "line_id, pos, x, y"
) -> str:
    """ANSI-SQL (DuckDB) replay of the exact same Douglas-Peucker splits.

    ``verts_cte`` must yield ``(rid, i, x, y)`` with ``i`` contiguous from
    0 per line. A recursive CTE carries open intervals; each step finds
    the farthest interior vertex with the same squared-distance formula
    and the same lowest-index tie-break, splitting iff d2 > eps2. Kept
    vertices are the union of interval endpoints.
    """
    return f"""
        WITH RECURSIVE verts AS ({verts_cte}),
        split(rid, lo, hi) AS (
            SELECT rid, 0, max(i) FROM verts GROUP BY rid
            UNION ALL
            SELECT s.rid, v.lo2, v.hi2
            FROM split s
            JOIN LATERAL (
                SELECT p.i AS j,
                       (CASE WHEN (b.x-a.x)*(b.x-a.x)+(b.y-a.y)*(b.y-a.y) = 0
                             THEN (p.x-a.x)*(p.x-a.x)+(p.y-a.y)*(p.y-a.y)
                             ELSE ((p.x-a.x)*(b.y-a.y)-(p.y-a.y)*(b.x-a.x))
                                  *((p.x-a.x)*(b.y-a.y)-(p.y-a.y)*(b.x-a.x))
                                  /((b.x-a.x)*(b.x-a.x)+(b.y-a.y)*(b.y-a.y)) END) AS d2
                FROM verts p, verts a, verts b
                WHERE p.rid = s.rid AND p.i > s.lo AND p.i < s.hi
                  AND a.rid = s.rid AND a.i = s.lo
                  AND b.rid = s.rid AND b.i = s.hi
                ORDER BY d2 DESC, p.i ASC LIMIT 1
            ) jj ON jj.d2 > {eps2!r}
            JOIN LATERAL (VALUES (s.lo, jj.j), (jj.j, s.hi)) v(lo2, hi2) ON true
        ),
        kept AS (
            SELECT DISTINCT rid, i FROM (
                SELECT rid, lo AS i FROM split
                UNION ALL SELECT rid, hi FROM split
            )
        )
        SELECT v.rid AS line_id, CAST(v.i AS INT) AS pos, v.x AS x, v.y AS y
        FROM verts v JOIN kept k ON v.rid = k.rid AND v.i = k.i
    """
