"""Cell-prejoined point-in-polygon join — the engine's flagship operator.

Plan shape (SURVEY.md §2.10, informed by Raster Intervals SIGMOD'23's
filter-then-refine decomposition):

1. **extract**: pages.text → (lat, lon) via the pinned regex, encode to
   hex cell (res 9) + S2 (level 13). One ArrowEvalPython pass by default,
   or a zero-Python Generate-barrier form (``engine="jvm"``) — bit-exact
   parity, see ``extract_points``.
2. **prejoin**: equi join ``points.h3_9 == way_cells.cell``. The polygon
   covering is the *small* side — broadcast when under threshold, else a
   shuffle hash join with **explicit per-cell salting** for hot cells
   (north_rule requires explicit skew handling: AQE splits oversized
   shuffle blocks, but only salting spreads a single hot *key*).
3. **refine**: exact ray-cast PIP in a vectorized mapInPandas over the
   candidate pairs (grouped by way within each Arrow batch).

At the 10^12-row design point the pages side never shuffles in the
broadcast path — the only wide exchange is the final aggregation, and
filter/projection pushdown reaches the parquet/Iceberg scan because steps
1-2 are plain Column expressions over one scan.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.geo.extract import COORD_REGEX
from osm_spark.geo.hexgrid import DEFAULT_RES, hex_cell_expr, points_in_polygon_np
from osm_spark.geo.s2 import s2_cell_cols

# Above this many covering cells we stop broadcasting and use the salted
# shuffle path (each cell row is ~16 bytes + way vertices joined later).
BROADCAST_MAX_CELLS = 2_000_000

# A cell is "hot" when it holds more than this many points; its key is
# split into ceil(n/target) salt buckets.
HOT_CELL_TARGET = 50_000

# engine="auto" switches extraction to the zero-Python JVM form at or
# above this defaultParallelism. Measured (BENCH.md finding #10): the
# Arrow pipe saturates a single VM's serialization bandwidth well below
# 16 concurrent workers (extract-stage scaling 0.33 vs the JVM form's
# 0.76 at 10 M rows, jvm extract-only ~2× faster at local[32]); below
# that the two engines are within host noise, so the oracle-gated Arrow
# form stays the default. On a real cluster each executor has its own
# worker pipes, so the threshold keys off defaultParallelism — the
# per-JVM task-slot count in local mode, total cores on a cluster —
# which is conservative there (per-executor parallelism is what
# saturates; a cluster past 16 total cores still benefits from jvm's
# zero serialization cost).
JVM_ENGINE_MIN_PARALLELISM = 16


def extract_points(
    pages: DataFrame,
    res: int = DEFAULT_RES,
    s2_level: int = 13,
    with_s2: bool = False,
    engine: str = "auto",
) -> DataFrame:
    """pages → page_points(url, lat, lon, h3_9[, s2_13]); rows without a
    coordinate are dropped (they can never join).

    Two engines, bit-identical output (parity-tested); the default
    ``"auto"`` picks by ``defaultParallelism`` (>= ``JVM_ENGINE_MIN_
    PARALLELISM`` → jvm): at high parallelism every Arrow worker shares
    one VM's serialization bandwidth and the pipe saturates (BENCH.md
    finding #10), while the JVM form costs nothing to scale.

    - ``engine="arrow"`` (default): ONE vectorized Arrow UDF pass (pandas
      str.extract, C regex). Besides being fast, the Python eval node is
      a project-collapse barrier, so the downstream hex encode (pure
      Column, codegen) reads plain lat/lon attributes instead of having
      the regex tree inlined into every one of its ~8 references — the
      expression blowup that made the naive all-Column form ~10× slower
      end-to-end.
    - ``engine="jvm"``: zero-Python form using ``explode(array(...))``
      Generate barriers in place of the Arrow node. GenerateExec
      materializes its generator output once per row, so CollapseProject
      cannot clone the regex / parse / hex-encode subtrees into their
      downstream references — the same once-per-row guarantee the Arrow
      barrier gives, at zero serialization cost. Measured (BENCH.md
      finding #10): full-PIP-pipeline parity with the Arrow engine at
      every size/parallelism tried (within host noise), extract-only
      ~2× faster at local[32] on pipe-floor-dominated inputs; kept
      non-default because the Arrow form is the oracle-gated path, but
      it is the form to prefer on real clusters where Python workers
      are the scarce resource.

    ``with_s2`` adds the S2 cell column; off by default so join paths
    that key on h3 alone never pay for it.
    """
    if engine == "auto":
        par = pages.sparkSession.sparkContext.defaultParallelism
        engine = "jvm" if par >= JVM_ENGINE_MIN_PARALLELISM else "arrow"
    if engine == "jvm":
        return _extract_points_jvm(pages, res, s2_level, with_s2)
    if engine != "arrow":
        raise ValueError(f"engine must be 'arrow', 'jvm' or 'auto', got {engine!r}")
    # Extraction + row-drop run as ONE vectorized mapInPandas pass
    # (pandas str.extract, C regex). The single Python node is a hard
    # optimizer barrier in BOTH directions: an all-Column formulation was
    # measured with CollapseProject/pushdown cloning the regex subtree
    # into every downstream reference (~10 evals/row), and the earlier
    # scalar-UDF + Spark-side notNull FILTER form was observed split by
    # filter pushdown into TWO ArrowEvalPython nodes around an upstream
    # exchange (the UDF evaluated once below for the filter, again above
    # for the projection). Dropping non-matching rows INSIDE the pandas
    # pass leaves Catalyst nothing to push, so the regex runs exactly
    # once per row; downstream cell math is pure-Column codegen.
    def _gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ext = pdf["text"].str.extract(COORD_REGEX, expand=True)
            lat = pd.to_numeric(ext[0], errors="coerce")
            lon = pd.to_numeric(ext[1], errors="coerce")
            bad = (lat.abs() > 90) | (lon.abs() > 180)
            lat[bad] = None
            lon[bad] = None
            keep = lat.notna() & lon.notna()
            if keep.any():
                yield pd.DataFrame(
                    {"url": pdf["url"][keep], "lat": lat[keep], "lon": lon[keep]}
                )

    pts = pages.select("url", "text").mapInPandas(
        _gen, "url string, lat double, lon double"
    )
    out = pts.select(
        F.col("url"),
        F.col("lat"),
        F.col("lon"),
        hex_cell_expr("lat", "lon", res).alias("h3_9"),
    )
    if with_s2:
        # codegen chain (s2_cell_cols) — no second Arrow round trip
        out = s2_cell_cols(out, level=s2_level, out="s2_13")
    return out


def _extract_points_jvm(
    pages: DataFrame, res: int, s2_level: int, with_s2: bool
) -> DataFrame:
    """Zero-Python extraction via stacked Generate barriers.

    Three barriers, each pinning one expensive subtree to exactly one
    evaluation per row:

    1. the raw regex match (group 0) — one full-text regex scan;
    2. the parsed (lat, lon) struct — substring parse of the <=64-char
       match, referenced dozens of times by the PIP refine lambdas;
    3. the hex cell id — the ~40-op encode chain, referenced by the
       prejoin hash on both candidate paths.

    Barrier 2/3 cost is negligible (the exploded arrays are 1-element and
    the attributes are scalars); without them CollapseProject re-inlines
    the subtree into every reference — the measured 3× regression of the
    array-form kNN experiment (BENCH.md finding #8), JVM edition.
    Semantics match the Arrow engine exactly: same COORD_REGEX first
    match, same domain filter, strtod on both sides (parity-tested
    bit-exact in tests/test_pipeline.py).
    """
    m_rows = pages.select(
        "url",
        F.explode(F.array(F.regexp_extract(F.col("text"), COORD_REGEX, 0))).alias(
            "m"
        ),
    ).where(F.col("m") != "")
    body = F.substring(F.col("m"), 5, 64)  # strip the 'geo:' prefix
    parsed = m_rows.select(
        "url",
        F.explode(
            F.array(
                F.struct(
                    F.substring_index(body, ",", 1).cast("double").alias("lat"),
                    F.substring_index(body, ",", -1).cast("double").alias("lon"),
                )
            )
        ).alias("c"),
    ).where((F.abs(F.col("c.lat")) <= 90.0) & (F.abs(F.col("c.lon")) <= 180.0))
    out = parsed.select(
        "url",
        F.col("c.lat").alias("lat"),
        F.col("c.lon").alias("lon"),
        F.explode(F.array(hex_cell_expr("c.lat", "c.lon", res))).alias("h3_9"),
    )
    if with_s2:
        out = s2_cell_cols(out, level=s2_level, out="s2_13")
    return out


def pip_cover_expr(
    lat: Column, lon: Column, vlat: Column, vlon: Column, eps: float = 1e-12
) -> Column:
    """Exact PIP 'covers' test as a pure Column expression.

    Same algorithm and IEEE op order as ``points_in_polygon_np`` (even-odd
    ray cast + boundary inclusion via point-segment distance), so results
    are bit-identical to the numpy refine — but codegen'd: the refine
    stage needs no Python at all. Per row cost is O(vertices) element_at
    arithmetic on broadcast-joined vertex arrays.
    """
    n = F.size(vlat)
    idx = F.sequence(F.lit(0), n - 1)

    def ay(i):
        return F.element_at(vlat, i + 1)

    def ax(i):
        return F.element_at(vlon, i + 1)

    def by(i):
        return F.element_at(vlat, F.pmod(i + 1, n) + 1)

    def bx(i):
        return F.element_at(vlon, F.pmod(i + 1, n) + 1)

    def crosses(i):
        denom = F.when(by(i) - ay(i) == 0.0, F.lit(1.0)).otherwise(by(i) - ay(i))
        xcross = (bx(i) - ax(i)) * (lat - ay(i)) / denom + ax(i)
        return ((ay(i) > lat) != (by(i) > lat)) & (lon < xcross)

    def seg_d2(i):
        abx = bx(i) - ax(i)
        aby = by(i) - ay(i)
        apx = lon - ax(i)
        apy = lat - ay(i)
        d = abx * abx + aby * aby
        t0 = F.when(d > 0.0, (apx * abx + apy * aby) / F.when(d == 0.0, F.lit(1.0)).otherwise(d)).otherwise(F.lit(0.0))
        t = F.least(F.greatest(t0, F.lit(0.0)), F.lit(1.0))
        dx = apx - t * abx
        dy = apy - t * aby
        return dx * dx + dy * dy

    inside = F.pmod(F.size(F.filter(idx, crosses)), F.lit(2)) == 1
    on_edge = F.exists(idx, lambda i: seg_d2(i) <= F.lit(eps * eps))
    return inside | on_edge


def _refine_pip_expr(candidates: DataFrame) -> DataFrame:
    """Column-expression refine over (url, lat, lon, way_id, vlat, vlon)."""
    keep = pip_cover_expr(F.col("lat"), F.col("lon"), F.col("vlat"), F.col("vlon"))
    return candidates.filter(keep).select("url", "way_id")


def _refine_pip(candidates: DataFrame) -> DataFrame:
    """Exact PIP over candidate (point, polygon) pairs.

    Input columns: url, lat, lon, way_id, vlat, vlon. Vectorized per way
    group inside each Arrow batch — no per-row Python.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            lat = pdf["lat"].to_numpy(np.float64)
            lon = pdf["lon"].to_numpy(np.float64)
            for way_id, idx in pdf.groupby("way_id", sort=False).indices.items():
                vlat = np.asarray(pdf["vlat"].iloc[idx[0]], dtype=np.float64)
                vlon = np.asarray(pdf["vlon"].iloc[idx[0]], dtype=np.float64)
                keep[idx] = points_in_polygon_np(lon[idx], lat[idx], vlon, vlat)
            out = pdf.loc[keep, ["url", "way_id"]]
            if len(out):
                yield out

    return candidates.mapInPandas(gen, "url string, way_id long")


def pip_join_broadcast(
    points: DataFrame, polygons: DataFrame, way_cells: DataFrame
) -> DataFrame:
    """Broadcast prejoin path: points never shuffle.

    Join covering cells (broadcast), then attach polygon vertices
    (broadcast), then exact refine. Output (url, way_id), distinct pairs.

    No persist on points: the extraction Arrow UDF node is already a
    project-collapse barrier (per-candidate re-evaluation cannot happen),
    and DataFrame cache materialization measured 10× slower than the
    recompute at local[32] (block-store write contention). On a cluster
    the durable form of this barrier is the checkpointed page_points
    stage (lineage.py).
    """
    cand = points.join(
        F.broadcast(way_cells), points["h3_9"] == way_cells["cell"], "inner"
    ).select("url", "lat", "lon", "way_id")
    cand = cand.join(F.broadcast(polygons.select("way_id", "vlat", "vlon")), "way_id")
    return _refine_pip_expr(cand)


def salt_plan(points: DataFrame, target: int = HOT_CELL_TARGET) -> DataFrame:
    """Per-cell salt factors from the data's own histogram.

    north_rule: skew handling must be explicit and data-driven ("salt
    factor must come from data, not constants" — SURVEY.md §7). Returns
    (cell, k) for hot cells only; everything else implicitly k=1.
    """
    return (
        points.groupBy("h3_9")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > target)
        .select(
            F.col("h3_9").alias("cell"),
            F.ceil(F.col("n") / target).cast("int").alias("k"),
        )
    )


def _prejoin_salted(
    points: DataFrame, way_cells: DataFrame, salts: DataFrame
) -> DataFrame:
    """Shuffle prejoin with explicit hot-cell salting → candidate
    (url, lat, lon, way_id) pairs.

    Points in a hot cell scatter across k salt buckets; the covering rows
    for that cell replicate into all k buckets (small side pays the
    replication). Join key becomes (cell, salt). Shared by the single-
    polygon and multipolygon joins — the covering table is the only thing
    that differs.
    """
    pts = points.join(F.broadcast(salts), points["h3_9"] == salts["cell"], "left")
    pts = pts.select(
        "url",
        "lat",
        "lon",
        "h3_9",
        F.when(
            F.col("k").isNotNull(), F.pmod(F.xxhash64("url"), F.col("k"))
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("salt"),
    )
    wc = way_cells.join(F.broadcast(salts), "cell", "left")
    wc = wc.select(
        "way_id",
        "cell",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("k") - 1, F.lit(0)))
        ).alias("salt"),
    )
    return pts.join(
        wc, (pts["h3_9"] == wc["cell"]) & (pts["salt"] == wc["salt"]), "inner"
    ).select("url", "lat", "lon", "way_id")


def way_salt_plan(way_cells: DataFrame, salts: DataFrame) -> DataFrame:
    """Per-WAY salt factors induced by the hot-CELL salt plan: a way
    whose covering includes a hot cell will receive that cell's point
    mass as candidate pairs, so it inherits the cell's split factor
    (max over its covering when several cells are hot). Derived entirely
    from tables already in hand — no extra pass over the points."""
    return (
        way_cells.join(F.broadcast(salts), "cell")
        .groupBy("way_id")
        .agg(F.max("k").alias("k"))
    )


def attach_polygon_dim(
    cand: DataFrame,
    dim: DataFrame,
    key: str,
    strategy: str,
    way_salts: DataFrame | None = None,
    scatter_col: str = "url",
) -> DataFrame:
    """Attach a polygon-keyed dim table (vertex arrays, areas, ring
    metadata) to a candidate pair list, following the join strategy the
    prejoin already chose.

    The salted shuffle path exists because the polygon side outgrew a
    broadcast — and covering-cell count correlates with vertex-dim bytes
    (continent rings have both the largest coverings and the longest
    vertex arrays), so that same path must NOT turn around and broadcast
    the vertex dim (round-3 verdict's named scale-killer). ``broadcast``
    keeps the small-dim plan; anything else hash-joins on the polygon id
    with an explicit shuffle_hash hint — the candidate list is skinny
    (ids + one point) and the hint prevents the statless-aggregate →
    SortMergeJoin fallback that would sort it (same trade-off as
    ``knn_join(phase2='aqe')``).

    **The way_id key is its own skew axis** (measured: a dense cell
    under a 40-polygon admin stack re-concentrated the freshly-salted
    hot pairs onto 40 way_id keys — 67-73 s vs 24-33 s for the
    broadcast attach on the skew fixture; BENCH.md finding #15). With
    ``way_salts`` (``way_salt_plan`` — per-way split factors inherited
    from the hot-cell plan, zero extra jobs) the attach two-side-salts:
    candidate rows scatter over ``pmod(xxhash64(scatter_col), k)`` and
    the dim rows for hot ways replicate into all k buckets, so the join
    key becomes (way_id, salt) and no single task owns a hot polygon's
    whole candidate mass. Cold ways pay one broadcast-join lookup and a
    1-element explode."""
    if strategy == "broadcast":
        return cand.join(F.broadcast(dim), key)
    if way_salts is not None:
        c = cand.join(F.broadcast(way_salts), key, "left").withColumn(
            "_vsalt",
            F.when(
                F.col("k").isNotNull(), F.pmod(F.xxhash64(scatter_col), F.col("k"))
            )
            .otherwise(F.lit(0))
            .cast("int"),
        ).drop("k")
        d = dim.join(F.broadcast(way_salts), key, "left").select(
            *dim.columns,
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("k") - 1, F.lit(0)))
            ).alias("_vsalt"),
        )
        return c.join(d.hint("shuffle_hash"), [key, "_vsalt"]).drop("_vsalt")
    return cand.join(dim.hint("shuffle_hash"), key)


def pip_join_salted(
    points: DataFrame,
    polygons: DataFrame,
    way_cells: DataFrame,
    salts: DataFrame,
    vertex_strategy: str = "shuffle",
) -> DataFrame:
    """Shuffle prejoin path with explicit hot-cell salting (see
    ``_prejoin_salted``), then the codegen refine.

    ``vertex_strategy`` controls how the polygon vertex dim attaches to
    the candidate list: default ``'shuffle'`` (hash join on way_id,
    two-side-salted by the way-level factors the hot-cell plan induces —
    see ``attach_polygon_dim``) — this path is chosen precisely because
    the polygon side outgrew the broadcast ceiling, and vertex bytes
    grow with covering size, so broadcasting the vertex dim here is the
    next thing to break at planet scale; plain-keying it instead would
    re-concentrate the freshly-salted hot pairs onto the polygon ids
    (measured 2-3× — BENCH.md finding #15). Pass ``'broadcast'`` only
    when the caller knows the vertex dim is small despite a huge
    covering (many tiny polygons)."""
    cand = _prejoin_salted(points, way_cells, salts)
    cand = attach_polygon_dim(
        cand,
        polygons.select("way_id", "vlat", "vlon"),
        "way_id",
        vertex_strategy,
        way_salts=way_salt_plan(way_cells, salts),
    )
    return _refine_pip_expr(cand)


def pip_join_multipolygon(
    points: DataFrame,
    rings: DataFrame,
    ring_cells: DataFrame | None = None,
    strategy: str = "auto",
    levels: list[int] | None = None,
) -> DataFrame:
    """Multipolygon PIP: (url, relation_id) pairs where the point lies
    inside at least one ``outer`` ring and inside no ``inner`` ring
    (holes) — OSM multipolygon semantics over the normalized ring table
    from ``relation_rings`` (relation_id, role, way_id, vlat, vlon).
    Reference analog: the relation-member model (lib/osm/event.rb:63-65
    nested structs; SURVEY.md §1.4).

    Same filter-then-refine shape and the same strategy surface as
    ``pip_join``: ``'broadcast'`` prejoins the ring covering (points
    never shuffle), ``'salted'`` is the shuffle prejoin with explicit
    data-driven hot-cell salting, ``'auto'`` decides from the
    bbox-derived covering estimate. Relation multipolygons are exactly
    where broadcast breaks first — continent/admin boundary rings have
    the largest coverings of any geometry — so the salted path matters
    *more* here than for single polygons. After the prejoin: codegen
    ray-cast refine per candidate (point, ring), then one aggregation
    per (point, relation) combining roles. A point inside a hole still
    matches the outer's covering cells, so the inner test runs on
    exactly the candidates that need it.

    ``levels``: pass the resolution set of a MIXED-resolution ring
    covering (``build_way_cells_adaptive`` — relation multipolygons are
    exactly where the flat-res covering explodes first: a continent
    outer ring at res 9 is 10^7-10^8 cells, its holes tiny). Points
    expand to their cell at every level (same codegen explode as
    ``pip_join_adaptive``); both strategies below then work unchanged
    because mixed-res ids never collide across levels.
    """
    from osm_spark.pipeline.geometry import (
        build_way_cells,
        build_way_cells_adaptive,
    )

    ring_geo = rings.select("way_id", "vlat", "vlon")
    if ring_cells is None:
        if (
            strategy == "auto"
            and estimate_covering_cells(ring_geo) > BROADCAST_MAX_CELLS
        ):
            # same ladder as pip_join: a flat covering past the ceiling
            # first tries the budget-capped mixed-res covering (rings
            # are where the flat form explodes first)
            ring_cells = build_way_cells_adaptive(ring_geo)
            levels = covering_levels(ring_cells)
            strategy = (
                "broadcast"
                if estimate_covering_cells(ring_geo, cap=4096)
                <= BROADCAST_MAX_CELLS
                else "salted"
            )
        else:
            ring_cells = build_way_cells(ring_geo)
    if levels is not None:
        points = points.withColumn(
            "h3_9", F.explode(point_cells_expr("lat", "lon", levels))
        )
    if strategy == "auto":
        strategy = (
            "broadcast"
            if estimate_covering_cells(ring_geo) <= BROADCAST_MAX_CELLS
            else "salted"
        )
    ring_salts = None
    if strategy == "broadcast":
        cand = points.join(
            F.broadcast(ring_cells), points["h3_9"] == ring_cells["cell"], "inner"
        ).select("url", "lat", "lon", "way_id")
    elif strategy == "salted":
        salts = salt_plan(points)
        cand = _prejoin_salted(points, ring_cells, salts)
        ring_salts = way_salt_plan(ring_cells, salts)
    else:
        raise ValueError(f"unknown pip_join_multipolygon strategy: {strategy!r}")
    # The ring vertex dim follows the SAME strategy the prejoin chose:
    # on the salted path (chosen because the ring covering outgrew the
    # broadcast ceiling) it hash-joins on (way_id, salt) instead of
    # broadcasting — ring vertex bytes grow with the covering, and the
    # two-sided salt keeps a hot cell's stacked rings from
    # re-concentrating the pairs (see attach_polygon_dim).
    cand = attach_polygon_dim(
        cand,
        rings.select("relation_id", "role", "way_id", "vlat", "vlon"),
        "way_id",
        "broadcast" if strategy == "broadcast" else "shuffle",
        way_salts=ring_salts,
    )
    hit = cand.withColumn(
        "inside", pip_cover_expr(F.col("lat"), F.col("lon"), F.col("vlat"), F.col("vlon"))
    )
    return (
        hit.groupBy("url", "relation_id")
        .agg(
            F.max(F.when(F.col("role") == "outer", F.col("inside"))).alias("in_outer"),
            F.max(F.when(F.col("role") == "inner", F.col("inside"))).alias("in_inner"),
        )
        .filter(
            F.coalesce(F.col("in_outer"), F.lit(False))
            & ~F.coalesce(F.col("in_inner"), F.lit(False))
        )
        .select("url", "relation_id")
    )


def estimate_covering_cells(
    polygons: DataFrame, res: int = DEFAULT_RES, cap: int | None = None
) -> int:
    """Upper-bound covering-cell estimate from polygon bboxes — pure
    Column arithmetic over the (small) polygon dim, mirroring
    ``hex_polyfill``'s candidate grid: (Δq+5)·(Δr+5) per polygon.

    This is the strategy-choice statistic: unlike ``way_cells.count()``
    it never executes the Python polyfill (at planet scale that count is
    a full covering job over millions of polygons; this is one codegen
    aggregate over vertex arrays).

    ``cap``: per-polygon ceiling — the estimate for a MIXED-resolution
    covering (``build_way_cells_adaptive`` bounds each polygon at its
    budget, so the adaptive index is ≤ Σ min(flat_est, budget))."""
    from osm_spark.geo.hexgrid import edge_deg

    size = edge_deg(res)
    qf = F.transform(
        F.arrays_zip(F.col("vlat").alias("la"), F.col("vlon").alias("lo")),
        lambda v: (0.5773502691896258 * v["lo"] - v["la"] / 3.0) / size,
    )
    rf = F.transform(F.col("vlat"), lambda la: (2.0 / 3.0 * la) / size)
    per_poly = (
        (F.array_max(qf) - F.array_min(qf) + 5.0)
        * (F.array_max(rf) - F.array_min(rf) + 5.0)
    )
    if cap is not None:
        per_poly = F.least(per_poly, F.lit(float(cap)))
    [row] = (
        polygons.select(per_poly.alias("est"))
        .agg(F.sum("est").alias("total"))
        .collect()
    )
    return int(row.total or 0)


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    way_cells: DataFrame | None = None,
    strategy: str = "auto",
    budget: int = 4096,
) -> DataFrame:
    """Auto-strategy PIP join. Returns (url, way_id) exact-match pairs.

    ``strategy``: 'broadcast' | 'salted' | 'auto'. Auto decides from the
    bbox-derived covering estimate (one cheap aggregate over the polygon
    dim — no covering materialization, no Python); callers that know
    their catalog stats pass the strategy explicitly and pay no job.

    Auto escalation ladder when no ``way_cells`` is supplied:

    1. flat res-9 covering fits the broadcast ceiling → broadcast
       prejoin, points never shuffle;
    2. flat covering too big but the MIXED-resolution covering
       (``build_way_cells_adaptive``, each polygon capped at ``budget``
       cells) fits → adaptive broadcast — still zero point shuffle, and
       measured 3.5× faster than the salted fallback it replaces while
       building its index 62× faster (BENCH.md adaptive-covering table);
    3. even Σ min(flat_est, budget) exceeds the ceiling (the polygon
       COUNT itself is huge) → adaptive covering + salted shuffle.

    Caller-supplied ``way_cells`` keeps the classic two-way choice (the
    caller owns the covering's shape); explicit 'broadcast'/'salted'
    with no ``way_cells`` keeps the flat covering for plan-pinning
    tests and callers that want the exact classic plans."""
    from osm_spark.pipeline.geometry import (
        build_way_cells,
        build_way_cells_adaptive,
    )

    if way_cells is None and strategy == "auto":
        if estimate_covering_cells(polygons) <= BROADCAST_MAX_CELLS:
            return pip_join_broadcast(points, polygons, build_way_cells(polygons))
        index = build_way_cells_adaptive(polygons, budget=budget)
        fits = (
            estimate_covering_cells(polygons, cap=budget) <= BROADCAST_MAX_CELLS
        )
        return pip_join_adaptive(
            points, polygons, index, "broadcast" if fits else "salted"
        )
    if way_cells is None:
        way_cells = build_way_cells(polygons)
    if strategy == "auto":
        strategy = (
            "broadcast"
            if estimate_covering_cells(polygons) <= BROADCAST_MAX_CELLS
            else "salted"
        )
    if strategy == "broadcast":
        return pip_join_broadcast(points, polygons, way_cells)
    if strategy != "salted":
        raise ValueError(f"unknown pip_join strategy: {strategy!r}")
    return pip_join_salted(points, polygons, way_cells, salt_plan(points))


def covering_levels(way_cells: DataFrame) -> list[int]:
    """Distinct resolutions present in a (possibly mixed-res) covering
    index — the cell id packs its res in the top bits, so this is one
    tiny distinct over a derived column. Bounded by the res range
    (≤ ~15 values); at planet scale this is a catalog statistic the
    caller passes explicitly to skip the job."""
    rows = (
        way_cells.select(F.shiftright("cell", 58).alias("res")).distinct().collect()
    )
    return sorted(int(r.res) for r in rows)


def point_cells_expr(lat, lon, levels: list[int]):
    """Array of the point's cell id at each covering level — pure
    codegen (one fused projection; no Python, no shuffle)."""
    return F.array(*[hex_cell_expr(lat, lon, r) for r in levels])


def pip_join_adaptive(
    points: DataFrame,
    polygons: DataFrame,
    way_cells: DataFrame,
    strategy: str = "broadcast",
    levels: list[int] | None = None,
) -> DataFrame:
    """PIP join over a MIXED-resolution covering index
    (``build_way_cells_adaptive``) — the planet-scale covering shape
    where large polygons sit at coarser cells so the index stays
    ``O(polygons × budget)`` rows instead of ``O(total area)``.

    Plan: each point expands to its cell id at every level present
    (``explode`` of a codegen array — on the broadcast path the
    expanded rows exist only inside one WholeStageCodegen pipeline
    feeding the hash probe, never materialized or shuffled; on the
    salted path the one prejoin shuffle carries ``levels×`` skinny
    rows, the same bytes as per-level passes without re-scanning
    points). Cell ids collide only within a level (res rides the top
    bits), so ONE equi-join against the whole mixed index is exact:
    each (point, way) true pair appears exactly once — a way's covering
    lives at exactly one res and a point has exactly one cell there.

    The salted path reuses the single-level machinery verbatim: the
    hot-cell histogram over the exploded frame prices EVERY level's
    cells in one map-side-combined aggregate (a hot fine cell makes its
    coarse ancestors at least as hot, so they earn their own factors),
    and the vertex attach inherits per-way factors exactly as in
    ``pip_join_salted`` (BENCH.md finding #15).

    ``levels``: pass the catalog's known level set to skip the
    ``covering_levels`` job."""
    cand, way_salts = _adaptive_candidates(points, way_cells, strategy, levels)
    vx = polygons.select("way_id", "vlat", "vlon")
    if way_salts is None:
        cand = attach_polygon_dim(cand, vx, "way_id", "broadcast")
    else:
        cand = attach_polygon_dim(
            cand, vx, "way_id", "shuffle", way_salts=way_salts
        )
    return _refine_pip_expr(cand)


def _adaptive_candidates(
    points: DataFrame,
    way_cells: DataFrame,
    strategy: str,
    levels: list[int] | None,
) -> tuple[DataFrame, DataFrame | None]:
    """Candidate (url, lat, lon, way_id) pairs for the mixed-res
    covering, plus the per-way salt plan when the salted path ran
    (None on the broadcast path) — shared by ``pip_join_adaptive`` and
    ``reverse_geocode``'s adaptive rungs, whose downstream polygon-dim
    attaches must follow the same salting (BENCH.md finding #15)."""
    if levels is None:
        levels = covering_levels(way_cells)
    mp = points.withColumn(
        "h3_9", F.explode(point_cells_expr("lat", "lon", levels))
    )
    if strategy == "broadcast":
        cand = mp.join(
            F.broadcast(way_cells), mp["h3_9"] == way_cells["cell"], "inner"
        ).select("url", "lat", "lon", "way_id")
        return cand, None
    if strategy == "salted":
        salts = salt_plan(mp)
        return (
            _prejoin_salted(mp, way_cells, salts),
            way_salt_plan(way_cells, salts),
        )
    raise ValueError(f"unknown pip_join_adaptive strategy: {strategy!r}")
