"""Global Moran's I / Geary's C spatial autocorrelation over the tile raster.

The corpus-level companion to geo/hotspot.py (Gi* answers "WHICH tiles
are hot"; Moran's I answers "is the raster spatially clustered AT ALL"
— the preflight statistic before hotspot hunting, crawl re-prioritizing
or skew salting is worth running). Binary 3×3 queen contiguity, self
EXCLUDED (Moran 1950; Cliff & Ord 1981 formulation):

    I = (N / W) · Σ_i Σ_j w_ij (x_i − x̄)(x_j − x̄) / Σ_i (x_i − x̄)²

Exactness design (the float-sum trap, same treatment as hotspot/lm):
with d_i = N·x_i − Σx (an INTEGER), (x_i − x̄) = d_i / N and the N²
cancels between numerator and denominator:

    I = (N / W) · Σ_i d_i · L_i / Σ_i d_i²,   L_i = N·nbr_sum_i − w_i·Σx

so every data-sized sum is integer arithmetic (decimal(38,0) — per-term
magnitude is (N·x)², past int64 at planet scale; DuckDB replays in
HUGEINT). The only float ops are the four closing casts/divides in one
pinned expression, then micro-unit quantization — value-hash gateable.

The statistical universe is the OCCUPIED tile set (hotspot.py's
documented sparse-raster convention). Occupied tiles with no occupied
neighbor keep w_i = 0, L_i = 0 via the left join — they still count in
N and the denominator.

Plan: tile groupBy (touches the point table once, map-side combined),
8-offset neighbor scatter re-keyed by target (second shuffle),
tile-keyed shuffle-hash join, then ONE single-row global aggregate —
nothing after the first groupBy scales beyond the occupied-tile count.

Output (single row): (n_cells, w_pairs, i_micro, e_i_micro) — i_micro =
round(I·1e6), NULL for a constant or single-tile raster (den = 0);
e_i_micro = round(−1e6/(N−1)), the null-hypothesis expectation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.geo.hotspot import tile_count_grid

_OFFSETS8 = [
    (dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)
]


def morans_i(points: DataFrame, z: int) -> DataFrame:
    counts = tile_count_grid(points, z)

    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _OFFSETS8
        ]
    )
    scattered = counts.select("x", "y", "cnt", F.explode(offs).alias("o")).select(
        (F.col("x") + F.col("o.dx")).alias("tx"),
        (F.col("y") + F.col("o.dy")).alias("ty"),
        "cnt",
    )
    nbr = scattered.groupBy("tx", "ty").agg(
        F.sum("cnt").alias("nbr_sum"), F.count(F.lit(1)).alias("w")
    )
    # LEFT join: isolated occupied tiles keep w = 0 / nbr_sum = 0 but
    # still contribute to N and the denominator (inner would drop them).
    occ = (
        counts.join(
            nbr.hint("shuffle_hash"),
            (counts["x"] == nbr["tx"]) & (counts["y"] == nbr["ty"]),
            "left",
        )
        .select(
            "cnt",
            F.coalesce(F.col("nbr_sum"), F.lit(0)).alias("nbr_sum"),
            F.coalesce(F.col("w"), F.lit(0)).alias("w"),
        )
    )

    glob = counts.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cnt").alias("sx")
    )
    j = occ.crossJoin(F.broadcast(glob))

    # decimal-FIRST arithmetic: N·x already exceeds int64 at planet
    # scale (N ~ 1e9 occupied z15 tiles × counts ~ 1e6), so promote
    # before the multiply, not after.
    nd_dec = F.col("n").cast("decimal(19,0)")
    d = nd_dec * F.col("cnt") - F.col("sx")
    lag = nd_dec * F.col("nbr_sum") - F.col("w").cast("decimal(19,0)") * F.col("sx")
    parts = j.groupBy().agg(
        F.first("n").alias("n_cells"),
        F.sum("w").alias("w_pairs"),
        F.sum(d * lag).alias("cross_dl"),
        F.sum(d * d).alias("den"),
    )

    nd = F.col("n_cells").cast("double")
    i_val = (nd * F.col("cross_dl").cast("double")) / (
        F.col("w_pairs").cast("double") * F.col("den").cast("double")
    )
    i_micro = F.when(
        (F.col("n_cells") > 1) & (F.col("den") > 0) & (F.col("w_pairs") > 0),
        F.round(i_val * 1e6, 0).cast("long"),
    ).otherwise(F.lit(None).cast("long"))
    e_micro = F.when(
        F.col("n_cells") > 1,
        F.round(F.lit(-1e6) / (nd - 1.0), 0).cast("long"),
    ).otherwise(F.lit(None).cast("long"))
    return parts.select(
        "n_cells",
        "w_pairs",
        i_micro.alias("i_micro"),
        e_micro.alias("e_i_micro"),
    )


def gearys_c(points: DataFrame, z: int) -> DataFrame:
    """Global Geary's C over the same z-tile raster / queen weights as
    ``morans_i`` (Geary 1954; Cliff & Ord 1981):

        C = ((N−1) / (2W)) · Σ_i Σ_j w_ij (x_i − x_j)² / Σ_i (x_i − x̄)²

    Moran's I is covariance-shaped (dominated by global deviation
    products); Geary's C is variogram-shaped (dominated by LOCAL
    pairwise contrast) — the two together distinguish broad trends from
    checkerboard texture, which is why spatial-stats suites ship both.

    Exactness design, same discipline as ``morans_i``: the pair sum
    collapses to per-tile integer algebra

        Σ_{j∈nbr(i)} (x_i − x_j)² = w_i·x_i² − 2·x_i·S_i + Q_i

    with S_i = Σ neighbor counts and Q_i = Σ neighbor counts² from the
    SAME 8-offset scatter (one extra sum column), and with
    d_i = N·x_i − Σx the denominator Σ(x−x̄)² = Σd_i²/N², so

        C = (N−1)·N²·num / (2W·den)

    where num and den are integer sums (decimal(38,0); DuckDB HUGEINT —
    per-term magnitude w·x² ~ 8·(1e6)² and the N² factor moves to the
    one pinned closing float expression precisely because carrying it
    in the integer domain would overflow 38 digits at planet scale).
    E[C] = 1 under the null. Output (single row):
    (n_cells, w_pairs, c_micro, e_c_micro) — NULL statistics for a
    constant or single-tile raster, identical gating convention to
    ``morans_i``.
    """
    counts = tile_count_grid(points, z)

    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _OFFSETS8
        ]
    )
    scattered = counts.select("x", "y", "cnt", F.explode(offs).alias("o")).select(
        (F.col("x") + F.col("o.dx")).alias("tx"),
        (F.col("y") + F.col("o.dy")).alias("ty"),
        "cnt",
    )
    cnt_dec = F.col("cnt").cast("decimal(19,0)")
    nbr = scattered.groupBy("tx", "ty").agg(
        F.sum("cnt").alias("nbr_sum"),
        F.sum(cnt_dec * cnt_dec).alias("nbr_sq"),
        F.count(F.lit(1)).alias("w"),
    )
    occ = (
        counts.join(
            nbr.hint("shuffle_hash"),
            (counts["x"] == nbr["tx"]) & (counts["y"] == nbr["ty"]),
            "left",
        )
        .select(
            "cnt",
            F.coalesce(F.col("nbr_sum"), F.lit(0)).alias("nbr_sum"),
            F.coalesce(F.col("nbr_sq"), F.lit(0).cast("decimal(38,0)")).alias(
                "nbr_sq"
            ),
            F.coalesce(F.col("w"), F.lit(0)).alias("w"),
        )
    )

    glob = counts.agg(F.count(F.lit(1)).alias("n"), F.sum("cnt").alias("sx"))
    j = occ.crossJoin(F.broadcast(glob))

    nd_dec = F.col("n").cast("decimal(19,0)")
    d = nd_dec * F.col("cnt") - F.col("sx")
    num_term = (
        F.col("w").cast("decimal(19,0)") * cnt_dec * cnt_dec
        - F.lit(2).cast("decimal(19,0)") * cnt_dec * F.col("nbr_sum")
        + F.col("nbr_sq")
    )
    parts = j.groupBy().agg(
        F.first("n").alias("n_cells"),
        F.sum("w").alias("w_pairs"),
        F.sum(num_term).alias("num"),
        F.sum(d * d).alias("den"),
    )

    nd = F.col("n_cells").cast("double")
    c_val = (
        (nd - F.lit(1.0))
        * nd
        * nd
        * F.col("num").cast("double")
        / (
            F.lit(2.0)
            * F.col("w_pairs").cast("double")
            * F.col("den").cast("double")
        )
    )
    c_micro = F.when(
        (F.col("n_cells") > 1) & (F.col("den") > 0) & (F.col("w_pairs") > 0),
        F.round(c_val * 1e6, 0).cast("long"),
    ).otherwise(F.lit(None).cast("long"))
    e_micro = F.when(
        F.col("n_cells") > 1, F.lit(1000000).cast("long")
    ).otherwise(F.lit(None).cast("long"))
    return parts.select(
        "n_cells",
        "w_pairs",
        c_micro.alias("c_micro"),
        e_micro.alias("e_c_micro"),
    )


def local_morans_i(points: DataFrame, z: int) -> DataFrame:
    """Local Moran's I (LISA — Anselin, "Local indicators of spatial
    association", Geographical Analysis 1995) per occupied z-tile, same
    queen weights / sparse-raster universe as the global statistic:

        I_i = N · d_i · L_i / Σ_k d_k²

    with d_i = N·x_i − Σx and L_i = N·nbr_sum_i − w_i·Σx — the same
    N²-cancelled integer forms as ``morans_i``, so every data-sized
    term is exact decimal(38,0) and ONE closing float expression per
    tile micro-quantizes (the global statistic says "clustered at
    all?"; this says WHICH tiles cluster, and how: quadrant HH = hot
    spot, LL = cold spot, HL/LH = spatial outliers — the standard LISA
    read-out that pairs with hotspot.py's Gi*).

    Output per occupied tile: (x, y, cnt, w, ii_micro, quadrant);
    ii_micro/quadrant are NULL for isolated tiles (w = 0), zero
    deviations, or a degenerate raster (den = 0)."""
    counts = tile_count_grid(points, z)
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _OFFSETS8
        ]
    )
    scattered = counts.select("x", "y", "cnt", F.explode(offs).alias("o")).select(
        (F.col("x") + F.col("o.dx")).alias("tx"),
        (F.col("y") + F.col("o.dy")).alias("ty"),
        "cnt",
    )
    nbr = scattered.groupBy("tx", "ty").agg(
        F.sum("cnt").alias("nbr_sum"), F.count(F.lit(1)).alias("w")
    )
    occ = counts.join(
        nbr.hint("shuffle_hash"),
        (counts["x"] == nbr["tx"]) & (counts["y"] == nbr["ty"]),
        "left",
    ).select(
        "x",
        "y",
        "cnt",
        F.coalesce(F.col("nbr_sum"), F.lit(0)).alias("nbr_sum"),
        F.coalesce(F.col("w"), F.lit(0)).alias("w"),
    )
    glob = counts.agg(F.count(F.lit(1)).alias("n"), F.sum("cnt").alias("sx"))
    j = occ.crossJoin(F.broadcast(glob))
    nd_dec = F.col("n").cast("decimal(19,0)")
    d = nd_dec * F.col("cnt") - F.col("sx")
    lag = nd_dec * F.col("nbr_sum") - F.col("w").cast("decimal(19,0)") * F.col("sx")
    withdl = j.select(
        "x", "y", "cnt", "w", "n",
        d.alias("d"),
        lag.alias("lag"),
        (d * lag).alias("dl"),
    )
    den = j.groupBy().agg(F.sum(d * d).alias("den"))
    out = withdl.crossJoin(F.broadcast(den))
    nd = F.col("n").cast("double")
    ok = (F.col("den") > 0) & (F.col("w") > 0) & (F.col("n") > 1)
    ii = F.when(
        ok,
        F.round(
            nd * F.col("dl").cast("double") / F.col("den").cast("double") * 1e6,
            0,
        ).cast("long"),
    )
    quad = F.when(
        ok & (F.col("d") > 0) & (F.col("lag") > 0), F.lit("HH")
    ).when(
        ok & (F.col("d") < 0) & (F.col("lag") < 0), F.lit("LL")
    ).when(
        ok & (F.col("d") > 0) & (F.col("lag") < 0), F.lit("HL")
    ).when(
        ok & (F.col("d") < 0) & (F.col("lag") > 0), F.lit("LH")
    )
    return out.select(
        "x", "y", "cnt", "w", ii.alias("ii_micro"), quad.alias("quadrant")
    )
