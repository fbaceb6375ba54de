"""HMM map matching — snap GPS trajectories onto the way graph.

The classic Newson–Krumm shape (Microsoft Research, ACM GIS 2009 —
public algorithm, independently implemented): each ping's candidate
road segments are HMM states; emission likelihood falls with the
snap distance (Gaussian), transition likelihood falls with how much
the snapped movement disagrees with the ping movement (exponential);
Viterbi picks the jointly most likely segment sequence. The single-best
``snap_join`` answers "which segment is this point on" per point in
isolation; map matching answers it per TRAJECTORY, letting neighboring
pings pull an ambiguous ping onto the route's segment instead of a
nearer-but-wrong parallel edge.

Exactness design (the engine's micro-quantization discipline): every
model weight is derived from INTEGER-MILLIMETER distances and quantized
to integer micro-units before the DP —

    dmm       = round(snap distance × 1000)          (per candidate)
    ecost(c)  = ⌊ (dmm/1000)² / (2·(σmm/1000)²) × 1e6 + 0.5 ⌋
    gapmm     = | smm − pmm |                        (both mm-rounded)
    tcost     = ⌊ gapmm / βmm × 1e6 + 0.5 ⌋

(the DP quantizer is ⌊x+0.5⌋, not round(): numpy rounds half-to-even
while SQL rounds half-away — floor(x+0.5) is the one spelling both
engines agree on bit-for-bit; dmm itself uses Spark's F.round, whose
HALF_UP pairs with DuckDB's round, the gated-snap precedent)

so the Viterbi recursion is pure int64 min-plus: bit-exact, order-
independent, and replayable in ANSI SQL. mm-rounding first absorbs the
cross-engine libm/JVM 1-ulp noise exactly as the gated snap does
(≈3e-10 m of noise cannot flip a 0.5 mm boundary); the float steps
after it start from identical integers with identical IEEE op order.
Ties break on (cost, way_id, seg_idx) at every argmin — candidate
states are unique per (way_id, seg_idx), so the tie-break is total and
the matched path is deterministic.

Distances: the snap distance and projection come from
``snap_candidates`` (the gated covering + refine machinery, one hash
join on the big side). Transition distances — snapped-position movement
``smm`` and ping movement ``pmm`` between consecutive surviving pings —
use the same local equirectangular plane, anchored at the EARLIER
ping's latitude for both, so the two legs of the gap share one cosine.

Scale shape: candidates are the snap join's (bounded per-ping density ×
k cap); the DP runs per trip inside ``applyInPandasWithState``-free
``applyInPandas`` — one shuffle on trip_id, per-group work T·K²
(trajectory length × candidate cap), independent of corpus size; no
trip's data exceeds a few KB. Pings with NO candidate within the radius
are dropped and the DP spans the gap using the surviving pings'
coordinates (the Newson–Krumm treatment of outage pings); trips with no
surviving ping are absent.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.geo.knn import DEG_M
from osm_spark.geo.snap import snap_candidates

__all__ = ["candidate_rows", "hmm_map_match", "match_candidates"]

MATCH_SCHEMA = (
    "trip_id long, seq int, way_id long, seg_idx int, dist_mm long"
)


def candidate_rows(
    points: DataFrame,
    ways: DataFrame,
    radius_m: float,
    extra_point_cols: tuple[str, ...] = (),
    keep_unmatched: bool = False,
    **snap_kw,
) -> DataFrame:
    """Flat (un-aggregated) candidate rows with the mm-quantized snap
    distance and the projected position — the shared front of the batch
    top-k (``match_candidates``) and the streaming stateful matcher
    (which cannot aggregate before its stateful op and k-cuts per trip
    inside the state function instead). Works on a batch or streaming
    ``points`` frame (stream-static join + projections only)."""
    hits = snap_candidates(
        points,
        ways,
        radius_m,
        point_cols=("trip_id", "seq", "lat", "lon", *extra_point_cols),
        with_projection=True,
        keep_unmatched=keep_unmatched,
        **snap_kw,
    )
    return hits.select(
        "trip_id",
        "seq",
        "lat",
        "lon",
        *extra_point_cols,
        F.round(F.col("dist_m") * 1000.0, 0).cast("long").alias("dist_mm"),
        "way_id",
        "seg_idx",
        "proj_lat",
        "proj_lon",
    )


def match_candidates(
    points: DataFrame,
    ways: DataFrame,
    radius_m: float,
    k: int = 3,
    **snap_kw,
) -> DataFrame:
    """Top-``k`` candidate segments per ping, with mm-quantized snap
    distance and the projected (snapped) position.

    ``points``: (trip_id, seq, lat, lon). Output: one row per
    (trip_id, seq, candidate) — way_id, seg_idx, dist_mm, proj_lat,
    proj_lon, plus the ping's own lat/lon (the DP needs both ends).
    The k-cut orders on the QUANTIZED (dist_mm, way_id, seg_idx) so the
    candidate SET is identical across engines — a float-ranked cut
    could flip near-equal candidates on 1-ulp noise."""
    c = candidate_rows(points, ways, radius_m, **snap_kw)
    # duplicate candidate rows (one segment reached through several
    # sampled cells) carry identical values — array_distinct before the
    # k-cut removes them without an extra aggregate
    topk = (
        c.groupBy("trip_id", "seq", "lat", "lon")
        .agg(
            F.slice(
                F.array_sort(
                    F.array_distinct(
                        F.collect_list(
                            F.struct(
                                "dist_mm",
                                "way_id",
                                "seg_idx",
                                "proj_lat",
                                "proj_lon",
                            )
                        )
                    )
                ),
                1,
                int(k),
            ).alias("cands")
        )
    )
    return topk.select(
        "trip_id",
        "seq",
        "lat",
        "lon",
        F.explode("cands").alias("c"),
    ).select(
        "trip_id",
        "seq",
        "lat",
        "lon",
        F.col("c.dist_mm").alias("dist_mm"),
        F.col("c.way_id").alias("way_id"),
        F.col("c.seg_idx").alias("seg_idx"),
        F.col("c.proj_lat").alias("proj_lat"),
        F.col("c.proj_lon").alias("proj_lon"),
    )


def _dist_mm(
    alat: float, alon: float, blat: float, blon: float, anchor_lat: float
) -> int:
    """Equirectangular distance in integer mm, cosine anchored at
    ``anchor_lat`` — the exact float expression the DuckDB oracle
    replays (all inputs reach here as float64)."""
    ck = np.cos(np.radians(anchor_lat))
    dx = (blon - alon) * ck
    dy = blat - alat
    return int(
        np.floor(np.sqrt(dx * dx + dy * dy) * DEG_M * 1000.0 + 0.5)
    )


def hmm_map_match(
    points: DataFrame,
    ways: DataFrame,
    radius_m: float,
    sigma_mm: int = 500_000,
    beta_mm: int = 1_000_000,
    k: int = 3,
    **snap_kw,
) -> DataFrame:
    """(trip_id, seq, way_id, seg_idx, dist_mm) — the Viterbi-matched
    segment per surviving ping. ``sigma_mm``: Gaussian emission scale
    (mm); ``beta_mm``: exponential transition scale (mm); ``k``:
    candidate cap per ping. See the module docstring for the exact
    integer cost model and tie rules."""
    if sigma_mm <= 0 or beta_mm <= 0:
        raise ValueError(
            f"sigma_mm/beta_mm must be > 0, got {sigma_mm}/{beta_mm}"
        )
    cands = match_candidates(points, ways, radius_m, k=k, **snap_kw)
    sig2 = 2.0 * (float(sigma_mm) / 1000.0) ** 2
    beta = float(beta_mm)

    def viterbi(pdf: pd.DataFrame) -> pd.DataFrame:
        trip = int(pdf["trip_id"].iloc[0])
        out_rows: list[tuple[int, int, int, int, int]] = []
        # surviving pings in seq order; each with its candidate list
        steps = []
        for seq, g in sorted(pdf.groupby("seq"), key=lambda t: t[0]):
            g = g.sort_values(["dist_mm", "way_id", "seg_idx"])
            steps.append(
                (
                    int(seq),
                    float(g["lat"].iloc[0]),
                    float(g["lon"].iloc[0]),
                    list(
                        zip(
                            g["dist_mm"].astype(np.int64),
                            g["way_id"].astype(np.int64),
                            g["seg_idx"].astype(np.int64),
                            g["proj_lat"].astype(np.float64),
                            g["proj_lon"].astype(np.float64),
                        )
                    ),
                )
            )

        def ecost(dmm: int) -> int:
            v = dmm / 1000.0
            return int(np.floor(v * v / sig2 * 1e6 + 0.5))

        # scores[i] = (cost, backpointer index into previous step)
        prev_scores: list[int] = [
            ecost(int(c[0])) for c in steps[0][3]
        ]
        back: list[list[int]] = [[-1] * len(steps[0][3])]
        for s in range(1, len(steps)):
            pseq, plat, plon, pcands = steps[s - 1]
            cseq, clat, clon, ccands = steps[s]
            pmm = _dist_mm(plat, plon, clat, clon, plat)
            scores: list[int] = []
            bps: list[int] = []
            for dmm, way, seg, pj_lat, pj_lon in ccands:
                best: tuple[int, int, int] | None = None
                bp = -1
                for pi, (pdmm, pway, pseg, pp_lat, pp_lon) in enumerate(
                    pcands
                ):
                    smm = _dist_mm(pp_lat, pp_lon, pj_lat, pj_lon, plat)
                    gap = abs(smm - pmm)
                    tcost = int(np.floor(gap / beta * 1e6 + 0.5))
                    cand = (
                        prev_scores[pi] + tcost,
                        int(pway),
                        int(pseg),
                    )
                    if best is None or cand < best:
                        best, bp = cand, pi
                scores.append(best[0] + ecost(int(dmm)))
                bps.append(bp)
            prev_scores, back = scores, back + [bps]

        # final argmin with the same (cost, way, seg) tie rule
        last = steps[-1][3]
        fi = min(
            range(len(last)),
            key=lambda i: (prev_scores[i], int(last[i][1]), int(last[i][2])),
        )
        # backtrack
        idx = fi
        for s in range(len(steps) - 1, -1, -1):
            seq, _, _, cc = steps[s]
            dmm, way, seg, _, _ = cc[idx]
            out_rows.append((trip, seq, int(way), int(seg), int(dmm)))
            idx = back[s][idx]
        out_rows.reverse()
        return pd.DataFrame(
            out_rows,
            columns=["trip_id", "seq", "way_id", "seg_idx", "dist_mm"],
        )

    def apply_fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return viterbi(pdf)

    return cands.groupBy("trip_id").applyInPandas(apply_fn, MATCH_SCHEMA)
