"""Streaming HMM map matching — continuous per-trip Viterbi state.

The streaming form of ``geo/mapmatch.py``: pings arrive on a stream,
candidates attach via ONE stream-static hash join (the gated snap's
covering machinery — ``candidate_rows(keep_unmatched=True)``), and an
``applyInPandasWithState`` operator keeps each live trip's Viterbi
frontier as state, emitting the matched rows when the trip CLOSES.

Why the frontier is enough: Viterbi's optimal substructure means the
DP needs only the LAST processed ping's candidate set — each
candidate's cumulative cost and its best path-so-far — plus that
ping's coordinates for the next transition. State per trip is
therefore K candidate rows (scores, way/seg ids, projected positions,
path strings), independent of trajectory length.

Close semantics: a trip emits when its ``is_final`` marker ping
arrives (the explicit trip-end event of a GPS feed). The marker must
survive the candidate attach even when it snaps to nothing — hence the
left-join ``keep_unmatched`` candidate form; a candidate-less final
ping closes the trip without contributing a DP step, exactly the
batch operator's outage-skip. Trips that never see a final marker
stay in state (a production deployment adds
``GroupStateTimeout.EventTimeTimeout`` on the ping timestamps to close
abandoned trips; the deterministic marker form is what the gate can
replay). After a close, later pings for the same trip id start a
fresh trip.

Ordering precondition (the corpus_ingest idiom): a trip's pings must
not be SPLIT ACROSS micro-batches out of seq order — later drops carry
later seqs. Within a batch, rows sort by seq before the DP.

Exactness: the DP arithmetic is byte-for-byte the batch operator's —
integer-mm distances, floor(x+0.5) micro-unit costs,
(cost, way_id, seg_idx) ties — and the candidate quantization happens
JVM-side in the streaming plan (same ``F.round`` expression), so an
availableNow run over complete trips equals ``hmm_map_match`` row for
row (the gate: same DuckDB oracle as ``hmm_match``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.geo.mapmatch import MATCH_SCHEMA, _dist_mm, candidate_rows

__all__ = ["hmm_map_match_stream"]

_STATE_SCHEMA = (
    "plat double, plon double, scores array<long>, ways array<long>, "
    "segs array<int>, sys array<double>, sxs array<double>, "
    "dmms array<long>, paths array<string>"
)


def hmm_map_match_stream(
    points_stream: DataFrame,
    ways: DataFrame,
    radius_m: float,
    sigma_mm: int = 500_000,
    beta_mm: int = 1_000_000,
    k: int = 3,
    final_col: str = "is_final",
    **snap_kw,
) -> DataFrame:
    """Streaming matched rows (trip_id, seq, way_id, seg_idx, dist_mm),
    emitted per trip when its ``final_col`` marker ping arrives.

    ``points_stream``: streaming (trip_id, seq, lat, lon, is_final).
    All other parameters as ``hmm_map_match``."""
    if sigma_mm <= 0 or beta_mm <= 0:
        raise ValueError(
            f"sigma_mm/beta_mm must be > 0, got {sigma_mm}/{beta_mm}"
        )
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cands = candidate_rows(
        points_stream,
        ways,
        radius_m,
        extra_point_cols=(final_col,),
        keep_unmatched=True,
        **snap_kw,
    )
    sig2 = 2.0 * (float(sigma_mm) / 1000.0) ** 2
    beta = float(beta_mm)
    kk = int(k)

    def ecost(dmm: int) -> int:
        v = dmm / 1000.0
        return int(np.floor(v * v / sig2 * 1e6 + 0.5))

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        trip = int(key[0])
        # frontier: (plat, plon, [(score, way, seg, sy, sx, dmm, path)])
        frontier: list[tuple] | None = None
        plat = plon = None
        if state.exists:
            plat, plon, scores, ws, gs, sys_, sxs, dmms, paths = state.get
            frontier = list(
                zip(scores, ws, gs, sys_, sxs, dmms, paths)
            )
        emitted: list[pd.DataFrame] = []
        closed = False

        def step(seq, lat, lon, cand_list):
            """Advance the frontier by one surviving ping."""
            nonlocal frontier, plat, plon
            if frontier is None:
                nxt = [
                    (ecost(int(d)), int(w), int(g), sy, sx, int(d),
                     f"{seq}:{int(w)}:{int(g)}:{int(d)}")
                    for d, w, g, sy, sx in cand_list
                ]
            else:
                pmm = _dist_mm(plat, plon, lat, lon, plat)
                nxt = []
                for d, w, g, sy, sx in cand_list:
                    best = None
                    for ps, pw, pg, py, px, pd_, ppath in frontier:
                        smm = _dist_mm(py, px, sy, sx, plat)
                        t = int(np.floor(abs(smm - pmm) / beta * 1e6 + 0.5))
                        cand = (int(ps) + t, int(pw), int(pg), ppath)
                        if best is None or cand[:3] < best[:3]:
                            best = cand
                    nxt.append(
                        (best[0] + ecost(int(d)), int(w), int(g), sy, sx,
                         int(d),
                         f"{best[3]}>{seq}:{int(w)}:{int(g)}:{int(d)}")
                    )
            frontier, plat, plon = nxt, lat, lon

        for pdf in pdfs:
            for seq, g in sorted(pdf.groupby("seq"), key=lambda t: t[0]):
                seq = int(seq)
                lat = float(g["lat"].iloc[0])
                lon = float(g["lon"].iloc[0])
                is_final = bool(g[final_col].iloc[0])
                has_cand = g["way_id"].notna()
                if has_cand.any():
                    gc = g[has_cand].copy()
                    gc["dist_mm"] = gc["dist_mm"].astype(np.int64)
                    gc["way_id"] = gc["way_id"].astype(np.int64)
                    gc["seg_idx"] = gc["seg_idx"].astype(np.int64)
                    # dedup + quantized-ordered k-cut, the batch rule
                    cand_list = sorted(
                        {
                            (int(r.dist_mm), int(r.way_id), int(r.seg_idx),
                             float(r.proj_lat), float(r.proj_lon))
                            for r in gc.itertuples()
                        }
                    )[:kk]
                    step(seq, lat, lon, cand_list)
                if is_final:
                    if frontier is not None:
                        fi = min(
                            frontier,
                            key=lambda c: (c[0], c[1], c[2]),
                        )
                        rows = []
                        for part in fi[6].split(">"):
                            s, w, gg, d = part.split(":")
                            rows.append(
                                (trip, int(s), int(w), int(gg), int(d))
                            )
                        emitted.append(
                            pd.DataFrame(
                                rows,
                                columns=[
                                    "trip_id", "seq", "way_id",
                                    "seg_idx", "dist_mm",
                                ],
                            )
                        )
                    frontier, plat, plon = None, None, None
                    closed = True

        if frontier is not None:
            scores, ws, gs, sys_, sxs, dmms, paths = (
                list(x) for x in zip(*frontier)
            )
            state.update(
                (plat, plon, scores, ws, gs, sys_, sxs, dmms, paths)
            )
        elif closed and state.exists:
            state.remove()
        # always yield exactly one (possibly empty) frame — the
        # sessionize_stream idiom; column-name mapping handles dtypes
        if emitted:
            yield pd.concat(emitted, ignore_index=True)
        else:
            yield pd.DataFrame(
                columns=["trip_id", "seq", "way_id", "seg_idx", "dist_mm"]
            )

    return cands.groupBy("trip_id").applyInPandasWithState(
        fn,
        MATCH_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
