"""Streaming HMM map matching — continuous per-trip Viterbi state.

The streaming form of ``geo/mapmatch.py``: pings arrive on a stream,
candidates attach via ONE stream-static hash join (the gated snap's
covering machinery — ``candidate_rows(keep_unmatched=True)``), and an
``applyInPandasWithState`` operator keeps each live trip's Viterbi
frontier as state, emitting the matched rows when the trip CLOSES.

Why the frontier is enough: Viterbi's optimal substructure means the
DP needs only the LAST processed ping's candidate set — each
candidate's cumulative cost and its best path-so-far — plus that
ping's coordinates for the next transition. State per trip is K
candidate rows (scores, way/seg ids, projected positions, pending
path suffixes).

Bounded state via online path compression: before state is written,
the K pending paths' COMMON PREFIX — the rows every candidate's
backpointers have converged on, which any future close must backtrack
through — is emitted immediately and truncated from state. Stored
state is therefore O(K × unconverged lag): real trajectories converge
within a few pings (the classic online-Viterbi observation), so a
day-long live trip holds a handful of pending rows, not its history.
The worst case (candidates that NEVER converge) degrades to the
trajectory length — the price of exact Viterbi; a bounded-latency
forced commit would be an approximation this engine's exact-match
contract rules out.

Close semantics: a trip's REMAINING rows emit when its ``is_final``
marker ping arrives (the explicit trip-end event of a GPS feed);
converged-prefix rows may already have been emitted in earlier
micro-batches — emitted rows are append-mode-immutable and certain,
so early emission changes latency, never values. The marker must
survive the candidate attach even when it snaps to nothing — hence the
left-join ``keep_unmatched`` candidate form; a candidate-less final
ping closes the trip without contributing a DP step, exactly the
batch operator's outage-skip. Trips that never see a final marker
keep only their unconverged suffix in state (a production deployment
adds ``GroupStateTimeout.EventTimeTimeout`` on the ping timestamps to
drop abandoned trips' residue). After a close, later pings for the
same trip id start a fresh trip.

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
                    tail = f"{seq}:{int(w)}:{int(g)}:{int(d)}"
                    nxt.append(
                        (best[0] + ecost(int(d)), int(w), int(g), sy, sx,
                         int(d),
                         f"{best[3]}>{tail}" if best[3] else tail)
                    )
            frontier, plat, plon = nxt, lat, lon

        def emit_parts(parts: list[str]) -> None:
            rows = [
                (trip, int(s), int(w), int(gg), int(d))
                for s, w, gg, d in (p.split(":") for p in parts)
            ]
            if rows:
                emitted.append(
                    pd.DataFrame(
                        rows,
                        columns=[
                            "trip_id", "seq", "way_id",
                            "seg_idx", "dist_mm",
                        ],
                    )
                )

        # Arrow hands a group's rows as SEVERAL chunks whenever the
        # micro-batch's rows for this trip exceed
        # spark.sql.execution.arrow.maxRecordsPerBatch, and the state
        # op only groups by key — it does NOT order chunks by seq, and
        # one seq's candidate rows can straddle a chunk boundary.
        # Concatenate before the seq loop: a per-chunk loop would run
        # the DP out of order and k-cut a straddling seq twice.
        chunks = list(pdfs)
        if len(chunks) == 1:
            pdf = chunks[0]
        elif chunks:
            pdf = pd.concat(chunks, ignore_index=True)
        else:  # no data for this key (defensive — NoTimeout never fires)
            pdf = pd.DataFrame(
                columns=["seq", "lat", "lon", final_col, "way_id",
                         "seg_idx", "dist_mm", "proj_lat", "proj_lon"]
            )
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
                        # the pending suffix only — converged-prefix
                        # rows were emitted when they converged
                        emit_parts([p for p in fi[6].split(">") if p])
                    frontier, plat, plon = None, None, None
                    closed = True

        if frontier is not None:
            # online path compression (module docstring): emit the rows
            # every candidate's path agrees on — they are certain — and
            # keep only the unconverged suffixes in state, so state per
            # trip is O(K × lag), not O(trajectory).
            part_lists = [
                [p for p in c[6].split(">") if p] for c in frontier
            ]
            cp = 0
            for vals in zip(*part_lists):
                if all(v == vals[0] for v in vals[1:]):
                    cp += 1
                else:
                    break
            if cp:
                emit_parts(part_lists[0][:cp])
                frontier = [
                    (*c[:6], ">".join(pl[cp:]))
                    for c, pl in zip(frontier, part_lists)
                ]
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
