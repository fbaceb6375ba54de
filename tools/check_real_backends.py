#!/usr/bin/env python
"""Real-backend seam conformance check (round-4 verdict ask #9).

Three of the engine's primitives are independent reimplementations of
functionality whose canonical libraries are absent from this container
(VERDICT r4 "What's missing" #2/#3). Each has a single, clearly-marked
swap point; this script — the ``check_iceberg_seam.py`` pattern applied
to the remaining environment-blocked seams — verifies TODAY that every
guard fails loudly (no silent fallback that could mix id spaces or fake
pixels into real pipelines), and, whenever the real library IS on the
path, runs the corresponding parity suite:

1. **H3 hex grid** (`osm_spark/geo/hexgrid.py`): the engine grid is an
   independent aperture-7 index; ``hex_cell_backend(backend="h3")``
   swaps in real Uber H3 ids via ``h3_cell_udf``. With ``h3``
   importable: UDF ids must equal direct library calls on a
   deterministic lat/lon grid (v3/v4 API both handled), NaN → null.
2. **S2 cells** (`osm_spark/geo/s2.py`): same published construction
   (cube faces, quadratic ST, Hilbert ij→pos), different id labels.
   With ``s2sphere`` importable: the PARTITIONS must agree — two points
   share an engine cell iff they share an s2sphere cell at the same
   level (the Hilbert position is a bijection of (i,j), so cells are
   the same point sets; only labels differ). A small boundary tolerance
   is allowed for ij quantization at cell edges.
3. **Media codecs** (`osm_spark/multimodal/media.py`): ``backend='real'``
   routes ``decode_media`` / ``resize_media`` through Pillow hooks.
   With ``PIL`` importable: synthesize PNGs in-process, decode through
   the real Spark ``mapInPandas`` path, and check exact dimensions and
   resize round-trip.

Run: ``python tools/check_real_backends.py`` → per-check PASS/BLOCKED
lines, exit 0 iff no check FAILED. In this sandbox the expected outcome
is: every guard check PASS, every real-library parity check
BLOCKED(no-<lib>). No Spark session is started unless a real library is
present (the guard checks are driver-side by construction).
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RESULTS: list[tuple[str, str, str]] = []


def record(check: str, status: str, detail: str = "") -> None:
    RESULTS.append((check, status, detail))
    print(f"{status:8s} {check}" + (f": {detail}" if detail else ""))


def _have(mod: str) -> bool:
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


def _grid(n: int = 400) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic lat/lon sample covering all six faces + poles."""
    k = np.arange(n, dtype=np.float64)
    lat = -89.5 + (k * 179.0 / (n - 1))
    lon = -179.5 + ((k * 37.0) % n) * 359.0 / (n - 1)
    return lat, lon


def _spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[4]")
        .appName("check_real_backends")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


# ---------------------------------------------------------------- H3 seam
def check_h3() -> None:
    from osm_spark.geo.hexgrid import hex_cell_backend

    if not _have("h3"):
        # The guard must fail LOUDLY at plan-build time — a silent
        # fallback to the native grid would let a caller join ids from
        # two different cell-id spaces without noticing.
        try:
            hex_cell_backend("lat", "lon", backend="h3")
        except ImportError:
            record("h3-guard", "PASS", "backend='h3' raises ImportError without the library")
        except Exception as exc:  # noqa: BLE001
            record("h3-guard", "FAIL", f"expected ImportError, got {type(exc).__name__}: {exc}")
        else:
            record("h3-guard", "FAIL", "backend='h3' built a Column without h3 installed")
        record("h3-parity", "BLOCKED", "no-h3 (library absent from this container)")
        return

    import h3  # noqa: F401  (presence just proven)

    spark = _spark()
    try:
        from pyspark.sql import functions as F

        lat, lon = _grid()
        pdf_rows = [(float(a), float(b)) for a, b in zip(lat, lon)]
        df = spark.createDataFrame(pdf_rows, "lat double, lon double")
        for res in (7, 9):
            got = [
                r.cell
                for r in df.select(
                    hex_cell_backend("lat", "lon", res=res, backend="h3").alias("cell")
                ).collect()
            ]
            import h3 as _h3

            enc = getattr(_h3, "latlng_to_cell", None) or getattr(_h3, "geo_to_h3", None)
            want = []
            for a, b in zip(lat, lon):
                c = enc(float(a), float(b), res)
                want.append(int(c, 16) if isinstance(c, str) else int(c))
            if got == want:
                record(f"h3-parity-res{res}", "PASS", f"{len(want)} ids equal direct library calls")
            else:
                bad = sum(1 for g, w in zip(got, want) if g != w)
                record(f"h3-parity-res{res}", "FAIL", f"{bad}/{len(want)} ids differ")
        # NaN handling: encode must yield null, not a junk id.
        row = (
            df.limit(1)
            .select(
                hex_cell_backend(
                    F.lit(float("nan")), F.lit(0.0), res=9, backend="h3"
                ).alias("cell")
            )
            .collect()[0]
        )
        record(
            "h3-nan",
            "PASS" if row.cell is None else "FAIL",
            "NaN lat encodes to null" if row.cell is None else f"got {row.cell}",
        )
    finally:
        spark.stop()


# ---------------------------------------------------------------- S2 seam
def check_s2() -> None:
    from osm_spark.geo.s2 import s2_cell_np, s2_parent_np

    # Always-runnable invariants (no library needed): determinism,
    # level recoverability, parent containment under prefix truncation.
    lat, lon = _grid()
    c13 = s2_cell_np(lat, lon, 13)
    if not np.array_equal(c13, s2_cell_np(lat, lon, 13)):
        record("s2-invariants", "FAIL", "encode is not deterministic")
    elif not np.all((c13 & 31) == 13):
        record("s2-invariants", "FAIL", "level bits not recoverable")
    elif not np.array_equal(s2_parent_np(c13, 13, 7), s2_cell_np(lat, lon, 7)):
        record("s2-invariants", "FAIL", "parent truncation != direct coarse encode")
    else:
        record("s2-invariants", "PASS", "determinism + level bits + parent containment")

    if not _have("s2sphere"):
        record("s2-partition-parity", "BLOCKED", "no-s2sphere (library absent from this container)")
        return

    import s2sphere

    # Partition equivalence: engine ids and s2sphere ids are different
    # LABELS for the same cells (same faces, same quadratic ST, same
    # 2^level ij grid; Hilbert pos is a bijection of (i,j)), so points
    # must co-cluster identically. Compare the partitions on pairs of
    # nearby points; tolerate a small fraction of boundary-quantization
    # disagreements (float rounding at cell edges differs by library).
    rng_lat = np.repeat(lat, 2)
    rng_lon = np.repeat(lon, 2)
    rng_lat[1::2] += 1e-4  # each even/odd pair is ~11 m apart
    level = 10
    ours = s2_cell_np(rng_lat, rng_lon, level)
    theirs = np.array(
        [
            s2sphere.CellId.from_lat_lng(
                s2sphere.LatLng.from_degrees(float(a), float(b))
            )
            .parent(level)
            .id()
            for a, b in zip(rng_lat, rng_lon)
        ],
        dtype=np.int64,
    )
    same_ours = ours[0::2] == ours[1::2]
    same_theirs = theirs[0::2] == theirs[1::2]
    agree = float(np.mean(same_ours == same_theirs))
    if agree >= 0.99:
        record("s2-partition-parity", "PASS", f"pairwise co-clustering agreement {agree:.4f}")
    else:
        record("s2-partition-parity", "FAIL", f"pairwise co-clustering agreement {agree:.4f} < 0.99")


# ------------------------------------------------------------- media seam
def check_media() -> None:
    from osm_spark.multimodal.media import _decode_real, _resize_real

    if not _have("PIL"):
        try:
            _decode_real("image", b"\x89PNG\r\n\x1a\n")
        except NotImplementedError:
            record("media-guard-decode", "PASS", "backend='real' decode raises NotImplementedError")
        except Exception as exc:  # noqa: BLE001
            record("media-guard-decode", "FAIL", f"expected NotImplementedError, got {type(exc).__name__}")
        else:
            record("media-guard-decode", "FAIL", "real decode returned without a codec installed")
        try:
            _resize_real(b"\x89PNG\r\n\x1a\n", 4, 4)
        except NotImplementedError:
            record("media-guard-resize", "PASS", "backend='real' resize raises NotImplementedError")
        except Exception as exc:  # noqa: BLE001
            record("media-guard-resize", "FAIL", f"expected NotImplementedError, got {type(exc).__name__}")
        else:
            record("media-guard-resize", "FAIL", "real resize returned without a codec installed")
        record("media-real-decode", "BLOCKED", "no-Pillow (library absent from this container)")
        return

    import io

    from PIL import Image

    # Synthesize PNGs in-process (no external data), push them through
    # the REAL Spark mapInPandas path, and verify exact dimensions.
    from osm_spark.multimodal.media import decode_media, resize_media

    spark = _spark()
    try:
        rows = []
        sizes = [(17, 9), (64, 64), (3, 200)]
        for i, (w, h) in enumerate(sizes):
            img = Image.new("RGB", (w, h), (i * 40 % 256, 10, 200))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            rows.append((i, "image", bytearray(buf.getvalue()), (f"image/png", w, h, 0)))
        media = spark.createDataFrame(
            rows,
            "media_id long, kind string, bytes binary, "
            "meta struct<mime:string, declared_w:int, declared_h:int, duration_ms:long>",
        )
        feats = {
            r.media_id: (r.width, r.height, r.n_frames)
            for r in decode_media(media, backend="real").collect()
        }
        ok = all(feats[i] == (w, h, 1) for i, (w, h) in enumerate(sizes))
        record(
            "media-real-decode",
            "PASS" if ok else "FAIL",
            f"decoded dims {feats}" if not ok else "true PNG dimensions via mapInPandas",
        )
        resized = {
            r.media_id: Image.open(io.BytesIO(bytes(r.bytes))).size
            for r in resize_media(media, 16, 12, backend="real").collect()
        }
        ok = all(resized[i] == (16, 12) for i in range(len(sizes)))
        record(
            "media-real-resize",
            "PASS" if ok else "FAIL",
            f"resized dims {resized}" if not ok else "re-encoded payloads decode at target size",
        )
    finally:
        spark.stop()


def main() -> int:
    check_h3()
    check_s2()
    check_media()
    n_fail = sum(1 for _, s, _ in RESULTS if s == "FAIL")
    n_pass = sum(1 for _, s, _ in RESULTS if s == "PASS")
    n_blocked = sum(1 for _, s, _ in RESULTS if s == "BLOCKED")
    print(f"\n{n_pass} PASS, {n_blocked} BLOCKED, {n_fail} FAIL")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
