"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing — schema, partitioning, UDF signatures, Arrow
batch shapes — is real and tested. The codec itself is import-guarded:
this container ships no image/audio libraries, so by default
``decode_media`` computes a deterministic fake "decode" from the bytes
(documented below); ``backend='real'`` routes through the
Pillow-backed hooks (``_decode_real`` / ``_resize_real``) which raise
``NotImplementedError`` when the library is absent — the seam is
exercised both ways by ``tools/check_real_backends.py``.

Scale design: media bytes dominate row size, so every stage projects the
binary column away as early as possible (decode emits features only);
``spark.sql.files.maxPartitionBytes`` governs scan granularity and the
pipeline never shuffles the binary payload — features join back to
metadata by key if needed.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, bytes binary, "
    "meta struct<mime:string, declared_w:int, declared_h:int, duration_ms:long>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, width int, height int, "
    "n_frames int, checksum string"
)


def synth_media(spark: SparkSession, sf_dir: str, mult: int = 1) -> DataFrame:
    """Deterministic media table derived from the documents fixture: each
    document's text bytes stand in for an encoded payload (no external
    data, per BASELINE.json input rules)."""
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    if mult > 1:
        docs = docs.crossJoin(
            spark.range(mult).select(F.col("id").alias("rep"))
        ).withColumn("doc_id", F.col("doc_id") * mult + F.col("rep"))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("bytes"),
        F.struct(
            F.concat(F.lit("x-fake/"), kind).alias("mime"),
            (F.col("n_chars") % 1920).cast("int").alias("declared_w"),
            (F.col("n_chars") % 1080).cast("int").alias("declared_h"),
            (F.col("n_chars") * 40).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_real(kind: str, payload: bytes) -> tuple[int, int, int]:
    """Real codec hook: import-guarded Pillow decode for images.

    When Pillow is on the path this returns the true (width, height,
    n_frames) of the encoded payload; when it is absent (this container)
    it raises NotImplementedError and ``decode_media`` stays on the
    deterministic fake. Audio/video hooks (soundfile / pyav) follow the
    same shape and remain unimplemented here. The swap point is
    exercised by ``tools/check_real_backends.py`` (PASS with Pillow,
    BLOCKED without)."""
    if kind != "image":
        raise NotImplementedError(
            "audio/video codecs are not installed; decode_media uses the "
            "deterministic fake decode"
        )
    try:
        import io

        from PIL import Image
    except ImportError as exc:  # the documented sandbox outcome
        raise NotImplementedError(
            "media codecs are not installed; decode_media uses the "
            "deterministic fake decode"
        ) from exc
    with Image.open(io.BytesIO(payload)) as img:
        return img.width, img.height, getattr(img, "n_frames", 1)


def _fake_decode(n_bytes: np.ndarray, first_byte: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic stand-in: dimensions derived from payload size/head.

    width  = 16 + n_bytes mod 1024
    height = 16 + (n_bytes * 31 + first_byte) mod 1024
    frames = 1 + n_bytes mod 240
    (Chosen to be reproducible in ANSI SQL for the correctness oracle.)
    """
    w = 16 + n_bytes % 1024
    h = 16 + (n_bytes * 31 + first_byte) % 1024
    fr = 1 + n_bytes % 240
    return w.astype(np.int32), h.astype(np.int32), fr.astype(np.int32)


def decode_media(media: DataFrame, backend: str = "fake") -> DataFrame:
    """binary payload → typed features via one Arrow ``mapInPandas`` pass.

    Emits features only (drops ``bytes``) so nothing downstream shuffles
    the payload. ``backend='fake'`` (default — the container ships no
    codecs) derives dimensions deterministically from the bytes,
    vectorized per batch; ``backend='real'`` routes IMAGE rows through
    ``_decode_real`` (Pillow, import-guarded — per-row Python is
    inherent to codecs, but the transfer stays Arrow-batched and the
    payload is still dropped on output) while audio/video rows stay on
    the deterministic stand-in (their codec hooks are unimplemented;
    a mixed-kind table must not crash the image path)."""
    if backend not in ("fake", "real"):
        raise ValueError(f"unknown media backend: {backend!r}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if pdf.empty:
                continue
            payload = pdf["bytes"]
            n_bytes = payload.map(len).to_numpy(np.int64)
            first = payload.map(lambda b: b[0] if len(b) else 0).to_numpy(np.int64)
            w, h, fr = _fake_decode(n_bytes, first)
            frames = np.where(pdf["kind"] == "image", 1, fr).astype(np.int32)
            if backend == "real":
                # images decode for real; audio/video keep the fake
                # dims (codec hooks unimplemented — kind-guarded so a
                # mixed-kind table never crashes the image decode)
                is_img = (pdf["kind"] == "image").to_numpy()
                dims = [
                    _decode_real("image", b) if img else None
                    for b, img in zip(payload, is_img)
                ]
                w = np.array(
                    [d[0] if d else int(wf) for d, wf in zip(dims, w)],
                    dtype=np.int32,
                )
                h = np.array(
                    [d[1] if d else int(hf) for d, hf in zip(dims, h)],
                    dtype=np.int32,
                )
                frames = np.array(
                    [d[2] if d else int(ff) for d, ff in zip(dims, frames)],
                    dtype=np.int32,
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "width": w,
                    "height": h,
                    "n_frames": frames,
                    "checksum": payload.map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return media.mapInPandas(gen, FEATURE_SCHEMA)


def frame_sample(features: DataFrame, every_n: int = 24) -> DataFrame:
    """Frame sampling plan for video rows: one output row per sampled
    frame index (explode of a sequence — pure Column; a real pipeline
    would feed these (media_id, frame_idx) pairs to a decode UDF)."""
    v = features.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.col("n_frames") - 1, F.lit(every_n)
            )
        ).alias("frame_idx"),
    )


RESIZED_SCHEMA = (
    "media_id long, kind string, bytes binary, width int, height int"
)


def _resize_real(payload: bytes, tw: int, th: int) -> bytes:
    """Real resize hook: import-guarded Pillow decode→resample→re-encode.

    With Pillow present this is the true preprocessing stage (PNG out,
    deterministic — no chroma/quality nondeterminism); without it (this
    container) it raises NotImplementedError and ``resize_media`` stays
    on the deterministic stride fake. Exercised by
    ``tools/check_real_backends.py``."""
    try:
        import io

        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "image codecs are not installed; resize_media uses the "
            "deterministic fake resample"
        ) from exc
    with Image.open(io.BytesIO(payload)) as img:
        out = io.BytesIO()
        img.resize((tw, th)).save(out, format="PNG")
        return out.getvalue()


def resize_media(
    media: DataFrame, target_w: int = 224, target_h: int = 224, backend: str = "fake"
) -> DataFrame:
    """Image resize stage: binary payload → resized binary payload via
    one Arrow ``mapInPandas`` pass (the feature-extraction preprocessing
    shape: decode → resample → re-encode).

    The deterministic fake resample keeps byte count proportional to the
    pixel-count ratio by striding the payload (every k-th byte), so the
    batch shapes, binary Arrow transfer and output schema are exactly
    what the Pillow-backed ``_resize_real`` would produce. Non-image
    rows pass through untouched with their stand-in-decoded dimensions
    — on BOTH backends, so downstream consumers see one dim contract.
    ``backend='real'`` swaps the stride fake for the Pillow
    decode→resample→re-encode in ``_resize_real`` (import-guarded);
    the resample needs no source-dimension probe, so images decode
    exactly once.
    """
    if backend not in ("fake", "real"):
        raise ValueError(f"unknown media backend: {backend!r}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payload = pdf["bytes"]
            n_bytes = payload.map(len).to_numpy(np.int64)
            is_img = (pdf["kind"] == "image").to_numpy()
            first = payload.map(lambda b: b[0] if len(b) else 0).to_numpy(np.int64)
            w, h, _fr = _fake_decode(n_bytes, first)
            if backend == "real":
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"].to_numpy(),
                        "kind": pdf["kind"],
                        "bytes": [
                            _resize_real(b, target_w, target_h)
                            if img
                            else b
                            for b, img in zip(payload, is_img)
                        ],
                        "width": np.where(is_img, target_w, w).astype(np.int32),
                        "height": np.where(is_img, target_h, h).astype(np.int32),
                    }
                )
                continue
            ratio = (float(target_w) * target_h) / np.maximum(
                w.astype(np.float64) * h, 1.0
            )
            out_len = np.maximum((n_bytes * np.minimum(ratio, 1.0)).astype(np.int64), 1)
            stride = np.maximum(n_bytes // out_len, 1)
            out_bytes = [
                bytes(b[:: int(s)]) if img else b
                for b, s, img in zip(payload, stride, is_img)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"],
                    "bytes": out_bytes,
                    "width": np.where(is_img, target_w, w).astype(np.int32),
                    "height": np.where(is_img, target_h, h).astype(np.int32),
                }
            )

    return media.mapInPandas(gen, RESIZED_SCHEMA)


def media_dhash(media: DataFrame) -> DataFrame:
    """Perceptual 64-bit difference hash (dHash) per payload — the
    image near-dup primitive, on the same honest-plumbing terms as
    decode_media: the REAL pipeline resizes the decoded image to a 9×8
    grayscale grid (Pillow hook, absent in this container); the
    deterministic stand-in samples 72 evenly-spaced payload bytes as
    the grid, so payloads sharing most bytes (re-encodes, tail edits)
    get nearby hashes and the downstream Hamming machinery is exercised
    for real. Bit (r, c) = grid[r][c+1] > grid[r][c], packed row-major
    into one signed long — schema-compatible with
    text/dedup.simhash_near_dups, whose pigeonhole blocking (recall
    bound and all) provides the scale path for pairing; that blocking
    layer is hash-gated via the simhash twin, so only the byte→grid
    stand-in itself is pytest-pinned.

    One Arrow pass, payload dropped on output — nothing downstream
    shuffles the binary (the decode_media discipline).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            hashes = []
            for b in pdf["bytes"]:
                n = len(b)
                if n == 0:
                    hashes.append(0)
                    continue
                # 72 evenly spaced byte samples -> 9 cols x 8 rows grid
                idx = (np.arange(72, dtype=np.int64) * n) // 72
                grid = np.frombuffer(b, dtype=np.uint8)[idx].reshape(8, 9)
                bits = (grid[:, 1:] > grid[:, :-1]).flatten()
                v = 0
                for bit in bits:
                    v = (v << 1) | int(bit)
                # two's-complement into a signed 64-bit long
                if v >= 1 << 63:
                    v -= 1 << 64
                hashes.append(v)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["media_id"].to_numpy(),
                    "simhash": np.array(hashes, dtype=np.int64),
                }
            )

    return media.mapInPandas(gen, "doc_id long, simhash long")


def media_near_dups(media: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Perceptual near-duplicate media pairs: dHash + the simhash
    pigeonhole Hamming join (text/dedup.py) — (doc_a, doc_b, hamming)."""
    from osm_spark.text.dedup import simhash_near_dups

    return simhash_near_dups(media_dhash(media), max_hamming=max_hamming)
