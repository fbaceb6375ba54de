"""Multimodal plumbing: schema, determinism, batch shape, frame sampling."""

from __future__ import annotations

import hashlib

import pytest

from osm_spark.multimodal.media import (
    FEATURE_SCHEMA,
    decode_media,
    frame_sample,
    synth_media,
    _decode_real,
)


@pytest.fixture(scope="module")
def media(spark, sf_small_dir):
    return synth_media(spark, sf_small_dir).cache()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "bytes", "meta"]
    assert media.schema["bytes"].dataType.typeName() == "binary"
    meta = media.schema["meta"].dataType
    assert [f.name for f in meta.fields] == [
        "mime",
        "declared_w",
        "declared_h",
        "duration_ms",
    ]


def test_decode_features_deterministic(spark, media, sf_small_dir):
    feats = decode_media(media)
    assert feats.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,n_bytes:bigint,width:int,"
        "height:int,n_frames:int,checksum:string>"
    )
    rows = {r.media_id: r for r in feats.collect()}
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_small_dir}/documents.parquet").collect()
    }
    for did in list(docs)[:30]:
        payload = docs[did].encode()
        n = len(payload)
        r = rows[did]
        assert r.n_bytes == n
        assert r.width == 16 + n % 1024
        assert r.height == 16 + (n * 31 + payload[0]) % 1024
        kind = ["image", "audio", "video"][did % 3]
        assert r.kind == kind
        assert r.n_frames == (1 if kind == "image" else 1 + n % 240)
        assert r.checksum == hashlib.md5(payload).hexdigest()
    # run twice → identical (decode is pure)
    again = {r.media_id: r for r in decode_media(media).collect()}
    assert again == rows


def test_frame_sample_only_video(media):
    feats = decode_media(media).cache()
    samples = frame_sample(feats, every_n=24)
    rows = samples.collect()
    assert all(r.frame_idx % 24 == 0 for r in rows)
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    videos = {r.media_id: r.n_frames for r in feats.filter("kind = 'video'").collect()}
    assert set(by_media) == {m for m, nf in videos.items() if nf >= 1}
    for m, idxs in by_media.items():
        assert sorted(idxs) == list(range(0, videos[m], 24))


def test_real_codec_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        _decode_real("image", b"\x89PNG")


def test_resize_media_plumbing(media):
    """Resize stage: images land at the target dims with payloads
    shrunk by the pixel-count ratio (strided fake resample); non-image
    rows pass through with decoded dims; deterministic across runs."""
    from osm_spark.multimodal.media import resize_media

    out = resize_media(media, target_w=64, target_h=64)
    rows = {r.media_id: r for r in out.collect()}
    src = {r.media_id: r for r in media.collect()}
    assert set(rows) == set(src)
    for mid, r in rows.items():
        if r.kind == "image":
            assert (r.width, r.height) == (64, 64)
            assert 1 <= len(r.bytes) <= len(src[mid].bytes)
        else:
            assert r.bytes == src[mid].bytes
            assert r.width > 0 and r.height > 0
    again = {r.media_id: bytes(r.bytes) for r in resize_media(media, 64, 64).collect()}
    assert again == {m: bytes(r.bytes) for m, r in rows.items()}


def test_media_dhash_properties(spark, sf_small_dir):
    """dHash: deterministic, near-identical payloads land within small
    Hamming distance, unrelated payloads far; pair op matches the
    brute-force Hamming join."""
    from osm_spark.multimodal.media import media_dhash, media_near_dups
    import pyspark.sql.functions as F

    base = b"abcdefgh" * 40
    rows = [
        (1, "image", base),
        (2, "image", base[:-1] + b"z"),   # tail edit: near dup
        (3, "image", bytes(range(256)) * 2),  # unrelated
        (4, "image", base),               # exact dup of 1
        (5, "image", b""),                # empty payload -> hash 0
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, bytes binary"
    )
    h = {r.doc_id: r.simhash for r in media_dhash(media).collect()}
    assert h[1] == h[4]
    assert h[5] == 0
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")  # noqa: E731
    assert ham(h[1], h[2]) <= 3 < ham(h[1], h[3])

    got = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in media_near_dups(media, max_hamming=3).collect()
    )
    want = sorted(
        (a, b, ham(h[a], h[b]))
        for a in h
        for b in h
        if a < b and ham(h[a], h[b]) <= 3
    )
    assert got == want
