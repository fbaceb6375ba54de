"""Multimodal (image/audio/video) column handling."""

from osm_spark.multimodal.media import (
    MEDIA_SCHEMA,
    FEATURE_SCHEMA,
    synth_media,
    decode_media,
    frame_sample,
)

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_SCHEMA",
    "synth_media",
    "decode_media",
    "frame_sample",
]
