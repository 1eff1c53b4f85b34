from .binary import (
    MEDIA_META_SCHEMA,
    attach_fake_media,
    decode_and_featurize,
    frame_sample,
    media_metadata,
)

__all__ = [
    "MEDIA_META_SCHEMA",
    "attach_fake_media",
    "decode_and_featurize",
    "frame_sample",
    "media_metadata",
]
