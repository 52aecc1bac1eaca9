from .columns import (
    MEDIA_SCHEMA,
    attach_media_metadata,
    decode_images,
    extract_features,
    sample_frames,
    text_to_media,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "decode_images",
    "extract_features",
    "sample_frames",
    "text_to_media",
]
