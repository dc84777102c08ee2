from .decode import (  # noqa: F401
    attach_media_metadata,
    decode_media,
    resize_media,
    sample_frames,
)
