from .decode import attach_media_metadata, decode_media, sample_frames  # noqa: F401
