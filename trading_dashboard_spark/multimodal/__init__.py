from .columns import (  # noqa: F401
    MEDIA_SCHEMA,
    attach_media_metadata,
    decode_media_batch,
    frame_sample,
)
