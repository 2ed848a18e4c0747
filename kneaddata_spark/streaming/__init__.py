from .qc_stream import CLIP_DDL, stream_qc  # noqa: F401
