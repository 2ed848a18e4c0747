from .html_stream import stream_html_extract  # noqa: F401
from .qc_stream import CLIP_DDL, stream_qc  # noqa: F401
from .screen_stream import stream_screen  # noqa: F401
from .warc_stream import stream_warc_records  # noqa: F401
from .warc_audio_stream import stream_warc_audio_qc  # noqa: F401
