from .html_stream import stream_html_extract  # noqa: F401
from .qc_stream import CLIP_DDL, stream_qc  # noqa: F401
from .screen_stream import stream_screen  # noqa: F401
