from .windows import (
    read_events_stream,
    stream_sessionized,
    stream_sliding,
    stream_tumbling,
)

__all__ = [
    "read_events_stream",
    "stream_tumbling",
    "stream_sliding",
    "stream_sessionized",
]
