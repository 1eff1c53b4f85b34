from .events import events_stream, stream_tumbling_counts, tumbling_counts
from .sessions import sessionize, stream_sessionize

__all__ = [
    "events_stream",
    "sessionize",
    "stream_sessionize",
    "stream_tumbling_counts",
    "tumbling_counts",
]
