from .cdc_apply import StreamUpsertSink, apply_stream
from .dedup import first_per_key, stream_first_per_key
from .events import (
    events_stream,
    hopping_counts,
    stream_hopping_counts,
    stream_tumbling_counts,
    tumbling_counts,
)
from .sessions import sessionize, stream_sessionize
from .sketch import StreamKMV, sketch_stream

__all__ = [
    "StreamKMV",
    "StreamUpsertSink",
    "apply_stream",
    "events_stream",
    "sketch_stream",
    "first_per_key",
    "hopping_counts",
    "sessionize",
    "stream_first_per_key",
    "stream_hopping_counts",
    "stream_sessionize",
    "stream_tumbling_counts",
    "tumbling_counts",
]
