from .events import events_stream, stream_tumbling_counts, tumbling_counts

__all__ = ["events_stream", "stream_tumbling_counts", "tumbling_counts"]
