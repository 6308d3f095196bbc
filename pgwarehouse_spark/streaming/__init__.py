from .events import (
    stream_dedup,
    stream_sessionize,
    stream_sync,
    stream_tumbling_counts,
)

__all__ = [
    "stream_dedup",
    "stream_sessionize",
    "stream_sync",
    "stream_tumbling_counts",
]
