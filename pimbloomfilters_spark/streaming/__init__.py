from .stream_build import (
    dedup_stream_query,
    get_stream_sketch,
    sketch_stream_query,
    windowed_distinct_stream,
)

__all__ = [
    "sketch_stream_query",
    "get_stream_sketch",
    "windowed_distinct_stream",
    "dedup_stream_query",
]
