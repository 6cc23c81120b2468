from .stream_build import (
    get_stream_sketch,
    sketch_stream_query,
    windowed_distinct_stream,
)

__all__ = ["sketch_stream_query", "get_stream_sketch", "windowed_distinct_stream"]
