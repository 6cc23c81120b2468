from .stream_build import (
    dedup_stream_query,
    screen_stream,
    get_stream_profile,
    profile_stream_query,
    stream_interval_join,
    get_stream_sketch,
    sharded_dedup_stream,
    sketch_stream_query,
    windowed_distinct_stream,
    windowed_heavy_hitters_stream,
    session_stream,
    windowed_quantiles_stream,
)

__all__ = [
    "sketch_stream_query",
    "get_stream_sketch",
    "sharded_dedup_stream",
    "windowed_distinct_stream",
    "windowed_heavy_hitters_stream",
    "session_stream",
    "windowed_quantiles_stream",
    "dedup_stream_query",
    "screen_stream",
    "profile_stream_query",
    "get_stream_profile",
    "stream_interval_join",
]
