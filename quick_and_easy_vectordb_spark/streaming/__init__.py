"""Structured Streaming operators (SURVEY.md §7 M7)."""

from quick_and_easy_vectordb_spark.streaming.windows import (  # noqa: F401
    read_events_stream,
    stream_sliding_counts,
    stream_tumbling_counts,
    stream_user_sessions,
)
