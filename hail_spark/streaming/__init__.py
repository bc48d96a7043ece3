from .events import (
    read_documents_stream,
    read_events_stream,
    sessionize_stream,
    stream_exact_dedup,
    stream_quality_filter,
    stream_windowed_counts,
)

__all__ = [
    "read_documents_stream",
    "read_events_stream",
    "sessionize_stream",
    "stream_exact_dedup",
    "stream_quality_filter",
    "stream_windowed_counts",
]
