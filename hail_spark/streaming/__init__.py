from .events import (
    minhash_index_append,
    read_documents_stream,
    read_events_stream,
    sessionize_stream,
    stream_dedup_with_index,
    stream_exact_dedup,
    stream_quality_filter,
    stream_windowed_counts,
)

__all__ = [
    "minhash_index_append",
    "read_documents_stream",
    "read_events_stream",
    "sessionize_stream",
    "stream_dedup_with_index",
    "stream_exact_dedup",
    "stream_quality_filter",
    "stream_windowed_counts",
]
