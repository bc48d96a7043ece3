from .events import sessionize_stream, stream_windowed_counts

__all__ = ["stream_windowed_counts", "sessionize_stream"]
