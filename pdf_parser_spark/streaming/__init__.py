from .stream import stream_extract, stream_status_counts

__all__ = ["stream_extract", "stream_status_counts"]
