from .stream import (
    stream_exact_dedup, stream_extract, stream_host_stats,
    stream_status_counts,
)

__all__ = [
    "stream_extract", "stream_host_stats", "stream_status_counts",
    "stream_exact_dedup",
]
