from .incremental import incremental_extract
from .windowed import windowed_event_counts_batch, windowed_event_counts_stream

__all__ = [
    "incremental_extract",
    "windowed_event_counts_batch",
    "windowed_event_counts_stream",
]
