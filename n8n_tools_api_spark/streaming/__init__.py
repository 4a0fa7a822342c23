from .incremental import incremental_extract
from .stateful import sessionize_batch, sessionize_stream
from .windowed import windowed_event_counts_batch, windowed_event_counts_stream

__all__ = [
    "incremental_extract",
    "sessionize_batch",
    "sessionize_stream",
    "windowed_event_counts_batch",
    "windowed_event_counts_stream",
]
