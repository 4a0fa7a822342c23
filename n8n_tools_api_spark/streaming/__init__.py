from .curation_stream import (
    curation_stream,
    curation_stream_batch_twin,
    periodic_components_keep_list,
)
from .dedup_stream import (dedup_batch_twin, dedup_stream,
                           url_dedup_stream, url_dedup_stream_batch_twin,
                           with_content_hash)
from .incremental import incremental_extract
from .neardup_stream import (
    neardup_prefilter_batch_twin,
    neardup_prefilter_stream,
)
from .stateful import sessionize_batch, sessionize_stream
from .windowed import windowed_event_counts_batch, windowed_event_counts_stream

__all__ = [
    "curation_stream",
    "curation_stream_batch_twin",
    "periodic_components_keep_list",
    "dedup_batch_twin",
    "url_dedup_stream",
    "url_dedup_stream_batch_twin",
    "dedup_stream",
    "with_content_hash",
    "incremental_extract",
    "neardup_prefilter_batch_twin",
    "neardup_prefilter_stream",
    "sessionize_batch",
    "sessionize_stream",
    "windowed_event_counts_batch",
    "windowed_event_counts_stream",
]
