from .ingest import (  # noqa: F401
    stream_dedup_first_seen,
    stream_extract,
    stream_sessionize,
    streaming_span_metrics,
    write_span_batch,
)
