from .ingest import (  # noqa: F401
    stream_extract,
    streaming_span_metrics,
    write_span_batch,
)
