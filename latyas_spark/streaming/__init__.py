from .ingest import stream_extract, streaming_span_metrics  # noqa: F401
