"""Structured-Streaming incremental ingest."""

from sparkx.streaming import start_extraction_stream, stream_transcripts  # noqa: F401
