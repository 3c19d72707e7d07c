"""Structured-Streaming incremental ingest + stateful operators."""

from sparkx.streaming import (  # noqa: F401
    run_catchup,
    start_conv_progress_stream,
    start_extraction_stream,
    start_turn_window_stream,
    stream_transcripts,
)
from sparkx.streaming_dedup import start_dedup_stream  # noqa: F401
