"""Plan builders: the extraction pipeline, checkpointing, metrics, sinks."""

from sparkx.checkpoint import completed_groups, read_extracted, run_resumable  # noqa: F401
from sparkx.pipeline import (  # noqa: F401
    crossref_edges,
    extract_blocks,
    extraction_metrics,
    ordered,
    run_extraction,
    surviving,
    type_stats,
)
from sparkx.sinks import save_chunks_json, serialized_chunks, upsert_extracted  # noqa: F401
