"""Conventional-layout namespace for the engine.

The implementation lives in ``sparkx`` (see SURVEY.md §7.1 for the module
blueprint); this package exposes it under the conventional
``operators / sources / functions / plans / streaming`` layout:

* ``.operators``  — extraction kernels + dedup/similarity/multimodal operators
* ``.sources``    — input construction (synthetic transcripts, documents graft)
* ``.functions``  — scalar/text column functions (token stats, fingerprints)
* ``.plans``      — the extraction pipeline plan builders + checkpointing
* ``.streaming``  — Structured-Streaming incremental ingest
"""

from agentic_rag_for_multi_model_pdf_extraction_spark import (  # noqa: F401
    functions,
    operators,
    plans,
    sources,
    streaming,
)
