"""NAMING-COMPAT FACADE — pure re-export shim, zero implementation.

Every module in this package is a re-export of ``sparkx`` (the real
engine; see SURVEY.md §7.1 for the module blueprint), kept only so the
conventional ``<reference>_spark`` package name resolves for users
arriving from the reference repo.  Do not add code here; add it to
``sparkx`` and re-export.  The package exposes the conventional
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
