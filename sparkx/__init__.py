"""sparkx — a PySpark-native main-content extraction engine.

Re-expresses the deterministic extraction semantics of the reference
(`Mr-Kondo/agentic_rag_for_multi_model_pdf_extraction`, studied read-only at
/root/reference) as idiomatic Spark over an Iceberg-style table of multi-turn
agent transcripts:

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Design (see SURVEY.md for the full blueprint):

* All per-row logic lives in pure pandas/numpy kernels (``sparkx.kernels``)
  with **no Spark imports**, wrapped exactly once by ``mapInPandas`` in
  ``sparkx.pipeline``.  Zero row-at-a-time Python UDFs.
* Gates / truncations / regexes / joins / aggregations use native
  ``pyspark.sql.functions`` so Catalyst can push down and codegen.
* Skew (long conversations) is broken by repartitioning on
  ``xxhash64(conv_id, turn_idx)`` — per-turn extraction is embarrassingly
  parallel; ordering is intrinsic to ``(turn_idx, ts)`` and never lost.
* Resumability: conv-bucket ledger + atomic snapshot manifests
  (``sparkx.checkpoint``), Iceberg-shaped but parquet-backed in this sandbox.
* A pure-Python oracle (``sparkx.oracle``) independently re-implements the
  reference semantics; pytest asserts per-turn byte equality.
"""

__version__ = "0.1.0"
